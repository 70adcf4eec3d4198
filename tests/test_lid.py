"""M1/M2 LID verification.

Three independent checks (the driver-gated lid_ngram_sql query is the
fourth - it hash-verifies the NB math against DuckDB):

  * the production Iterator-pandas-UDF path must predict IDENTICALLY to
    the pure-SQL rendering (same vocab cutoff, smoothing, argmax);
  * a held-out accuracy floor on genuinely multilingual synthetic docs
    (the driver's documents fixture has decorative lang labels - every
    lang draws from the same English word distribution, so accuracy
    there is pinned at the prior and says nothing about the model);
  * agreement-filter invariants (both models agree with expected lang,
    min_len gate drops short rows);
  * the fastText seam: a fake fasttext module shipped via addPyFile
    serves through the same broadcast + Iterator-UDF path with zero
    pipeline changes.
"""

from __future__ import annotations

import random

from pyspark.sql import Row, functions as F

from ccspark import lid
from ccspark import queries as Q

WORDS = {
    "eng": ("the quick brown fox jumps over lazy dog with from this that "
            "house water light people through world because should").split(),
    "deu": ("der die das und ist nicht ein eine mit von haus wasser licht "
            "leute durch welt weil sollte schnell braun fuchs über").split(),
    "spa": ("el la los que de en un una con por casa agua luz gente "
            "mundo porque rápido zorro sobre perro salta desde").split(),
    "fra": ("le la les que de en un une avec par maison eau lumière gens "
            "monde parce rapide renard sur chien saute depuis").split(),
}


def synth_docs(spark, per_lang=60, words_per_doc=30, seed=11):
    rng = random.Random(seed)
    rows = []
    i = 0
    for lang, vocab in WORDS.items():
        for _ in range(per_lang):
            rows.append(Row(doc_id=i, lang=lang,
                            text=" ".join(rng.choices(vocab,
                                                      k=words_per_doc))))
            i += 1
    return spark.createDataFrame(rows)


def test_udf_path_matches_sql_twin_exactly(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    model = lid.train(docs, n=3, top_k=1000)
    mod = {r.doc_id: r.lang_pred
           for r in lid.predict(spark, docs, model).collect()}
    Q.ensure_views(spark, "/root/testdata/sf0.001")
    sql = {r.doc_id: r.lang_pred
           for r in spark.sql(Q.q_lid_ngram_sql(Q.SPARK)).collect()}
    assert mod == sql


def test_heldout_accuracy_floor(spark):
    docs = synth_docs(spark)
    train_d = docs.where("doc_id % 5 != 0")
    test_d = docs.where("doc_id % 5 = 0")
    model = lid.train(train_d, n=3, top_k=2000)
    got = lid.predict(spark, test_d, model).collect()
    acc = sum(r.lang_pred == r.lang for r in got) / len(got)
    assert acc >= 0.95, acc


def test_agreement_filter_invariants(spark):
    docs = synth_docs(spark, per_lang=30, words_per_doc=40)
    short = spark.createDataFrame(
        [Row(doc_id=10_000, lang="eng", text="too short")])
    docs = docs.unionByName(short)
    m2 = lid.train(docs, n=2, top_k=800)
    m3 = lid.train(docs, n=3, top_k=2000)
    kept = lid.agreement_filter(spark, docs, m2, m3, min_len=150).collect()
    assert kept
    for r in kept:
        assert r.lid_a == r.lang and r.lid_b == r.lang
        assert len(r.text) > 150          # the 'ukn' gate
    assert all(r.doc_id != 10_000 for r in kept)
    # the filter is the conjunction, nothing more: recompute expectations
    scored = lid.predict(spark, docs, m2, out_col="a", min_len=150)
    scored = lid.predict(spark, scored, m3, out_col="b", min_len=150)
    want = {r.doc_id for r in scored.collect()
            if r.a == r.lang and r.b == r.lang}
    assert {r.doc_id for r in kept} == want


FAKE_FASTTEXT = '''
class _Model:
    def predict(self, text, k=1):
        lang = "en" if " the " in (" " + text + " ") else "xx"
        return ([f"__label__{lang}"], [0.9])

def load_model(path):
    return _Model()
'''


def test_fasttext_seam_serves_through_udf(spark, tmp_path):
    """FastTextLidModel must flow through broadcast + Iterator-UDF
    serving unchanged: only the path pickles, workers lazy-load."""
    mod = tmp_path / "fasttext.py"
    mod.write_text(FAKE_FASTTEXT)
    spark.sparkContext.addPyFile(str(mod))
    model = lid.load_model("fasttext:/nonexistent/lid.176.bin")
    docs = spark.createDataFrame([
        Row(doc_id=0, text="this is the english sentence for the test"),
        Row(doc_id=1, text="ceci nest pas anglais du tout vraiment"),
        Row(doc_id=2, text=""),
    ])
    got = {r.doc_id: r.lang_pred
           for r in lid.predict(spark, docs, model).collect()}
    assert got == {0: "en", 1: "xx", 2: "ukn"}
    # pickling ships only the path, never a loaded model
    import pickle
    state = pickle.loads(pickle.dumps(model))
    assert state._m is None and state.path == "/nonexistent/lid.176.bin"


def test_load_model_spec_errors():
    import pytest
    with pytest.raises(ValueError, match="needs training docs"):
        lid.load_model("ngram")
    with pytest.raises(ValueError, match="unknown LID model"):
        lid.load_model("cld3")
