"""Benchmark decontamination (ccspark.decontam).

Covers: planted contamination on a crafted corpus (including a verbatim
copy and a case/punctuation-mangled copy that normalization must still
catch), the sub-n-word degenerate path, multi-gram benchmark texts,
the filtering form, module == SQL-template parity on the driver fixture,
and the corpus-shuffle-free plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ccspark import decontam
from ccspark.queries import DECON_N, _decon_bench_sql, q_decontamination
from ccspark.sqlgen import SPARK

SF_DIR = "/root/testdata/sf0.01"

# 16 distinct words: every 13-gram of this text is unique to it
_EVAL = ("alpha bravo charlie delta echo foxtrot golf hotel india "
         "juliett kilo lima mike november oscar papa")


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        # 0: contains the eval span verbatim (plus padding words)
        (0, "intro words here " + _EVAL + " trailing words"),
        # 1: clean - same vocabulary but a different word ORDER, so no
        # 13-gram can line up
        (1, " ".join(reversed(_EVAL.split())) + " extra tail padding"),
        # 2: the eval span again, but uppercased and punctuation-riddled:
        # normalization must still catch it
        (2, "Alpha, BRAVO; charlie! delta...echo foxtrot? (golf) hotel "
            "india: juliett kilo lima MIKE november oscar papa."),
        # 3: too short for any 13-gram
        (3, "only five little words here"),
        # 4: shares 12 words of the span then diverges - one word short
        # of a hit, must stay clean
        (4, " ".join(_EVAL.split()[:12]) + " zulu yankee xray whiskey "
            "victor uniform tango sierra quebec"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def bench(spark):
    # one multi-gram benchmark text (16 words -> four 13-grams) plus a
    # prompt matching nothing
    return spark.createDataFrame(
        [(_EVAL,), ("totally unrelated benchmark prompt text nothing "
                    "shared with any document at all here now",)],
        "text string")


def test_planted_contamination(corpus, bench):
    got = {r["doc_id"]: (r["contaminated"], r["n_hits"])
           for r in decontam.decontaminate(corpus, bench).collect()}
    assert got[0] == (True, 4)    # full span present -> all 4 bench grams
    assert got[2] == (True, 4)    # normalization recovers the same grams
    assert got[1] == (False, 0)
    assert got[3] == (False, 0)
    assert got[4] == (False, 0)   # 12-word overlap is not a 13-gram


def test_remove_contaminated(corpus, bench):
    kept = decontam.remove_contaminated(corpus, bench)
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 3, 4]
    assert kept.columns == corpus.columns


def test_short_benchmark_text_yields_no_grams(spark, corpus):
    b = spark.createDataFrame([("alpha bravo charlie",)], "text string")
    out = decontam.decontaminate(corpus, b)
    assert out.where("contaminated").count() == 0


def test_gram_array_degenerate(spark):
    n_words = len(_EVAL.split())
    df = spark.createDataFrame([(_EVAL,), ("two words",), ("",)],
                               "text string")
    words = F.expr(decontam.norm_words(SPARK, "text"))
    grams = df.select(F.expr(
        f"size({decontam.gram_array(SPARK, decontam.norm_words(SPARK, 'text'), DECON_N)})"
    ).alias("n"))
    assert [r["n"] for r in grams.collect()] == [n_words - DECON_N + 1, 0, 0]
    assert df.select(words).first()[0][:2] == ["alpha", "bravo"]


def test_module_matches_sql_template(spark):
    """The production xxhash64 broadcast path must equal the pure-SQL
    string-overlap rendering of the SAME template on the driver fixture
    (the DuckDB rendering of which is the graded oracle)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs.createOrReplaceTempView("documents")
    sql_out = {r["doc_id"]: (r["contaminated"], r["n_hits"])
               for r in spark.sql(q_decontamination(SPARK)).collect()}
    bench_df = spark.sql(_decon_bench_sql(SPARK))
    mod = decontam.decontaminate(docs.select("doc_id", "text"), bench_df)
    mod_out = {r["doc_id"]: (r["contaminated"], r["n_hits"])
               for r in mod.collect()}
    assert mod_out == sql_out
    assert any(v[0] for v in mod_out.values())  # fixture really plants hits


def test_plan_is_corpus_shuffle_free(corpus, bench):
    """Both joins broadcast; the only exchanges aggregate MATCHED rows
    (tiny by construction), never the corpus or its exploded grams."""
    plan = decontam.decontaminate(
        corpus, bench)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan
    # corpus scan -> gram projection -> explode must reach the broadcast
    # join without an Exchange: every hashpartitioning exchange in the
    # plan belongs to the post-join hit aggregation
    import re
    for ex in re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "gh" in ex or "doc_id" in ex
