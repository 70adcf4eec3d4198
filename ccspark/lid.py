"""M1/M2: trainable language identification + dual-model agreement filter.

Reference behavior being re-expressed:
  * M1 - a neural LID model scored page-at-a-time in batch
    (cc_corpus.py:147-148,176: lidNet loaded per worker, predict on the
    page list);
  * M2 - a second pass where TWO independent detectors (CLD2 + CLD3) must
    both agree with the expected language, and lines of <= 150 chars are
    'ukn' (geoWAC.py:19-41, applied :62-67).

Neither lidNet/fastText nor CLD2/3 is installable here, so the model is a
self-trained character-n-gram multinomial Naive Bayes - the same model
family fastText's supervised mode reduces to for LID - trained with
DataFrame aggregations (distributed counting), collected into a compact
top-K table, and scored inside an ``Iterator[pd.Series]`` pandas UDF so
the model deserializes ONCE per executor python worker, not once per
batch (the fastText-on-Spark serving pattern; swap `train`/`predict`
internals for fasttext.load_model + model.predict on a real cluster).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F


class NgramLidModel:
    """Char-n-gram multinomial NB: log P(lang) + sum log P(gram|lang)."""

    def __init__(self, n: int, priors: dict, loglik: dict, vocab: set,
                 alpha_denom: dict):
        self.n = n
        self.priors = priors        # lang -> log prior
        self.loglik = loglik        # (lang, gram) -> log prob
        self.vocab = vocab
        self.alpha_denom = alpha_denom  # lang -> log(unseen-gram prob)

    def grams(self, text: str):
        t = f" {text.lower()} "
        return (t[i:i + self.n] for i in range(max(len(t) - self.n + 1, 1)))

    def predict(self, text: str, min_len: int = 0) -> str:
        if text is None or len(text) <= min_len:
            return "ukn"
        scores = dict(self.priors)
        for g in self.grams(text):
            if g in self.vocab:
                for lang in scores:
                    scores[lang] += self.loglik.get(
                        (lang, g), self.alpha_denom[lang])
        # deterministic argmax (score desc, lang asc)
        return max(sorted(scores), key=lambda lg: scores[lg])


def train(docs: DataFrame, n: int = 3, text_col: str = "text",
          label_col: str = "lang", top_k: int = 4000) -> NgramLidModel:
    """Distributed training: explode char n-grams, count per (lang, gram),
    keep the top_k grams by global frequency, Laplace-smooth."""
    t = F.concat(F.lit(" "), F.lower(F.col(text_col)), F.lit(" "))
    idx = F.sequence(F.lit(0), F.greatest(F.length(t) - n, F.lit(0)))
    grams = F.transform(idx, lambda i: F.substring(t, i + 1, n))
    g = (docs.select(F.col(label_col).alias("lang"),
                     F.explode(grams).alias("gram"))
         .where(F.length("gram") == n))
    counts = g.groupBy("lang", "gram").count()
    vocab_rows = (counts.groupBy("gram").agg(F.sum("count").alias("n"))
                  .orderBy(F.desc("n"), "gram").limit(top_k).collect())
    vocab = {r.gram for r in vocab_rows}
    cl = counts.where(F.col("gram").isin(list(vocab))).collect()
    lang_totals: dict = {}
    for r in cl:
        lang_totals[r.lang] = lang_totals.get(r.lang, 0) + r["count"]
    v = len(vocab)
    loglik = {
        (r.lang, r.gram):
            math.log((r["count"] + 1) / (lang_totals[r.lang] + v + 1))
        for r in cl
    }
    alpha_denom = {
        lang: math.log(1.0 / (tot + v + 1)) for lang, tot in lang_totals.items()
    }
    n_docs = docs.count()
    prior_rows = docs.groupBy(label_col).count().collect()
    priors = {r[label_col]: math.log(r["count"] / n_docs) for r in prior_rows}
    return NgramLidModel(n, priors, loglik, vocab, alpha_denom)


def make_predict_udf(spark, model: NgramLidModel, min_len: int = 0):
    """Iterator-of-Series pandas UDF: the broadcast model is resolved once
    per executor worker, then reused across every Arrow batch."""
    import pandas  # noqa: F401
    from pyspark.sql.functions import pandas_udf

    bc = spark.sparkContext.broadcast(model)

    def predict_iter(it: "Iterator[pandas.Series]"):
        m = bc.value                      # once per worker
        for series in it:
            yield pandas.Series([m.predict(x, min_len) for x in series])

    from typing import Iterator as _It
    predict_iter.__annotations__ = {
        "it": _It[pandas.Series], "return": _It[pandas.Series]}
    return pandas_udf(predict_iter, "string")


def predict(spark, docs: DataFrame, model: NgramLidModel,
            text_col: str = "text", out_col: str = "lang_pred",
            min_len: int = 0) -> DataFrame:
    return docs.withColumn(out_col,
                           make_predict_udf(spark, model, min_len)(text_col))


def agreement_filter(spark, docs: DataFrame, model_a: NgramLidModel,
                     model_b: NgramLidModel, expected_col: str = "lang",
                     text_col: str = "text",
                     min_len: int = 150) -> DataFrame:
    """M2 (geoWAC.py:62-67): keep rows where BOTH detectors agree with the
    expected language; rows shorter than min_len score 'ukn' and are
    dropped (geoWAC.py:19-22 threshold semantics)."""
    df = predict(spark, docs, model_a, text_col, "lid_a", min_len)
    df = predict(spark, df, model_b, text_col, "lid_b", min_len)
    return df.where((F.col("lid_a") == F.col(expected_col))
                    & (F.col("lid_b") == F.col(expected_col)))
