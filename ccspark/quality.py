"""M3-M5: n-gram LM "perplexity" scoring + Iglewicz-Hoaglin outlier cut.

Reference: per-(region,country,lang) cell, train a FastText LM
(outlier_detection.py:58-74), score each sample's avg log-likelihood
("Probability"), divide by word count ("Perplexity" - actually mean
per-word log-likelihood, outlier_detection.py:83-84), then cut samples
whose modified z-score 0.6745*(x - median)/MAD exceeds |3|
(outlier_detection.py:95-113): z > 3 -> "HIGH" (too predictable),
z < -3 -> "LOW" (too random).  Cells under the 5M-word training gate are
passed through unscored (outlier_detection.py:147-149).

Spark re-expression (north_rule allows a counting n-gram LM): the LM is a
token-unigram model estimated per cell with pure DataFrame aggregations -
no Python in the scoring path, everything stays in whole-stage codegen:

    tokens = explode(split(text))
    lm     = count(token) per (cell, token)          [shuffle 1]
    score  = avg over tokens of ln P(token | cell)   [join + shuffle 2]
    stats  = exact median + MAD per cell             [two shuffles, tiny]
    cut    = pure column arithmetic

Keeping the reference's sign convention: higher mean loglik = more
predictable = HIGH side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

CELL = ("region", "country", "lang")


def score_loglik(docs: DataFrame, group_cols=CELL,
                 text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Per-doc mean token log-likelihood under its cell's unigram LM."""
    g = list(group_cols)
    toks = (docs.select(id_col, *g,
                        F.explode(F.split(F.col(text_col), " ")).alias("w"))
            .where(F.length("w") > 0))
    lm = toks.groupBy(*g, "w").agg(F.count("*").alias("cnt"))
    totals = lm.groupBy(*g).agg(F.sum("cnt").alias("cell_n"))
    lm = lm.join(F.broadcast(totals) if len(g) > 0 else totals, g)
    scored = (toks.join(lm, g + ["w"])
              .groupBy(id_col, *g)
              .agg(F.avg(F.log(F.col("cnt") / F.col("cell_n")))
                    .alias("loglik"),
                   F.count("*").alias("n_words")))
    return scored


def mark_outliers(scored: DataFrame, group_cols=CELL,
                  z_cut: float = 3.0,
                  min_words: int = 5_000_000) -> DataFrame:
    """Modified z-score cut per cell; cells under the training-size gate
    pass through as 'ORIGINAL' (the reference copies them unprocessed)."""
    g = list(group_cols)
    med = scored.groupBy(*g).agg(
        F.median("loglik").alias("med"),
        F.sum("n_words").alias("cell_words"))
    j = scored.join(F.broadcast(med), g)
    mad = (j.groupBy(*g)
           .agg(F.median(F.abs(F.col("loglik") - F.col("med"))).alias("mad")))
    j = j.join(F.broadcast(mad), g)
    # degenerate cell (all docs score identically) -> MAD = 0 -> z := 0
    # (the reference divides by zero and gets inf/nan in pandas; all-IN is
    # the intended outcome)
    z = F.when(F.col("mad") == 0, F.lit(0.0)).otherwise(
        0.6745 * (F.col("loglik") - F.col("med")) / F.col("mad"))
    return (
        j.withColumn("z", F.round(z, 6))
        .withColumn(
            "prediction",
            F.when(F.col("cell_words") < min_words, F.lit("ORIGINAL"))
             .when(F.col("z") > z_cut, F.lit("HIGH"))
             .when(F.col("z") < -z_cut, F.lit("LOW"))
             .otherwise(F.lit("IN")))
        .drop("med", "mad", "cell_words")
    )


def remove_outliers(docs: DataFrame, group_cols=CELL,
                    text_col: str = "text", id_col: str = "doc_id",
                    z_cut: float = 3.0, min_words: int = 5_000_000
                    ) -> DataFrame:
    """End-to-end M3-M5: keep docs scored IN (or ORIGINAL)."""
    scored = score_loglik(docs, group_cols, text_col, id_col)
    marked = mark_outliers(scored, group_cols, z_cut, min_words)
    keep_ids = marked.where(F.col("prediction").isin("IN", "ORIGINAL")) \
                     .select(id_col)
    return docs.join(keep_ids, id_col, "left_semi")
