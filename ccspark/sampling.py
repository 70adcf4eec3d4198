"""Deterministic token-budget sampling (training-data mixing).

A training-data build rarely takes every document it could: it targets a
token BUDGET per group (per language, per source, per domain tier) and
needs the selection to be (a) deterministic across reruns/engines,
(b) unbiased w.r.t. document content, (c) computable in one pass.  The
reference caps page COUNTS per country with random.shuffle
(geoWAC.py:149-152 - W4, whose deterministic rewrite is skew.cap_per_key);
this operator generalizes the cap to WEIGHTED budgets: order each group
by a content-independent hash and keep the greedy prefix of documents
whose cumulative token count stays within the budget.

Semantics (pinned, oracle-verified): documents are ordered by
(md5(group || ':' || doc_id), doc_id) inside each group; a document is
kept iff the cumulative token count BEFORE it is still below the budget
- so the document that crosses the boundary is included, and every
non-empty group keeps at least one document (budget overshoot is at most
one document, the standard greedy-prefix contract).

Scale shape: one hash projection + one window over the group partition
(a single shuffle on the group key, the same partitioning the downstream
per-group writes reuse).  Skewed groups (one language dominating a
crawl) can salt the window via a two-phase variant, but the group count
here is small (languages), so the plain window is the right default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def with_token_weights(docs: DataFrame, text_col: str = "text",
                       weight_col: str = "weight") -> DataFrame:
    """Whitespace-token count as the sampling weight (bigint)."""
    w = F.size(F.filter(F.split(F.col(text_col), " "),
                        lambda x: x != F.lit("")))
    return docs.withColumn(weight_col, w.cast("long"))


def sample_by_token_budget(docs: DataFrame, budget: int,
                           group_col: str = "lang",
                           text_col: str = "text",
                           id_col: str = "doc_id",
                           weight_col: str | None = None) -> DataFrame:
    """All *docs* columns + ``weight``, ``cum`` (cumulative tokens in
    hash order, inclusive) and ``kept`` (greedy prefix within *budget*).

    Filter ``kept`` for the sample; the flags are returned (rather than
    pre-filtered) so lineage metrics and the driver oracle can see the
    rejected rows too."""
    if weight_col is None:
        docs = with_token_weights(docs, text_col)
        weight_col = "weight"
    ordkey = F.md5(F.concat_ws(":", F.col(group_col), F.col(id_col)))
    w = (Window.partitionBy(group_col)
         .orderBy(ordkey, F.col(id_col))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    out = docs.withColumn("cum", F.sum(weight_col).over(w).cast("long"))
    return out.withColumn(
        "kept", (F.col("cum") - F.col(weight_col)) < F.lit(budget))
