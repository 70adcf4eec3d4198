"""Checkpointed, idempotently-resumable corpus builds + lineage/metrics.

Re-expression of the reference's marker-file checkpointing
(cc_corpus.py:142-144,186-190: write ``check/<segment>.txt`` after a
segment completes, skip segments whose marker exists) in warehouse terms,
per north_rule: per-partition lineage and metrics tables and idempotent
resume after failure.

The unit of work is a *bucket*: ``xxhash64(url) % n_buckets`` (the scale
analogue of a WET segment - at 10^12 docs you'd use the crawl's natural
segment/file partitioning).  Each bucket batch is processed by the full
corpus pipeline and written to its own partition directory with
overwrite semantics, THEN its lineage row is appended - so a crash
between data write and lineage commit leaves only an orphan directory
that the resumed run overwrites.  On Iceberg this maps to one
snapshot-producing ``overwritePartitions()`` per batch with the lineage
table as a second table in the same catalog; parquet directories emulate
it here.

Layout under <root>/:
    data/bucket=<i>/...parquet     corpus_lines output per bucket
    lineage/...parquet             (bucket, status, n_rows, run_id)
    metrics/...parquet             (bucket, region, country, lang,
                                    lines_seen/kept/dropped, docs_seen)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ccspark import pipeline

LINEAGE_SCHEMA = "bucket INT, status STRING, n_rows LONG, run_id STRING"


def _bucket_col(n_buckets: int):
    return F.pmod(F.xxhash64("url"), F.lit(n_buckets)).cast("int")


def completed_buckets(spark: SparkSession, root: str) -> set[int]:
    path = os.path.join(root, "lineage")
    if not os.path.exists(path):
        return set()
    rows = (spark.read.parquet(path)
            .where(F.col("status") == "done")
            .select("bucket").distinct().collect())
    return {r.bucket for r in rows}


def build_resumable(spark: SparkSession, pages: DataFrame, root: str,
                    n_buckets: int = 8, run_id: str = "run",
                    fail_after: int | None = None) -> None:
    """Process all not-yet-done buckets; each bucket is atomic-ish
    (data overwrite, then lineage append).  *fail_after* injects a crash
    after that many buckets - used by the resume tests."""
    done = completed_buckets(spark, root)
    todo = [b for b in range(n_buckets) if b not in done]
    staged = pages.withColumn("_bucket", _bucket_col(n_buckets))
    n_processed = 0
    for b in todo:
        part = staged.where(F.col("_bucket") == b).drop("_bucket")
        out = pipeline.corpus_lines(part)
        data_path = os.path.join(root, "data", f"bucket={b}")
        out.write.mode("overwrite").parquet(data_path)
        n_rows = spark.read.parquet(data_path).count()

        metrics = (pipeline.cell_metrics(part)
                   .withColumn("bucket", F.lit(b)))
        metrics.write.mode("append").parquet(os.path.join(root, "metrics"))

        lineage = spark.createDataFrame(
            [(b, "done", n_rows, run_id)], LINEAGE_SCHEMA)
        lineage.write.mode("append").parquet(os.path.join(root, "lineage"))

        n_processed += 1
        if fail_after is not None and n_processed >= fail_after:
            raise RuntimeError(f"injected failure after bucket {b}")


def read_corpus(spark: SparkSession, root: str) -> DataFrame:
    return spark.read.parquet(os.path.join(root, "data"))


def read_metrics(spark: SparkSession, root: str) -> DataFrame:
    """Aggregated metrics across buckets; invariant seen = kept + dropped
    holds per cell because it holds per bucket-cell."""
    m = spark.read.parquet(os.path.join(root, "metrics"))
    return (m.groupBy("region", "country", "lang")
             .agg(F.sum("lines_seen").alias("lines_seen"),
                  F.sum("lines_kept").alias("lines_kept"),
                  F.sum("lines_dropped").alias("lines_dropped"),
                  F.sum("docs_seen").alias("docs_seen")))
