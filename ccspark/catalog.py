"""Warehouse abstraction: Iceberg when a catalog is configured, parquet
directories otherwise.

north_rule targets Iceberg tables; this sandbox has no Iceberg runtime
jars, so every writer in the repo goes through this layer: against a real
cluster (`spark.sql.catalog.<name>=org.apache.iceberg.spark.SparkCatalog`
configured), `save_table` issues the Iceberg `writeTo(...).partitionedBy
(...).createOrReplace()` DataFrameWriterV2 path and `overwrite_partition`
maps to `overwritePartitions()` (one snapshot per checkpoint bucket -
ccspark.checkpoint's semantics); in the sandbox both fall back to
partitioned parquet under a warehouse directory with identical layout and
results.  The selection is observable (`is_iceberg`) and tested on the
fallback path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F


class Warehouse:
    def __init__(self, spark: SparkSession, root: str,
                 catalog: str | None = None):
        self.spark = spark
        self.root = root
        self.catalog = catalog or self._detect_catalog()

    def _detect_catalog(self) -> str | None:
        try:
            confs = self.spark.conf
            for name in ("iceberg", "spark_catalog", "local"):
                v = confs.get(f"spark.sql.catalog.{name}", None)
                if v and "iceberg" in v.lower():
                    return name
        except Exception:
            pass
        return None

    @property
    def is_iceberg(self) -> bool:
        return self.catalog is not None

    def _path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def save_table(self, df: DataFrame, table: str,
                   partition_cols: tuple[str, ...] = (),
                   max_records_per_file: int = 100_000) -> None:
        """CREATE OR REPLACE the table (Iceberg DataFrameWriterV2 when
        available, partitioned parquet otherwise)."""
        if self.is_iceberg:
            w = (df.writeTo(f"{self.catalog}.{table}")
                   .option("write.target-file-size-bytes", "134217728"))
            if partition_cols:
                cols = [F.col(c) for c in partition_cols]
                w = w.partitionedBy(*cols)
            w.createOrReplace()
            return
        (df.write.mode("overwrite")
           .option("maxRecordsPerFile", max_records_per_file)
           .partitionBy(*partition_cols)
           .parquet(self._path(table)))

    def overwrite_partition(self, df: DataFrame, table: str,
                            partition_col: str, value) -> None:
        """Idempotent per-partition overwrite - the checkpoint/resume
        primitive (one Iceberg snapshot per call)."""
        part = df.where(F.col(partition_col) == value)
        if self.is_iceberg:
            part.writeTo(f"{self.catalog}.{table}").overwritePartitions()
            return
        (part.write.mode("overwrite")
             .parquet(os.path.join(self._path(table),
                                   f"{partition_col}={value}")))

    def append(self, df: DataFrame, table: str) -> None:
        if self.is_iceberg:
            df.writeTo(f"{self.catalog}.{table}").append()
            return
        df.write.mode("append").parquet(self._path(table))

    def read_table(self, table: str) -> DataFrame:
        if self.is_iceberg:
            return self.spark.read.table(f"{self.catalog}.{table}")
        return self.spark.read.parquet(self._path(table))


def save_bucketed(spark: SparkSession, df: DataFrame, table: str,
                  bucket_col: str, n_buckets: int = 16,
                  sort_col: str | None = None) -> None:
    """Bucketed managed table (Hive-style bucketBy; Iceberg's
    bucket(N, col) partition transform on a real catalog): co-locates rows
    by hash(bucket_col) at WRITE time so joins and aggregations on that
    key read pre-shuffled data - the exchange disappears from every
    downstream join between tables bucketed the same way (asserted in
    tests/test_catalog.py).  At crawl scale: bucket corpus lines and their
    side tables by url/domain once, join shuffle-free forever after."""
    w = df.write.mode("overwrite").format("parquet") \
        .bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)
