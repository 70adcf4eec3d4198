"""Warehouse layer: parquet fallback behaviors (the Iceberg path needs a
catalog jar; selection logic is observable via is_iceberg)."""

from __future__ import annotations

from pyspark.sql import Row

from ccspark.catalog import Warehouse


def test_fallback_detected(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path))
    assert not wh.is_iceberg          # no iceberg catalog in the sandbox


def test_save_and_read_partitioned(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path))
    df = spark.createDataFrame(
        [Row(region="eu", country="de", v=i) for i in range(5)]
        + [Row(region="eu", country="fr", v=9)])
    wh.save_table(df, "t1", ("region", "country"))
    back = wh.read_table("t1")
    assert back.count() == 6
    assert {r.country for r in back.collect()} == {"de", "fr"}


def test_overwrite_partition_idempotent(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path))
    df = spark.createDataFrame(
        [Row(bucket=0, v="a"), Row(bucket=0, v="b"), Row(bucket=1, v="c")])
    wh.overwrite_partition(df, "t2", "bucket", 0)
    wh.overwrite_partition(df, "t2", "bucket", 1)
    assert wh.read_table("t2").count() == 3
    # re-running a partition overwrite does not duplicate rows
    wh.overwrite_partition(df, "t2", "bucket", 0)
    assert wh.read_table("t2").count() == 3


def test_append(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path))
    df = spark.createDataFrame([Row(x=1)])
    wh.append(df, "t3")
    wh.append(df, "t3")
    assert wh.read_table("t3").count() == 2
