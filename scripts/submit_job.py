"""spark-submit entry point: the corpus build as a submitted job.

Usage (north_rule deployment shape):

    python scripts/package.py                 # -> dist/ccspark.zip
    spark-submit --master local[8] \\
        --py-files dist/ccspark.zip \\
        scripts/submit_job.py <sf_dir> <out_dir>

On a real cluster only --master and the memory/executor flags change; the
job itself is identical.  Prints one JSON line with row counts so the
invocation is verifiable.
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/ccspark_submit_out"

    spark = SparkSession.builder.appName("ccspark-submit").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from ccspark.api import CCSparkCorpus
    from ccspark.fixtures_sql import pages_spark
    from ccspark import pipeline

    pages = pages_spark(spark, sf_dir)
    cc = CCSparkCorpus(spark)
    corpus = cc.process_pages(pages)
    pipeline.write_partitioned(corpus, out_dir)
    n = spark.read.parquet(out_dir).count()
    metrics = cc.metrics(pages)
    print(json.dumps({"corpus_lines": n,
                      "cells": metrics.count(),
                      "out": out_dir}))


if __name__ == "__main__":
    main()
