"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All query bodies live in ccspark.queries: each is ONE SQL template
rendered for Spark and for DuckDB, so the two sides cannot drift.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ccspark import queries as Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full quality_filter composite on sf0.001 through the
    production facade - Gopher + C4 document gates (scan-speed pruning) ->
    geo gate -> line explode -> clean/keep pandas-UDF kernel -> ordinal ->
    keep-first dedup -> PII scrub.  Hash-verified end-to-end against a
    one-statement DuckDB twin (driver query ``training_corpus``)."""
    from ccspark.api import CCSparkCorpus
    from ccspark.fixtures_sql import pages_spark

    pages = pages_spark(spark, "/root/testdata/sf0.001")
    cc = CCSparkCorpus(spark)
    return cc.build_training_corpus(
        pages, gopher_thresholds=Q.TRAINING_GOPHER_TH)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md par.2."""
    out = {name: Q.spark_query(name) for name in Q.QUERY_BUILDERS}
    out.update(Q.MODULE_QUERIES)   # non-SQL ops: driver rows-only check
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB renderings of the same query templates."""
    return Q.oracle_queries()
