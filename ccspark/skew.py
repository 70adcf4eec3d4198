"""Explicit skew handling (north_rule: "partitioning / shuffle / skew
handled explicitly at 10^12-document scale").

Where skew lives in this workload and what handles it:

  * dimension joins - broadcast (never shuffled), skew-immune;
  * dedup / metrics aggregates - hash aggregation with map-side partial
    combine: hot keys collapse before the exchange (pipeline.dedup_keep_first);
  * joins that do shuffle - AQE skew-join splitting is on (session.py);
  * per-URL windows - urls are fine-grained; a single url's lines always
    fit one task;
  * per-DOMAIN sequential operators (the greedy chunker) - a mega-domain
    must be processed by one task; the mitigations are the deterministic
    per-key cap below (the reference's own answer: country_limit=150,
    geoWAC.py:149-152) or pre-splitting by url prefix;
  * pathological groupBy-collect patterns - the salted two-phase
    aggregation below.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def salted_counts(df: DataFrame, keys: list[str], salt_n: int = 16,
                  count_col: str = "n") -> DataFrame:
    """Two-phase salted count per key: phase 1 aggregates (key, salt)
    locally (splitting a hot key across salt_n reducers), phase 2 merges
    the partials.  Equivalent to groupBy(keys).count() - the salt only
    changes the shuffle layout."""
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()),
                  F.lit(salt_n)).alias("_salt")
    partial = (df.select(*keys, salt)
               .groupBy(*keys, "_salt")
               .agg(F.count("*").alias("_pc")))
    return (partial.groupBy(*keys)
            .agg(F.sum("_pc").alias(count_col)))


def cap_per_key(df: DataFrame, key: str, limit: int,
                tiebreak: str = "url") -> DataFrame:
    """W4 (geoWAC.py:149-152): deterministically keep at most *limit*
    rows per key - selection pinned by md5(tiebreak) rather than
    random.shuffle so results are stable across runs and executors."""
    w = Window.partitionBy(key).orderBy(F.md5(F.col(tiebreak)), tiebreak)
    return (df.withColumn("_rk", F.row_number().over(w))
              .where(F.col("_rk") <= limit).drop("_rk"))
