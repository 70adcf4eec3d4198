"""Skew utilities: salted two-phase counts equal plain counts; the
deterministic per-key cap bounds group sizes and is shuffle-stable."""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from ccspark import chunker, skew


def skewed_df(spark, hot=400, cold=20):
    rows = [Row(domain="mega", url=f"https://mega.de/{i}", text=f"w {i}")
            for i in range(hot)]
    for d in range(5):
        rows += [Row(domain=f"small{d}", url=f"https://small{d}.de/{i}",
                     text=f"x {i}") for i in range(cold)]
    return spark.createDataFrame(rows)


def test_salted_counts_equal_plain(spark):
    df = skewed_df(spark)
    plain = {r.domain: r["count"]
             for r in df.groupBy("domain").count().collect()}
    salted = {r.domain: r.n
              for r in skew.salted_counts(df, ["domain"], salt_n=8).collect()}
    assert salted == plain


def test_cap_per_key_bounds_and_determinism(spark):
    df = skewed_df(spark)
    capped = skew.cap_per_key(df, "domain", 50)
    sizes = {r.domain: r["count"]
             for r in capped.groupBy("domain").count().collect()}
    assert sizes["mega"] == 50
    assert all(v == 20 for d, v in sizes.items() if d != "mega")
    a = sorted(r.url for r in capped.collect())
    b = sorted(r.url for r in
               skew.cap_per_key(df.repartition(13), "domain", 50).collect())
    assert a == b


def test_chunker_with_domain_cap(spark):
    df = skewed_df(spark)
    out = chunker.domain_samples(df, chunksize=10, max_rows_per_domain=30)
    mega_words = sum(r.n_words for r in out.collect() if r.domain == "mega")
    assert mega_words == 60            # 30 capped rows x 2 words each
