"""geo helper expressions: crawl period extraction (X6)."""

from ccspark import geo
from ccspark.sqlgen import DUCK, SPARK


def test_crawl_period_expr_both_dialects(spark, duck):
    e_s = geo.crawl_period_expr(SPARK, "seg")
    got_s = spark.sql(
        f"SELECT {e_s} AS p FROM (SELECT 'CC-MAIN-2022-40.1234.wet' AS seg)"
    ).collect()[0].p
    e_d = geo.crawl_period_expr(DUCK, "seg")
    got_d = duck.sql(
        f"SELECT {e_d} AS p FROM (SELECT 'CC-MAIN-2022-40.1234.wet' AS seg)"
    ).fetchone()[0]
    assert got_s == got_d == "2022-40"


def test_write_url_filter_csv_roundtrip(spark, tmp_path):
    from pyspark.sql import Row
    from ccspark import geo
    df = spark.createDataFrame([
        Row(domain="hotel", num_of_countries=9, num_of_pages=253383),
        Row(domain="kayak", num_of_countries=4, num_of_pages=1000),
    ])
    path = str(tmp_path / "uf")
    geo.write_url_filter_csv(df, path)
    back = spark.read.csv(
        path, sep=" ",
        schema="domain string, num_of_countries int, num_of_pages int")
    got = {r.domain: (r.num_of_countries, r.num_of_pages)
           for r in back.collect()}
    assert got == {"hotel": (9, 253383), "kayak": (4, 1000)}
