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
