"""Physical-plan assertions: the things that matter at 100 TB.

- column pruning: the kernel never reads the (large, binary) `html`
  column even though the input table carries it;
- the dimension joins are broadcast, not shuffled;
- the flagship plan contains exactly one real exchange (the dedup
  aggregate) plus the line-ordinal window exchange - no accidental extras.
"""

from __future__ import annotations

import re

from ccspark import pipeline
from ccspark.fixtures_sql import pages_spark


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_html_column_pruned(spark):
    pages = pages_spark(spark, "/root/testdata/sf0.001", materialize=True)
    assert "html" in pages.columns and "warc_ts" in pages.columns
    out = pipeline.corpus_lines(pages)
    plan = plan_of(out)
    scans = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    page_scans = [ln for ln in scans if "ccspark_pages" in ln]
    assert page_scans, plan
    for ln in page_scans:
        assert "html" not in ln, f"html not pruned: {ln}"
        assert "warc_ts" not in ln, f"warc_ts not pruned: {ln}"


def test_dimension_joins_broadcast(spark):
    pages = pages_spark(spark, "/root/testdata/sf0.001", materialize=True)
    plan = plan_of(pipeline.with_geo(pages))
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" not in plan


def test_flagship_exchange_count(spark):
    pages = pages_spark(spark, "/root/testdata/sf0.001", materialize=True)
    plan = plan_of(pipeline.corpus_lines(pages))
    # broadcast exchanges are fine; count only shuffle exchanges
    shuffles = len(re.findall(r"Exchange (?:hash|range)partitioning", plan))
    assert shuffles <= 2, f"unexpected extra shuffles ({shuffles}):\n{plan}"
