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
    # broadcast exchanges are fine; count only shuffle exchanges.
    # Arrow (production) path: the in-stage line_id removed the
    # url-window shuffle entirely - ONE exchange (dedup) and no Window.
    shuffles = len(re.findall(r"Exchange (?:hash|range)partitioning", plan))
    assert shuffles == 1, f"unexpected shuffles ({shuffles}):\n{plan}"
    assert "Window" not in plan, plan


def test_composite_doc_gates_run_before_explode(spark):
    """The Gopher/C4 document gates must execute at-or-below the line
    blow-up in the physical plan (prune whole pages before the row
    explosion) - the property that makes the composite scan-bound at
    crawl scale.  Arrow (production) path: the gates are FUSED INSIDE
    the single MapInArrow stage, so the plan has no Generate and no
    separate full-text gate Filter at all.  Py path: the staged plan
    must keep every gate Filter below the posexplode Generate."""
    import os

    from ccspark.api import CCSparkCorpus
    pages = pages_spark(spark, "/root/testdata/sf0.001", materialize=True)

    plan = plan_of(CCSparkCorpus(spark).build_training_corpus(pages))
    assert "MapInArrow" in plan and "Generate" not in plan, plan
    assert "size(filter(" not in plan, plan     # gates fused, not staged
    assert len(re.findall(
        r"Exchange (?:hash|range)partitioning", plan)) <= 2

    old = os.environ.get("CCSPARK_KERNEL")
    os.environ["CCSPARK_KERNEL"] = "py"
    try:
        plan = plan_of(CCSparkCorpus(spark).build_training_corpus(pages))
    finally:
        if old is None:
            os.environ.pop("CCSPARK_KERNEL", None)
        else:
            os.environ["CCSPARK_KERNEL"] = old
    lines = plan.splitlines()
    gen = min(i for i, ln in enumerate(lines) if "Generate" in ln)
    gates = [i for i, ln in enumerate(lines)
             if "Filter" in ln and "size(filter(" in ln]
    assert gates, plan
    # executedPlan prints children below parents: deeper = earlier
    assert all(i > gen for i in gates), (gen, gates)
    shuffles = len(re.findall(r"Exchange (?:hash|range)partitioning", plan))
    assert shuffles <= 2, shuffles


def test_domain_gate_joins_broadcast_semi(spark):
    """The wholesale domain gate (build_training_corpus(domain_min_keep=
    ...)) must rejoin the surviving-domain set as a BROADCAST left-semi
    join - the survivor set is tiny, so a shuffle there would be a plan
    bug at crawl scale."""
    from ccspark.api import CCSparkCorpus
    pages = pages_spark(spark, "/root/testdata/sf0.001", materialize=True)
    out = CCSparkCorpus(spark).build_training_corpus(
        pages, domain_min_keep=0.7, scrub_pii=False)
    plan = plan_of(out)
    semi = [ln for ln in plan.splitlines()
            if "LeftSemi" in ln and "domain" in ln]
    assert semi, plan
    assert all("BroadcastHashJoin" in ln for ln in semi), semi
    # the gate itself must not shuffle the big side: the only exchange it
    # may add is the rollup's own groupBy(domain) aggregation (a narrow
    # (domain, signals) frame), on top of the composite's two
    base = plan_of(CCSparkCorpus(spark).build_training_corpus(
        pages, scrub_pii=False))
    n_ex = lambda p: len([ln for ln in p.splitlines()
                          if re.search(r"\bExchange hashpartitioning", ln)])
    assert n_ex(plan) == n_ex(base) + 1, (n_ex(plan), n_ex(base))
