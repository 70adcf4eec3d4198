"""Pipeline-level behavior: geo gate, line ordinals, dedup semantics,
metrics invariants, partitioned writes - against crafted pages and the
pandas oracle."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row, functions as F

from ccspark import pipeline
from tests import oracle

GOOD = "this line is long enough to pass every filter in the chain easily"
GOOD2 = "another line that is long enough to pass every filter easily too"


def make_pages(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, url=u, text=t, lang="en") for i, (u, t) in enumerate(rows)])


def test_geo_gate_and_domain(spark):
    pages = make_pages(spark, [
        ("https://www.keep.de/x", GOOD),
        ("https://sub.keep2.co.nz/y", GOOD),
        ("http://nocountry.com/z", GOOD),       # com -> not a ccTLD
        ("https://hotel.fr/z", GOOD),           # MNC anti-join
        ("https://xn--80aswg.xn--p1ai/z", GOOD),  # punycode IDN ccTLD
    ])
    got = pipeline.with_geo(pages).select("url", "domain", "tld", "country")
    rows = {r.url: r for r in got.collect()}
    assert set(rows) == {"https://www.keep.de/x", "https://sub.keep2.co.nz/y",
                         "https://xn--80aswg.xn--p1ai/z"}
    assert rows["https://sub.keep2.co.nz/y"].domain == "keep2"
    assert rows["https://sub.keep2.co.nz/y"].tld == "nz"
    assert rows["https://www.keep.de/x"].country == "Germany"
    # r3: punycode twins in cctld.csv close the reference's
    # WET_processor.py:51 TODO - the xn-- form now geo-gates correctly
    assert rows["https://xn--80aswg.xn--p1ai/z"].country == "Russia"


def test_unicode_cctld(spark):
    pages = make_pages(spark, [("https://пример.рф/x", GOOD)])
    got = pipeline.with_geo(pages).collect()
    assert len(got) == 1
    assert got[0].country == "Russia"
    assert got[0].region == "europe_russia"


def test_line_ordinal_counts_kept_lines_only(spark):
    text = f"{GOOD}\nshort\n{GOOD2}"
    pages = make_pages(spark, [("https://www.a.de/1", text)])
    out = pipeline.corpus_lines(pages).orderBy("line_id").collect()
    assert [(r.line_id, r.text) for r in out] == [
        (1, oracle.verdict(GOOD)[0]), (2, oracle.verdict(GOOD2)[0])]


def test_crlf_and_unicode_linebreaks(spark):
    text = f"{GOOD}\r\n{GOOD2} {GOOD} extra"
    pages = make_pages(spark, [("https://www.a.de/1", text)])
    out = pipeline.corpus_lines(pages)
    assert out.count() == 3
    # oracle sees the same segmentation
    assert len(oracle.process_page(text)) == 3


def test_dedup_keep_first_deterministic(spark):
    pages = make_pages(spark, [
        ("https://www.a.de/1", GOOD),
        ("https://www.b.de/2", GOOD),   # same line -> same hash
        ("https://www.b.de/3", GOOD2),
    ])
    out = pipeline.corpus_lines(pages).collect()
    kept_urls = {r.text: r.url for r in out}
    assert len(out) == 2
    # first by (url, line_id) tiebreak -> /1 wins
    assert kept_urls[oracle.verdict(GOOD)[0]] == "https://www.a.de/1"


def test_dedup_keep_none(spark):
    pages = make_pages(spark, [
        ("https://www.a.de/1", GOOD),
        ("https://www.b.de/2", GOOD),
        ("https://www.b.de/3", GOOD2),
    ])
    df = pipeline.with_geo(pages)
    df = pipeline.explode_lines(df)
    df = pipeline.clean_and_filter(df)
    df = pipeline.number_and_hash(df)
    from ccspark.dedup import dedup_keep_none
    out = dedup_keep_none(df).collect()
    assert [r.text for r in out] == [oracle.verdict(GOOD2)[0]]


def test_metrics_match_oracle(spark):
    texts = [f"{GOOD}\nshort", f"{GOOD}\n{GOOD2}", "tiny"]
    pages = make_pages(spark, [
        (f"https://www.m{i}.de/{i}", t) for i, t in enumerate(texts)])
    m = pipeline.cell_metrics(pages).collect()
    assert len(m) == 1
    row = m[0]
    exp_kept = sum(len(oracle.process_page(t)) for t in texts)
    assert row.lines_kept == exp_kept
    assert row.lines_seen == row.lines_kept + row.lines_dropped
    assert row.docs_seen == 3


def test_partitioned_write_roundtrip(spark, tmp_path):
    pages = make_pages(spark, [
        ("https://www.a.de/1", GOOD),
        ("https://www.b.fr/2", GOOD2),
    ])
    out = pipeline.corpus_lines(pages)
    path = str(tmp_path / "corpus")
    pipeline.write_partitioned(out, path)
    back = spark.read.parquet(path)
    assert back.count() == out.count()
    # hive partition dirs exist (region=europe_west/country=...)
    assert any(d.startswith("region=") for d in os.listdir(path))
    countries = {r.country for r in back.select("country").collect()}
    assert countries == {"Germany", "France"}


def test_partitioned_write_includes_lang_dirs(spark, tmp_path):
    pages = make_pages(spark, [
        ("https://www.a.de/1", GOOD),
        ("https://www.b.fr/2", GOOD2),
    ])
    out = pipeline.corpus_lines(pages)
    assert "lang" in out.columns
    path = str(tmp_path / "corpus_lang")
    pipeline.write_partitioned(out, path)
    region_dirs = [d for d in os.listdir(path) if d.startswith("region=")]
    assert region_dirs
    country = os.path.join(path, region_dirs[0],
                           os.listdir(os.path.join(path, region_dirs[0]))[0])
    assert any(d.startswith("lang=") for d in os.listdir(country))


def test_corpus_lines_observed_free_metrics(spark):
    """observe() metrics must match the standalone metrics job without a
    second kernel pass, and the observed pipeline's output must equal
    corpus_lines exactly."""
    from ccspark.fixtures_sql import pages_spark
    pages = pages_spark(spark, "/root/testdata/sf0.001", materialize=True)
    df, obs = pipeline.corpus_lines_observed(pages)
    rows = sorted((r.url, r.line_id, r.text) for r in df.collect())
    want = sorted((r.url, r.line_id, r.text)
                  for r in pipeline.corpus_lines(pages).collect())
    assert rows == want
    got = obs.get
    cm = pipeline.cell_metrics(pages).collect()
    # cell_metrics counts ALL lines incl. the raw-length-gated ones; the
    # observed pass counts after the cheap JVM gate (the Arrow boundary),
    # so compare kept (identical) and gated <= seen
    assert got["lines_kept"] == sum(r.lines_kept for r in cm)
    assert got["lines_gated"] <= sum(r.lines_seen for r in cm)
    assert got["docs_seen_approx"] > 0


def test_corpus_lines_with_metrics_single_pass_equivalence(spark):
    """corpus_lines_with_metrics (ONE persisted kernel pass) must be
    output-identical to running corpus_lines and cell_metrics separately
    (two kernel passes)."""
    from ccspark.fixtures_sql import pages_spark
    pages = pages_spark(spark, "/root/testdata/sf0.001", materialize=True)
    corpus, metrics, v = pipeline.corpus_lines_with_metrics(pages)
    got_c = sorted((r.url, r.line_id, r.text, r.hash)
                   for r in corpus.collect())
    got_m = sorted(map(tuple, metrics.collect()))
    v.unpersist()
    want_c = sorted((r.url, r.line_id, r.text, r.hash)
                    for r in pipeline.corpus_lines(pages).collect())
    want_m = sorted(map(tuple, pipeline.cell_metrics(pages).collect()))
    assert got_c == want_c
    assert got_m == want_m


def test_fused_explode_clean_matches_staged(spark):
    """The fused mapInArrow explode+kernel stage (arrow production path)
    is ROW-IDENTICAL to the staged posexplode + UDF form - on the
    fixture corpus AND on crafted edge pages (null/empty text, CRLF,
    unicode line breaks, pages whose every line is dropped)."""
    from tests.fixtures import LINE_CASES

    from ccspark.fixtures_sql import pages_spark

    edge = spark.createDataFrame(
        [Row(doc_id=0, url="https://edge.de/none", text=None, lang="en"),
         Row(doc_id=1, url="https://edge.de/empty", text="", lang="en"),
         Row(doc_id=2, url="https://edge.de/crlf",
             text=f"{GOOD}\r\n{GOOD2}\rshort\n\n{GOOD}", lang="en"),
         Row(doc_id=3, url="https://edge.de/uni",
             text=GOOD + "\u2028" + GOOD2 + "\u0085" + GOOD, lang="en"),
         Row(doc_id=4, url="https://edge.de/alldrop",
             text="short\n|||| bad pipes line that is long enough here",
             lang="en"),
         Row(doc_id=5, url="https://edge.de/cases",
             text="\n".join(raw for _, raw in LINE_CASES), lang="en")],
        "doc_id long, url string, text string, lang string")
    frames = [pages_spark(spark, "/root/testdata/sf0.001"), edge]
    for pages in frames:
        geo = pipeline.with_geo(pages)
        cols = pipeline._corpus_line_cols(geo)
        # staged twin WITH the window ordinal, so the fused in-stage
        # line_id (no url shuffle) is checked against the general form
        staged = (pipeline.number_and_hash(
            pipeline.clean_and_filter(pipeline.explode_lines(geo)))
            .select(*cols, "pos", "line_id", "text"))
        fused = pipeline.explode_clean_fused(
            geo.select(*cols, "text")).select(
            *cols, "pos", "line_id", "text")
        a = sorted(map(tuple, staged.collect()))
        b = sorted(map(tuple, fused.collect()))
        assert a == b, (len(a), len(b))
        assert a or pages is edge


def test_corpus_lines_arrow_py_paths_identical(spark):
    """corpus_lines under CCSPARK_KERNEL=arrow (fused) and =py (staged
    pandas UDF) return the same rows bitwise."""
    from ccspark.fixtures_sql import pages_spark

    pages = pages_spark(spark, "/root/testdata/sf0.001")
    old = os.environ.get("CCSPARK_KERNEL")
    try:
        os.environ["CCSPARK_KERNEL"] = "py"
        a = sorted(map(tuple, pipeline.corpus_lines(pages).collect()))
        os.environ["CCSPARK_KERNEL"] = "arrow"
        b = sorted(map(tuple, pipeline.corpus_lines(pages).collect()))
    finally:
        if old is None:
            os.environ.pop("CCSPARK_KERNEL", None)
        else:
            os.environ["CCSPARK_KERNEL"] = old
    assert a == b and len(a) > 0


def test_composite_arrow_py_paths_identical(spark):
    """build_training_corpus under CCSPARK_KERNEL=arrow (Gopher gate
    fused into the mapInArrow line stage) and =py (staged gate UDF +
    posexplode) return the same rows bitwise - incl. the domain-gated
    variant."""
    from ccspark.api import CCSparkCorpus
    from ccspark.fixtures_sql import pages_spark

    pages = pages_spark(spark, "/root/testdata/sf0.001")
    cc = CCSparkCorpus(spark)
    old = os.environ.get("CCSPARK_KERNEL")
    try:
        for kwargs in ({}, {"domain_min_keep": 0.7},
                       {"lang_aware": False}):
            os.environ["CCSPARK_KERNEL"] = "py"
            a = sorted(map(tuple,
                           cc.build_training_corpus(pages, **kwargs)
                           .collect()))
            os.environ["CCSPARK_KERNEL"] = "arrow"
            b = sorted(map(tuple,
                           cc.build_training_corpus(pages, **kwargs)
                           .collect()))
            assert a == b and len(a) > 0, kwargs
    finally:
        if old is None:
            os.environ.pop("CCSPARK_KERNEL", None)
        else:
            os.environ["CCSPARK_KERNEL"] = old


def test_verdict_fused_matches_staged(spark):
    """explode_verdict_fused (metrics path, arrow) is row-identical to
    verdict_lines(explode_lines(...)) - ALL lines, kept or dropped,
    with the same drop_reason labels."""
    from ccspark.fixtures_sql import pages_spark

    pages = pages_spark(spark, "/root/testdata/sf0.001")
    geo = pipeline.with_geo(pages)
    cols = ["region", "country", "lang", "url"]
    staged = (pipeline.verdict_lines(pipeline.explode_lines(geo))
              .select(*cols, "pos", "text", "keep", "drop_reason"))
    fused = pipeline.explode_verdict_fused(geo.select(*cols, "text"))
    a = sorted(map(tuple, staged.collect()))
    b = sorted(map(tuple, fused.collect()))
    assert a == b and len(a) > 0
