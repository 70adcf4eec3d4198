"""Deterministic `pages` synthesis from the driver's `documents` table.

BASELINE.json's input_hint fixes the pipeline input shape:
    (url string, warc_ts timestamp, html binary, text string, lang string)

The driver provides no such table, so we derive one *deterministically and
SQL-expressibly* from `documents` (doc_id, text, lang, source, n_chars) -
the same subquery text renders for Spark and for the DuckDB oracle, so both
engines see byte-identical pages.

The synthesis deliberately exercises every page-level gate:
  * ccTLD variety incl. multi-part suffixes (co.nz, com.au, co.jp, co.in),
  * non-geographic TLDs (com, org) that the geo gate must drop,
  * multinational domains ('hotel', 'kayak', 'pinterest') for the anti-join,
  * one mega-domain carrying ~20% of pages (skew handling),
  * multi-line text whose lines hit different keep/drop rules (short lines,
    URL/@/# lines, repeated-punctuation lines, plus the original document
    body).
"""

from __future__ import annotations

from ccspark.sqlgen import SPARK


def pages_subquery(d: str, docs_rel: str = "documents") -> str:
    """A subquery (incl. surrounding parens) producing the pages table with
    columns (doc_id, url, text, lang).  `warc_ts`/`html` are added only on
    the Spark side (ccspark.pipeline.attach_page_extras) - timestamps and
    binaries don't survive the driver's cross-engine value-hash, and the
    kernel never reads them (column pruning is part of the design)."""
    # one of 10 (sub).domain.suffix shapes, keyed by doc_id
    dom = (
        "CASE"
        " WHEN doc_id % 17 = 0 THEN 'hotel'"
        " WHEN doc_id % 13 = 0 THEN 'kayak'"
        " WHEN doc_id % 11 = 0 THEN 'pinterest'"
        " WHEN doc_id % 5 = 0 THEN 'meganews'"
        f" ELSE concat('site', cast(doc_id % 50 as int)) END"
    )
    suf = (
        "CASE cast(doc_id % 10 as int)"
        " WHEN 0 THEN 'de'"
        " WHEN 1 THEN 'fr'"
        " WHEN 2 THEN 'co.nz'"
        " WHEN 3 THEN 'com.au'"
        " WHEN 4 THEN 'co.jp'"
        " WHEN 5 THEN 'co.in'"
        " WHEN 6 THEN 'ru'"
        " WHEN 7 THEN 'com'"
        " WHEN 8 THEN 'org'"
        " ELSE 'es' END"
    )
    # multi-line body: original text + rule-hitting extra lines
    nl = "chr(10)"
    body = (
        f"concat("
        f"text, {nl},"                                      # document body
        f"'short line', {nl},"                              # raw len <= 15 -> drop
        f"'visit http://example', cast(doc_id as string), '.com/page now for more '"
        f", 'details about the offer', {nl},"               # URL stripped, still long -> keep
        f"'contact @user', cast(doc_id as string), ' and tag #topic', cast(doc_id as string),"
        f" ' plus enough following words to stay over the fifty character line minimum', {nl},"
        f"repeat('=-', 40), {nl},"                           # punctuation budget -> drop
        f"'<b>', substr(text, 1, 60), '</b>'"                # tags stripped
        f")"
    )
    return (
        f"(SELECT doc_id, "
        f"concat('https://www.', {dom}, '.', {suf}, '/p', cast(doc_id as string)) AS url, "
        f"{body} AS text, "
        f"lang "
        f"FROM {docs_rel})"
    )


def pages_spark(spark, sf_dir: str, materialize: bool = False):
    """Spark DataFrame of synthesized pages for a testdata scale dir.

    With materialize=True the pages are written to a local parquet dir once
    and read back - the realistic shape (the pipeline's contract input is a
    *stored* Iceberg/parquet table), and it keeps the synthesis expressions
    out of downstream plans."""
    import os
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "documents")
    df = spark.sql(f"SELECT * FROM {pages_subquery(SPARK)} AS pages")
    if not materialize:
        return df
    tag = os.path.basename(os.path.normpath(sf_dir))
    path = f"/tmp/ccspark_pages_{tag}.parquet"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        # full input_hint schema: (url, warc_ts, html binary, text, lang).
        # html is a deterministic wrapper the kernel never reads - it
        # exercises column pruning; warc_ts a deterministic crawl window.
        from pyspark.sql import functions as F
        full = (df
                .withColumn("warc_ts",
                            F.timestamp_seconds(F.lit(1664032538)
                                                + F.col("doc_id")))
                .withColumn("html",
                            F.encode(F.concat(F.lit("<html><body>"),
                                              F.col("text"),
                                              F.lit("</body></html>")),
                                     "UTF-8"))
                .select("doc_id", "url", "warc_ts", "html", "text", "lang"))
        # split into many files like a real crawl table (one task per split)
        nfiles = max(8, int(spark.conf.get("spark.sql.shuffle.partitions")))
        full.repartition(nfiles, "doc_id").write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)
