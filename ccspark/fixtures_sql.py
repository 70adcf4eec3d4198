"""Deterministic `pages` synthesis from the driver's `documents` table.

BASELINE.json's input_hint fixes the pipeline input shape:
    (url string, warc_ts timestamp, html binary, text string, lang string)

The driver provides no such table, so we derive one *deterministically and
SQL-expressibly* from `documents` (doc_id, text, lang, source, n_chars) -
the same subquery text renders for Spark and for the DuckDB oracle, so both
engines see byte-identical pages.

The synthesis deliberately exercises every page-level gate:
  * ccTLD variety incl. multi-part suffixes (co.nz, com.au, co.jp, co.in)
    and a punycode IDN ccTLD (xn--p1ai -> Russia),
  * non-geographic TLDs (com, org) that the geo gate must drop,
  * multinational domains ('hotel', 'kayak', 'pinterest') for the anti-join,
  * one mega-domain carrying ~20% of pages (skew handling),
  * multi-line text whose lines hit different keep/drop rules (short lines,
    URL/@/# lines, repeated-punctuation lines, plus the original document
    body),
  * GENUINE per-language content lines: the driver documents' lang labels
    are decorative (English word salad for every lang), so each page gains
    a line in its labeled language - German/Spanish/French stopword
    sentences, and for zh/ja/ko real CJK text including a SHORT (16-49
    char) native line that only survives the kernel via the CJK 15-char
    threshold (F12) - making both the language-aware document gates AND
    the CJK line rules driver-oracle-exercised, not just pytest-covered.
    A slice of doc_ids is relabeled ja/ko (the driver table has no such
    labels) so every space-free path is graded.
"""

from __future__ import annotations

from ccspark.sqlgen import SPARK


def pages_subquery(d: str, docs_rel: str = "documents") -> str:
    """Pages relation for query templates: on the DuckDB side the full
    inline synthesis; on the Spark side a reference to the ``pages_src``
    temp view (registered by queries.ensure_views over the materialized
    parquet - byte-identical content, but the scan-based plan keeps the
    big synthesis CASEs out of whole-stage codegen and gets real
    pushdown/pruning)."""
    from ccspark.sqlgen import SPARK as _S
    if d == _S:
        return "(SELECT doc_id, url, text, lang FROM pages_src)"
    return pages_synthesis_sql(d, docs_rel)


def pages_synthesis_sql(d: str, docs_rel: str = "documents") -> str:
    """A subquery (incl. surrounding parens) producing the pages table with
    columns (doc_id, url, text, lang).  `warc_ts`/`html` are added only on
    the Spark side (pages_spark materialization) - timestamps and
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
        # every third Russian page carries the punycode IDN ccTLD form
        # (geo-gates to Russia through the cctld.csv punycode twin rows)
        " WHEN 6 THEN (CASE WHEN doc_id % 3 = 0 THEN 'xn--p1ai'"
        " ELSE 'ru' END)"
        " WHEN 7 THEN 'com'"
        " WHEN 8 THEN 'org'"
        " ELSE 'es' END"
    )
    # the driver documents' lang labels never include space-free scripts;
    # relabel two prime-keyed slices so zh/ja/ko paths are all graded
    lang_fix = (
        "CASE WHEN doc_id % 37 = 0 THEN 'ja'"
        " WHEN doc_id % 41 = 0 THEN 'ko'"
        " ELSE lang END"
    )
    # one genuine line in the page's labeled language (>= 50 chars, carries
    # that language's stopwords - the language-aware Gopher gate judges
    # each page by ITS language, so these must be real, not word salad)
    lang_line = (
        f"CASE {lang_fix}"
        " WHEN 'de' THEN 'Der Bericht und das Ergebnis der Arbeit sind"
        " von heute und mit allen Daten auf vielen Seiten gut.'"
        " WHEN 'es' THEN 'La casa es grande y el jardín de la familia con"
        " los árboles en la colina por la mañana es bonito.'"
        " WHEN 'fr' THEN 'Le rapport de la semaine et les résultats que"
        " nous avons dans le document sont bons et complets.'"
        " WHEN 'zh' THEN"
        " '这是一个用于测试语料质量规则的中文页面，包含足够多的汉字来通过最小字数门槛，数据质量评估需要真实的中文文本内容。'"
        " WHEN 'ja' THEN"
        " 'これは品質評価の試験のための日本語の文章でありデータの品質を確認するために五十文字以上の仮名と漢字を含んでいます。'"
        " WHEN 'ko' THEN '이것은 품질 게이트를 시험하기 위한 한국어 문장입니다"
        " 데이터 품질 평가를 위해 오십 자 이상의 한글을 포함하도록 길게 작성되었습니다.'"
        " ELSE 'the quick brown fox jumps with that dog and we have been"
        " of good cheer for many days to come now.' END"
    )
    # a SHORT native line for space-free scripts (16-49 chars): dies at
    # the 50-char gate unless the kernel's CJK 15-char threshold (F12)
    # applies - the Latin twin below it must be DROPPED at the same gate
    short_native = (
        f"CASE {lang_fix}"
        " WHEN 'zh' THEN '这是一条短的中文测试行十六个字符以上了。'"
        " WHEN 'ja' THEN 'これは短い日本語のテスト行であります。'"
        " WHEN 'ko' THEN '이것은 짧은 한국어 테스트 줄입니다.'"
        " ELSE 'a short latin line under fifty' END"
    )
    # multi-line body: original text + rule-hitting extra lines
    nl = "chr(10)"
    body = (
        f"concat("
        f"text, {nl},"                                      # document body
        f"'short line', {nl},"                              # raw len <= 15 -> drop
        f"{lang_line}, ' ', cast(doc_id as string), {nl},"  # per-lang content
        f"{short_native}, {nl},"                            # CJK 15-char keep / latin drop
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
        f"{lang_fix} AS lang "
        f"FROM {docs_rel})"
    )


def _synthesis_fingerprint() -> str:
    """Content hash of the Spark-side synthesis SQL: the materialized
    parquet cache is keyed by it, so editing THIS FILE can never serve a
    stale cache (the round-2 foot-gun was a manual rm -rf)."""
    import hashlib
    return hashlib.md5(pages_synthesis_sql(SPARK).encode()).hexdigest()[:10]


def pages_cache_path(sf_dir: str) -> str:
    import os
    tag = os.path.basename(os.path.normpath(sf_dir))
    return f"/tmp/ccspark_pages_{tag}_{_synthesis_fingerprint()}.parquet"


def pages_spark(spark, sf_dir: str, materialize: bool = True):
    """Spark DataFrame of synthesized pages for a testdata scale dir.

    With materialize=True (default) the pages are written to a local
    parquet dir once and read back - the realistic shape (the pipeline's
    contract input is a *stored* Iceberg/parquet table), it keeps the
    synthesis expressions out of downstream plans (the r3 multilingual
    synthesis CASEs pushed whole-stage codegen past the 64KB method
    limit when inlined everywhere), and scans get real pushdown/pruning.
    The cache path is fingerprinted by the synthesis SQL, so edits here
    auto-invalidate it."""
    import os
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "documents")
    df = spark.sql(f"SELECT * FROM {pages_synthesis_sql(SPARK)} AS pages")
    if not materialize:
        return df
    path = pages_cache_path(sf_dir)
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
