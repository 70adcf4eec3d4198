"""The driver-graded query suite: every operator as a (Spark, DuckDB) pair.

Each query is ONE SQL template rendered for both engines through
ccspark.sqlgen / kernel / geo / fixtures_sql, so the Spark callable in
``queries()`` and the oracle string in ``oracle_sql()`` cannot drift.
Column names are aliased identically on both sides (the driver's compare
sorts columns by name and value-hashes).

Cross-engine determinism rules used throughout:
  * hashes: md5 hex strings (identical in both engines) - the production
    pipeline uses xxhash64 internally for 8-byte shuffle keys; these
    queries surface md5 so DuckDB can verify values;
  * floats: always round(x, 4) before output;
  * no timestamps/binaries in compared outputs;
  * every top-k / keep-first is pinned by a total deterministic order.
"""

from __future__ import annotations

import os
from typing import Callable

from ccspark import geo, kernel, quality
from ccspark.fixtures_sql import pages_subquery
from ccspark.regexes import RE_LINE_SPLIT
from ccspark.sqlgen import (
    DUCK, SPARK, hex_to_bigint, rrep, split_arr,
)

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def _scan_parts() -> int:
    """Target partition count for under-partitioned base-table scans.
    Parameterised, never hard-coded: CCSPARK_SCAN_PARTS overrides (0
    disables the repartition entirely - the right setting when the
    input already arrives well-split, e.g. a real multi-segment crawl);
    default follows the driver's core count ($SPARK_GRAFT_CPUS), the
    same knob bench.py sizes the session from."""
    v = os.environ.get("CCSPARK_SCAN_PARTS")
    if v is not None:
        return int(v)
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def scan_src(d: str, table: str, key: str,
             alias: str | None = None) -> str:
    """Spark-side base-table scan guarded against single-split inputs
    (optimization guide par.2.5): the fixture/driver parquet files are
    one split, so every narrow map stage (shingle explodes, md5 hashing,
    per-pair folds) otherwise runs on ONE core.  A deterministic hash
    REPARTITION on the row key right after the read buys full map
    parallelism, and - because the downstream per-key aggregates hash on
    the same key - usually REPLACES their exchange rather than adding
    one (ENSURE_REQUIREMENTS is satisfied by the explicit partitioning).
    Measured 3.6-12x on the documents-family queries at bench scale.
    The DuckDB rendering (single-process anyway) and the oracle text are
    untouched."""
    if d == SPARK and _scan_parts() > 0:
        # self-aliased so call sites never append one (a call-site alias
        # would leak into the DUCK rendering's frozen oracle text);
        # pass *alias* when the template needs a specific name
        return (f"(SELECT /*+ REPARTITION({_scan_parts()}, {key}) */ * "
                f"FROM {table}) {alias or table + '_rp'}")
    return f"{table} {alias}" if alias else table


def dim(d: str, name: str) -> str:
    """Dimension CSV as a relation: Spark temp view / DuckDB read_csv."""
    if d == SPARK:
        return f"dim_{name}"
    path = os.path.join(geo.DATA_DIR, f"{name}.csv")
    return f"read_csv('{path}', header=true, all_varchar=true)"


def ensure_views(spark, sf_dir: str) -> None:
    """Register the driver tables + dimension CSVs as Spark temp views."""
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            spark.read.parquet(p).createOrReplaceTempView(t)
    for name, loader in (("cctld", geo.cctld_dim),
                         ("url_filter", geo.url_filter_dim),
                         ("country_iso3", geo.country_iso3_dim),
                         ("lang_iso2_iso3", geo.lang_iso3_dim)):
        loader(spark).createOrReplaceTempView(f"dim_{name}")
    # Spark-side pages relation: the synthesis materialized ONCE to
    # parquet (content-fingerprinted cache) and registered as pages_src -
    # templates scan a stored table instead of re-inlining the big
    # multilingual synthesis CASEs into every plan (64KB codegen)
    from ccspark.fixtures_sql import pages_spark
    (pages_spark(spark, sf_dir, materialize=True)
     .select("doc_id", "url", "text", "lang")
     .createOrReplaceTempView("pages_src"))
    # r6: the clean/keep kernel for the SQL templates, as the SAME
    # registered vectorized UDF the production pipeline uses
    # (arrowkernel RE2 default; CCSPARK_KERNEL=py selects the per-row
    # parity anchor - both row-identical to the pure-Catalyst rendering,
    # parity-asserted).  Templates reference it via kernel_call(); the
    # templates already require ensure_views (pages_src), so the
    # function is always registered before any template runs.
    from ccspark import arrowkernel, pykernel
    spark.udf.register("ccspark_kernel", pykernel.make_clean_verdict_udf())
    spark.udf.register("ccspark_scrub", arrowkernel.make_scrub_udf())


def _posexplode_lines(d: str, src: str) -> str:
    """Per-line explode of pages text preserving order: (…, pos, raw_line).
    Spark: lateral posexplode; DuckDB: zipped unnest + generate_subscripts."""
    arr = split_arr(d, "text", RE_LINE_SPLIT)
    if d == SPARK:
        return (
            f"(SELECT doc_id, url, tld, domain, country, region, lang, "
            f"pos + 1 AS pos, raw_line "
            f"FROM {src} LATERAL VIEW posexplode({arr}) t AS pos, raw_line)"
        )
    return (
        f"(SELECT doc_id, url, tld, domain, country, region, lang, "
        f"generate_subscripts({arr}, 1) AS pos, unnest({arr}) AS raw_line "
        f"FROM {src})"
    )


def geo_pages_cte(d: str) -> str:
    """pages -> host/tld/domain -> ccTLD join -> MNC anti-join.

    Spark rendering binds host and (tld, domain) behind generator-
    position evaluation barriers (``LATERAL VIEW explode(array(...))``):
    plain projection columns get re-inlined by Spark-4 predicate
    pushdown into BOTH dimension-join keys and the scan filter, so the
    4-regex host chain was evaluated ~40x per page (inside every PSL
    CASE arm of the join key - r6 plan audit, plans/r06).  A filter or
    join key can only reference a generator OUTPUT attribute, never
    push through it, so each expression now evaluates exactly once per
    page.  Values are identical (exceptAll-verified both ways); the
    DuckDB oracle keeps the plain-projection rendering."""
    host = geo.host_expr(d, "url")
    if d == SPARK:
        return f"""
pages AS (SELECT * FROM {pages_subquery(d)} p),
hosted AS (SELECT p.*, host FROM pages p
           LATERAL VIEW explode(array({host})) th AS host),
parsed AS (SELECT h.*, td.tld AS tld, td.domain AS domain FROM hosted h
           LATERAL VIEW explode(array(named_struct(
               'tld', {geo.tld_expr(d, 'host')},
               'domain', {geo.domain_expr(d, 'host')}))) tp AS td),
geo_pages AS (
  SELECT pr.doc_id, pr.url, pr.lang, pr.text, pr.tld, pr.domain,
         c.country, c.region
  FROM parsed pr JOIN {dim(d, 'cctld')} c ON pr.tld = c.tld
  WHERE pr.domain NOT IN (SELECT domain FROM {dim(d, 'url_filter')})
)"""
    return f"""
pages AS (SELECT * FROM {pages_subquery(d)} p),
hosted AS (SELECT p.*, {host} AS host FROM pages p),
parsed AS (SELECT h.*, {geo.tld_expr(d, 'host')} AS tld,
                  {geo.domain_expr(d, 'host')} AS domain FROM hosted h),
geo_pages AS (
  SELECT pr.doc_id, pr.url, pr.lang, pr.text, pr.tld, pr.domain,
         c.country, c.region
  FROM parsed pr JOIN {dim(d, 'cctld')} c ON pr.tld = c.tld
  WHERE pr.domain NOT IN (SELECT domain FROM {dim(d, 'url_filter')})
)"""


def corpus_lines_cte(d: str, page_filter: str | None = None,
                     extra_ctes: str = "") -> str:
    """geo_pages -> explode -> clean -> keep -> ordinal -> dedup(first).
    *page_filter*: optional boolean SQL over geo_pages columns (e.g. the
    Gopher/C4 document gates) applied BEFORE the explode - the composite
    training-corpus shape prunes whole documents at scan speed first.
    *extra_ctes*: additional CTE definitions inserted after geo_pages
    (e.g. the domain-quality rollup the page_filter may reference)."""
    cleaned = kernel.cleaned_expr(d, "raw_line")
    rules = kernel.rule_exprs(d, "raw_line", "text")
    post = " AND ".join(rules[k] for k in kernel.RULE_ORDER[1:])
    src = "geo_pages"
    gate = ""
    if extra_ctes:
        gate += ",\n" + extra_ctes
    if page_filter is not None:
        gate += (f",\ngated_pages AS (SELECT * FROM geo_pages "
                 f"WHERE {page_filter})")
        src = "gated_pages"
    # Spark: the clean/keep kernel runs as the registered vectorized UDF
    # (ccspark_kernel - the production arrowkernel RE2 path; see
    # ensure_views), inside a generator-position barrier so the keep
    # filter references the struct ATTRIBUTE and the UDF evaluates once
    # (the guide-par.4.4 duplicate-BatchEvalPython trap).  The old
    # pure-Catalyst rendering re-inlined the 9-regex chain into every
    # rule predicate (28 copies counted in the r6 plan audit) and even
    # barrier-bound ran the chain on JVM regex - the RE2 batch kernel is
    # a further 3.1x (measured, values exceptAll-identical; parity of
    # kernel vs SQL rendering is fixture+hypothesis-asserted).
    # CCSPARK_SQL_KERNEL=catalyst restores the pure-SQL rendering.
    # DuckDB keeps the plain projection (it IS the oracle rendering).
    if d == SPARK and os.environ.get("CCSPARK_SQL_KERNEL") != "catalyst":
        kernel_ctes = """cleaned_lines AS (
  SELECT doc_id, url, tld, domain, country, region, lang, pos,
         v.text AS text, v.keep AS _keep
  FROM raw_lines
  LATERAL VIEW explode(array(ccspark_kernel(raw_line))) tk AS v
  WHERE length(raw_line) > 15
),
kept_lines AS (SELECT doc_id, url, tld, domain, country, region, lang,
                      pos, text FROM cleaned_lines WHERE _keep),"""
    elif d == SPARK:
        kernel_ctes = f"""cleaned_lines AS (
  SELECT doc_id, url, tld, domain, country, region, lang, pos, text
  FROM raw_lines
  LATERAL VIEW explode(array({cleaned})) tc AS text
  WHERE length(raw_line) > 15
),
kept_lines AS (SELECT * FROM cleaned_lines WHERE {post}),"""
    else:
        kernel_ctes = f"""cleaned_lines AS (
  SELECT doc_id, url, tld, domain, country, region, lang, pos,
         {cleaned} AS text
  FROM raw_lines WHERE length(raw_line) > 15
),
kept_lines AS (SELECT * FROM cleaned_lines WHERE {post}),"""
    return f"""{geo_pages_cte(d)}{gate},
raw_lines AS (SELECT * FROM {_posexplode_lines(d, src)} rl),
{kernel_ctes}
numbered AS (
  SELECT *, row_number() OVER (PARTITION BY url ORDER BY pos) AS line_id,
         md5(text) AS line_md5
  FROM kept_lines
),
corpus_lines AS (
  SELECT domain, tld, country, region, lang, url, line_id, text, line_md5
  FROM (SELECT *, row_number() OVER (PARTITION BY line_md5
                                     ORDER BY url, line_id) AS _rn
        FROM numbered) dd
  WHERE _rn = 1
)"""


def verdict_lines_cte(d: str) -> str:
    """All lines with keep verdict + drop_reason (for metrics queries).

    Spark: the clean chain is bound behind an explode(array(..)) barrier
    first (see corpus_lines_cte) - keep + drop_reason together reference
    the cleaned text ~24x and would otherwise each re-inline the full
    chain.  Downstream queries must select named columns (they do), not
    ``verdicts.*``, since the Spark rendering carries the extra bound
    ``_cleaned`` column."""
    cleaned = kernel.cleaned_expr(d, "raw_line")
    if d == SPARK and os.environ.get("CCSPARK_SQL_KERNEL") != "catalyst":
        # registered-UDF kernel: keep AND drop_reason come out of the
        # one vectorized evaluation (see corpus_lines_cte); no
        # raw-length prefilter here - rawlen verdicts must be emitted
        return f"""{geo_pages_cte(d)},
raw_lines AS (SELECT * FROM {_posexplode_lines(d, 'geo_pages')} rl),
verdicts AS (
  SELECT *, v.keep AS keep, v.drop_reason AS drop_reason
  FROM raw_lines
  LATERAL VIEW explode(array(ccspark_kernel(raw_line))) tk AS v
)"""
    if d == SPARK:
        return f"""{geo_pages_cte(d)},
raw_lines AS (SELECT * FROM {_posexplode_lines(d, 'geo_pages')} rl),
cleaned_v AS (
  SELECT * FROM raw_lines
  LATERAL VIEW explode(array({cleaned})) tc AS _cleaned
),
verdicts AS (
  SELECT *, {kernel.keep_expr(d, 'raw_line', '_cleaned')} AS keep,
         {kernel.drop_reason_expr(d, 'raw_line', '_cleaned')} AS drop_reason
  FROM cleaned_v
)"""
    return f"""{geo_pages_cte(d)},
raw_lines AS (SELECT * FROM {_posexplode_lines(d, 'geo_pages')} rl),
verdicts AS (
  SELECT *, {kernel.keep_expr(d, 'raw_line', cleaned)} AS keep,
         {kernel.drop_reason_expr(d, 'raw_line', cleaned)} AS drop_reason
  FROM raw_lines
)"""


# ==========================================================================
# Query templates.  Each returns the full SQL for dialect d.

def q_corpus_lines(d: str) -> str:
    """Flagship: the end-to-end corpus build (SURVEY par.3.1)."""
    return f"WITH {corpus_lines_cte(d)} SELECT * FROM corpus_lines"


def q_geo_pages(d: str) -> str:
    """F2-F4 + J1/J2: per-page geography after both dimension joins."""
    return (f"WITH {geo_pages_cte(d)} "
            f"SELECT doc_id, url, tld, domain, country, region "
            f"FROM geo_pages")


def q_cell_metrics(d: str) -> str:
    """A5 / north_rule lineage metrics per (region, country, lang) cell."""
    return f"""WITH {verdict_lines_cte(d)}
SELECT region, country, lang,
       count(*) AS lines_seen,
       cast(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS bigint) AS lines_kept,
       cast(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS bigint) AS lines_dropped,
       count(DISTINCT url) AS docs_seen
FROM verdicts GROUP BY region, country, lang"""


def q_drop_reasons(d: str) -> str:
    """Distribution of first-failing-rule across all lines."""
    return f"""WITH {verdict_lines_cte(d)}
SELECT coalesce(drop_reason, 'kept') AS reason, count(*) AS n_lines
FROM verdicts GROUP BY coalesce(drop_reason, 'kept')"""


def q_dedup_keep_none(d: str) -> str:
    """D2: lines whose text occurs exactly once corpus-wide
    (pandas drop_duplicates(keep=False), deduplication.py:97-104)."""
    cleaned = kernel.cleaned_expr(d, "raw_line")
    rules = kernel.rule_exprs(d, "raw_line", "text")
    post = " AND ".join(rules[k] for k in kernel.RULE_ORDER[1:])
    if d == SPARK and os.environ.get("CCSPARK_SQL_KERNEL") != "catalyst":
        # registered-UDF kernel behind a generator barrier (see
        # corpus_lines_cte)
        kernel_ctes = """cleaned_lines AS (
  SELECT url, pos, v.text AS text, v.keep AS _keep FROM raw_lines
  LATERAL VIEW explode(array(ccspark_kernel(raw_line))) tk AS v
  WHERE length(raw_line) > 15
),
kept AS (SELECT url, pos, text FROM cleaned_lines WHERE _keep),"""
    elif d == SPARK:  # generator-position barrier (see corpus_lines_cte)
        kernel_ctes = f"""cleaned_lines AS (
  SELECT url, pos, text FROM raw_lines
  LATERAL VIEW explode(array({cleaned})) tc AS text
  WHERE length(raw_line) > 15
),
kept AS (SELECT * FROM cleaned_lines WHERE {post}),"""
    else:
        kernel_ctes = f"""cleaned_lines AS (
  SELECT url, pos, {cleaned} AS text FROM raw_lines
  WHERE length(raw_line) > 15
),
kept AS (SELECT * FROM cleaned_lines WHERE {post}),"""
    return f"""WITH {geo_pages_cte(d)},
raw_lines AS (SELECT * FROM {_posexplode_lines(d, 'geo_pages')} rl),
{kernel_ctes}
counted AS (
  SELECT *, count(*) OVER (PARTITION BY md5(text)) AS _c FROM kept
)
SELECT url, text FROM counted WHERE _c = 1"""


def q_page_reassembly(d: str) -> str:
    """A1: corpus lines regrouped into pages - newline-joined in line_id
    order + word count (cc_corpus.py:167-175)."""
    nl = "chr(10)"
    if d == SPARK:
        joined = ("concat_ws(char(10), transform(array_sort("
                  "collect_list(struct(line_id, text))), s -> s.text))")
    else:
        joined = f"string_agg(text, {nl} ORDER BY line_id)"
    return f"""WITH {corpus_lines_cte(d)}
SELECT url, country, region,
       {joined} AS page_text,
       cast(sum(length(text) - length(replace(text, ' ', '')) + 1)
            AS bigint) AS n_words
FROM corpus_lines
GROUP BY url, country, region"""


# chunk size used by the sf-scale oracle twins (the production default is
# chunker.DEFAULT_CHUNK_WORDS = 5000 - the reference's chunksize; 500 keeps
# multiple chunks per domain at sf0.01 so the bucketing logic is exercised)
CHUNK_WORDS_SF = 500


def q_domain_word_chunks(d: str, chunk_words: int = CHUNK_WORDS_SF) -> str:
    """A3 (SQL-oracle variant of the domain sample accumulator,
    deduplication.py:19-85): running word count per domain in url/line
    order, bucketed every *chunk_words* words.  (The greedy
    reset-on-overflow original is applyInPandas - ccspark.chunker - and is
    pytest-verified plus aggregate-invariant-oracled via
    greedy_domain_totals; this fixed-boundary variant is its scalable SQL
    twin.)"""
    words = "(length(text) - length(replace(text, ' ', '')) + 1)"
    bucket = f"cast(floor((cum_words - 1) / {chunk_words}) AS bigint)"
    return f"""WITH {corpus_lines_cte(d)},
runs AS (
  SELECT domain, url, line_id, text, {words} AS n_words,
         sum({words}) OVER (PARTITION BY domain ORDER BY url, line_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_words
  FROM corpus_lines
)
SELECT domain, {bucket} AS chunk_id,
       count(*) AS n_lines, cast(sum(n_words) AS bigint) AS chunk_words,
       min(url) AS first_url
FROM runs GROUP BY domain, {bucket}"""


def q_greedy_domain_totals(d: str) -> str:
    """Aggregate-invariant oracle for the greedy chunker (ccspark.chunker):
    whatever the chunk boundaries, per-domain sum(n_words) over the emitted
    samples must equal the total whitespace-token count of the domain's
    raw lines (text split on newline, CRs stripped - the accumulator's own
    counting, deduplication.py:45-48), and domains with zero words emit
    nothing.  The Spark side of this pair runs the real applyInPandas
    chunker (_mq_greedy_domain_totals); this SQL computes the invariant
    independently."""
    if d == SPARK:
        lines = ("SELECT domain, raw_line FROM geo_pages "
                 "LATERAL VIEW explode(split(text, '\\n')) t AS raw_line")
        wc = ("size(filter(split(replace(raw_line, chr(13), ''), '\\\\s+'),"
              " x -> x != ''))")
    else:
        lines = ("SELECT domain, unnest(string_split(text, chr(10))) "
                 "AS raw_line FROM geo_pages")
        wc = (r"len(list_filter(string_split_regex("
              r"replace(raw_line, chr(13), ''), '\s+'), x -> x != ''))")
    return f"""WITH {geo_pages_cte(d)},
raw_lines AS ({lines}),
counted AS (SELECT domain, {wc} AS n_words FROM raw_lines)
SELECT domain, cast(sum(n_words) AS bigint) AS total_words
FROM counted GROUP BY domain HAVING sum(n_words) > 0"""


def q_lid_ngram_sql(d: str, n: int = 3, top_k: int = 1000) -> str:
    """M1 as pure SQL: the char-n-gram multinomial-NB LID scorer
    (ccspark.lid train+predict semantics - cc_corpus.py:147-148,176) as
    one dual-dialect template, so the NB math (top-k vocab by global
    count, Laplace smoothing, per-occurrence log-lik sums, unseen-gram
    alpha, prior, deterministic argmax) is hash-verified cross-engine.
    The production Iterator-pandas-UDF path (MODULE_QUERIES lid_ngram) is
    asserted equal to this rendering in tests/test_lid.py.  Trains and
    scores on the full documents table, mirroring _mq_lid_ngram."""
    return f"""WITH {_LID_DOCS_CTE},
{_lid_nb_ctes(d, n, top_k, '')}
SELECT d.doc_id, d.lang, p.lang_pred
FROM docs d JOIN pred p ON p.doc_id = d.doc_id"""


_LID_DOCS_CTE = """docs AS (
  SELECT doc_id, lang, text, ' ' || lower(text) || ' ' AS t FROM documents
)"""


def _lid_nb_ctes(d: str, n: int, top_k: int, x: str) -> str:
    """The NB train+score CTE chain with every name suffixed by *x*, so
    two differently-configured models compose in one statement (the
    dual-LID agreement twin).  Expects a ``docs(doc_id, lang, text, t)``
    CTE in scope; yields ``pred{x}(doc_id, lang_pred)``."""
    m = n - 1
    if d == SPARK:
        pos = ("LATERAL VIEW explode(sequence(1, greatest(length(t) - "
               f"{m}, 1))) ix AS i")
        grams = (f"grams{x} AS (\n  SELECT doc_id, lang, "
                 f"substring(t, i, {n}) AS gram FROM docs {pos})")
    else:
        grams = f"""grams{x} AS (
  SELECT doc_id, lang,
         substring(t, unnest(generate_series(1, greatest(length(t) - {m},
                                                          1))), {n}) AS gram
  FROM docs)"""
    return f"""{grams},
valid{x} AS (SELECT * FROM grams{x} WHERE length(gram) = {n}),
counts{x} AS (SELECT lang, gram, count(*) AS c FROM valid{x}
              GROUP BY lang, gram),
vocab{x} AS (SELECT gram, sum(c) AS nn FROM counts{x} GROUP BY gram
             ORDER BY nn DESC, gram LIMIT {top_k}),
vc{x} AS (SELECT c.lang, c.gram, c.c FROM counts{x} c JOIN vocab{x} v
          ON c.gram = v.gram),
lang_totals{x} AS (SELECT lang, sum(c) AS tot FROM vc{x} GROUP BY lang),
vsize{x} AS (SELECT count(*) AS v FROM vocab{x}),
loglik{x} AS (
  SELECT vc.lang, vc.gram, ln((vc.c + 1) * 1e0 / (lt.tot + vs.v + 1)) AS lp
  FROM vc{x} vc JOIN lang_totals{x} lt ON vc.lang = lt.lang
  CROSS JOIN vsize{x} vs
),
alpha{x} AS (
  SELECT lt.lang, ln(1e0 / (lt.tot + vs.v + 1)) AS lp0
  FROM lang_totals{x} lt CROSS JOIN vsize{x} vs
),
ndocs{x} AS (SELECT count(*) AS n FROM docs),
priors{x} AS (
  SELECT lang, ln(count(*) * 1e0 / max(nd.n)) AS lprior
  FROM docs CROSS JOIN ndocs{x} nd GROUP BY lang
),
doc_grams{x} AS (
  SELECT g.doc_id, g.gram, count(*) AS cnt
  FROM valid{x} g JOIN vocab{x} v ON g.gram = v.gram
  GROUP BY g.doc_id, g.gram
),
scored{x} AS (
  SELECT dg.doc_id, a.lang, sum(dg.cnt * coalesce(ll.lp, a.lp0)) AS gsum
  FROM doc_grams{x} dg
  CROSS JOIN alpha{x} a
  LEFT JOIN loglik{x} ll ON ll.lang = a.lang AND ll.gram = dg.gram
  GROUP BY dg.doc_id, a.lang
),
totals{x} AS (
  SELECT s.doc_id, s.lang, s.gsum + p.lprior AS score
  FROM scored{x} s JOIN priors{x} p ON p.lang = s.lang
),
ranked{x} AS (
  SELECT doc_id, lang AS p_lang,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, lang) AS rk
  FROM totals{x}
),
prior_best{x} AS (
  SELECT lang AS fallback FROM priors{x} ORDER BY lprior DESC, lang LIMIT 1
),
pred{x} AS (
  SELECT d.doc_id, coalesce(r.p_lang, pb.fallback) AS lang_pred
  FROM docs d CROSS JOIN prior_best{x} pb
  LEFT JOIN ranked{x} r ON r.doc_id = d.doc_id AND r.rk = 1
)"""


def q_dual_lid_agreement(d: str, min_len: int = 50) -> str:
    """M2 as pure SQL: TWO NB models (char-2-gram/600 and char-3-gram/
    1000 - the CLD2+CLD3 shape, geoWAC.py:19-41) must both agree with the
    expected language; texts of <= min_len chars score 'ukn' and drop.
    Oracle twin of the production agreement_filter module query."""
    return f"""WITH {_LID_DOCS_CTE},
{_lid_nb_ctes(d, 2, 600, '_a')},
{_lid_nb_ctes(d, 3, 1000, '_b')}
SELECT d.doc_id, d.lang,
       (CASE WHEN length(d.text) <= {min_len} THEN 'ukn'
             ELSE a.lang_pred END) AS lid_a,
       (CASE WHEN length(d.text) <= {min_len} THEN 'ukn'
             ELSE b.lang_pred END) AS lid_b
FROM docs d
JOIN pred_a a ON a.doc_id = d.doc_id
JOIN pred_b b ON b.doc_id = d.doc_id
WHERE (CASE WHEN length(d.text) <= {min_len} THEN 'ukn'
            ELSE a.lang_pred END) = d.lang
  AND (CASE WHEN length(d.text) <= {min_len} THEN 'ukn'
            ELSE b.lang_pred END) = d.lang"""


def q_gopher_quality(d: str) -> str:
    """Document-level Gopher/C4 quality gate (Rae et al. 2021 table A1 +
    repetition signals) over the pages fixture: every signal and the keep
    verdict computed in ONE projection via array higher-order functions -
    no explode, no shuffle, no UDF (ccspark.quality.gopher_signal_exprs;
    the DataFrame operator quality.gopher_quality shares these exact
    fragments)."""
    from ccspark.quality import gopher_keep_expr, gopher_signal_exprs
    sig = gopher_signal_exprs(d, "text")
    cols = ",\n       ".join(f"{e} AS {name}" for name, e in sig.items())
    keep = gopher_keep_expr(d, "text")

    # the fixture never exercises the bullet/ellipsis/duplicate-line
    # rules (those signals were constant 0 across all 500 docs for three
    # judged rounds) - inject one violator per rule so each line-level
    # signal AND its keep consequence is value-graded (r4)
    def sqldoc(lines):
        return ("concat(" + ", chr(10), ".join(f"'{x}'" for x in lines)
                + ")")
    inject = " UNION ALL ".join(
        f"SELECT cast({i} AS bigint) AS doc_id, "
        f"'synthetic://gopher/{tag}' AS url, {t} AS text"
        for i, (tag, t) in enumerate((
            ("bullets", sqldoc([f"- bullet item number {k} right here"
                                for k in range(10)])),
            ("ellipses", sqldoc([f"a trailing thought number {k} that "
                                 "just goes on..." for k in range(10)])),
            ("duplines", sqldoc(["the very same duplicated line of "
                                 "plain text appears again"] * 10)),
        ), start=-3))
    return f"""WITH pages AS (SELECT * FROM {pages_subquery(d)} p),
aug AS (
  SELECT doc_id, url, text FROM pages
  UNION ALL
  {inject}
)
SELECT doc_id, url,
       {cols},
       {keep} AS gopher_keep
FROM aug"""


# Gopher override shared by the training_corpus pair - empty since r3:
# the pages fixture now carries genuine per-language stopword lines, so
# the default thresholds (incl. min_stopword_hits=2) hold as published.
TRAINING_GOPHER_TH: dict = {}


def pii_chain(d: str, e: str) -> str:
    """The PII scrub chain rendered for dialect *d*, driven by
    scrub.SCRUB_STEPS - the module path and every template (pii_scrub,
    training_corpus, training_corpus_domgate) share the ONE ordered
    definition, so adding a class (r4: credit cards) can't drift."""
    from ccspark.scrub import SCRUB_STEPS
    for _, pat, repl in SCRUB_STEPS:
        e = rrep(d, e, pat, repl)
    return e


def q_training_corpus(d: str) -> str:
    """The full quality_filter composite as ONE SQL statement:
    LANGUAGE-AWARE Gopher doc gate (per-lang stopwords, CJK-safe word
    counts) + C4 page gate (scan-speed pruning BEFORE the explode) -> geo
    gate -> line kernel -> ordinal -> keep-first dedup -> PII scrub on the
    surviving lines.  The Spark side of this pair is the PRODUCTION facade
    (api.CCSparkCorpus.build_training_corpus - pandas-UDF gate + kernel
    and all), so a green hash here verifies the whole composite
    end-to-end."""
    from ccspark.quality import c4_page_keep_expr, gopher_keep_ml_expr
    gate = (f"({gopher_keep_ml_expr(d, 'text', 'lang', TRAINING_GOPHER_TH)}"
            f" AND {c4_page_keep_expr(d, 'text')})")
    s = pii_chain(d, "text")
    return f"""WITH {corpus_lines_cte(d, page_filter=gate)}
SELECT domain, tld, country, region, url, line_id, {s} AS text
FROM corpus_lines"""


# domain-gate threshold for the training_corpus_domgate pair: above
# the fixture's weakest domain (keep_frac 0.625 at sf0.01) so the
# gate PROVABLY prunes - a threshold nothing fails would be vacuous
DOMGATE_MIN_KEEP = 0.7


def q_training_corpus_domgate(d: str) -> str:
    """The training composite with the WHOLESALE DOMAIN GATE on
    (api.build_training_corpus(domain_min_keep=DOMGATE_MIN_KEEP), 0.7 -
    deliberately above the fixture's weakest domain): the per-domain
    Gopher keep fraction is rolled up once over the geo-gated pages and
    pages of below-threshold domains are dropped before the doc gates.
    Judging a spam farm once instead of per-page is the cheapest pruning
    at crawl scale; the survivor-domain set is tiny, so the Spark side
    rejoins it broadcast-left-semi (plan-asserted in tests)."""
    from ccspark.quality import c4_page_keep_expr, gopher_keep_ml_expr
    keep = gopher_keep_ml_expr(d, "text", "lang", TRAINING_GOPHER_TH)
    rollup = f"""dq AS (
  SELECT domain,
         round(avg(CASE WHEN {keep} THEN 1e0 ELSE 0e0 END), 4) AS keep_frac
  FROM geo_pages GROUP BY domain
),
good_domains AS (SELECT domain FROM dq WHERE keep_frac >= {DOMGATE_MIN_KEEP})"""
    gate = (f"({keep} AND {c4_page_keep_expr(d, 'text')} AND "
            f"domain IN (SELECT domain FROM good_domains))")
    s = pii_chain(d, "text")
    return f"""WITH {corpus_lines_cte(d, page_filter=gate,
                                      extra_ctes=rollup)}
SELECT domain, tld, country, region, url, line_id, {s} AS text
FROM corpus_lines"""


def q_gopher_repetition(d: str) -> str:
    """Gopher repetition panel part 2 (table A1 rows 8-13): character
    fraction of the MOST COMMON word {2,3,4}-gram and of DUPLICATED word
    5-grams per document, with the keep verdict.  SQL twin of
    quality.gopher_repetition (asserted equal in tests/test_gopher.py).
    All gram sizes ride ONE tagged union - one count shuffle on
    (doc, n, gram), one window on (doc, n), one pivot - instead of a
    per-n explode/aggregate/join chain."""
    from ccspark.quality import GOPHER_REP_THRESHOLDS as T
    if d == SPARK:
        words = r"filter(split(text, '\\s+'), x -> x != '')"
    else:
        words = r"list_filter(string_split_regex(text, '\s+'), x -> x != '')"

    # words bound in a CTE below the four explodes (inlined regex
    # split+filter re-evaluates per element inside interpreted HOF
    # lambdas, x4 gram sizes - see dedup.shingles, r4)
    def grams(n: int) -> str:
        if d == SPARK:
            spans = (f"transform(sequence(1, greatest(size(w) - "
                     f"{n - 1}, 1)), i -> concat_ws(' ', "
                     f"slice(w, i, {n})))")
            return (f"SELECT doc_id, {n} AS n, gram FROM pw "
                    f"LATERAL VIEW explode({spans}) t AS gram")
        spans = (f"list_transform(generate_series(1, "
                 f"greatest(len(w) - {n - 1}, 1)), "
                 f"i -> array_to_string(w[i:i+{n - 1}], ' '))")
        return f"SELECT doc_id, {n} AS n, unnest({spans}) AS gram FROM pw"

    union = "\n  UNION ALL ".join(grams(n) for n in (2, 3, 4, 5))
    fr = ("round(coalesce({c}, 0) * 1e0 / greatest(length(p.text), 1), 4)")
    f2, f3, f4 = (fr.format(c=f"t.top{n}_chars") for n in (2, 3, 4))
    f5 = fr.format(c="d.dup5_chars")
    # every fixture page FAILS the panel (the synthesis plants repeated
    # structural lines on purpose), so rep_keep was only ever False -
    # inject one all-unique-words page so the keep verdict is graded in
    # both directions (r4; the pii_scrub injection pattern)
    diverse = " ".join(
        f"{a}{b}" for a in "abcdefg" for b in ("x", "y", "z", "w"))
    return f"""WITH real_pages AS (SELECT * FROM {pages_subquery(d)} pp),
pages AS (
  SELECT doc_id, text FROM real_pages
  UNION ALL
  SELECT cast(-1 AS bigint) AS doc_id, '{diverse}' AS text
),
pw AS (SELECT doc_id, {words} AS w FROM pages),
grams AS ({union}),
cnt AS (
  SELECT doc_id, n, gram, count(*) AS c,
         count(*) * length(gram) AS chars
  FROM grams
  WHERE length(gram) - length(replace(gram, ' ', '')) = n - 1
  GROUP BY doc_id, n, gram
),
tops AS (
  SELECT doc_id,
         max(CASE WHEN n = 2 THEN chars END) AS top2_chars,
         max(CASE WHEN n = 3 THEN chars END) AS top3_chars,
         max(CASE WHEN n = 4 THEN chars END) AS top4_chars
  FROM (SELECT *, row_number() OVER (PARTITION BY doc_id, n
                                     ORDER BY c DESC, gram) AS rk
        FROM cnt WHERE n <= 4) r
  WHERE rk = 1 GROUP BY doc_id
),
dups AS (
  SELECT doc_id, cast(sum(chars) AS bigint) AS dup5_chars
  FROM cnt WHERE n = 5 AND c > 1 GROUP BY doc_id
)
SELECT p.doc_id,
       {f2} AS top2_frac, {f3} AS top3_frac, {f4} AS top4_frac,
       {f5} AS dup5_frac,
       ({f2} <= {T['max_top2_frac']} AND {f3} <= {T['max_top3_frac']} AND
        {f4} <= {T['max_top4_frac']} AND {f5} <= {T['max_dup5_frac']})
         AS rep_keep
FROM pages p
LEFT JOIN tops t ON t.doc_id = p.doc_id
LEFT JOIN dups d ON d.doc_id = p.doc_id"""


def q_c4_quality(d: str) -> str:
    """C4 page + line gates (Raffel et al. 2020 sec 2.2) over pages: page
    keep (>=5 sentences, no lorem-ipsum/brace) plus per-page counts of
    lines passing the C4 line rules (terminal punctuation, >=3 words, no
    'javascript') - line stats via array lambdas, no explode."""
    from ccspark.quality import (
        c4_line_keep_expr, c4_page_keep_expr, c4_sentences_expr,
    )
    lines = ("split(text, chr(10))" if d == SPARK
             else "string_split(text, chr(10))")
    lk = c4_line_keep_expr(d, "x")
    kept = (f"size(filter({lines}, x -> {lk}))" if d == SPARK
            else f"len(list_filter({lines}, x -> {lk}))")
    nl = f"size({lines})" if d == SPARK else f"len({lines})"
    sents = c4_sentences_expr(d, "text")
    ns = (f"size(filter({sents}, x -> length(x) > 0))" if d == SPARK
          else f"len(list_filter({sents}, x -> length(x) > 0))")
    # every fixture page passes the C4 page gate (the fixture must stay
    # junk-free for the other graded queries), so page_keep was only
    # ever True - inject one synthetic failing page per reject reason
    # (lorem-ipsum, brace, <5 sentences) so BOTH verdicts are
    # value-graded (r4; the pii_scrub injection pattern)
    five = ("First sentence is fine. Second sentence follows. Third one "
            "too. Fourth sentence present. Fifth clears the bar.")
    bad = " UNION ALL ".join(
        f"SELECT cast({i} AS bigint) AS doc_id, "
        f"'synthetic://c4/{tag}' AS url, '{t}' AS text"
        for i, (tag, t) in enumerate((
            ("lorem", five + " But lorem ipsum poisons the page."),
            ("brace", five + " A stray { brace marks template junk."),
            ("short", "Too short. Only two sentences."),
        ), start=-3))
    return f"""WITH pages AS (SELECT * FROM {pages_subquery(d)} p),
aug AS (
  SELECT doc_id, url, text FROM pages
  UNION ALL
  {bad}
)
SELECT doc_id, url,
       cast({ns} AS bigint) AS n_sentences,
       cast({nl} AS bigint) AS n_lines,
       cast({kept} AS bigint) AS n_lines_kept,
       {c4_page_keep_expr(d, 'text')} AS page_keep
FROM aug"""


def q_c4_span_dedup(d: str, span: int = 3) -> str:
    """C4's global three-sentence-span dedup as SQL: explode positional
    sentence windows, hash, keep only the first occurrence corpus-wide
    (first by doc_id, span_idx).  SQL twin of quality.c4_span_dedup
    (asserted identical in tests/test_gopher.py); one shuffle on the span
    hash."""
    from ccspark.quality import c4_sentences_expr
    # sentence array bound in a CTE below the explode (inlined regex
    # split re-evaluates per element inside interpreted HOF lambdas -
    # see dedup.shingles, r4).  No fixture span repeats across docs, so
    # keep was only ever True - docs 0-1 are replayed under high ids
    # (the recrawl shape) so duplicated spans exist and the DROP side of
    # the dedup is value-graded; real docs' keepers are unchanged
    # (replays sort last in the keep-first window) (r4)
    arr = c4_sentences_expr(d, "text")
    ps = (f"(SELECT doc_id, {arr} AS sents FROM "
          f"(SELECT doc_id, text FROM pages UNION ALL "
          f"SELECT doc_id + 1000000 AS doc_id, text FROM pages "
          f"WHERE doc_id < 2) aug)")
    if d == SPARK:
        spans = (f"transform(sequence(1, greatest(size(sents) - "
                 f"{span - 1}, 1)), i -> concat_ws(' ', "
                 f"slice(sents, i, {span})))")
        ex = (f"SELECT doc_id, span_idx + 1 AS span_idx, span_text "
              f"FROM {ps} ps LATERAL VIEW posexplode({spans}) t "
              f"AS span_idx, span_text")
    else:
        spans = (f"list_transform(generate_series(1, greatest(len(sents) - "
                 f"{span - 1}, 1)), i -> array_to_string("
                 f"sents[i:i+{span - 1}], ' '))")
        ex = (f"SELECT doc_id, generate_subscripts({spans}, 1) AS span_idx,"
              f" unnest({spans}) AS span_text FROM {ps} ps")
    return f"""WITH pages AS (SELECT * FROM {pages_subquery(d)} p),
spans AS ({ex}),
hashed AS (
  SELECT doc_id, span_idx, md5(span_text) AS span_hash FROM spans
  WHERE length(span_text) > 0
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY span_hash
                               ORDER BY doc_id, span_idx) AS rk
  FROM hashed
)
SELECT doc_id, span_idx, span_hash, (rk = 1) AS keep FROM ranked"""


def q_html_extract(d: str) -> str:
    """HTML -> visible-text extraction (sources.html_to_text_expr): wraps
    every fixture page in a realistic HTML shell (head with title, style
    and script blocks, comments, block tags, entities) and extracts -
    value-hashed cross-engine over every page.  The exact
    visible-text-equality invariant on controlled markup lives in
    tests/test_sources_api.py (fixture page text itself contains inline
    tags, which the extractor correctly strips)."""
    from ccspark.sources import html_to_text_expr
    mk = ("'<html><head><title>t</title><style>p{color:red}</style>"
          "<script>if (1 < 2) { x(); }</script></head><body>"
          "<!-- boilerplate --><h1>Head &amp; Line</h1><p>' || "
          "replace(text, chr(10), '</p><p>') || "
          "'</p><div>tail &#39;q&#39;</div></body></html>'")
    extract = html_to_text_expr(d, "html")
    return f"""WITH pages AS (SELECT * FROM {pages_subquery(d)} p),
wrapped AS (SELECT doc_id, text, {mk} AS html FROM pages)
SELECT doc_id, {extract} AS extracted FROM wrapped"""


def q_url_normalize(d: str) -> str:
    """D3 with canonicalization: crawl URL variants (tracking params,
    fragments, scheme/host case, trailing slash) must collapse to one
    dedup key while REAL query params keep their own.  Decorates every
    fixture URL three ways: the tracking/fragment and case/slash variants
    collapse onto the original (groups of 3), the variant carrying a
    non-tracking param (&keep=1) stays distinct (groups of 1) - the
    group-count distribution is value-hashed cross-engine."""
    norm = geo.normalize_url_expr(d, "u")
    return f"""WITH pages AS (SELECT * FROM {pages_subquery(d)} p),
variants AS (
  SELECT url AS u FROM pages
  UNION ALL SELECT url || '?utm_source=news&utm_campaign=x#frag' FROM pages
  UNION ALL SELECT replace(replace(url, 'https://', 'HTTPS://WWW.'),
                           'www.', '') || '/' FROM pages
  UNION ALL SELECT url || '?gclid=abc123&keep=1' FROM pages
),
normed AS (SELECT {norm} AS canon FROM variants)
SELECT canon, cast(count(*) AS bigint) AS n_variants
FROM normed GROUP BY canon"""


def q_word_ngrams(d: str, n: int = 2, top: int = 10) -> str:
    """X4 (utilities.py defines an n-grams helper the reference never
    calls; here it is a first-class operator): top word-bigrams per lang
    over documents - explode positional n-grams, count, rank.  Single
    shuffle on (lang, gram); the rank window rides the same partitioning."""
    # words bound below the explode (inlined split re-evaluates per
    # element inside interpreted HOF lambdas - see dedup.shingles, r4)
    if d == SPARK:
        dw = (f"(SELECT lang, split(text, ' ') AS w "
              f"FROM {scan_src(d, 'documents', 'doc_id')})")
        grams = (f"transform(sequence(1, greatest(size(w) - {n - 1}, 1)),"
                 f" i -> concat_ws(' ', slice(w, i, {n})))")
        ex = (f"SELECT lang, gram FROM {dw} dw "
              f"LATERAL VIEW explode({grams}) t AS gram")
    else:
        dw = "(SELECT lang, string_split(text, ' ') AS w FROM documents)"
        grams = (f"list_transform(generate_series(1, greatest(len(w) - "
                 f"{n - 1}, 1)), i -> array_to_string(w[i:i+{n - 1}], ' '))")
        ex = f"SELECT lang, unnest({grams}) AS gram FROM {dw} dw"
    return f"""WITH grams AS ({ex}),
valid AS (
  SELECT lang, gram FROM grams
  WHERE length(gram) - length(replace(gram, ' ', '')) = {n - 1}
),
counted AS (SELECT lang, gram, count(*) AS n_occ FROM valid
            GROUP BY lang, gram),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY lang
                               ORDER BY n_occ DESC, gram) AS rk
  FROM counted
)
SELECT lang, gram, n_occ, rk FROM ranked WHERE rk <= {top}"""


def q_repeat_buyers(d: str) -> str:
    """U2/W5 coverage: INTERSECT/EXCEPT set ops + max-aggregate.
    Customers who ordered in BOTH 1995 and 1996 (INTERSECT) but never at
    top order priority (EXCEPT), with their max single-order value."""
    return """WITH both_years AS (
  SELECT o_custkey FROM orders
  WHERE o_orderdate >= date '1995-01-01' AND o_orderdate < date '1996-01-01'
  INTERSECT
  SELECT o_custkey FROM orders
  WHERE o_orderdate >= date '1996-01-01' AND o_orderdate < date '1997-01-01'
),
eligible AS (
  SELECT o_custkey FROM both_years
  EXCEPT
  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
)
SELECT e.o_custkey AS custkey,
       max(o.o_totalprice) AS max_order,
       count(*) AS n_orders
FROM eligible e JOIN orders o ON o.o_custkey = e.o_custkey
GROUP BY e.o_custkey"""


def q_str_hash_bitcompat(d: str) -> str:
    """X7 bit-compat gate: Spark computes the reference's str_hash
    (first-8-LE-bytes-of-SHA-1 as uint64, deduplication.py:88-94) over
    documents; the oracle side is PRECOMPUTED with hashlib+numpy - the
    reference's literal implementation - because DuckDB has no sha1().
    A green hash_match therefore proves byte-for-byte equality with hash
    files the reference would produce, so users can join existing
    reference hashes against ours."""
    if d == SPARK:
        from ccspark.dedup import str_hash_expr
        return (f"SELECT doc_id, {str_hash_expr('text')} AS hash_u64 "
                f"FROM documents WHERE doc_id < 64")
    import hashlib

    import duckdb
    import numpy as np
    rows = duckdb.sql(
        "SELECT doc_id, text FROM "
        "read_parquet('/root/testdata/sf0.01/documents.parquet') "
        "WHERE doc_id < 64 ORDER BY doc_id").fetchall()
    vals = ", ".join(
        "({}, '{}')".format(
            i, np.frombuffer(hashlib.sha1(t.encode("utf-8")).digest()[:8],
                             "<u8").item(0))
        for i, t in rows)
    return (f"SELECT * FROM (VALUES {vals}) AS t(doc_id, hash_u64)")


def q_pii_scrub(d: str) -> str:
    """F17 (north_rule extension): regex PII scrub over raw page lines -
    emails, phones, IPs, SSNs, credit cards -> typed placeholders, with
    per-line redaction flags.

    The fixture pages deliberately contain no PII (it must never leak
    into other graded queries' text), so this template INJECTS one
    deterministic PII line per page (pos 0; real lines are pos >= 1)
    carrying every class - the scrub chain is then value-hashed
    cross-engine on lines that actually redact (r4; previously every
    fixture line passed through unchanged and the chain was only
    pytest-exercised).  The email varies per row via the domain column;
    both card spellings (space/dash groups) are present; the SSN/IP/
    phone samples sit on one line so the chain's ORDER is exercised
    too (ssn+ip+cc must all fire before the greedy phone class)."""
    s = pii_chain(d, "raw_line")
    pii = ("concat('reach ', domain, "
           "'@mail.example.org or call +1 (555) 123-4567, card "
           "4111 1111 1111 1111 or 4111-1111-1111-1111, host "
           "10.0.42.7, ssn 987-65-4320 end')")
    if d == SPARK:
        # ONE pass: the injected PII line is PREPENDED to the split
        # array, so a single posexplode yields it at pos 0 and real
        # lines at their 1-based positions - the UNION rendering planned
        # geo_pages (scan + host/tld regex) twice (r6 plan audit: 2
        # scans -> 1).  The scrub chain sits in a generator position so
        # the was_redacted comparison references the bound attribute
        # instead of re-inlining the regex chain (values identical,
        # exceptAll-verified; DuckDB keeps the UNION form).
        arr = split_arr(d, "text", RE_LINE_SPLIT)
        scrub_call = ("ccspark_scrub(raw_line)"
                      if os.environ.get("CCSPARK_SQL_KERNEL") != "catalyst"
                      else s)
        return f"""WITH {geo_pages_cte(d)},
raw_lines AS (
  SELECT url, pos, raw_line FROM geo_pages
  LATERAL VIEW posexplode(concat(array({pii}), {arr})) t AS pos, raw_line
),
scrubbed AS (
  SELECT url, pos, raw_line, scrubbed_line FROM raw_lines
  LATERAL VIEW explode(array({scrub_call})) ts AS scrubbed_line
)
SELECT url, pos, scrubbed_line,
       CASE WHEN raw_line = scrubbed_line THEN 0 ELSE 1 END AS was_redacted
FROM scrubbed"""
    return f"""WITH {geo_pages_cte(d)},
pii_lines AS (
  SELECT doc_id, url, tld, domain, country, region, lang,
         0 AS pos, {pii} AS raw_line
  FROM geo_pages
),
raw_lines AS (
  SELECT * FROM {_posexplode_lines(d, 'geo_pages')} rl
  UNION ALL
  SELECT * FROM pii_lines
),
scrubbed AS (
  SELECT url, pos, raw_line, {s} AS scrubbed_line FROM raw_lines
)
SELECT url, pos, scrubbed_line,
       CASE WHEN raw_line = scrubbed_line THEN 0 ELSE 1 END AS was_redacted
FROM scrubbed"""


def q_url_filter_stats(d: str) -> str:
    """A6 (scan_url_filters, cc_corpus.py:405-411): per-domain distinct
    languages and page count; flag domains spanning > 3 languages."""
    return f"""WITH {geo_pages_cte(d)}
SELECT domain, count(DISTINCT lang) AS n_langs, count(*) AS n_pages,
       CASE WHEN count(DISTINCT lang) > 3 THEN 1 ELSE 0 END AS mnc_flag
FROM geo_pages GROUP BY domain"""


def q_iso_join(d: str) -> str:
    """J3: country -> ISO-3 broadcast dimension join (geoWAC.py:81-108)."""
    return f"""WITH {geo_pages_cte(d)}
SELECT g.country, i.iso3, count(*) AS n_pages
FROM geo_pages g JOIN {dim(d, 'country_iso3')} i ON g.country = i.country
GROUP BY g.country, i.iso3"""


def q_country_cap(d: str) -> str:
    """W4 (geoWAC.py:149-152): cap pages per country at K=20, selection
    pinned by md5(url) instead of random.shuffle - deterministic.

    This window rendering exists so DuckDB can reproduce the selection
    bit-for-bit; it is the PARITY ANCHOR (skew.cap_per_key_window).
    Production paths use skew.cap_per_key - the salted two-phase top-k
    that never sorts a whole hot key in one task - whose survivors are
    provably identical (tests/test_skew.py).

    Vacuity (r5): at sf0.01 EVERY real country saturates rk=20, so the
    keep-all-when-under-cap path was never graded - two injected
    sentinel rows (negative doc_ids, country '_under_cap') pin it in
    both dialects."""
    return f"""WITH {geo_pages_cte(d)},
capped_in AS (
  SELECT doc_id, url, country FROM geo_pages
  UNION ALL
  SELECT cast(-1 AS bigint), 'https://tiny-a.example.bd/', '_under_cap'
  UNION ALL
  SELECT cast(-2 AS bigint), 'https://tiny-b.example.bd/', '_under_cap'
),
ranked AS (
  SELECT doc_id, url, country,
         row_number() OVER (PARTITION BY country ORDER BY md5(url), url)
           AS rk
  FROM capped_in
)
SELECT doc_id, url, country, rk FROM ranked WHERE rk <= 20"""


def q_shard_assign(d: str) -> str:
    """W3 (cc_corpus.py:439-441): 100k-row shard split -> here 100-row
    shards per (region, country), deterministic order."""
    return f"""WITH {corpus_lines_cte(d)}
SELECT region, country,
       cast(floor((row_number() OVER (PARTITION BY region, country
                                      ORDER BY url, line_id) - 1) / 100)
            AS bigint) AS shard_id,
       count(*) OVER (PARTITION BY region, country) AS cell_lines,
       url, line_id
FROM corpus_lines"""


# ----- language ID + quality scoring (M1-M5 re-expressions) ---------------

_LANG_MARKERS = {
    "en": ("the", "and", "of", "to", "is"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "los", "las", "es", "y"),
    "zh": ("zh",),
}


def q_langid_agreement(d: str) -> str:
    """M1/M2/J4: two independent heuristic LID scorers (stopword-marker
    voting over disjoint marker halves); a doc's LID is accepted only when
    both agree with the labeled lang (geoWAC.py:67 semantics).  fastText
    would fill the same UDF slot at production scale; markers keep the
    oracle exact."""
    def score(lang: str, half: int) -> str:
        toks = _LANG_MARKERS[lang]
        toks = toks[half::2] or toks
        parts = []
        for t in toks:
            pat = f"(^|[^a-z])({t})([^a-z]|$)"
            stripped = rrep(d, "lower(text)", pat, "\\1\\3")
            parts.append(
                f"(length(lower(text)) - length({stripped}))")
        return "(" + " + ".join(parts) + ")"

    langs = sorted(_LANG_MARKERS)
    best = []
    for half in (0, 1):
        scores = ", ".join(
            f"{score(lg, half)}" for lg in langs)
        # argmax via greatest + case
        g = f"greatest({scores})"
        cases = " ".join(
            f"WHEN {score(lg, half)} = {g} THEN '{lg}'" for lg in langs)
        best.append(f"(CASE {cases} END)")
    return f"""WITH pages AS (SELECT * FROM {pages_subquery(d)} p),
scored AS (
  SELECT doc_id, lang, {best[0]} AS lid_a, {best[1]} AS lid_b FROM pages
)
SELECT doc_id, lang, lid_a, lid_b,
       CASE WHEN lid_a = lang AND lid_b = lang THEN 1 ELSE 0 END AS accepted
FROM scored"""


def q_quality_signals(d: str) -> str:
    """Heuristic quality scoring per document: token count, mean word
    length, stopword ratio, punctuation ratio, distinct-word ratio,
    char-repetition flag - the standard webtext quality panel."""
    words = split_arr(d, "text", " ")
    nw = f"len({words})" if d == DUCK else f"size({words})"
    stop_pat = "(^|[^a-z])(the|and|of|to|is|a|in|that|it|for)([^a-z]|$)"
    stop_stripped = rrep(d, "lower(text)", stop_pat, "\\1\\3")
    punct_stripped = rrep(d, "text", "[!-/:-@\\[-`{-~]", "")
    dw = (f"cardinality(array_distinct({words}))" if d == SPARK
          else f"len(list_distinct({words}))")
    return f"""WITH pages AS (SELECT * FROM {pages_subquery(d)} p),
sig AS (
  SELECT doc_id, lang,
         {nw} AS n_tokens,
         round(length(replace(text, ' ', '')) * 1e0 / {nw}, 4)
           AS mean_word_len,
         round((length(lower(text)) - length({stop_stripped})) * 1e0
               / length(text), 4) AS stopword_mass,
         round((length(text) - length({punct_stripped})) * 1e0
               / length(text), 4) AS punct_ratio,
         round({dw} * 1e0 / {nw}, 4) AS distinct_ratio
  FROM pages
)
SELECT doc_id, lang, n_tokens, mean_word_len, stopword_mass, punct_ratio,
       distinct_ratio,
       CASE WHEN n_tokens >= 10 AND distinct_ratio >= 0.2
                 AND punct_ratio <= 0.2 THEN 1 ELSE 0 END AS quality_pass
FROM sig"""


def q_perplexity_outliers(d: str) -> str:
    """M3-M5 re-expression: corpus-level unigram LM -> per-doc mean token
    surprisal ("perplexity" proxy, outlier_detection.py:77-92) -> per-lang
    Iglewicz-Hoaglin modified z-score cut at |z| > 3 with exact
    median/MAD (outlier_detection.py:95-113).  Reference orientation:
    the score is mean token LOG-LIKELIHOOD (misnamed "Perplexity" there,
    outlier_detection.py:84) so HIGH = too predictable, LOW = too random.  Pure DataFrame ops - the
    per-cell FastText trainer becomes a counting LM, as allowed by
    north_rule ('n-gram perplexity').

    No fixture doc is hyper-repetitive, so the HIGH (too-predictable)
    verdict never fired in the grade - the template injects one
    max-likelihood doc (the corpus's ubiquitous word repeated) so all
    three predictions are value-graded (r4; LOW and IN occur
    naturally).

    r5 tag-union: rows with prediction='QQ' carry the M6 probplot data
    (outlier_detection.py:88-91) for the per-lang loglik distribution -
    doc_id:=rank, loglik:=the rank-th order statistic, z:=the
    round-4 Filliben/Acklam theoretical quantile
    (quality.norm_ppf_case_sql, same constants as the Column form).
    row_number ties are harmless: tied loglik values make the emitted
    (rank, loglik, z) row SET order-independent.  At grading scale the
    big langs exercise all three Acklam branches (n>=29 puts rank 1
    past the 0.02425 tail split) and both Filliben endpoint arms.
    Like country_cap's window rendering, the per-lang ranking here is
    the bit-stable ANCHOR form: the production path for crawl-scale QQ
    is quality.qq_points(approx=True) - a percentile_approx sketch,
    one mergeable aggregation, no per-key sort."""
    words = split_arr(d, "text", " ")
    unnest_w = (
        f"(SELECT doc_id, lang, unnest({words}) AS w FROM pages)"
        if d == DUCK else
        f"(SELECT doc_id, lang, w FROM pages "
        f"LATERAL VIEW explode({words}) t AS w)"
    )
    rep_doc = " ".join(["the"] * 60)
    if d == SPARK:
        # r6 FUSED rendering: the rejoin form planned the pages explode
        # 12x (stats/mad/scored/qq_ranked each re-derive doc_ll ->
        # toks -> pages; runtime exchange reuse recovered only part of
        # it).  One doc_ll pass instead: corpus total as a window over
        # vocab (same sum), per-lang median/MAD/rank/count as windows
        # over doc_ll (same groups, same median function -> identical
        # values), and the scored+QQ tag-union emitted by ONE
        # two-element struct explode per doc_ll row (each row yields
        # exactly one scored and one QQ row, so the union IS a per-row
        # duplication).  The Acklam inputs (pp, ql, qh, qm, rr) are
        # bound behind the struct-explode barrier per the
        # norm_ppf_case_sql contract - attribute reads, no re-inlined
        # sqrt/ln trees.  DuckDB keeps the rejoin rendering; all values
        # hash-identical (oracle MATCH, plain + hostile).
        z_s = "round(0.6745 * (loglik - med) / mad_v, 4)"
        pp = ("CASE WHEN rk = 1 THEN 1e0 - power(5e-1, 1e0 / n) "
              "WHEN rk = n THEN power(5e-1, 1e0 / n) "
              "ELSE (rk - 3.175e-1) / (n + 3.65e-1) END")
        return f"""WITH real_pages AS (SELECT * FROM {pages_subquery(d)} p),
pages AS (
  SELECT doc_id, lang, text FROM real_pages
  UNION ALL
  SELECT cast(-1 AS bigint) AS doc_id, 'en' AS lang, '{rep_doc}' AS text
),
toks AS (SELECT * FROM {unnest_w} u WHERE length(w) > 0),
vocab AS (
  SELECT w, count(*) AS cnt FROM toks GROUP BY w
),
vocab_t AS (SELECT w, cnt, sum(cnt) OVER () AS n FROM vocab),
doc_ll AS (
  SELECT t.doc_id, t.lang,
         round(avg(ln(v.cnt * 1e0 / v.n)), 4) AS loglik
  FROM toks t JOIN vocab_t v ON t.w = v.w
  GROUP BY t.doc_id, t.lang
),
win AS (
  SELECT doc_id, lang, loglik,
         median(loglik) OVER (PARTITION BY lang) AS med,
         row_number() OVER (PARTITION BY lang ORDER BY loglik) AS rk,
         count(*) OVER (PARTITION BY lang) AS n
  FROM doc_ll
),
win2 AS (
  SELECT *, median(abs(loglik - med)) OVER (PARTITION BY lang) AS mad_v
  FROM win
),
qq_in AS (
  SELECT doc_id, lang, loglik, {z_s} AS z, rk, b.pp, b.ql, b.qh, b.qm, b.rr
  FROM win2
  LATERAL VIEW explode(array(named_struct(
    'pp', {pp},
    'ql', sqrt(-2e0 * ln({pp})),
    'qh', sqrt(-2e0 * ln(1e0 - {pp})),
    'qm', {pp} - 5e-1,
    'rr', ({pp} - 5e-1) * ({pp} - 5e-1)))) tb AS b
)
SELECT duo.doc_id, lang, loglik, duo.z, duo.prediction
FROM qq_in
LATERAL VIEW explode(array(
  named_struct('doc_id', doc_id, 'z', z, 'prediction',
    CASE WHEN z > 3 THEN 'HIGH' WHEN z < -3 THEN 'LOW' ELSE 'IN' END),
  named_struct('doc_id', cast(rk AS bigint),
    'z', round({quality.norm_ppf_case_sql('pp', 'ql', 'qh', 'qm', 'rr')}, 4),
    'prediction', 'QQ'))) td AS duo"""
    return f"""WITH real_pages AS (SELECT * FROM {pages_subquery(d)} p),
pages AS (
  SELECT doc_id, lang, text FROM real_pages
  UNION ALL
  SELECT cast(-1 AS bigint) AS doc_id, 'en' AS lang, '{rep_doc}' AS text
),
toks AS (SELECT * FROM {unnest_w} u WHERE length(w) > 0),
vocab AS (
  SELECT w, count(*) AS cnt FROM toks GROUP BY w
),
total AS (SELECT sum(cnt) AS n FROM vocab),
doc_ll AS (
  SELECT t.doc_id, t.lang,
         round(avg(ln(v.cnt * 1e0 / total.n)), 4) AS loglik
  FROM toks t JOIN vocab v ON t.w = v.w CROSS JOIN total
  GROUP BY t.doc_id, t.lang
),
stats AS (
  SELECT lang, median(loglik) AS med FROM doc_ll GROUP BY lang
),
mad AS (
  SELECT d2.lang, median(abs(d2.loglik - s.med)) AS mad_v, min(s.med) AS med
  FROM doc_ll d2 JOIN stats s ON d2.lang = s.lang GROUP BY d2.lang
),
scored AS (
  SELECT d3.doc_id, d3.lang, d3.loglik,
         round(0.6745 * (d3.loglik - m.med) / m.mad_v, 4) AS z
  FROM doc_ll d3 JOIN mad m ON d3.lang = m.lang
),
qq_ranked AS (
  SELECT lang, loglik,
         row_number() OVER (PARTITION BY lang ORDER BY loglik) AS rk,
         count(*) OVER (PARTITION BY lang) AS n
  FROM doc_ll
),
qq_pp AS (
  SELECT lang, rk, loglik,
         CASE WHEN rk = 1 THEN 1e0 - power(5e-1, 1e0 / n)
              WHEN rk = n THEN power(5e-1, 1e0 / n)
              ELSE (rk - 3.175e-1) / (n + 3.65e-1) END AS pp
  FROM qq_ranked
),
qq_bound AS (
  SELECT lang, rk, loglik, pp,
         sqrt(-2e0 * ln(pp)) AS ql,
         sqrt(-2e0 * ln(1e0 - pp)) AS qh,
         pp - 5e-1 AS qm,
         (pp - 5e-1) * (pp - 5e-1) AS rr
  FROM qq_pp
)
SELECT doc_id, lang, loglik, z,
       CASE WHEN z > 3 THEN 'HIGH' WHEN z < -3 THEN 'LOW' ELSE 'IN' END
         AS prediction
FROM scored
UNION ALL
SELECT cast(rk AS bigint) AS doc_id, lang, loglik,
       round({quality.norm_ppf_case_sql()}, 4) AS z,
       'QQ' AS prediction
FROM qq_bound"""


# ----- near-dup + similarity over documents/embeddings --------------------

_MINHASH_P = 2147483647
_MINHASH_AB = [(1103515245 + 2 * i, 12345 + 7 * i) for i in range(12)]


def _minhash_shingles(d: str, k: int = 3, src: str = "documents") -> str:
    """Distinct word-k-gram shingle subquery (doc_id, shingle) - the
    shared gram rendering of the minhash template AND the near-dup /
    incremental oracles (one definition so they can't drift; mirrors
    dedup.shingles exactly, length-0 filter included).  *src* is the
    source relation (a table name or parenthesized subquery).  Words
    are bound to a projection column BEFORE the transform lambda: HOFs
    are interpreted, so an inlined split re-evaluates per array element
    (measured 3.6x at sf1, r4 - see dedup.shingles)."""
    words = split_arr(d, "text", " ")
    if src == "documents":          # single-split-input guard (scan_src)
        src = scan_src(d, "documents", "doc_id")
    dw = f"(SELECT doc_id, {words} AS w FROM {src})"
    if d == SPARK:
        sh_arr = (f"transform(sequence(0, greatest(size(w) - {k}, 0)), "
                  f"i -> concat_ws(' ', slice(w, i + 1, {k})))")
        return (f"(SELECT doc_id, shingle FROM {dw} dw "
                f"LATERAL VIEW explode(array_distinct({sh_arr})) t AS shingle "
                f"WHERE length(shingle) > 0)")
    sh_arr = (f"list_distinct(list_transform("
              f"range(1, greatest(len(w) - {k} + 1, 1) + 1), "
              f"i -> array_to_string(w[i:i+{k - 1}], ' ')))")
    return (f"(SELECT doc_id, unnest({sh_arr}) AS shingle FROM {dw} dw "
            f"WHERE len({sh_arr}) > 0)")


def q_minhash_pairs(d: str) -> str:
    """MinHash-LSH near-dup candidates: 3-word shingles, ONE md5 per
    shingle reduced to a 31-bit int, 12 affine min-hashes
    h_i = (a_i*h + b_i) mod (2^31-1) computed as 12 aggregate COLUMNS in a
    single groupBy(doc) (no seed explosion, one shuffle), 4 bands x 3
    rows, candidates = shared band digest, estimated Jaccard = fraction of
    agreeing minhashes.  31-bit values keep a_i*h inside int64 in both
    engines (both raise on bigint overflow)."""
    P = _MINHASH_P
    AB = _MINHASH_AB
    sh = _minhash_shingles(d)
    h32 = hex_to_bigint(d, "substr(md5(shingle), 1, 7)")
    mins = ", ".join(
        f"min(({a} * h + {b}) % {P}) AS m{i}"
        for i, (a, b) in enumerate(AB))
    digest = lambda lo: ("md5(concat(" + ", ".join(
        f"m{j}, ','" for j in range(lo, lo + 3)) + "))")
    # ONE explode of the 4-digest array (a 4-way UNION would re-plan the
    # signature aggregate once per band per join side - 8 recomputations)
    arr = "array(" + ", ".join(digest(bi * 3) for bi in range(4)) + ")"
    if d == SPARK:
        # r6: signature columns RIDE THROUGH the banding explode (the
        # r4 dedup.minhash_near_dups lesson) and candidate pairs come
        # from a per-(band, digest) collect_list + stacked explodes
        # instead of a self-join: the old rejoin-against-sa/sb form
        # planned the whole shingle+md5+aggregate chain FOUR times, and
        # even the carried-signature self-join still computed it twice
        # (broadcast build + streamed side; AQE exchange reuse did not
        # fire across the CTE copies).  The bucket form references the
        # chain ONCE.  Memory per bucket row is O(bucket size) - the
        # stacked explodes stream pairs row-at-a-time, never
        # materializing the quadratic pair array - and bucket size is
        # bounded by per-band duplicate multiplicity (production
        # near-dup removal additionally collapses exact copies first:
        # dedup.dedup_near pre_exact).  A pair sharing several bands
        # repeats with the SAME estimate, so DISTINCT yields the
        # identical value set (oracle-verified).  DuckDB keeps the
        # rejoin form.
        mstruct = ", ".join(f"'m{i}', m{i}" for i in range(12))
        agree_ap = " + ".join(
            f"(CASE WHEN a.m{i} = p.m{i} THEN 1 ELSE 0 END)"
            for i in range(12))
        mcols = ", ".join(f"m{i}" for i in range(12))
        return f"""WITH hashed AS (
  SELECT doc_id, {h32} AS h FROM {sh} q WHERE length(shingle) > 0
),
sig AS (
  SELECT doc_id, {mins} FROM hashed GROUP BY doc_id
),
digests AS (
  SELECT doc_id, {mcols}, band, digest FROM sig
  LATERAL VIEW posexplode({arr}) t AS band, digest
),
buckets AS (
  SELECT band, digest,
         collect_list(named_struct('i', doc_id, {mstruct})) AS ds
  FROM digests GROUP BY band, digest
),
pp AS (
  SELECT a.i AS doc_a, p.i AS doc_b, {agree_ap} AS agree
  FROM buckets
  LATERAL VIEW explode(ds) ta AS a
  LATERAL VIEW explode(filter(ds, b -> b.i > a.i)) tb AS p
)
SELECT DISTINCT doc_a, doc_b, round(agree * 1e0 / 12, 4) AS jaccard_est
FROM pp"""
    arr_d = "[" + ", ".join(digest(bi * 3) for bi in range(4)) + "]"
    bands = (f"SELECT doc_id, generate_subscripts({arr_d}, 1) - 1 "
             f"AS band, unnest({arr_d}) AS digest FROM sig")
    agree = " + ".join(
        f"(CASE WHEN sa.m{i} = sb.m{i} THEN 1 ELSE 0 END)" for i in range(12))
    return f"""WITH hashed AS (
  SELECT doc_id, {h32} AS h FROM {sh} q WHERE length(shingle) > 0
),
sig AS (
  SELECT doc_id, {mins} FROM hashed GROUP BY doc_id
),
digests AS (
  {bands}
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM digests a JOIN digests b
    ON a.band = b.band AND a.digest = b.digest AND a.doc_id < b.doc_id
)
SELECT p.doc_a, p.doc_b, round(({agree}) * 1e0 / 12, 4) AS jaccard_est
FROM pairs p
JOIN sig sa ON sa.doc_id = p.doc_a
JOIN sig sb ON sb.doc_id = p.doc_b"""


def q_simhash(d: str) -> str:
    """16-bit SimHash fingerprint per document (majority vote over the
    high bit of each hex digit of md5(word))."""
    words = split_arr(d, "text", " ")
    unnest_w = (
        f"(SELECT doc_id, unnest({words}) AS w FROM documents)"
        if d == DUCK else
        f"(SELECT doc_id, w FROM {scan_src(d, 'documents', 'doc_id')} "
        f"LATERAL VIEW explode({words}) t AS w)"
    )
    bit_sums = ", ".join(
        f"sum(CASE WHEN substr(h, {i + 1}, 1) IN "
        f"('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) AS s{i}"
        for i in range(16)
    )
    fp = " + ".join(
        f"(CASE WHEN s{i} > 0 THEN cast({2 ** i} AS bigint) ELSE 0 END)"
        for i in range(16)
    )
    return f"""WITH toks AS (
  SELECT doc_id, md5(w) AS h FROM {unnest_w} u WHERE length(w) > 0
),
votes AS (SELECT doc_id, {bit_sums} FROM toks GROUP BY doc_id)
SELECT doc_id, cast({fp} AS bigint) AS simhash FROM votes"""


def q_knn_cosine(d: str) -> str:
    """Brute-force cosine top-5 neighbors for query vectors (vec_id < 3):
    the exact-ANN baseline over the embeddings table.

    Scale guard: the query set is pre-filtered into its own relation and
    explicitly BROADCAST, so the plan is one streaming scan of the table
    against a Q-row broadcast - O(Q*N) compute, zero shuffle of the big
    side, driver memory bounded by Q.  This is the labeled exact baseline
    for SMALL query sets only; large query sets route through the IVF
    (similarity.ivf_knn / ivf_recall) or sign-LSH (q_ann_sign_lsh) scale
    paths instead of raising Q here."""
    if d == SPARK:
        dot = ("aggregate(zip_with(cast(a.embedding as array<double>), "
               "cast(b.embedding as array<double>), "
               "(x, y) -> x * y), cast(0.0 as double), (acc, v) -> acc + v)")
        na = ("sqrt(aggregate(transform(cast(a.embedding as array<double>), "
              "x -> x * x), cast(0.0 as double), (acc, v) -> acc + v))")
        nb = ("sqrt(aggregate(transform(cast(b.embedding as array<double>), "
              "x -> x * x), cast(0.0 as double), (acc, v) -> acc + v))")
        cos = f"round({dot} / ({na} * {nb}), 4)"
    else:
        cos = ("round(list_cosine_similarity(a.embedding::DOUBLE[], "
               "b.embedding::DOUBLE[]), 4)")
    hint = "/*+ BROADCAST(a) */ " if d == SPARK else ""
    emb = scan_src(d, "embeddings", "vec_id", alias="b")
    return f"""WITH q AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id < 3
),
pairs AS (
  SELECT {hint}a.vec_id AS query_id, b.vec_id AS neighbor_id,
         b.label AS neighbor_label, {cos} AS cosine
  FROM q a JOIN {emb} ON b.vec_id <> a.vec_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS rk
  FROM pairs
)
SELECT query_id, neighbor_id, neighbor_label, cosine, rk
FROM ranked WHERE rk <= 5"""


def q_ann_sign_lsh(d: str) -> str:
    """Bucketed ANN: sign-LSH over 8 fixed dimensions = the scale path
    (compare within-bucket only).  Returns top-3 within-bucket neighbors
    for the same query vectors as q_knn_cosine."""
    idx = lambda e, i: (f"element_at({e}, {i})" if d == SPARK else f"{e}[{i}]")
    def bucket(e):
        return ("concat(" + ", ".join(
            f"CASE WHEN {idx(e, i)} >= 0 THEN '1' ELSE '0' END"
            for i in (1, 9, 17, 25, 33, 41, 49, 57)) + ")")
    if d == SPARK:
        # r6: the double cast and the norm fold are bound to per-side
        # projection columns BELOW the self-join (the r4 HOF-binding
        # rule the module sign_lsh_pairs already follows): inline they
        # re-evaluated once per PAIR - O(pairs) interpreted array folds
        # instead of O(rows).  Same expressions, same arithmetic, so
        # cosines are bitwise identical (oracle-verified); the cast is
        # additionally behind a generator barrier so the norm
        # references the attribute, not a second copy of the cast.
        dot = ("aggregate(zip_with(a._v, b._v, "
               "(x, y) -> x * y), cast(0.0 as double), (acc, v) -> acc + v)")
        cos = f"round({dot} / (a._n * b._n), 4)"
        return f"""WITH bucketed AS (
  SELECT vec_id, label, {bucket('embedding')} AS bucket, _v,
         sqrt(aggregate(transform(_v, x -> x * x), cast(0.0 as double),
              (acc, v) -> acc + v)) AS _n
  FROM {scan_src(d, 'embeddings', 'vec_id')}
  LATERAL VIEW explode(array(cast(embedding as array<double>))) tv AS _v
),
pairs AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, a.bucket,
         {cos} AS cosine
  FROM bucketed a JOIN bucketed b
    ON a.bucket = b.bucket AND a.vec_id < 3 AND b.vec_id <> a.vec_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS rk
  FROM pairs
)
SELECT query_id, neighbor_id, bucket, cosine, rk FROM ranked WHERE rk <= 3"""
    cos = ("round(list_cosine_similarity(a.embedding::DOUBLE[], "
           "b.embedding::DOUBLE[]), 4)")
    return f"""WITH bucketed AS (
  SELECT vec_id, label, embedding, {bucket('embedding')} AS bucket
  FROM embeddings
),
pairs AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, a.bucket,
         {cos} AS cosine
  FROM bucketed a JOIN bucketed b
    ON a.bucket = b.bucket AND a.vec_id < 3 AND b.vec_id <> a.vec_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS rk
  FROM pairs
)
SELECT query_id, neighbor_id, bucket, cosine, rk FROM ranked WHERE rk <= 3"""


EMB_ND_TH = 0.30


def q_embedding_near_dups(d: str) -> str:
    """Embedding-cosine near-duplicate detection: candidate pairs from
    sign-LSH buckets (8 fixed dimensions), kept when cosine >= 0.90 -
    the semantic-dedup complement to MinHash (which sees only surface
    n-grams).  Bucketing keeps the self-join near-linear at scale.
    Threshold EMB_ND_TH=0.30 here: the driver's synthetic embeddings are
    near-orthogonal (max within-bucket cosine ~0.45), so a production-
    style 0.9 cut would make the check vacuous; the plan is identical."""
    idx = lambda e, i: (f"element_at({e}, {i})" if d == SPARK else f"{e}[{i}]")
    def bucket(e):
        return ("concat(" + ", ".join(
            f"CASE WHEN {idx(e, i)} >= 0 THEN '1' ELSE '0' END"
            for i in (1, 9, 17, 25, 33, 41, 49, 57)) + ")")
    if d == SPARK:
        # per-side bound cast+norm, generator barrier - see
        # q_ann_sign_lsh (same rationale, bitwise-identical cosines)
        dot = ("aggregate(zip_with(a._v, b._v, "
               "(x, y) -> x * y), cast(0.0 as double), (acc, v) -> acc + v)")
        cos = f"round({dot} / (a._n * b._n), 4)"
        return f"""WITH bucketed AS (
  SELECT vec_id, label, {bucket('embedding')} AS bucket, _v,
         sqrt(aggregate(transform(_v, x -> x * x), cast(0.0 as double),
              (acc, v) -> acc + v)) AS _n
  FROM {scan_src(d, 'embeddings', 'vec_id')}
  LATERAL VIEW explode(array(cast(embedding as array<double>))) tv AS _v
),
pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         a.label AS label_a, b.label AS label_b, cosine
  FROM bucketed a JOIN bucketed b
    ON a.bucket = b.bucket AND a.vec_id < b.vec_id
  LATERAL VIEW explode(array({cos})) tc AS cosine
)
SELECT vec_a, vec_b, label_a, label_b, cosine
FROM pairs WHERE cosine >= {EMB_ND_TH}"""
    cos = ("round(list_cosine_similarity(a.embedding::DOUBLE[], "
           "b.embedding::DOUBLE[]), 4)")
    return f"""WITH bucketed AS (
  SELECT vec_id, label, embedding, {bucket('embedding')} AS bucket
  FROM embeddings
),
pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         a.label AS label_a, b.label AS label_b, {cos} AS cosine
  FROM bucketed a JOIN bucketed b
    ON a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, label_a, label_b, cosine
FROM pairs WHERE cosine >= {EMB_ND_TH}"""


def q_sign_lsh_suite(d: str) -> str:
    """ann_sign_lsh + embedding_near_dups TAG-UNIONED into one graded
    slot (r3 fold pattern: both ride the same sign-LSH bucketing, both
    are dialect-shared templates, so they share a slot without losing a
    single verified value - the union keeps every column of each branch).
    Freed slot taken by near_dup_removal (r3 verdict item 6).  r4: a
    third 'survivor' branch (the END-TO-END semantic dedup output) rides
    the module side - see _mq_sign_lsh_suite."""
    a = q_ann_sign_lsh(d)
    b = q_embedding_near_dups(d)
    return f"""SELECT 'ann' AS op, query_id AS id_a, neighbor_id AS id_b,
       bucket AS tag, cosine, cast(rk AS bigint) AS rk
FROM ({a}) ann_q
UNION ALL
SELECT 'near_dup' AS op, vec_a AS id_a, vec_b AS id_b,
       concat(label_a, '|', label_b) AS tag, cosine,
       cast(NULL AS bigint) AS rk
FROM ({b}) nd_q"""


def q_token_stats(d: str) -> str:
    """Token counting: whitespace tokens vs BPE-ish subword pieces
    (letter-runs, digit-runs, single punctuation marks)."""
    ws_words = split_arr(d, "text", " ")
    nw = f"size({ws_words})" if d == SPARK else f"len({ws_words})"
    pieces = rrep(d, "text", "([a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ])", "\\1\x1f")
    npieces = (f"size(filter(split({pieces}, '\x1f'), x -> length(x) > 0))"
               if d == SPARK else
               f"len(list_filter(string_split({pieces}, '\x1f'), "
               f"x -> length(x) > 0))")
    return f"""WITH pages AS (SELECT * FROM {pages_subquery(d)} p)
SELECT doc_id, lang,
       {nw} AS ws_tokens,
       {npieces} AS subword_pieces,
       length(text) AS n_chars
FROM pages"""


def q_doc_fingerprint(d: str) -> str:
    """Winnowing-style document fingerprinting: 4-gram word shingles,
    min md5 per window of 4 consecutive shingles -> distinct fingerprint
    set per doc (rolling-hash fingerprint family)."""
    # words bound below the explode (inlined split re-evaluates per
    # element inside interpreted HOF lambdas - see dedup.shingles, r4)
    words = split_arr(d, "text", " ")
    dw = (f"(SELECT doc_id, {words} AS w "
          f"FROM {scan_src(d, 'documents', 'doc_id')})")
    k, w = 4, 4
    if d == SPARK:
        sh_arr = (f"transform(sequence(0, greatest(size(w) - {k}, 0)), "
                  f"i -> md5(concat_ws(' ', slice(w, i + 1, {k}))))")
        sh = (f"(SELECT doc_id, pos, sh FROM {dw} dw "
              f"LATERAL VIEW posexplode({sh_arr}) t AS pos, sh)")
    else:
        sh_arr = (f"list_transform("
                  f"range(1, greatest(len(w) - {k} + 1, 1) + 1), "
                  f"i -> md5(array_to_string(w[i:i+{k - 1}], ' ')))")
        sh = (f"(SELECT doc_id, generate_subscripts({sh_arr}, 1) - 1 AS pos, "
              f"unnest({sh_arr}) AS sh FROM {dw} dw)")
    return f"""WITH shingles AS (SELECT * FROM {sh} s),
windows AS (
  SELECT doc_id, cast(floor(pos / {w}.0) AS int) AS win, min(sh) AS fingerprint
  FROM shingles GROUP BY doc_id, cast(floor(pos / {w}.0) AS int)
)
SELECT doc_id, fingerprint, count(*) AS n_windows
FROM windows GROUP BY doc_id, fingerprint"""


def q_union_segments(d: str) -> str:
    """U1 (pd.concat of per-segment frames, cc_corpus.py:377): union-all of
    two crawl segments with per-segment provenance, then per-segment/tld
    counts over the combined frame.

    The graded Spark side (_mq_union_segments) tag-unions the S2/S3 WET
    container-parse round-trip onto this template (r5): rows tagged
    wet_plain/wet_gz carry the parsed record counts and a 48-bit md5 row
    digest per rec_type, against hashlib-precomputed VALUES in the
    oracle - the only reference PIPELINE stage that previously had no
    CORRECTNESS row."""
    if d == SPARK:
        # every page lands in exactly one branch, so the 2-branch UNION
        # is a partition of geo_pages by doc_id parity - the single-pass
        # CASE tag computes the identical row set while planning
        # geo_pages (scan + host/tld regex chain) ONCE instead of twice
        # (r6 plan audit: 2 scans -> 1; DuckDB keeps the UNION form)
        return f"""WITH {geo_pages_cte(d)},
unioned AS (SELECT *, CASE WHEN doc_id % 2 = 0 THEN 'seg_a' ELSE 'seg_b' END
                        AS segment FROM geo_pages)
SELECT segment, tld, count(*) AS n_pages, count(DISTINCT domain) AS n_domains
FROM unioned GROUP BY segment, tld"""
    return f"""WITH {geo_pages_cte(d)},
seg_a AS (SELECT *, 'seg_a' AS segment FROM geo_pages WHERE doc_id % 2 = 0),
seg_b AS (SELECT *, 'seg_b' AS segment FROM geo_pages WHERE doc_id % 2 = 1),
unioned AS (SELECT * FROM seg_a UNION ALL SELECT * FROM seg_b)
SELECT segment, tld, count(*) AS n_pages, count(DISTINCT domain) AS n_domains
FROM unioned GROUP BY segment, tld"""


# --- WET-parse grading (r5): the S2/S3 container parser round-trip,
# folded into the union_segments slot (tag-union; generic columns carry
# rec_type in 'tld' and the row-digest sum in 'n_domains').  The records
# are LITERALS, so the oracle's expected digests are hashlib-precomputed
# from the very strings the segment bytes were built from: a matching
# sum proves sources.make_wet_bytes -> read_wet reproduced every
# url/timestamp/body byte-for-byte through the WARC framing (gzip and
# plain), Content-Length spanning internal CRLFs, multibyte UTF-8, and
# empty bodies included.

WET_DEMO_PLAIN = (
    ("https://www.alpha.co.jp/p1", "2024-01-15T00:00:01Z",
     "こんにちは世界 first line\nsecond line of page one"),
    ("https://beta.on.ca/p2", "2024-01-15T00:00:02Z",
     "body with an internal\r\nCRLF that Content-Length must span"),
    ("https://gamma.example.bd/p3", "2024-01-15T00:00:03Z", ""),
)
WET_DEMO_GZ = (
    ("https://delta.gov.uk/q1", "2024-02-01T12:30:00Z",
     "gzip segment page • non-ascii bullet and trailing space "),
    ("https://epsilon.com/q2", "2024-02-01T12:30:05Z",
     "  leading whitespace preserved"),
)
_WET_INFO_BODY = "software: ccspark-test\r\n"


def _wet_row_int(url, ts, text, rec_type) -> int:
    """48-bit md5 row int of one parsed WET record - hashlib HERE (the
    oracle side), Spark md5() on the module side."""
    import hashlib
    s = "|".join([url or "", ts or "", text, rec_type])
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:12], 16)


def _wet_expected_rows():
    rows = []
    for seg, recs in (("wet_gz", WET_DEMO_GZ),
                      ("wet_plain", WET_DEMO_PLAIN)):
        conv = sum(_wet_row_int(u, t, x, "conversion") for u, t, x in recs)
        rows.append((seg, "conversion", len(recs), conv))
        rows.append((seg, "warcinfo", 1,
                     _wet_row_int(None, None, _WET_INFO_BODY, "warcinfo")))
    return rows


def _wet_demo_glob() -> str:
    """Write the two synthetic segments (one plain, one gzipped) to a
    content-addressed tmp dir - same caching idea as the pages fixture:
    editing the record literals changes the address, so no stale
    reads."""
    import hashlib
    import os

    from ccspark import sources
    plain = sources.make_wet_bytes(WET_DEMO_PLAIN)
    gz = sources.make_wet_bytes(WET_DEMO_GZ, gzip_out=True)
    tag = hashlib.md5(plain + gz).hexdigest()[:12]
    d = f"/tmp/ccspark_wet_demo_{tag}"
    if not os.path.isdir(d):
        tmp = f"{d}.tmp{os.getpid()}"
        os.makedirs(tmp, exist_ok=True)
        with open(f"{tmp}/plain.wet", "wb") as f:
            f.write(plain)
        with open(f"{tmp}/gz.wet.gz", "wb") as f:
            f.write(gz)
        try:
            os.replace(tmp, d)
        except OSError:           # concurrent creator won the race
            import shutil
            shutil.rmtree(tmp, ignore_errors=True)
    # the directory itself, not dir/* - binaryFile reads every file in
    # it, and a literal path spares the noisy FileStreamSink glob probe
    return d


def _mq_union_segments(spark, sf_dir):
    """U1 template (its Spark rendering stays the parity anchor) + the
    WET container-parse round-trip branch (sources.make_wet_bytes ->
    read_wet with conversion_only=False so the warcinfo/F1 gate is
    value-graded too)."""
    from pyspark.sql import functions as F

    from ccspark import sources
    ensure_views(spark, sf_dir)
    base = spark.sql(q_union_segments(SPARK))
    pages = sources.read_wet(spark, _wet_demo_glob(),
                             conversion_only=False)
    dig = F.conv(F.substring(F.md5(F.concat_ws(
        "|", F.coalesce("url", F.lit("")),
        F.coalesce("warc_ts", F.lit("")),
        "text", "rec_type")), 1, 12), 16, 10).cast("bigint")
    wet = (pages
           .withColumn("segment",
                       F.when(F.col("segment").contains("plain"),
                              F.lit("wet_plain")).otherwise("wet_gz"))
           .withColumn("_ri", dig)
           .groupBy("segment", F.col("rec_type").alias("tld"))
           .agg(F.count("*").alias("n_pages"),
                F.sum("_ri").alias("n_domains")))
    return base.unionByName(wet)


def _union_segments_oracle() -> str:
    vals = ", ".join(f"('{s}', '{t}', {n}, {dig})"
                     for s, t, n, dig in _wet_expected_rows())
    return f"""{q_union_segments(DUCK)}
UNION ALL
SELECT segment, tld, cast(n_pages AS bigint) AS n_pages,
       cast(n_domains AS bigint) AS n_domains
FROM (VALUES {vals}) v(segment, tld, n_pages, n_domains)"""


def q_media_meta(d: str) -> str:
    """Multimodal metadata over binary media columns: byte size + magic
    sniff.  The html wrapper is synthesized identically in both engines
    (pages' html column in parquet is byte-identical - pytest covers the
    true-binary path; this oracle derives the bytes in-query since DuckDB
    cannot substring blobs).

    Every fixture page sniffs 'html', so the non-html arms were never
    graded - the template injects one payload per ASCII-expressible
    magic (GIF8, %PDF, RIFF - real container magics that happen to be
    valid UTF-8, mirroring multimodal.MAGIC) plus an unknown, so the
    sniff CASE is value-graded across classes (r4).  jpeg/png magics
    are NOT valid UTF-8 and cannot be derived in-query - those arms
    stay pytest-covered on true binaries (multimodal.media_meta)."""
    wrapped = "concat('<html><body>', text, '</body></html>')"
    if d == SPARK:
        size = "octet_length(encode(payload, 'UTF-8'))"
        magic = "upper(hex(encode(substring(payload, 1, 4), 'UTF-8')))"
    else:
        size = "octet_length(encode(payload))"
        magic = "upper(hex(encode(substring(payload, 1, 4))))"
    inject = " UNION ALL ".join(
        f"SELECT cast({i} AS bigint) AS doc_id, '{p}' AS payload"
        for i, p in ((-1, "GIF89a synthetic tiny gif"),
                     (-2, "%PDF-1.4 synthetic document"),
                     (-3, "RIFF....WAVEfmt synthetic audio"),
                     (-4, "PK zip-ish bytes sniff nothing")))
    return f"""WITH pages AS (SELECT * FROM {pages_subquery(d)} p),
media AS (
  SELECT doc_id, {wrapped} AS payload FROM pages
  UNION ALL
  {inject}
)
SELECT doc_id, {size} AS size_bytes, {magic} AS magic_hex,
       CASE WHEN {magic} IN ('3C68746D', '3C21444F') THEN 'html'
            WHEN {magic} = 'FFD8FFE0' THEN 'jpeg'
            WHEN {magic} = '47494638' THEN 'gif'
            WHEN {magic} = '25504446' THEN 'pdf'
            WHEN {magic} = '52494646' THEN 'riff'
            ELSE 'unknown' END AS media_type
FROM media"""


def q_metrics_rollup(d: str) -> str:
    """A8: ROLLUP over the lineage metrics hierarchy (region -> country) -
    subtotals + grand total in one pass (available free in both engines;
    the reference walked directory trees for the same numbers)."""
    return f"""WITH {verdict_lines_cte(d)}
SELECT coalesce(region, '(all)') AS region,
       coalesce(country, '(all)') AS country,
       count(*) AS lines_seen,
       cast(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS bigint) AS lines_kept
FROM verdicts GROUP BY ROLLUP (region, country)"""


def q_char_repetition(d: str) -> str:
    """north_star's character-repetition quality rule: per document, the
    longest run of the SAME consecutive token (gaps-and-islands over the
    exploded token sequence) and the distinct-token ratio; flag docs whose
    max run >= 4 or distinct ratio < 0.2 as repetition spam."""
    words = split_arr(d, "text", " ")
    if d == SPARK:
        toks = (f"(SELECT doc_id, pos + 1 AS pos, w "
                f"FROM {scan_src(d, 'documents', 'doc_id')} "
                f"LATERAL VIEW posexplode({words}) t AS pos, w)")
    else:
        toks = (f"(SELECT doc_id, generate_subscripts({words}, 1) AS pos, "
                f"unnest({words}) AS w FROM documents)")
    return f"""WITH toks AS (SELECT * FROM {toks} q WHERE length(w) > 0),
flagged AS (
  SELECT *, CASE WHEN w = lag(w) OVER (PARTITION BY doc_id ORDER BY pos)
                 THEN 0 ELSE 1 END AS brk
  FROM toks
),
runs AS (
  SELECT doc_id, w,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS run_id
  FROM flagged
),
run_lens AS (
  SELECT doc_id, run_id, count(*) AS run_len FROM runs
  GROUP BY doc_id, run_id
),
per_doc AS (
  SELECT r.doc_id, max(r.run_len) AS max_run
  FROM run_lens r GROUP BY r.doc_id
),
ratios AS (
  SELECT doc_id, count(DISTINCT w) * 1e0 / count(*) AS distinct_ratio
  FROM toks GROUP BY doc_id
)
SELECT p.doc_id, p.max_run, round(r.distinct_ratio, 4) AS distinct_ratio,
       CASE WHEN p.max_run >= 4 OR r.distinct_ratio < 0.2
            THEN 1 ELSE 0 END AS repetition_flag
FROM per_doc p JOIN ratios r ON p.doc_id = r.doc_id"""


def q_doc_exact_dedup(d: str) -> str:
    """D1 at document granularity over the raw documents table: exact
    dedup on md5(text) keeping the lowest doc_id, with duplicate-family
    sizes (the 'duplicate-line filter' generalized to whole docs).

    The fixture's 500 document texts are all distinct, so family_size
    was only ever 1 and the keep-first choice was never exercised by the
    grade - the template replays docs 0-4 under high ids (the recrawl
    shape) so five families of size 2 exist and the survivor choice
    (lowest id wins) is value-graded (r4)."""
    return """WITH aug AS (
  SELECT doc_id, lang, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, lang, text FROM documents
  WHERE doc_id < 5
),
keyed AS (
  SELECT doc_id, lang, md5(text) AS th FROM aug
),
fams AS (
  SELECT *, count(*) OVER (PARTITION BY th) AS family_size,
         row_number() OVER (PARTITION BY th ORDER BY doc_id) AS rn
  FROM keyed
)
SELECT doc_id, lang, th, family_size FROM fams WHERE rn = 1"""


# ----- general relational coverage (joins/aggs/windows the engine offers) --

def q_customers_without_orders(d: str) -> str:
    """Anti-join shape (J5 family): customers who never placed an URGENT
    order, by market segment (plain no-orders-at-all is vacuous on this
    data - every customer has orders)."""
    return """SELECT c.c_mktsegment, count(*) AS n_customers
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
GROUP BY c.c_mktsegment"""


def q_suppliers_of_large_parts(d: str) -> str:
    """Semi-join shape: suppliers in nations that have customers with
    account balance above 9000 (EXISTS over a correlated subquery)."""
    return """SELECT n.n_name, count(*) AS n_suppliers,
       round(sum(s.s_acctbal), 2) AS total_bal
FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE EXISTS (SELECT 1 FROM customer c
              WHERE c.c_nationkey = s.s_nationkey AND c.c_acctbal > 9000)
GROUP BY n.n_name"""


def q_monthly_order_stats(d: str) -> str:
    """Date bucketing + conditional aggregation over orders."""
    ym = ("date_format(o_orderdate, 'yyyy-MM')" if d == SPARK
          else "strftime(o_orderdate, '%Y-%m')")
    return f"""SELECT {ym} AS order_month,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS month_total,
       cast(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
            AS bigint) AS n_urgent
FROM orders GROUP BY {ym}"""


def q_tpch_pricing_summary(d: str) -> str:
    """TPC-H Q1 shape over lineitem: grouped aggregates w/ arithmetic."""
    return """SELECT l_returnflag, l_linestatus,
       sum(l_quantity) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 4) AS avg_qty,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= date '1998-09-02'
GROUP BY l_returnflag, l_linestatus"""


def q_top_customers_per_nation(d: str) -> str:
    """Join + window top-k: 3 highest-spending customers per nation."""
    return """WITH spend AS (
  SELECT c.c_custkey, c.c_name, n.n_name,
         round(sum(o.o_totalprice), 2) AS total_spend
  FROM customer c
  JOIN orders o ON o.o_custkey = c.c_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY c.c_custkey, c.c_name, n.n_name
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY n_name
                               ORDER BY total_spend DESC, c_custkey) AS rk
  FROM spend
)
SELECT n_name, c_custkey, c_name, total_spend, rk FROM ranked
WHERE rk <= 3"""


def q_relational_suite(d: str) -> str:
    """General relational coverage (J5 anti/semi/theta joins, U2
    INTERSECT/EXCEPT, W5 max-agg, W6 ranking windows, X11 date/math -
    TPC-H Q1 shape included), DIGEST-FOLDED into one graded query: the
    driver grades at most ~50 queries, so the six TPC-H-table
    demonstrations ride one slot.  Per sub-op the row emits (op, n_rows,
    digest) where digest = sum over rows of a 48-bit md5-derived integer
    of the canonical row rendering (strings verbatim, doubles pre-scaled
    by their rounding unit to EXACT integers so both engines hash
    identical bytes; 48-bit values keep the sum far from bigint overflow
    under Spark's ANSI mode).  Any value change in any sub-query flips
    its digest, so every op stays fully value-verified end-to-end while
    the graded surface stays within the driver's limit.  The folded
    sub-queries share no CTE, so the union costs nothing extra."""
    from ccspark.sqlgen import hex_to_bigint

    def cents(c: str) -> str:
        return f"cast(round({c} * 100) AS bigint)"

    subs = [
        ("tpch_pricing_summary", q_tpch_pricing_summary(d),
         ["l_returnflag", "l_linestatus", cents("sum_qty"),
          cents("sum_base_price"), cents("sum_disc_price"),
          "cast(round(avg_qty * 10000) AS bigint)", "count_order"]),
        ("repeat_buyers", q_repeat_buyers(d),
         ["custkey", cents("max_order"), "n_orders"]),
        ("customers_without_orders", q_customers_without_orders(d),
         ["c_mktsegment", "n_customers"]),
        ("suppliers_of_large_parts", q_suppliers_of_large_parts(d),
         ["n_name", "n_suppliers", cents("total_bal")]),
        ("monthly_order_stats", q_monthly_order_stats(d),
         ["order_month", "n_orders", cents("month_total"), "n_urgent"]),
        ("top_customers_per_nation", q_top_customers_per_nation(d),
         ["n_name", "c_custkey", "c_name", cents("total_spend"), "rk"]),
    ]
    parts = []
    for op, body, cols in subs:
        canon = ("concat_ws('|', "
                 + ", ".join(f"cast({c} AS STRING)" for c in cols) + ")")
        h = hex_to_bigint(d, f"substr(md5({canon}), 1, 12)")
        parts.append(
            f"SELECT '{op}' AS op, cast(count(*) AS bigint) AS n_rows,\n"
            f"       cast(sum({h}) AS bigint) AS digest\n"
            f"FROM ({body}) t")
    return "\nUNION ALL\n".join(parts)


def q_windowed_event_counts(d: str, minutes: int = 10) -> str:
    """Tumbling event-time windows (the batch rendering of
    streaming.windowed_event_counts): Spark ``window()`` vs DuckDB
    ``time_bucket()`` - both epoch-aligned - with boundaries exported as
    unix seconds (timestamps never cross the compared-output boundary,
    round-1 rule)."""
    if d == SPARK:
        ws = f"unix_timestamp(window(ts, '{minutes} minutes').start)"
    else:
        ws = (f"cast(floor(epoch(time_bucket(INTERVAL {minutes} minutes, "
              f"ts))) AS bigint)")
    return f"""SELECT {ws} AS window_start_s, event_type,
       count(*) AS n_events,
       round(sum(value), 2) AS total_value
FROM events GROUP BY {ws}, event_type"""


def q_events_sessionization(d: str) -> str:
    """Gaps-and-islands sessionization over the events stream table:
    a session breaks after > 30 min idle per user (epoch arithmetic -
    cross-engine-safe)."""
    ep = ("unix_timestamp(ts)" if d == SPARK
          else "cast(floor(epoch(ts)) AS bigint)")
    return f"""WITH ev AS (
  SELECT user_id, event_type, value, {ep} AS ets FROM events
),
flagged AS (
  SELECT *, CASE WHEN ets - lag(ets) OVER (PARTITION BY user_id
                                           ORDER BY ets, event_type) > 1800
                 THEN 1 ELSE 0 END AS new_session
  FROM ev
),
sessions AS (
  SELECT *, cast(sum(new_session) OVER (PARTITION BY user_id
                                        ORDER BY ets, event_type
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND
                                        CURRENT ROW) AS bigint) AS session_id
  FROM flagged
)
SELECT user_id, session_id, count(*) AS n_events,
       round(sum(value), 2) AS session_value,
       max(ets) - min(ets) AS duration_s
FROM sessions GROUP BY user_id, session_id"""


# ==========================================================================

QUERY_BUILDERS: dict[str, Callable[[str], str]] = {
    "corpus_lines": q_corpus_lines,
    "geo_pages": q_geo_pages,
    "cell_metrics": q_cell_metrics,
    "drop_reasons": q_drop_reasons,
    "dedup_keep_none": q_dedup_keep_none,
    "page_reassembly": q_page_reassembly,
    "domain_word_chunks": q_domain_word_chunks,
    "pii_scrub": q_pii_scrub,
    "url_filter_stats": q_url_filter_stats,
    "iso_join": q_iso_join,
    "country_cap": q_country_cap,
    "shard_assign": q_shard_assign,
    "langid_agreement": q_langid_agreement,
    "lid_ngram_sql": q_lid_ngram_sql,
    "str_hash_bitcompat": q_str_hash_bitcompat,
    "word_ngrams": q_word_ngrams,
    "url_normalize": q_url_normalize,
    "html_extract": q_html_extract,
    "gopher_quality": q_gopher_quality,
    "gopher_repetition": q_gopher_repetition,
    "c4_quality": q_c4_quality,
    "c4_span_dedup": q_c4_span_dedup,
    "quality_signals": q_quality_signals,
    "perplexity_outliers": q_perplexity_outliers,
    "minhash_pairs": q_minhash_pairs,
    "simhash": q_simhash,
    "knn_cosine": q_knn_cosine,
    # sign_lsh_suite moved to MODULE_QUERIES (r4): its third branch is
    # the end-to-end semantic dedup survivor set (connected components,
    # not SQL-expressible Spark-side)
    # token_stats now rides the token_suite module slot (tag-union with
    # the budget sampler, r4)
    "doc_fingerprint": q_doc_fingerprint,
    "union_segments": q_union_segments,
    "metrics_rollup": q_metrics_rollup,
    "char_repetition": q_char_repetition,
    "doc_exact_dedup": q_doc_exact_dedup,
    "media_meta": q_media_meta,
    # six TPC-H-table relational demos digest-folded into one graded
    # slot (see q_relational_suite) - each still fully value-verified
    "relational_suite": q_relational_suite,
    "events_sessionization": q_events_sessionization,
    "windowed_event_counts": q_windowed_event_counts,
}


def spark_query(name: str):
    """queries() entry: (spark, sf_dir) -> DataFrame."""
    def run(spark, sf_dir):
        # the driver runs these with ITS session: pin the confs the
        # templates assume (DuckDB's epoch() is UTC; timestamp arithmetic
        # must agree)
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        ensure_views(spark, sf_dir)
        return spark.sql(QUERY_BUILDERS[name](SPARK))
    run.__name__ = f"q_{name}"
    return run


def oracle_queries() -> dict[str, str]:
    out = {name: fn(DUCK) for name, fn in QUERY_BUILDERS.items()}
    out.update(MODULE_ORACLES)
    return out


# ==========================================================================
# Module-backed queries (applyInPandas / pandas-UDF / ML operators that are
# not ANSI-SQL-expressible; the driver records a rows-only check for them).

def _mq_greedy_domain_chunks(spark, sf_dir):
    """A3 exact greedy semantics (ccspark.chunker; SQL twin:
    domain_word_chunks)."""
    from ccspark import chunker, pipeline
    from ccspark.fixtures_sql import pages_spark
    pages = pages_spark(spark, sf_dir)
    geo = pipeline.with_geo(pages)
    return chunker.domain_samples(geo, chunksize=500)


def _greedy_chunks_oracle(chunk: int = CHUNK_WORDS_SF) -> str:
    """DuckDB-only RECURSIVE-CTE rendering of the reference's sequential
    greedy accumulator (deduplication.py:19-85): per domain, walk lines in
    (url, line-index) order carrying (count, text) state, emit on
    count > chunksize with reset, emit the stripped tail.  Spark 4 would
    execute each recursion level as a separate job, so the PRODUCTION
    side stays applyInPandas (ccspark.chunker) - but the ORACLE only
    needs DuckDB, which runs the recursion natively.  This makes the
    exact greedy semantics (not just its aggregate invariant)
    hash-verified."""
    d = DUCK
    wc = (r"len(list_filter(string_split_regex(replace(line, chr(13), "
          r"''), '\s+'), x -> x != ''))")
    return f"""WITH RECURSIVE {geo_pages_cte(d)},
lines AS (
  SELECT domain,
         row_number() OVER (PARTITION BY domain ORDER BY url, li) AS rn,
         replace(line, chr(13), '') AS line, {wc} AS w
  FROM (SELECT domain, url,
               generate_subscripts(string_split(text, chr(10)), 1) AS li,
               unnest(string_split(text, chr(10))) AS line
        FROM geo_pages)
),
nmax AS (SELECT domain, max(rn) AS mx FROM lines GROUP BY domain),
acc AS (
  SELECT domain, rn,
         CASE WHEN w > {chunk} THEN 1 ELSE 0 END AS cid,
         CASE WHEN w > {chunk} THEN 0 ELSE w END AS cnt,
         CASE WHEN w > {chunk} THEN '' ELSE line || ' ' END AS txt,
         CASE WHEN w > {chunk} THEN 0 END AS emit_cid,
         CASE WHEN w > {chunk} THEN w END AS emit_n,
         CASE WHEN w > {chunk} THEN line || ' ' END AS emit_txt
  FROM lines WHERE rn = 1
  UNION ALL
  SELECT l.domain, l.rn,
         CASE WHEN a.cnt + l.w > {chunk} THEN a.cid + 1 ELSE a.cid END,
         CASE WHEN a.cnt + l.w > {chunk} THEN 0 ELSE a.cnt + l.w END,
         CASE WHEN a.cnt + l.w > {chunk} THEN ''
              ELSE a.txt || l.line || ' ' END,
         CASE WHEN a.cnt + l.w > {chunk} THEN a.cid END,
         CASE WHEN a.cnt + l.w > {chunk} THEN a.cnt + l.w END,
         CASE WHEN a.cnt + l.w > {chunk} THEN a.txt || l.line || ' ' END
  FROM acc a JOIN lines l ON l.domain = a.domain AND l.rn = a.rn + 1
)
SELECT domain, cast(emit_cid AS int) AS chunk_id,
       cast(emit_n AS int) AS n_words, emit_txt AS text
FROM acc WHERE emit_n IS NOT NULL
UNION ALL
SELECT a.domain, cast(a.cid AS int), cast(a.cnt AS int), trim(a.txt)
FROM acc a JOIN nmax m ON m.domain = a.domain AND a.rn = m.mx
WHERE trim(a.txt) <> ''"""


def _mq_salted_domain_counts(spark, sf_dir):
    """Skew handling verified by value: the two-phase SALTED aggregation
    (skew.salted_counts - hot keys split across salt_n reducers, partials
    merged) must produce byte-identical counts to a plain GROUP BY, which
    is exactly what the DuckDB oracle runs."""
    from pyspark.sql import functions as F

    from ccspark import pipeline, skew
    from ccspark.fixtures_sql import pages_spark
    pages = pages_spark(spark, sf_dir)
    geo_pages = pipeline.with_geo(pages)
    out = skew.salted_counts(geo_pages, ["domain"], salt_n=16,
                             count_col="n_pages")
    return out.select("domain", F.col("n_pages").cast("long")
                      .alias("n_pages"))


def _salted_counts_oracle() -> str:
    return f"""WITH {geo_pages_cte(DUCK)}
SELECT domain, cast(count(*) AS bigint) AS n_pages
FROM geo_pages GROUP BY domain"""


def _mq_greedy_domain_totals(spark, sf_dir):
    """Aggregate-invariant check for the greedy chunker: runs the REAL
    applyInPandas accumulator, then aggregates per-domain word totals -
    hash-compared against q_greedy_domain_totals(DUCK), which recomputes
    the totals independently in SQL."""
    from pyspark.sql import functions as F

    from ccspark import chunker, pipeline
    from ccspark.fixtures_sql import pages_spark
    pages = pages_spark(spark, sf_dir)
    geo = pipeline.with_geo(pages)
    chunks = chunker.domain_samples(geo, chunksize=CHUNK_WORDS_SF)
    return (chunks.groupBy("domain")
            .agg(F.sum("n_words").cast("bigint").alias("total_words")))


def _mq_greedy_domain_suite(spark, sf_dir):
    """greedy_domain_chunks + greedy_domain_totals TAG-UNIONED into one
    graded slot (the sign_lsh_suite fold pattern; the freed slot went to
    ``decontamination``).  Zero verified values lost: branch 'chunks' is
    the full exact-greedy emission (every column), branch 'totals' the
    per-domain aggregate invariant, each still hash-compared against its
    original independent oracle (the DuckDB RECURSIVE accumulator and the
    raw-line word-total recount respectively, unioned the same way)."""
    from pyspark.sql import functions as F
    a = (_mq_greedy_domain_chunks(spark, sf_dir)
         .select(F.lit("chunks").alias("op"), "domain",
                 F.col("chunk_id").cast("bigint").alias("chunk_id"),
                 F.col("n_words").cast("bigint").alias("n_words"), "text"))
    b = (_mq_greedy_domain_totals(spark, sf_dir)
         .select(F.lit("totals").alias("op"), "domain",
                 F.lit(None).cast("bigint").alias("chunk_id"),
                 F.col("total_words").alias("n_words"),
                 F.lit(None).cast("string").alias("text")))
    return a.unionByName(b)


def _greedy_suite_oracle() -> str:
    return f"""SELECT 'chunks' AS op, domain,
       cast(chunk_id AS bigint) AS chunk_id,
       cast(n_words AS bigint) AS n_words, text
FROM ({_greedy_chunks_oracle()}) c
UNION ALL
SELECT 'totals' AS op, domain, cast(NULL AS bigint) AS chunk_id,
       total_words AS n_words, cast(NULL AS varchar) AS text
FROM ({q_greedy_domain_totals(DUCK)}) t"""


# ==========================================================================
# Benchmark decontamination (ccspark.decontam): the driver-graded pair.
# The benchmark is synthesized deterministically IN-QUERY from documents:
# every 29th doc with >= 16 normalized words contributes its words 4..16
# as one 13-gram "eval prompt" (so those docs are contaminated by
# construction, as is any doc sharing the same normalized span - the
# fixture's exact-duplicate docs exercise that path), plus one control
# prompt that can never match.

DECON_N = 13
DECON_BENCH_MOD = 29
_DECON_CONTROL = " ".join(f"zzdecon{i}" for i in range(DECON_N))

# char-gram branch (space-free-script protection, r5): every 31st doc
# with a long-enough normalized char stream contributes chars 8..27 as
# one 20-char "eval prompt" - contaminated by construction - plus a
# control that can never match.  20 chars ~ a 13-word span at CJK
# information density (decontam.DEFAULT_CHAR_N).
DECON_CHAR_N = 20
DECON_CHAR_BENCH_MOD = 31
_DECON_CHAR_CONTROL = "zqxjv" * 4          # exactly 20 normalized chars


def _decon_bench_sql(d: str) -> str:
    """Benchmark relation (one column ``text``) - rendered identically
    for the Spark module side and the DuckDB oracle side."""
    from ccspark import decontam as DC
    w = DC.norm_words(d, "text")
    if d == SPARK:
        sl = f"concat_ws(' ', slice({w}, 4, {DECON_N}))"
    else:
        sl = f"array_to_string({w}[4:{DECON_N + 3}], ' ')"
    from ccspark.sqlgen import arr_len
    return f"""SELECT DISTINCT gram AS text FROM (
  SELECT {sl} AS gram FROM documents
  WHERE doc_id % {DECON_BENCH_MOD} = 0 AND {arr_len(d, w)} >= {DECON_N + 3}
  UNION ALL SELECT '{_DECON_CONTROL}'
) b"""


def _decon_char_bench_sql(d: str) -> str:
    """Char-gram benchmark relation (one column ``text``) - rendered
    identically for the Spark module side and the DuckDB oracle side.
    Prompts are exactly DECON_CHAR_N normalized chars, so a prompt's
    char-gram set is the prompt itself (the word branch's 13-word
    prompts have the same property)."""
    from ccspark import decontam as DC
    cs = DC.char_stream(d, "text")
    lo = 8
    return f"""SELECT DISTINCT gram AS text FROM (
  SELECT substring({cs}, {lo}, {DECON_CHAR_N}) AS gram FROM documents
  WHERE doc_id % {DECON_CHAR_BENCH_MOD} = 0
    AND length({cs}) >= {lo + DECON_CHAR_N - 1}
  UNION ALL SELECT '{_DECON_CHAR_CONTROL}'
) b"""


def q_decontamination(d: str) -> str:
    """Benchmark decontamination as ONE dual-dialect tag-union: branch
    'word' = normalized word 13-gram overlap (GPT-3 appendix C / C4 /
    FineWeb hygiene rule); branch 'char' = normalized char 20-gram
    overlap (decontam.decontaminate_chars - the protection space-free
    scripts get, since CJK text normalizes to one word token and yields
    no word 13-grams; r5).  The DuckDB rendering is the driver oracle -
    it matches gram STRINGS, while the production module path
    (_mq_decontamination, the graded Spark side) matches xxhash64 hashes
    of the same grams: a green value-hash proves both broadcast-hash
    fast paths implement exactly the string-overlap semantics.  The
    Spark rendering of THIS template is the pytest parity anchor
    (tests/test_decontam.py asserts module == SQL, both branches)."""
    from ccspark import decontam as DC
    w = DC.norm_words(d, "text")
    grams = DC.gram_array(d, "w", DECON_N)
    cgrams = DC.char_gram_array(d, "cs", DECON_CHAR_N)
    if d == SPARK:
        ex = (f"SELECT doc_id, gram FROM docs "
              f"LATERAL VIEW explode({grams}) t AS gram")
        cex = (f"SELECT doc_id, gram FROM cdocs "
               f"LATERAL VIEW explode({cgrams}) t AS gram")
    else:
        ex = f"SELECT doc_id, unnest({grams}) AS gram FROM docs"
        cex = f"SELECT doc_id, unnest({cgrams}) AS gram FROM cdocs"
    return f"""WITH docs AS (SELECT doc_id, {w} AS w FROM documents),
cdocs AS (SELECT doc_id, {DC.char_stream(d, 'text')} AS cs FROM documents),
bench AS ({_decon_bench_sql(d)}),
cbench AS ({_decon_char_bench_sql(d)}),
doc_grams AS (SELECT DISTINCT doc_id, gram FROM ({ex}) g),
cdoc_grams AS (SELECT DISTINCT doc_id, gram FROM ({cex}) g),
hits AS (
  SELECT dg.doc_id, cast(count(*) AS bigint) AS n_hits
  FROM doc_grams dg JOIN bench b ON b.text = dg.gram
  GROUP BY dg.doc_id
),
chits AS (
  SELECT dg.doc_id, cast(count(*) AS bigint) AS n_hits
  FROM cdoc_grams dg JOIN cbench b ON b.text = dg.gram
  GROUP BY dg.doc_id
)
SELECT 'word' AS tag, d.doc_id, (h.doc_id IS NOT NULL) AS contaminated,
       cast(coalesce(h.n_hits, 0) AS bigint) AS n_hits
FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id
UNION ALL
SELECT 'char' AS tag, d.doc_id, (h.doc_id IS NOT NULL) AS contaminated,
       cast(coalesce(h.n_hits, 0) AS bigint) AS n_hits
FROM documents d LEFT JOIN chits h ON h.doc_id = d.doc_id"""


def _mq_decontamination(spark, sf_dir):
    """PRODUCTION decontamination path (ccspark.decontam.decontaminate):
    corpus-shuffle-free broadcast-hash overlap - gram hashes in one
    codegen projection, explode, BroadcastHashJoin vs the benchmark hash
    set, tiny count-distinct, broadcast rejoin.  Hash-compared against
    q_decontamination(DUCK), which recomputes the overlap on the raw
    gram strings."""
    from pyspark.sql import functions as F

    from ccspark import decontam as DC
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.createOrReplaceTempView("documents")
    bench = spark.sql(_decon_bench_sql(SPARK))
    cbench = spark.sql(_decon_char_bench_sql(SPARK))
    d2 = docs.select("doc_id", "text")
    word = (DC.decontaminate(d2, bench, n=DECON_N)
            .select(F.lit("word").alias("tag"), "doc_id", "contaminated",
                    F.col("n_hits")))
    chars = (DC.decontaminate_chars(d2, cbench, n=DECON_CHAR_N)
             .select(F.lit("char").alias("tag"), "doc_id", "contaminated",
                     F.col("n_char_hits").alias("n_hits")))
    return word.unionByName(chars)


# ==========================================================================
# Token accounting suite: token_stats + the deterministic token-budget
# sampler (ccspark.sampling, the training-data mixing operator) tag-unioned
# into one graded slot.  Generic columns (a, b, c) carry every original
# value: 'stats' = (ws_tokens, subword_pieces, n_chars); 'budget' =
# (weight, cum, kept as 0/1).

TOKEN_BUDGET = 1000  # per-lang token quota; fixture per-lang totals are
#                      ~4-5k, so the budget provably both keeps and prunes

# Mixture sampling (r5): one GLOBAL budget split across languages by
# target proportions.  en/de/fr budgets (3000/1200/1800 at these
# numbers) sit below the sf0.01 per-lang totals (~11.8k/3.5k/3.8k) so
# every named group both keeps and prunes; es/zh are absent -> budget 0,
# nothing kept - the 'kept' column takes both values per the vacuity
# audit.  The integer budgets are derived ONCE driver-side
# (sampling.derive_mixture_budgets) and inlined into both dialects so
# the engines cannot drift on float math.
MIXTURE_TOTAL = 6000
MIXTURE_PROPS = {"en": 0.5, "de": 0.2, "fr": 0.3}


def _mixture_budget_case() -> str:
    """CASE arm per named group from the SAME derivation the production
    module uses (identical in both SQL dialects)."""
    from ccspark.sampling import derive_mixture_budgets
    budgets = derive_mixture_budgets(MIXTURE_TOTAL, MIXTURE_PROPS)
    arms = " ".join(f"WHEN '{g}' THEN {b}"
                    for g, b in sorted(budgets.items()))
    return f"CASE lang {arms} ELSE 0 END"


def q_token_suite(d: str) -> str:
    """token_stats + sample_by_token_budget + sample_by_mixture as ONE
    dual-dialect statement.  The sampler branches pin the full
    greedy-prefix contract cross-engine: md5(lang:doc_id) hash order,
    inclusive running token sum, kept iff the budget was not exhausted
    BEFORE the doc (the boundary-crossing doc is included, every group
    with a positive budget keeps >= 1 doc).  The 'mixture' branch
    (r5) splits one global budget across languages by target
    proportions — its c column packs budget*2 + kept so the derived
    per-group budget is value-graded alongside the keep decision.  The
    graded Spark side runs the PRODUCTION modules
    (ccspark.sampling.sample_by_token_budget / sample_by_mixture) for
    these branches; this template's Spark rendering is the pytest
    parity anchor.  Both sampler branches ride ONE scan of the windowed
    budget subquery via a 2-row tag cross join (the budget/mixture rows
    differ only in which threshold gates `kept`) - never UNION the same
    expensive subquery per branch (CLAUDE.md: Spark re-plans it per
    branch)."""
    stats = q_token_stats(d)
    wc = ("size(filter(split(text, ' '), x -> x != ''))" if d == SPARK
          else "len(list_filter(string_split(text, ' '), x -> x != ''))")
    bud_case = _mixture_budget_case()
    budget = f"""WITH weighted AS (
  SELECT doc_id, lang, cast({wc} AS bigint) AS weight,
         md5(concat_ws(':', lang, doc_id)) AS ord
  FROM documents
),
cums AS (
  SELECT doc_id, lang, weight,
         sum(weight) OVER (PARTITION BY lang ORDER BY ord, doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND
                           CURRENT ROW) AS cum
  FROM weighted
)
SELECT doc_id, lang, weight, cast(cum AS bigint) AS cum,
       (CASE WHEN cum - weight < {TOKEN_BUDGET} THEN 1 ELSE 0 END) AS kept,
       ({bud_case}) AS bud
FROM cums"""
    return f"""SELECT 'stats' AS op, doc_id, lang,
       cast(ws_tokens AS bigint) AS a,
       cast(subword_pieces AS bigint) AS b,
       cast(n_chars AS bigint) AS c
FROM ({stats}) st
UNION ALL
SELECT t.op AS op, doc_id, lang,
       weight AS a, cum AS b,
       cast(CASE WHEN t.op = 'budget' THEN kept
            ELSE bud * 2 + (CASE WHEN cum - weight < bud THEN 1 ELSE 0 END)
            END AS bigint) AS c
FROM ({budget}) bu
CROSS JOIN (SELECT 'budget' AS op UNION ALL SELECT 'mixture') t"""


def _mq_token_suite(spark, sf_dir):
    """Graded Spark side: the 'stats' branch via the shared SQL template,
    the 'budget' branch via the PRODUCTION sampling module - so the
    driver hash-verifies ccspark.sampling end-to-end against the DuckDB
    recomputation."""
    from pyspark.sql import functions as F

    from ccspark import sampling
    ensure_views(spark, sf_dir)   # token_stats reads pages_src
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    stats = (spark.sql(q_token_stats(SPARK))
             .select(F.lit("stats").alias("op"), "doc_id", "lang",
                     F.col("ws_tokens").cast("bigint").alias("a"),
                     F.col("subword_pieces").cast("bigint").alias("b"),
                     F.col("n_chars").cast("bigint").alias("c")))
    samp = sampling.sample_by_token_budget(docs, TOKEN_BUDGET)
    b = samp.select(F.lit("budget").alias("op"), "doc_id", "lang",
                    F.col("weight").alias("a"), F.col("cum").alias("b"),
                    F.col("kept").cast("bigint").alias("c"))
    mix = sampling.sample_by_mixture(docs, MIXTURE_TOTAL, MIXTURE_PROPS)
    m = mix.select(F.lit("mixture").alias("op"), "doc_id", "lang",
                   F.col("weight").alias("a"), F.col("cum").alias("b"),
                   (F.col("budget") * 2
                    + F.col("kept").cast("bigint")).alias("c"))
    return stats.unionByName(b).unionByName(m)


def _mq_ivf_recall(spark, sf_dir):
    """Assertion query: query vectors where IVF at nprobe = n_lists (full
    probe) diverges from the exact brute-force kNN - expected EMPTY (the
    oracle is a typed empty relation, so any machinery bug - vectors lost
    at list boundaries, wrong rerank, unstable tie-breaks - fails the
    row-count compare).  Full probe MUST equal exact by construction; the
    driver embeddings are near-uniform noise (same-label neighbor
    fraction 0.13), so a partial-probe recall bar would measure the data,
    not the operator - the nprobe<n_lists recall >= 0.9 bar lives in
    pytest on genuinely clustered vectors (tests/test_similarity.py)."""
    from pyspark.sql import functions as F

    from ccspark import similarity
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    assigned, cents = similarity.build_ivf(emb, n_lists=8)
    q = emb.where(F.col("vec_id") < 20)
    exact = similarity.cosine_knn(emb, q, k=5)
    approx = similarity.ivf_knn(assigned, cents, q, k=5, nprobe=8)
    hits = (exact.join(approx, ["query_id", "neighbor_id"], "left_semi")
            .groupBy("query_id").agg(F.count("*").alias("n_hits")))
    recall = (exact.select("query_id").distinct()
              .join(hits, "query_id", "left")
              .select("query_id",
                      (F.coalesce(F.col("n_hits"), F.lit(0)) / F.lit(5.0))
                      .alias("recall")))
    return recall.where(F.col("recall") < 1.0)


def _mq_training_corpus(spark, sf_dir):
    """The PRODUCTION composite (api facade: Gopher+C4 doc gates ->
    pandas-UDF kernel pipeline -> dedup -> PII scrub), hash-compared
    against the one-statement SQL twin q_training_corpus(DUCK)."""
    from ccspark.api import CCSparkCorpus
    from ccspark.fixtures_sql import pages_spark
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    pages = pages_spark(spark, sf_dir)
    cc = CCSparkCorpus(spark)
    out = cc.build_training_corpus(
        pages, gopher_thresholds=TRAINING_GOPHER_TH)
    return out.select("domain", "tld", "country", "region", "url",
                      "line_id", "text")


def _mq_training_corpus_domgate(spark, sf_dir):
    """The PRODUCTION facade with the wholesale domain gate on
    (broadcast-semi rejoin of the surviving domains), hash-compared
    against the one-statement twin q_training_corpus_domgate(DUCK)."""
    from ccspark.api import CCSparkCorpus
    from ccspark.fixtures_sql import pages_spark
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    pages = pages_spark(spark, sf_dir)
    cc = CCSparkCorpus(spark)
    out = cc.build_training_corpus(
        pages, gopher_thresholds=TRAINING_GOPHER_TH,
        domain_min_keep=DOMGATE_MIN_KEEP)
    return out.select("domain", "tld", "country", "region", "url",
                      "line_id", "text")


def _mq_pq_recall(spark, sf_dir):
    """Assertion query for product quantization: PQ-shortlist(100) +
    exact-rerank recall@5 vs brute-force kNN.  Emits query vectors with
    recall < 0.2 OR everything when the mean drops below 0.8 - expected
    EMPTY.  Any real machinery bug (misaligned subspace codes, wrong
    lookup axis, broken rerank join) craters recall to ~0, so the empty
    oracle catches it; the tight bar (recall == 1.0 on clustered vectors
    at shortlist=50) lives in pytest - the fixture embeddings are
    near-uniform noise where per-query recall is data-limited (observed
    min 0.4, mean 0.93)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from ccspark import similarity
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    codes, books = similarity.build_pq(emb, m=8, nbits=4)
    q = emb.where(F.col("vec_id") < 20)
    exact = similarity.cosine_knn(emb, q, k=5)
    approx = similarity.pq_knn(codes, books, q, k=5,
                               rerank_with=emb, shortlist=100)
    hits = (exact.join(approx, ["query_id", "neighbor_id"], "left_semi")
            .groupBy("query_id").agg(F.count("*").alias("n_hits")))
    recall = (exact.select("query_id").distinct()
              .join(hits, "query_id", "left")
              .select("query_id",
                      (F.coalesce(F.col("n_hits"), F.lit(0)) / F.lit(5.0))
                      .alias("recall")))
    mean = F.avg("recall").over(Window.partitionBy())
    return (recall.withColumn("_mean", mean)
            .where((F.col("recall") < 0.2) | (F.col("_mean") < 0.8))
            .drop("_mean"))


def _mq_ann_recall(spark, sf_dir):
    """ivf_recall + pq_recall + the FULL-PROBE IVF output folded into ONE
    graded query.  Three branches, tagged by op:

      * 'ivf'/'pq' - the r2 assertion branches (expected EMPTY: query
        vectors where full-probe IVF / PQ+rerank diverge from exact kNN;
        neighbor_id is NULL, val carries the sub-1.0 recall);
      * 'ivf_knn' - the r3 verdict item 3 upgrade: the ACTUAL output of
        similarity.ivf_knn at nprobe == n_lists, VALUE-hashed against the
        brute-force SQL twin.  Full probe is provably exact (every vector
        sits in exactly one probed list, and all lists are probed), so
        the oracle predicts the IVF path's (query, neighbor, cosine)
        rows exactly - the k-means build, list assignment, probe fan-out
        and rerank are all on the hash path now, not rows-only.  round4 +
        rank-on-rounded keeps rank ties cross-engine deterministic
        (q_knn_cosine pattern)."""
    from pyspark.sql import functions as F

    from ccspark import similarity
    nullb = F.lit(None).cast("bigint")
    a = (_mq_ivf_recall(spark, sf_dir)
         .select(F.lit("ivf").alias("op"),
                 F.col("query_id").cast("bigint").alias("query_id"),
                 nullb.alias("neighbor_id"),
                 F.col("recall").alias("val")))
    b = (_mq_pq_recall(spark, sf_dir)
         .select(F.lit("pq").alias("op"),
                 F.col("query_id").cast("bigint").alias("query_id"),
                 nullb.alias("neighbor_id"),
                 F.col("recall").alias("val")))
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    assigned, cents = similarity.build_ivf(emb, n_lists=8)
    q = emb.where(F.col("vec_id") < 3)
    full = similarity.ivf_knn(assigned, cents, q, k=5, nprobe=8,
                              round_digits=4)
    c = full.select(F.lit("ivf_knn").alias("op"),
                    F.col("query_id").cast("bigint").alias("query_id"),
                    F.col("neighbor_id").cast("bigint").alias("neighbor_id"),
                    F.col("cosine").alias("val"))
    return a.unionByName(b).unionByName(c)


def _ann_recall_oracle() -> str:
    """Typed-empty assertion branches UNION the brute-force prediction of
    the full-probe IVF branch (see _mq_ann_recall)."""
    cos = ("round(list_cosine_similarity(a.embedding::DOUBLE[], "
           "b.embedding::DOUBLE[]), 4)")
    return f"""SELECT cast(NULL AS varchar) AS op,
       cast(NULL AS bigint) AS query_id,
       cast(NULL AS bigint) AS neighbor_id,
       cast(NULL AS double) AS val WHERE false
UNION ALL
SELECT 'ivf_knn' AS op, query_id, neighbor_id, cosine AS val
FROM (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, {cos} AS cosine,
         row_number() OVER (PARTITION BY a.vec_id
                            ORDER BY {cos} DESC, b.vec_id) AS rk
  FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
  WHERE a.vec_id < 3
) ranked WHERE rk <= 5"""


_ANN_RECALL_ORACLE = _ann_recall_oracle()


INCR_NEAR_TH = 0.9


def _mq_incremental_dedup(spark, sf_dir):
    """Cross-crawl incremental dedup, TAG-UNION of the two production
    screens so both are value-graded in one slot (r4): 'new crawl' =
    docs 250..499 plus a replay of docs 0..49 (the re-fetched pages
    every real crawl contains); 'history' = docs 0..249.

      exact - dedup.incremental_new_rows: anti-join on the text hash.
      near  - dedup.incremental_near_dups: the new crawl screened
              against history's MINHASH SIGNATURE TABLE
              (dedup.minhash_signature_table, md5 family so the oracle
              can recompute it) - near-dups of history (estimate >=
              INCR_NEAR_TH) drop even when the bytes differ.  On this
              fixture the near branch screens genuinely more than the
              exact one (cross-boundary near-dup pairs at est 0.92-1.0),
              so the two branches differ.

    The oracle recomputes both in SQL: the anti-join, and the full
    signature/banding/agreement pipeline over the same shingle
    rendering (_minhash_shingles, shared with the minhash template)."""
    from pyspark.sql import functions as F

    from ccspark import dedup
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    hist = docs.where("doc_id < 250")
    new = (docs.where("doc_id >= 250")
           .unionByName(docs.where("doc_id < 50")))
    exact = dedup.incremental_new_rows(
        new.select("doc_id", F.md5("text").alias("hash")),
        hist.select(F.md5("text").alias("hash")), key="hash")
    hist_sig = dedup.minhash_signature_table(hist, num_hashes=12,
                                             hash_family="md5")
    near = (dedup.incremental_near_dups(new, hist_sig,
                                        threshold=INCR_NEAR_TH,
                                        bands=4, hash_family="md5")
            .select("doc_id", F.md5("text").alias("hash")))
    return (exact.select(F.lit("exact").alias("path"), "doc_id", "hash")
            .unionByName(
                near.select(F.lit("near").alias("path"), "doc_id",
                            "hash")))


def _incremental_dedup_oracle() -> str:
    P = _MINHASH_P
    h32 = hex_to_bigint(DUCK, "substr(md5(shingle), 1, 7)")
    mins = ", ".join(f"min(({a} * h + {b}) % {P}) AS m{i}"
                     for i, (a, b) in enumerate(_MINHASH_AB))
    digest = lambda lo: ("md5(concat(" + ", ".join(
        f"m{j}" if j == lo + 2 else f"m{j}, ','"
        for j in range(lo, lo + 3)) + "))")
    arr_d = "[" + ", ".join(digest(bi * 3) for bi in range(4)) + "]"
    agree = " + ".join(
        f"(CASE WHEN n.m{i} = h.m{i} THEN 1 ELSE 0 END)"
        for i in range(12))
    mcols = ", ".join(f"m{i}" for i in range(12))

    def sig(tag: str, src: str) -> str:
        sh = _minhash_shingles(DUCK, src=src)
        return f"""sh_{tag} AS (SELECT doc_id, shingle FROM {sh} q),
hashed_{tag} AS (
  SELECT doc_id, {h32} AS h FROM sh_{tag} WHERE length(shingle) > 0
),
sig_{tag} AS (SELECT doc_id, {mins} FROM hashed_{tag} GROUP BY doc_id),
dig_{tag} AS (
  SELECT doc_id, {mcols}, unnest({arr_d}) AS digest FROM sig_{tag}
)"""

    return f"""WITH hist_rows AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 250
),
new_rows AS (
  SELECT doc_id, text FROM documents WHERE doc_id >= 250
  UNION ALL
  SELECT doc_id, text FROM documents WHERE doc_id < 50
),
{sig("h", "hist_rows")},
{sig("n", "new_rows")},
matched AS (
  SELECT DISTINCT n.doc_id
  FROM dig_n n JOIN dig_h h ON n.digest = h.digest
  WHERE ({agree}) * 1e0 / 12 >= {INCR_NEAR_TH}
)
SELECT 'exact' AS path, n.doc_id, md5(n.text) AS hash FROM new_rows n
WHERE NOT EXISTS (SELECT 1 FROM hist_rows h
                  WHERE md5(h.text) = md5(n.text))
UNION ALL
SELECT 'near' AS path, n.doc_id, md5(n.text) AS hash FROM new_rows n
WHERE NOT EXISTS (SELECT 1 FROM matched m WHERE m.doc_id = n.doc_id)"""


_INCREMENTAL_DEDUP_ORACLE = _incremental_dedup_oracle()


# standalone domain_quality rollup threshold: above the language-
# blind gate's weakest fixture domain (0.875) so the verdict prunes
DQ_MIN_KEEP = 0.9


def _mq_domain_quality(spark, sf_dir):
    """Domain-level quality rollup (quality.domain_quality over the REAL
    gopher_quality operator): per-domain page counts, gopher keep
    fraction, mean signals, and the wholesale domain verdict - the oracle
    recomputes the rollup from the shared signal fragments in SQL.
    Threshold DQ_MIN_KEEP (0.9 - the language-BLIND gate this rollup
    uses is gentler than the domgate's lang-aware one; its weakest
    fixture domain sits at 0.875) so domain_keep is graded in BOTH
    directions - at the old 0.5 every domain passed and the verdict was
    vacuous (r4)."""
    from ccspark import pipeline, quality
    from ccspark.fixtures_sql import pages_spark
    pages = pages_spark(spark, sf_dir)
    geo_pages = pipeline.with_geo(pages)
    return quality.domain_quality(geo_pages, min_keep_frac=DQ_MIN_KEEP)


def _domain_quality_oracle() -> str:
    from ccspark.quality import gopher_keep_expr, gopher_signal_exprs
    s = gopher_signal_exprs(DUCK, "text")
    keep = gopher_keep_expr(DUCK, "text")
    return f"""WITH {geo_pages_cte(DUCK)},
sig AS (
  SELECT domain, {s['mean_word_len']} AS mwl,
         {s['dup_line_frac']} AS dlf,
         (CASE WHEN {keep} THEN 1e0 ELSE 0e0 END) AS kept
  FROM geo_pages
)
SELECT domain, cast(count(*) AS bigint) AS n_pages,
       round(avg(kept), 4) AS keep_frac,
       round(sum(cast(round(mwl * 10000) AS bigint)) * 1e0
             / (count(*) * 10000e0), 4) AS avg_word_len,
       round(sum(cast(round(dlf * 10000) AS bigint)) * 1e0
             / (count(*) * 10000e0), 4) AS avg_dup_line_frac,
       (round(avg(kept), 4) >= {DQ_MIN_KEEP}) AS domain_keep
FROM sig GROUP BY domain"""


def q_gopher_quality_ml(d: str) -> str:
    """LANGUAGE-AWARE Gopher gate (per-row stopword sets from the lang
    column, CJK-char word counting and token-shape-gate bypass for
    space-free scripts) over the multilingual pages fixture - the r2
    verdict's headline hole: a language-blind gate structurally drops
    every valid CJK page and demands English stopwords of German ones.
    The fixture carries genuine zh/ja/ko/de/es/fr content, so each path
    is value-verified, not just typed."""
    from ccspark.quality import gopher_keep_ml_expr, gopher_signal_exprs_ml
    sig = gopher_signal_exprs_ml(d, "text", "lang")
    cols = ",\n       ".join(f"{e} AS {name}" for name, e in sig.items())
    keep = gopher_keep_ml_expr(d, "text", "lang")
    return f"""WITH pages AS (SELECT * FROM {pages_subquery(d)} p)
SELECT doc_id, lang,
       {cols},
       {keep} AS gopher_keep
FROM pages"""


def _mq_gopher_quality_ml(spark, sf_dir):
    """The language-aware doc gate with the keep verdict computed by the
    PRODUCTION vectorized pandas-UDF path (quality.make_gopher_keep_ml_udf
    via gopher_quality(lang_col=..., engine='udf')); signals come from the
    shared SQL fragments.  The DuckDB twin recomputes keep from the pure
    SQL rendering, so a green hash verifies the production UDF against an
    independent engine row-for-row (same pattern as lid_ngram)."""
    from ccspark import quality
    from ccspark.fixtures_sql import pages_spark
    from ccspark.quality import gopher_signal_exprs_ml
    from ccspark.sqlgen import SPARK as _S
    pages = pages_spark(spark, sf_dir)
    out = quality.gopher_quality(pages, lang_col="lang", engine="udf")
    sig_names = list(gopher_signal_exprs_ml(_S).keys())
    return out.select("doc_id", "lang", *sig_names, "gopher_keep")


def _mq_lid_ngram(spark, sf_dir):
    """M1: trainable char-n-gram LID served via Iterator pandas UDF
    (deterministic: seeded counts, pinned vocab order)."""
    from ccspark import lid
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    model = lid.train(docs, n=3, top_k=1000)
    return (lid.predict(spark, docs, model)
            .select("doc_id", "lang", "lang_pred"))


def _mq_ivf_ann(spark, sf_dir):
    """IVF approximate nearest neighbors (seeded k-means quantizer)."""
    from ccspark import similarity
    from pyspark.sql import functions as F
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    assigned, cents = similarity.build_ivf(emb, n_lists=8)
    q = emb.where(F.col("vec_id") < 3)
    return similarity.ivf_knn(assigned, cents, q, k=5, nprobe=3)


# near-dup removal threshold: fraction of the 12 minhashes agreeing.
# The fixture's candidate estimates are exactly {0.8333, 0.9167, 1.0};
# 0.95 PROVABLY both prunes (the 0.83/0.92 edges) and keeps (the 1.0
# edges) - a threshold below 0.83 would be vacuous (every candidate
# kept), and 0.95 sits safely away from the k/12 rounding boundaries so
# the unrounded Spark estimate and the round4 oracle estimate agree on
# every verdict.
NEAR_DUP_TH = 0.95


def _mq_near_dup_removal(spark, sf_dir):
    """END-TO-END near-duplicate removal (r3 verdict item 6: pairs alone
    don't dedup anything), TAG-UNION of the two production variants so
    both are value-graded in one slot (r4):

      est - dedup.near_dup_clusters thresholding the minhash ESTIMATE:
            signatures, LSH banding, candidate pairs, threshold gate,
            iterative min-label connected components.
      ver - the same with verify_exact=True: the EXACT k-gram Jaccard
            of every LSH candidate pair (dedup.jaccard_on_candidates)
            is computed and thresholded instead of the estimate.  On
            this fixture the two genuinely differ: the 12-hash estimate
            has false negatives (true-0.96 pairs estimating 0.83-0.92),
            so the verified branch clusters pairs the estimate misses.

    The DuckDB twin recomputes both independently: the pairs SQL
    (minhash_pairs' own template), an exact-Jaccard CTE over the SAME
    shingle rendering (_minhash_shingles - shared so they can't drift),
    and a RECURSIVE transitive closure per branch; the hash verifies
    cluster assignment AND canonical choice value-for-value for both
    paths."""
    from pyspark.sql import functions as F

    from ccspark import dedup
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    est = dedup.near_dup_clusters(docs, threshold=NEAR_DUP_TH,
                                  num_hashes=12, bands=4)
    ver = dedup.near_dup_clusters(docs, threshold=NEAR_DUP_TH,
                                  num_hashes=12, bands=4,
                                  verify_exact=True)
    cols = ["doc_id", "cluster_id", "survivor"]
    return (est.select(F.lit("est").alias("path"), *cols)
            .unionByName(ver.select(F.lit("ver").alias("path"), *cols)))


def _near_dup_oracle() -> str:
    pairs_sql = q_minhash_pairs(DUCK)
    sh = _minhash_shingles(DUCK)

    def closure(tag: str, tp: str) -> str:
        return f"""edges_{tag} AS (
  SELECT doc_a AS s, doc_b AS t FROM {tp}
  UNION
  SELECT doc_b AS s, doc_a AS t FROM {tp}
),
reach_{tag}(s, t) AS (
  SELECT s, t FROM edges_{tag}
  UNION
  SELECT r.s, e.t FROM reach_{tag} r JOIN edges_{tag} e ON r.t = e.s
)"""

    def select(tag: str) -> str:
        return f"""SELECT '{tag}' AS path, s AS doc_id,
       least(min(t), s) AS cluster_id,
       (least(min(t), s) = s) AS survivor
FROM reach_{tag} GROUP BY s"""

    return f"""WITH RECURSIVE base AS ({pairs_sql}),
sh AS (SELECT doc_id, shingle FROM {sh} q),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS common
  FROM base c
  JOIN sh a ON a.doc_id = c.doc_a
  JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
  GROUP BY c.doc_a, c.doc_b
),
exact AS (
  SELECT c.doc_a, c.doc_b,
         coalesce(i.common, 0) * 1e0
         / (na.n + nb.n - coalesce(i.common, 0)) AS j
  FROM base c
  LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
  JOIN sizes na ON na.doc_id = c.doc_a
  JOIN sizes nb ON nb.doc_id = c.doc_b
),
tp_est AS (SELECT doc_a, doc_b FROM base WHERE jaccard_est >= {NEAR_DUP_TH}),
tp_ver AS (SELECT doc_a, doc_b FROM exact WHERE j >= {NEAR_DUP_TH}),
{closure("est", "tp_est")},
{closure("ver", "tp_ver")}
{select("est")}
UNION ALL
{select("ver")}"""


def _mq_sign_lsh_suite(spark, sf_dir):
    """sign_lsh_suite = ann_sign_lsh + embedding_near_dups (the shared
    SQL template, unchanged) + a third 'survivor' tag branch (r4): the
    END-TO-END semantic near-dup removal output
    (similarity.dedup_near_embeddings - sign-LSH pairs at EMB_ND_TH ->
    connected components -> keep cluster minima + singletons).  The
    module path shares the template's exact pair semantics (same dims,
    double cast, round(,4), threshold), so the DuckDB twin can recompute
    the survivor set independently via a RECURSIVE transitive closure
    over ITS OWN rendering of the pairs."""
    from pyspark.sql import functions as F

    from ccspark import similarity
    ensure_views(spark, sf_dir)
    base = spark.sql(q_sign_lsh_suite(SPARK))
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # pre_exact=False pins the graded branch to the direct-path parity
    # anchor (plan bit-stability, the country_cap/window pattern); the
    # facade/bench default is pre_exact=True since r6
    surv = similarity.dedup_near_embeddings(emb, threshold=EMB_ND_TH,
                                            pre_exact=False)
    branch = surv.select(
        F.lit("survivor").alias("op"),
        F.col("vec_id").alias("id_a"),
        F.lit(None).cast("bigint").alias("id_b"),
        F.col("label").cast("string").alias("tag"),
        F.lit(None).cast("double").alias("cosine"),
        F.lit(None).cast("bigint").alias("rk"))
    return base.unionByName(branch)


def _sign_lsh_suite_oracle() -> str:
    nd = q_embedding_near_dups(DUCK)
    return f"""WITH RECURSIVE nd AS ({nd}),
edges AS (
  SELECT vec_a AS s, vec_b AS t FROM nd
  UNION
  SELECT vec_b AS s, vec_a AS t FROM nd
),
reach(s, t) AS (
  SELECT s, t FROM edges
  UNION
  SELECT r.s, e.t FROM reach r JOIN edges e ON r.t = e.s
),
losers AS (
  SELECT s FROM reach GROUP BY s HAVING least(min(t), s) <> s
)
{q_sign_lsh_suite(DUCK)}
UNION ALL
SELECT 'survivor' AS op, vec_id AS id_a, cast(NULL AS bigint) AS id_b,
       cast(label AS varchar) AS tag, cast(NULL AS double) AS cosine,
       cast(NULL AS bigint) AS rk
FROM embeddings e
WHERE NOT EXISTS (SELECT 1 FROM losers l WHERE l.s = e.vec_id)"""


def _mq_dual_lid_agreement(spark, sf_dir):
    """M2: dual trained models + expected-lang conjunction filter."""
    from ccspark import lid
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    m2 = lid.train(docs, n=2, top_k=600)
    m3 = lid.train(docs, n=3, top_k=1000)
    return (lid.agreement_filter(spark, docs, m2, m3, min_len=50)
            .select("doc_id", "lang", "lid_a", "lid_b"))


# Ordered by grading priority: the production-UDF paths (training
# composite, lang-aware gate, LID) lead; the one rows-only query
# (ivf_ann, k-means - its full-probe==exact sibling IS oracled inside
# ann_recall) is last so a driver cap can only ever skip it.
MODULE_QUERIES = {
    "training_corpus": _mq_training_corpus,
    "training_corpus_domgate": _mq_training_corpus_domgate,
    "gopher_quality_ml": _mq_gopher_quality_ml,
    "lid_ngram": _mq_lid_ngram,
    "dual_lid_agreement": _mq_dual_lid_agreement,
    "ann_recall": _mq_ann_recall,
    # chunks + totals tag-unioned into one slot (r4); the freed slot is
    # the decontamination operator, fully value-graded
    "greedy_domain_suite": _mq_greedy_domain_suite,
    "decontamination": _mq_decontamination,
    # U1 union + the WET container-parse round-trip (r5 tag-union): the
    # S2/S3 parser gets a value-graded CORRECTNESS row
    "union_segments": _mq_union_segments,
    # token_stats + the production token-budget sampler (r4 tag-union;
    # the freed builder slot keeps the surface at exactly 50 oracled)
    "token_suite": _mq_token_suite,
    "salted_domain_counts": _mq_salted_domain_counts,
    "incremental_dedup": _mq_incremental_dedup,
    "domain_quality": _mq_domain_quality,
    "near_dup_removal": _mq_near_dup_removal,
    # ann + embedding near-dup pairs (shared template) + the end-to-end
    # semantic-dedup survivor branch (r4)
    "sign_lsh_suite": _mq_sign_lsh_suite,
    "ivf_ann": _mq_ivf_ann,
}

# Module-backed Spark queries that still have a DuckDB oracle: the Spark
# side runs real pandas-UDF/ML operators, the oracle recomputes an
# invariant of their output in SQL (driver hash-compares as usual).
MODULE_ORACLES = {
    "training_corpus": q_training_corpus(DUCK),
    "training_corpus_domgate": q_training_corpus_domgate(DUCK),
    # the Iterator-UDF LID path is prediction-identical to the SQL twin
    # (tests/test_lid.py asserts it), so the twin IS its oracle: the
    # PRODUCTION pandas-UDF scorer gets hash-compared against DuckDB
    "lid_ngram": q_lid_ngram_sql(DUCK),
    "dual_lid_agreement": q_dual_lid_agreement(DUCK),
    "gopher_quality_ml": q_gopher_quality_ml(DUCK),
    "ann_recall": _ANN_RECALL_ORACLE,
    "greedy_domain_suite": _greedy_suite_oracle(),
    "decontamination": q_decontamination(DUCK),
    "union_segments": _union_segments_oracle(),
    "token_suite": q_token_suite(DUCK),
    "salted_domain_counts": _salted_counts_oracle(),
    "incremental_dedup": _INCREMENTAL_DEDUP_ORACLE,
    "domain_quality": _domain_quality_oracle(),
    "near_dup_removal": _near_dup_oracle(),
    "sign_lsh_suite": _sign_lsh_suite_oracle(),
}
