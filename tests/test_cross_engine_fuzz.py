"""Cross-engine fuzz: the dual-dialect expression operators must produce
IDENTICAL output on adversarial inputs in Spark (Java regex) and DuckDB
(RE2) - the class of bug the driver gate would only catch if a fixture
happened to contain the divergent input.  Deterministic seeded corpus,
batched through ONE query per engine."""

from __future__ import annotations

import random

from ccspark import geo, sources
from ccspark.sqlgen import DUCK, SPARK

URL_ATOMS = [
    "\n", "http://", "https://", "HTTPS://", "ftp://", "", "user:pw@",
    "WWW.",
    "example", ".co.uk", ".de", ".com", ".bd", ".kawasaki.jp", ":8080",
    ":443", ":80", "/path", "/Path/Case", "/", "?", "?utm_source=x",
    "&utm_medium=y", "&keep=1", "&gclid=9", "#frag", "#", "..", "a b",
    "%20", "?&", "&&", "?utm_term=", "xn--bcher-kva",
]

HTML_ATOMS = [
    "<p>", "</p>", "<div>", "</div>", "<br>", "<br/>", "<BR >", "text",
    "more words", "<script>", "</script>", "<script>var x=1<2;</script>",
    "<style>a{}</style>", "<!-- c -->", "<!--", "-->", "&amp;", "&lt;",
    "&gt;", "&#39;", "&nbsp;", "&quot;", "<b>bold</b>", "< notatag",
    ">", "<", "\n", "\t", "  ", "<h1>T</h1>", "<title>t</title>",
    "<ScRiPt>x</sCrIpT>", "é", "中文",
]


def synth(atoms, n, seed, max_parts=8):
    rng = random.Random(seed)
    return ["".join(rng.choices(atoms, k=rng.randint(1, max_parts)))
            for _ in range(n)]


def run_both(spark, duck, expr_fn, inputs):
    rows = [(i, s) for i, s in enumerate(inputs)]
    sdf = spark.createDataFrame(rows, "i int, u string")
    sdf.createOrReplaceTempView("fuzz_in")
    got_s = dict(spark.sql(
        f"SELECT i, {expr_fn(SPARK, 'u')} FROM fuzz_in").collect())
    duck.execute("CREATE OR REPLACE TABLE fuzz_in AS "
                 "SELECT * FROM (VALUES (0, '')) t(i, u) WHERE false")
    duck.executemany("INSERT INTO fuzz_in VALUES (?, ?)", rows)
    got_d = dict(duck.sql(
        f"SELECT i, {expr_fn(DUCK, 'u')} FROM fuzz_in").fetchall())
    bad = [(inputs[i], got_s[i], got_d[i]) for i in got_s
           if got_s[i] != got_d[i]]
    assert not bad, bad[:3]


def test_fuzz_normalize_url(spark, duck):
    run_both(spark, duck, geo.normalize_url_expr,
             synth(URL_ATOMS, 300, seed=101))


def test_fuzz_domain_and_tld(spark, duck):
    hosts = synth(["www.", "a.", "b-c.", "x", "co.", "gov.", "uk", "de",
                   "bd", "ck", "kawasaki.jp", "sch.uk", ".", "..",
                   "xn--p1ai", "127.0.0.1", ""], 300, seed=202,
                  max_parts=5)

    def both(d, col):
        return f"concat({geo.tld_expr(d, col)}, '|', " \
               f"{geo.domain_expr(d, col)})"
    run_both(spark, duck, both, hosts)


def test_fuzz_html_to_text(spark, duck):
    run_both(spark, duck, sources.html_to_text_expr,
             synth(HTML_ATOMS, 300, seed=303, max_parts=12))


QUALITY_ATOMS = [
    "the quick", "fox", "über", "中文字", "...", "…", "##", "a" * 30,
    "\n", "- bullet", "* star", "• dot", "1234", " ", "  ", "e.g.",
    "end.", "uh?", "wow!", "\t", "\r", "mixed2tok", "", "of and that",
]


def test_fuzz_gopher_signals(spark, duck):
    """Every Gopher signal fragment must agree cross-engine on
    adversarial text (regexp_count vs regexp_extract_all, \\p{L} classes,
    LIKE-in-lambda, char counting)."""
    from ccspark import quality
    texts = synth(QUALITY_ATOMS, 250, seed=404, max_parts=15)

    def all_signals(d, col):
        sig = quality.gopher_signal_exprs(d, col)
        parts = [f"cast({e} AS varchar)" if d == DUCK else
                 f"cast({e} AS string)" for e in sig.values()]
        return "concat_ws('|', " + ", ".join(parts) + ")"
    run_both(spark, duck, all_signals, texts)


def test_fuzz_c4_gates(spark, duck):
    from ccspark import quality
    texts = synth(QUALITY_ATOMS + ["First one. Second! Third?",
                                   "lorem ipsum", "{", "javascript"],
                  250, seed=505, max_parts=10)

    def gates(d, col):
        page = quality.c4_page_keep_expr(d, col)
        line = quality.c4_line_keep_expr(d, col)
        return (f"concat(cast({page} AS {'string' if d == SPARK else 'varchar'}), '|', "
                f"cast({line} AS {'string' if d == SPARK else 'varchar'}))")
    run_both(spark, duck, gates, texts)


TEXT_ATOMS = [
    "Hello", "WORLD", "world", "ß", "Straße", "İstanbul", "ÄÖÜ", "äöü",
    "中文", "漢字", "😀", "a\\b", "it's", "o'clock", "\t", "\n", "  ",
    "naïve", "café", "ΣΟΦΙΑ", "σοφια", "МОСКВА", "москва", "ﬁ", "½",
    "ｆｕｌｌwidth", ",", ".", "!", "?", ";", "--", "...", "(paren)",
    "[brack]", "{brace}", "#tag", "@user", "100", "3.14", "a1b2",
    "under_score", "hy-phen", "", " ", "'", '"',
]


def test_fuzz_decontam_norm_and_grams(spark, duck):
    """The decontamination normalizer + gram template must agree byte
    for byte across engines on adversarial unicode/punctuation text -
    incl. the Turkish-İ Java-vs-ICU lower() divergence the \\p{M} strip
    pins (found by this fuzz)."""
    from ccspark import decontam

    def norm_join(d, col):
        w = decontam.norm_words(d, col)
        g = decontam.gram_array(d, w, 3)   # 3-grams: short texts hit too
        join = "array_join" if d == SPARK else "array_to_string"
        return (f"concat({join}({w}, chr(7)), chr(7), chr(7), "
                f"{join}({g}, chr(7)))")

    run_both(spark, duck, norm_join,
             synth(TEXT_ATOMS, 250, seed=303, max_parts=12))


PII_ATOMS = [
    "4111", "1111", "5500", "0000", "123", "45", "6789", "555",
    " ", "-", ".", "", "(", ")", "+1 ", "a", "x@y.co", "user@", "@",
    "@mail.example.org", "10.0.42.7", "192.168.10.250", "10.0.",
    "999.999.999.999", "12345678901234567890", "word ", "end",
    "\n", "--", "  ", "4111-1111", "1111 1111",
]


def test_fuzz_pii_chain(spark, duck):
    """The ordered email/ssn/ip/cc/phone regexp_replace chain (now a
    GRADED cross-engine surface via the injected pii_scrub lines) must
    scrub adversarial digit/dash/space/at soups identically in Java
    regex and RE2 - \b boundaries, class precedence and replace-all
    semantics included."""
    from ccspark.queries import pii_chain
    run_both(spark, duck, lambda d, e: pii_chain(d, e),
             synth(PII_ATOMS, 400, seed=777))
