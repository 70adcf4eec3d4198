"""URL geography: host/domain/ccTLD extraction + broadcast dimension tables.

Reference semantics (cc_corpus.py:244-248, utilities.py:226-228):

  * ``tldextract.extract(url)`` -> (subdomain, domain, suffix); the geo key
    is ``suffix.split('.')[-1]`` - i.e. the LAST label of the public suffix,
    which for any host under a known TLD equals the last hostname label.
  * a page survives only if that label is a key of COUNTRY_CODE_NAME
    (ccspark/data/cctld.csv) - this is a ~295-row broadcast inner join;
  * and its registrable *domain* label is not in the multinational filter
    (url_filter.txt + utilities.py:148-219) - a broadcast anti join.

``tldextract``'s Public Suffix List lookup is replaced by a frozen table of
well-known second-level ccTLD suffixes (public knowledge, PSL subset): the
registrable domain is the third-from-last label when the last two labels
form a known multi-part suffix (``trademe.co.nz`` -> ``trademe``), else the
second-from-last.  Divergences from a live PSL only affect which label is
anti-joined against the MNC filter and are covered by tests on fixture URLs.
Punycode IDN hosts are NOT decoded - same as the reference, whose dicts key
on the unicode form only (see WET_processor.py:51 TODO).
"""

from __future__ import annotations

import os

from ccspark.sqlgen import arr_get, arr_len, in_list, rext, rrep, split_arr

DATA_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")

# Second-level public suffixes under ccTLDs (PSL subset, frozen).
_SECOND_LEVEL = {
    "uk": ["co", "org", "me", "ltd", "plc", "net", "sch", "ac", "gov", "nhs", "police"],
    "nz": ["co", "net", "org", "govt", "ac", "school", "geek", "maori", "iwi", "kiwi"],
    "au": ["com", "net", "org", "edu", "gov", "asn", "id"],
    "za": ["co", "org", "web", "net", "gov", "ac", "edu", "mil"],
    "jp": ["co", "or", "ne", "ac", "ad", "go", "ed", "lg", "gr"],
    "kr": ["co", "or", "ne", "re", "pe", "go", "ac", "hs", "ms", "es", "sc", "kg"],
    "cn": ["com", "net", "org", "gov", "edu", "ac", "mil"],
    "br": ["com", "net", "org", "gov", "edu", "art", "blog", "eco", "emp"],
    "mx": ["com", "org", "gob", "edu", "net"],
    "in": ["co", "net", "org", "gen", "firm", "ind", "ac", "edu", "res", "gov", "nic", "mil"],
    "tr": ["com", "net", "org", "gov", "edu", "k12", "av", "bel", "biz", "gen", "web"],
    "ar": ["com", "net", "org", "gob", "edu", "int", "mil", "musica", "tur"],
    "sg": ["com", "net", "org", "edu", "gov", "per"],
    "my": ["com", "net", "org", "gov", "edu", "mil", "name"],
    "hk": ["com", "net", "org", "edu", "gov", "idv"],
    "tw": ["com", "net", "org", "edu", "gov", "idv", "game", "club"],
    "th": ["co", "in", "or", "ac", "go", "net", "mi"],
    "vn": ["com", "net", "org", "edu", "gov", "int", "ac", "biz", "info", "name", "pro"],
    "id": ["co", "or", "ac", "go", "web", "sch", "net", "my", "biz", "desa"],
    "ph": ["com", "net", "org", "edu", "gov", "mil", "ngo"],
    "pk": ["com", "net", "org", "edu", "gov", "gob", "web", "fam", "biz"],
    "bd": ["com", "net", "org", "edu", "gov", "ac", "mil"],
    "lk": ["com", "net", "org", "edu", "gov", "ac", "sch", "web", "int", "ltd"],
    "np": ["com", "net", "org", "edu", "gov", "mil", "aero", "biz", "coop"],
    "eg": ["com", "net", "org", "edu", "gov", "sci", "eun", "mil", "name"],
    "sa": ["com", "net", "org", "edu", "gov", "med", "sch", "pub"],
    "ae": ["co", "net", "org", "ac", "gov", "mil", "sch"],
    "il": ["co", "org", "net", "ac", "gov", "muni", "k12", "idf"],
    "jo": ["com", "net", "org", "edu", "gov", "mil", "name", "sch"],
    "lb": ["com", "net", "org", "edu", "gov"],
    "kw": ["com", "net", "org", "edu", "gov", "ind", "emb"],
    "qa": ["com", "net", "org", "edu", "gov", "mil", "name", "sch"],
    "om": ["com", "net", "org", "edu", "gov", "med", "museum", "pro", "co"],
    "bh": ["com", "net", "org", "edu", "gov"],
    "iq": ["com", "net", "org", "edu", "gov", "mil"],
    "sy": ["com", "net", "org", "edu", "gov", "mil"],
    "ye": ["com", "net", "org", "edu", "gov", "mil"],
    "kz": ["com", "net", "org", "edu", "gov", "mil"],
    "uz": ["com", "net", "org", "co"],
    "af": ["com", "net", "org", "edu", "gov"],
    "ua": ["com", "net", "org", "edu", "gov", "in"],
    "pl": ["com", "net", "org", "edu", "gov", "info", "waw", "biz"],
    "rs": ["co", "org", "edu", "in", "ac", "gov"],
    "mk": ["com", "org", "net", "edu", "gov", "inf", "name"],
    "ba": ["com", "org", "net", "edu", "gov", "mil", "unsa", "unbi", "co", "rs"],
    "hr": ["com", "from", "name", "iz"],
    "al": ["com", "org", "net", "edu", "gov", "mil"],
    "by": ["com", "of", "gov", "mil"],
    "ge": ["com", "net", "org", "edu", "gov", "pvt", "mil"],
    "hu": ["co", "info", "org", "priv", "tm", "2000", "agrar", "bolt", "city", "film"],
    "gr": ["com", "edu", "net", "org", "gov"],
    "cy": ["com", "org", "net", "ac", "gov", "biz", "ltd", "name", "press", "pro", "tm"],
    "mt": ["com", "net", "org", "edu", "gov"],
    "pt": ["com", "edu", "gov", "int", "net", "nome", "org", "publ"],
    "es": ["com", "nom", "org", "gob", "edu"],
    "fr": ["asso", "nom", "gouv", "tm", "prd", "presse", "com"],
    "ro": ["com", "org", "tm", "nt", "nom", "info", "rec", "arts", "firm", "store", "www"],
    "at": ["co", "or", "ac", "gv", "priv"],
    "ke": ["co", "or", "ne", "go", "ac", "sc", "info", "me", "mobi"],
    "tz": ["co", "or", "ne", "go", "ac", "sc", "hotel", "info", "me", "mil", "mobi", "tv"],
    "ug": ["co", "or", "ne", "go", "ac", "sc", "com", "org"],
    "zm": ["co", "org", "gov", "ac", "com", "edu", "mil", "net", "sch"],
    "zw": ["co", "org", "gov", "ac", "mil", "school"],
    "bw": ["co", "org", "ac", "gov", "net"],
    "na": ["com", "co", "org", "edu", "net", "alt", "in", "info"],
    "mz": ["co", "net", "org", "ac", "edu", "gov", "adv"],
    "ng": ["com", "net", "org", "edu", "gov", "name", "sch", "mobi", "mil", "i"],
    "gh": ["com", "org", "edu", "gov", "mil"],
    "tn": ["com", "ens", "fin", "gov", "ind", "info", "intl", "mincom", "nat", "net", "org", "perso", "tourism"],
    "ma": ["co", "net", "gov", "org", "ac", "press"],
    "dz": ["com", "org", "net", "gov", "edu", "asso", "pol", "art"],
    "ly": ["com", "net", "org", "edu", "gov", "plc", "sch", "med", "id"],
    "sd": ["com", "net", "org", "edu", "gov", "med", "tv", "info"],
    "et": ["com", "gov", "org", "edu", "net", "biz", "name", "info"],
    "ao": ["co", "ed", "gv", "it", "og", "pb"],
    "ve": ["com", "net", "org", "co", "gob", "edu", "info", "mil", "web"],
    "pe": ["com", "net", "org", "edu", "gob", "nom", "mil", "sld"],
    "co": ["com", "net", "org", "edu", "gov", "nom", "mil", "rec", "web", "firm", "info", "int", "arts"],
    "ec": ["com", "net", "org", "edu", "gob", "gov", "mil", "fin", "med", "pro", "info"],
    "uy": ["com", "net", "org", "edu", "gub", "mil"],
    "py": ["com", "net", "org", "edu", "gov", "mil", "coop", "una"],
    "bo": ["com", "net", "org", "edu", "gob", "gov", "int", "mil", "tv", "web"],
    "do": ["com", "net", "org", "edu", "gob", "gov", "mil", "sld", "web", "art"],
    "gt": ["com", "net", "org", "edu", "gob", "ind", "mil"],
    "ni": ["com", "net", "org", "edu", "gob", "mil", "co", "biz", "info", "in", "int", "web", "nom"],
    "sv": ["com", "org", "edu", "gob", "red"],
    "hn": ["com", "net", "org", "edu", "gob", "mil"],
    "pa": ["com", "net", "org", "edu", "gob", "ac", "sld", "abo", "ing", "med", "nom"],
    "cr": ["ac", "co", "ed", "fi", "go", "or", "sa"],
    "cu": ["com", "net", "org", "edu", "gov", "inf"],
    "fj": ["com", "net", "org", "ac", "gov", "biz", "info", "mil", "name", "pro", "school"],
    "pg": ["com", "net", "org", "ac", "gov", "mil"],
    "sb": ["com", "net", "org", "edu", "gov"],
    "vu": ["com", "net", "org", "edu", "gov"],
    "kh": ["com", "net", "org", "edu", "gov", "per", "mil"],
    "mm": ["com", "net", "org", "edu", "gov"],
    "bn": ["com", "net", "org", "edu", "gov"],
    "mv": ["com", "net", "org", "edu", "gov", "aero", "biz", "coop", "info", "int", "mil", "museum", "name", "pro"],
    "ck": ["co", "org", "edu", "gov", "net", "gen", "biz", "info"],
    "nf": ["com", "net", "per", "rec", "web", "arts", "firm", "info", "other", "store"],
}
TWO_LEVEL_SUFFIXES = tuple(sorted(
    f"{s}.{tld}" for tld, seconds in _SECOND_LEVEL.items() for s in seconds
))


# --------------------------------------------------------------------------
# Expression builders (dialect-parameterized; see ccspark.sqlgen)

def host_expr(d: str, url: str) -> str:
    """Lowercased hostname: strip scheme, take authority, strip
    userinfo + port."""
    no_scheme = rrep(d, url, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    auth = rext(d, no_scheme, "^([^/?#]*)", 1)
    no_user = rrep(d, auth, "^[^@]*@", "")
    no_port = rrep(d, no_user, ":[0-9]*$", "")
    return f"lower({no_port})"


def tld_expr(d: str, host: str) -> str:
    """Last dot-label of the host (the reference's suffix.split('.')[-1])."""
    return rext(d, host, "([^.]+)$", 1)


def domain_expr(d: str, host: str) -> str:
    """Registrable domain label (tldextract's ``domain`` field)."""
    labels = split_arr(d, host, "\\.")
    n = arr_len(d, labels)
    last2 = f"concat({arr_get(d, labels, -2)}, '.', {arr_get(d, labels, -1)})"
    in_two = in_list(d, last2, TWO_LEVEL_SUFFIXES)
    return (
        f"(CASE WHEN {n} >= 3 AND {in_two} THEN {arr_get(d, labels, -3)} "
        f"WHEN {n} >= 2 THEN {arr_get(d, labels, -2)} "
        f"ELSE {host} END)"
    )


# --------------------------------------------------------------------------
# Dimension tables (Spark side).  Read through importlib.resources so the
# package works both from a checkout and from the spark-submit --py-files
# zip (a csv inside a zip has no filesystem path for spark.read.csv); the
# tables are tiny (<=971 rows), so a LocalRelation + broadcast join is the
# right physical shape anyway.

def _read_data_csv(name: str) -> list[list[str]]:
    import csv as _csv
    import importlib.resources as _res
    import io as _io

    text = _res.files("ccspark").joinpath(f"data/{name}.csv").read_text(
        encoding="utf-8")
    rows = list(_csv.reader(_io.StringIO(text)))
    return rows[1:]        # drop header


def cctld_dim(spark):
    """~295-row (tld, country, region) dimension -> broadcast inner join."""
    return spark.createDataFrame(
        _read_data_csv("cctld"), "tld string, country string, region string")


def url_filter_dim(spark):
    """Multinational-domain exclusion list -> broadcast anti join."""
    rows = [(d, int(a), int(b)) for d, a, b in _read_data_csv("url_filter")]
    return spark.createDataFrame(
        rows,
        "domain string, num_of_countries int, num_of_pages int")


def country_iso3_dim(spark):
    return spark.createDataFrame(
        _read_data_csv("country_iso3"), "country string, iso3 string")


def lang_iso3_dim(spark):
    return spark.createDataFrame(
        _read_data_csv("lang_iso2_iso3"), "iso2 string, iso3 string")


def write_url_filter_csv(df, path: str) -> None:
    """S9 writer (utilities.py:247-256): persist a mined multinational-
    domain filter as the space-delimited url_filter format."""
    (df.selectExpr("concat_ws(' ', domain, num_of_countries, num_of_pages)"
                   " AS line")
       .coalesce(1).write.mode("overwrite").text(path))


def crawl_period_expr(d: str, col: str) -> str:
    """X6 (cc_corpus.py:159-162): crawl period from a segment id/filename -
    strip the 'CC-MAIN-' prefix, keep the first 7 chars ('2022-40').
    Real event time comes from warc_ts; this labels outputs by crawl."""
    stripped = rrep(d, col, "CC-MAIN-", "")
    return f"substring({stripped}, 1, 7)"


# DuckDB-side loader for the oracle SQL (reads the same CSVs).
def duck_dim_sql(name: str) -> str:
    path = os.path.join(DATA_DIR, f"{name}.csv")
    return f"read_csv('{path}', header=true, all_varchar=true)"
