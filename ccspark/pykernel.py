"""Vectorized Python implementation of the keep/drop + clean kernel.

This is the production hot path: one Arrow-batched pandas UDF computes the
cleaned text, the keep verdict, and the first failing rule for a batch of
raw lines in a single pass (the pure-SQL rendering in ccspark.kernel would
have Catalyst re-evaluating the 9-regex clean chain once per keep-rule -
~14x the regex work - because predicate pushdown re-inlines the chain into
the filter; a UDF output column is a hard optimizer barrier, so the chain
runs exactly once per line).

Semantics are the reference chain, byte-for-byte (cc_corpus.py:254-293);
patterns come from ccspark.regexes - the same dialect-neutral strings the
DuckDB oracle SQL uses, so Spark results and oracle results agree by
construction.  An independent transcription of the reference (gensim-style
``\\s`` shorthands + unicodedata alphabet detection) lives in
tests/oracle.py and cross-validates this module on boundary fixtures.
"""

from __future__ import annotations

import re

from ccspark import regexes as R

# Precompiled once per process (executors import this module once).
_SUBS = tuple(
    (re.compile(pat), rep)
    for pat, rep in (
        (R.RE_URL, ""),
        (R.RE_AT, ""),
        (R.RE_HASHTAG, ""),
        (R.RE_ANGLE, ""),
        (R.EMOJI_CLASS, ""),
        (R.RE_GENSIM_TAGS, ""),
        (R.RE_AL_NUM, "\\1 \\2"),
        (R.RE_NUM_AL, "\\1 \\2"),
        (R.RE_MULTI_WS, " "),
    )
)
_RE_ILLEGAL = re.compile(R.ILLEGAL_CLASS)
_RE_NUMERIC = re.compile(R.RE_NUMERIC)
_RE_PUNCT = re.compile(R.PUNCT_CLASS)
_STRIP_ALPHABETS = tuple(
    re.compile(cls)
    for cls in (R.CJK_CLASS, R.HANGUL_CLASS, R.HIRAGANA_CLASS, R.KATAKANA_CLASS)
)


def clean_line(line: str) -> str:
    """Steps 2-6: strip urls/@/#/tags, emoji, gensim tag/alnum/ws filters."""
    for rx, rep in _SUBS:
        line = rx.sub(rep, line)
    return line


def _has_alpha(s: str) -> bool:
    """Python-re has no \\p{L}; str.isalpha() is the same category-L* test
    the SQL dialects express with [\\p{L}]."""
    return any(ch.isalpha() for ch in s)


def short_threshold(cleaned: str) -> bool:
    """True -> 15-char minimum applies (CJK/Hangul/Kana line)."""
    for rx in _STRIP_ALPHABETS:
        if not _has_alpha(rx.sub("", cleaned)):
            return True
    return False


def verdict(raw: str):
    """(cleaned_text, keep, drop_reason) for one raw line - drop_reason is
    the first failing rule in reference evaluation order, else None."""
    if raw is None or len(raw) <= 15:
        return None, False, "rawlen"
    c = clean_line(raw)
    if len(c) <= 15:
        return c, False, "postlen"
    if _RE_ILLEGAL.search(c):
        return c, False, "illegal"
    if len(_RE_PUNCT.sub(" ", _RE_NUMERIC.sub("", c))) <= 12:
        return c, False, "alphamass"
    if len(c) < (15 if short_threshold(c) else 50):
        return c, False, "cjklen"
    for ch, k in R.PUNCT_BUDGET:
        if c.count(ch) >= k:
            return c, False, "punct"
    return c, True, None


def make_clean_verdict_udf():
    """pandas UDF: raw_line -> struct<text string, keep boolean,
    drop_reason string>, one Arrow batch at a time."""
    import pandas  # noqa: F401 - resolved lazily so a bare import of this
    from pyspark.sql.functions import pandas_udf  # module needs no Spark

    def clean_verdict(raw: "pandas.Series") -> "pandas.DataFrame":
        out = [verdict(x) for x in raw]
        return pandas.DataFrame(out, columns=["text", "keep", "drop_reason"])

    clean_verdict.__annotations__ = {
        "raw": pandas.Series, "return": pandas.DataFrame}
    return pandas_udf(clean_verdict,
                      "text string, keep boolean, drop_reason string")
