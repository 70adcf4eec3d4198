"""Benchmark decontamination: flag training documents that overlap an
evaluation set by shared normalized word n-grams.

The standard training-data hygiene operator (GPT-3 appendix C / C4 /
FineWeb practice): a document is *contaminated* when any normalized
``n``-gram (default 13 words) of its text also occurs in a benchmark /
eval-set text.  The reference pipeline has no such operator - this is a
first-class extension of the quality_filter surface, same family as the
dedup ops (deduplication.py:88-112 is the closest reference analogue:
hash-keyed overlap detection).

Scale design (the whole point at 100 TB):

  * the benchmark side is TINY relative to the corpus (eval suites are
    at most ~10^6 grams) -> distinct n-gram hashes are broadcast; the
    corpus is NEVER shuffled;
  * doc-side n-grams are generated in one projection (split + slice +
    xxhash64 inside a ``transform`` lambda - whole-stage codegen, no
    Python), exploded, and broadcast-hash-joined against the benchmark
    set: only MATCHING rows (a vanishingly small fraction) survive into
    the tiny count-distinct aggregation;
  * the per-doc flag is rejoined with a second broadcast (the hit set is
    small by construction), so the full pipeline is corpus-shuffle-free.

Normalization (both engines, one template): lowercase, every non-
alphanumeric run (unicode classes ``\\p{L}\\p{N}``) collapsed to a single
space, empty tokens dropped.  Space-free scripts (CJK) normalize to one
long token and therefore produce no word 13-grams - character-n-gram
decontamination for those languages would ride the same skeleton with a
different gram expression (documented limitation, same boundary as the
reference's word-based dedup at deduplication.py:45-48).

Cross-engine verification: the driver query ``decontamination`` runs
THIS module (xxhash64 hash path) against a DuckDB twin that matches the
normalized gram STRINGS directly - a green value-hash proves the hashed
fast path implements exactly the string-overlap semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ccspark.sqlgen import DUCK, SPARK, arr_filter, arr_len, rrep, split_arr

DEFAULT_N = 13

# one normalized token never contains a space, so a true n-gram has
# exactly n-1 spaces: the greatest()-guard + space-count filter is the
# proven dual-dialect way to drop the short-doc degenerate slices
# (q_word_ngrams pattern) without a CASE over mismatched array types
_WORDS_SENTINEL = "__ccspark_words__"


def norm_words(d: str, e: str) -> str:
    """Array of normalized words of text expr *e* (dialect *d*).

    Combining marks (``\\p{M}``) are stripped after lowercasing: this
    pins the one measured Java-vs-ICU ``lower()`` divergence (Turkish
    'İ' lowers to ``i`` + U+0307 in the JVM but plain ``i`` in DuckDB -
    cross-engine fuzz, r4) and keeps marks from SPLITTING a word (they
    are not ``\\p{L}``).  Precomposed accents survive (``é`` stays
    ``é``); NFC-vs-NFD unification is out of scope (no shared SQL
    normalizer) and documented as a boundary."""
    demarked = rrep(d, f"lower({e})", r"\p{M}", "")
    cleaned = rrep(d, demarked, r"[^\p{L}\p{N}]+", " ")
    return arr_filter(d, split_arr(d, cleaned, " "), "x != ''")


def gram_array(d: str, words: str, n: int = DEFAULT_N) -> str:
    """Array of word ``n``-grams (space-joined) over a words-array expr.

    *words* MUST be a bound COLUMN (projection/CTE), never an inline
    split expression: it is referenced inside the transform LAMBDA BODY,
    and HOF lambdas are interpreted - an inlined expression re-evaluates
    once per array element (see dedup.shingles, r4).

    Docs shorter than *n* words yield an empty set: the guarded sequence
    emits one degenerate short slice which the space-count filter drops.
    """
    if d == SPARK:
        raw = (f"transform(sequence(1, greatest({arr_len(d, words)} - "
               f"{n - 1}, 1)), i -> concat_ws(' ', slice({words}, i, {n})))")
    else:
        raw = (f"list_transform(generate_series(1, greatest("
               f"{arr_len(d, words)} - {n - 1}, 1)), "
               f"i -> array_to_string({words}[i:i+{n - 1}], ' '))")
    return arr_filter(
        d, raw, f"length(x) - length(replace(x, ' ', '')) = {n - 1}")


def _gram_hashes_expr(n: int) -> str:
    """Spark SQL: array<bigint> of xxhash64'd n-grams of a words column."""
    grams = gram_array(SPARK, _WORDS_SENTINEL, n)
    return f"transform({grams}, g -> xxhash64(g))"


def bench_gram_hashes(benchmark: DataFrame, *, n: int = DEFAULT_N,
                      text_col: str = "text") -> DataFrame:
    """Distinct xxhash64 n-gram hashes of the benchmark texts.

    One column ``gh: bigint``.  Small by construction (eval suites), so
    callers broadcast it; the distinct is a shuffle of the benchmark side
    only, never of the corpus.
    """
    words = F.expr(norm_words(SPARK, text_col))
    return (benchmark
            .select(words.alias(_WORDS_SENTINEL))
            .select(F.explode(F.expr(_gram_hashes_expr(n))).alias("gh"))
            .distinct())


def decontaminate(docs: DataFrame, benchmark: DataFrame, *,
                  n: int = DEFAULT_N, id_col: str = "doc_id",
                  text_col: str = "text",
                  bench_text_col: str = "text") -> DataFrame:
    """All *docs* columns + ``n_hits`` (distinct benchmark n-grams found
    in the doc, bigint) + ``contaminated`` (n_hits > 0).

    Plan shape (asserted in tests/test_decontam.py): the corpus side is
    scan -> projection (gram hashes) -> explode -> BroadcastHashJoin
    against the benchmark hash set -> tiny count-distinct on matches ->
    broadcast left join of the hit counts back onto *docs*.  Zero
    corpus-wide exchanges; survives a 100x scale-up as long as the
    benchmark fits in a broadcast (eval suites do, by orders of
    magnitude).
    """
    bench = bench_gram_hashes(benchmark, n=n, text_col=bench_text_col)
    words = F.expr(norm_words(SPARK, text_col))
    exploded = (docs
                .select(F.col(id_col),
                        words.alias(_WORDS_SENTINEL))
                .select(id_col,
                        F.explode(F.expr(_gram_hashes_expr(n))).alias("gh")))
    hits = (exploded
            .join(F.broadcast(bench), "gh")
            .groupBy(id_col)
            .agg(F.count_distinct("gh").cast("long").alias("n_hits")))
    return (docs
            .join(F.broadcast(hits), id_col, "left")
            .withColumn("n_hits",
                        F.coalesce(F.col("n_hits"), F.lit(0)).cast("long"))
            .withColumn("contaminated", F.col("n_hits") > 0))


def remove_contaminated(docs: DataFrame, benchmark: DataFrame, *,
                        n: int = DEFAULT_N, id_col: str = "doc_id",
                        text_col: str = "text",
                        bench_text_col: str = "text") -> DataFrame:
    """The filtering form: *docs* minus contaminated rows (original
    columns only) - what a training-data build actually calls."""
    flagged = decontaminate(docs, benchmark, n=n, id_col=id_col,
                            text_col=text_col, bench_text_col=bench_text_col)
    return flagged.where(~F.col("contaminated")).drop("contaminated",
                                                      "n_hits")
