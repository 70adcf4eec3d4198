"""Write PLANS.md: formatted physical plans for the flagship pipeline and
key queries, with the properties that matter at scale called out
(broadcast joins, pruned scans, exchange count).

Run: python scripts/gen_plans.py
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")


def main() -> None:
    from ccspark.session import get_spark
    from ccspark.fixtures_sql import pages_spark
    from ccspark import pipeline, queries as Q
    from ccspark.sqlgen import SPARK

    spark = get_spark("plans", cores=8)
    pages = pages_spark(spark, "/root/testdata/sf0.001", materialize=True)
    Q.ensure_views(spark, "/root/testdata/sf0.001")

    sections = []

    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode \
        .fromString("formatted")

    def add(title, df, note=""):
        plan = df._jdf.queryExecution().explainString(mode)
        shuffles = len(re.findall(r"\(\d+\) Exchange\b", plan))
        bcasts = len(re.findall(r"\(\d+\) BroadcastHashJoin", plan))
        sections.append(
            f"## {title}\n\n{note}\n"
            f"Shuffle exchanges: **{shuffles}**, broadcast joins: "
            f"**{bcasts}**\n\n```\n{plan.strip()}\n```\n")

    add("Flagship corpus pipeline (production pandas-UDF path)",
        pipeline.corpus_lines(pages),
        "Scan -> broadcast geo joins -> explode + raw-length gate -> one "
        "ArrowEvalPython (clean+verdict, single pass) -> url-window "
        "ordinal -> map-side-combining hash-agg dedup. `html`/`warc_ts` "
        "pruned from the scan (ReadSchema).\n")

    from ccspark.api import CCSparkCorpus
    add("Training-corpus composite (production facade)",
        CCSparkCorpus(spark).build_training_corpus(
            pages, gopher_thresholds=Q.TRAINING_GOPHER_TH),
        "Gopher+C4 document gates execute BELOW the Generate (whole-page "
        "pruning before the row blow-up - asserted in "
        "tests/test_plan_shape.py), then the flagship plan + scrub "
        "projection. Same two-shuffle budget as the plain pipeline.\n")

    for name, note in (
        ("corpus_lines", "SQL-template rendering of the pipeline (the "
                         "DuckDB-oracle twin); since r6 the clean/keep "
                         "kernel runs as the registered RE2 UDF behind "
                         "a generator barrier "
                         "(CCSPARK_SQL_KERNEL=catalyst restores the "
                         "pure-Catalyst form)."),
        ("minhash_pairs", "Wide MinHash: one groupBy producing 12 min() "
                          "columns; signatures ride the banding "
                          "explode; pairs stream from per-(band, "
                          "digest) collect_list buckets via stacked "
                          "explodes (r6 - the chain is planned ONCE)."),
        ("cell_metrics", "Partial-aggregated metrics rollup."),
        ("knn_cosine", "Broadcast query set over the embeddings scan "
                       "(BuildLeft on the filtered 3-row query set)."),
        ("gopher_quality", "Doc-level quality gate: ONE projection, array "
                           "higher-order functions, zero exchanges - the "
                           "filter composes with any scan at 100TB."),
        ("gopher_repetition", "Per-(doc, gram) counting is the one "
                              "shuffle; the three top-gram windows and "
                              "the dup aggregation ride the same "
                              "partitioning."),
        ("c4_span_dedup", "Global 3-sentence-span keep-first: explode -> "
                          "hash -> window on the span hash."),
        ("word_ngrams", "Single shuffle on (lang, gram); rank window "
                        "rides the same partitioning."),
        ("lid_ngram_sql", "NB LID train+score as one statement (oracle "
                          "twin; production serving is the Iterator "
                          "pandas UDF, see BENCH lid_predict)."),
    ):
        add(f"query: {name}",
            spark.sql(Q.QUERY_BUILDERS[name](SPARK)), note)

    sf_dir = "/root/testdata/sf0.001"
    for name, note in (
        ("near_dup_removal", "MinHash-LSH near-dup removal (est+ver): "
                             "pre_exact collapses exact-copy groups "
                             "before pair emission; signatures ride the "
                             "banding explode (2 derivations); exact-"
                             "Jaccard verify only touches LSH "
                             "candidates."),
        ("incremental_dedup", "Cross-crawl screens: hash anti-join "
                              "(exact) + new-vs-history band-digest "
                              "probe over the persisted signature table "
                              "(near) - only the NEW crawl's text is "
                              "read; history enters as ~100B/doc "
                              "signatures."),
        ("decontamination", "13-gram eval-overlap scrub: per-word "
                            "xxhash64 once, compositional gram folds "
                            "(no gram strings); eval grams broadcast."),
        ("token_suite", "Token stats + budget sampler: bucketed "
                        "distributed prefix-sum (md5-first-byte "
                        "buckets, offsets broadcast) - no per-group "
                        "sort-the-world window."),
    ):
        add(f"module query: {name}", Q.MODULE_QUERIES[name](spark, sf_dir),
            note)

    with open("PLANS.md", "w") as fh:
        fh.write("# PLANS — physical plans of the headline jobs "
                 "(sf0.001 fixtures, AQE on)\n\n" + "\n".join(sections))
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
