"""Dump .explain("formatted") for the bench-timed queries to
plans/r06/<query>_<tag>.txt (tag = before/after).

Run: python scripts/dump_plans_r06.py before [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

BENCH_QUERIES = (
    "corpus_lines", "quality_signals", "perplexity_outliers",
    "minhash_pairs", "simhash", "knn_cosine", "doc_fingerprint",
    "pii_scrub", "media_meta", "union_segments", "relational_suite",
    "events_sessionization", "gopher_quality", "c4_span_dedup",
    "word_ngrams", "sign_lsh_suite", "cell_metrics",
)


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or BENCH_QUERIES

    from ccspark.session import get_spark
    from ccspark import queries as Q
    from ccspark.sqlgen import SPARK

    spark = get_spark("plans_r06", cores=8)
    Q.ensure_views(spark, "/root/testdata/sf0.001")
    os.makedirs("plans/r06", exist_ok=True)

    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode \
        .fromString("formatted")
    for name in names:
        if name == "sign_lsh_suite":
            sql = Q.q_sign_lsh_suite(SPARK)
        else:
            sql = Q.QUERY_BUILDERS[name](SPARK)
        df = spark.sql(sql)
        plan = df._jdf.queryExecution().explainString(mode)
        out = f"plans/r06/{name}_{tag}.txt"
        with open(out, "w") as f:
            f.write(plan)
        print(out, len(plan.splitlines()), "lines")

    # module paths timed by bench.py
    from ccspark import pipeline
    from ccspark.fixtures_sql import pages_spark
    pages = pages_spark(spark, "/root/testdata/sf0.001", materialize=True)
    mod = {}
    mod["corpus_pipeline_module"] = pipeline.corpus_lines(pages)
    from ccspark.api import CCSparkCorpus
    mod["training_corpus_module"] = CCSparkCorpus(spark) \
        .build_training_corpus(pages, gopher_thresholds=Q.TRAINING_GOPHER_TH)
    from ccspark import dedup as D, similarity as S, decontam as C
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    mod["minhash_md5_module"] = D.minhash_near_dups(
        docs, num_hashes=12, bands=4)
    mod["minhash_xxh64_module"] = D.minhash_near_dups(
        docs, num_hashes=12, bands=4, hash_family="xxhash64")
    mod["winnow_xxh64_module"] = D.winnow_fingerprints(
        docs, hash_family="xxhash64")
    mod["embedding_dedup_module"] = S.dedup_near_embeddings(
        emb, threshold=0.9)
    if len(sys.argv) <= 2:
        for name, df in mod.items():
            plan = df._jdf.queryExecution().explainString(mode)
            out = f"plans/r06/{name}_{tag}.txt"
            with open(out, "w") as f:
                f.write(plan)
            print(out, len(plan.splitlines()), "lines")


if __name__ == "__main__":
    main()
