"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS].  Prints exactly ONE JSON line:

  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The headline metric is end-to-end corpus-pipeline throughput (docs/sec) at
the bench scale; per-query wall seconds are reported alongside.  Set
BENCH_SCALING=1 to also run the N-vs-4N-cores scaling evidence (slower;
normally done via scripts/scaling_evidence.py which writes BENCH.md).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "")

    from ccspark.session import get_spark
    from ccspark.fixtures_sql import pages_spark
    from ccspark import pipeline, queries as Q
    from ccspark.sqlgen import SPARK

    spark = get_spark("bench", cores=cpus)

    # fixture synthesis is input prep, not pipeline work - excluded
    pages = pages_spark(spark, sf_dir, materialize=True)
    n_docs = pages.count()
    Q.ensure_views(spark, sf_dir)

    timings: dict[str, float] = {}

    def timed(name, thunk, warm: bool = True):
        if warm:                       # steady-state: exclude JVM/codegen
            thunk()                    # warmup from the reported number
        best = float("inf")
        for _ in range(2):             # min-of-2: long-lived local-mode
            t0 = time.time()           # sessions show run-to-run GC noise
            thunk()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

    # flagship: production pandas-UDF pipeline end-to-end (warm once to
    # exclude JVM/python-worker startup from the throughput number)
    timed("corpus_pipeline",
          lambda: pipeline.corpus_lines(pages).count(), warm=True)
    timed("cell_metrics", lambda: pipeline.cell_metrics(pages).count())

    # the full quality_filter composite (Gopher+C4 doc gates -> kernel ->
    # dedup -> PII scrub) through the production facade
    from ccspark.api import CCSparkCorpus
    cc = CCSparkCorpus(spark)
    timed("training_corpus",
          lambda: cc.build_training_corpus(
              pages, gopher_thresholds=Q.TRAINING_GOPHER_TH).count())

    sql_queries = (
        "corpus_lines",          # pure-SQL rendering of the same pipeline
        "quality_signals",
        "perplexity_outliers",
        "minhash_pairs",
        "simhash",
        "knn_cosine",
        "doc_fingerprint",
        "pii_scrub",
        "media_meta",
        "union_segments",
        "relational_suite",      # 6 digest-folded TPC-H-table demos
        "events_sessionization",
        "gopher_quality",        # doc-level quality gate (scan-speed)
        "c4_span_dedup",         # global 3-sentence-span dedup (1 shuffle)
        "word_ngrams",
    )
    for name in sql_queries:
        sql = Q.QUERY_BUILDERS[name](SPARK)
        timed(name, lambda s=sql: spark.sql(s).count())

    # ann + pairs template; the graded module adds the CC survivor branch
    lsh_sql = Q.q_sign_lsh_suite(SPARK)
    timed("sign_lsh_suite", lambda: spark.sql(lsh_sql).count())

    # language-aware doc gate, production pandas-UDF path (the facade
    # default since r3) vs its pure-expression rendering
    from ccspark import quality
    timed("gopher_quality_ml_udf",
          lambda: quality.gopher_quality(pages, lang_col="lang",
                                         signals=False, engine="udf")
          .where("gopher_keep").count())
    ml_sql = Q.q_gopher_quality_ml(SPARK)
    timed("gopher_quality_ml_sql",
          lambda: spark.sql(ml_sql).where("gopher_keep").count())

    # production LID serving path: model trained once (prep, excluded),
    # scoring via the Iterator pandas UDF (timed) - the SQL twin
    # lid_ngram_sql is a correctness oracle, not the serving path
    from ccspark import lid
    docs_tbl = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lid_model = lid.train(docs_tbl, n=3, top_k=1000)
    timed("lid_predict",
          lambda: lid.predict(spark, docs_tbl, lid_model).count())

    # reference-comparable micro-op (Benchmark/Deduplicate.py semantics:
    # hash the Text column + drop_duplicates; reference: 13.9s hashing +
    # 22.4s dedup for <=250 segment frames single-node): hash+dedup rate
    # over the corpus lines replicated 20x.
    from pyspark.sql import functions as F
    lines = pipeline.corpus_lines(pages)
    big = (lines.crossJoin(spark.range(20).withColumnRenamed("id", "c"))
           .withColumn("url", F.concat_ws("#", "url", "c")).drop("c")
           .select("url", "line_id", "text").persist())
    n_lines = big.count()

    def hash_dedup():
        return (big.withColumn("h", F.xxhash64("text"))
                .groupBy("h")
                .agg(F.min(F.struct("url", "line_id")).alias("w")).count())
    timed("hash_dedup_micro", hash_dedup)
    big.unpersist()
    lines_per_sec = round(n_lines / max(timings["hash_dedup_micro"], 1e-9), 1)

    docs_per_sec = round(n_docs / max(timings["corpus_pipeline"], 1e-9), 1)
    out = {
        "metric": "corpus_pipeline_wall_sec",
        "value": timings["corpus_pipeline"],
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
        "n_docs": n_docs,
        "docs_per_sec": docs_per_sec,
        "hash_dedup_lines_per_sec": lines_per_sec,
        "cores": cpus,
    }

    # ---- sf1 section (r3 verdict item 7): the heavy queries at 10x the
    # fixture (~50k pages / 5k docs), min-of-3 - sf0.1's sub-second
    # timings drown real regressions in GC/warmup noise.  BENCH_SF1=0
    # skips it for quick local iterations.
    if os.environ.get("BENCH_SF1", "1") != "0":
        reps = int(os.environ.get("BENCH_SF1_REPS", "10"))

        def replicate(df, str_cols=(), num_cols=()):
            """reps copies with distinct keys (ONE crossJoin remaps all
            key columns)."""
            r = df.crossJoin(
                spark.range(reps).withColumnRenamed("id", "copy"))
            for c in str_cols:
                r = r.withColumn(c, F.concat_ws("#", c, "copy"))
            for c in num_cols:
                r = r.withColumn(c, F.col(c) * reps + F.col("copy"))
            return r.drop("copy")

        pages1 = replicate(pages, str_cols=("url",),
                           num_cols=("doc_id",)).persist()
        n1 = pages1.count()
        docs1 = replicate(spark.read.parquet(
            f"{sf_dir}/documents.parquet"), num_cols=("doc_id",)).persist()
        docs1.count()
        # point the template views at the replicated frames
        pages1.createOrReplaceTempView("pages_src")
        docs1.createOrReplaceTempView("documents")

        t1: dict[str, float] = {}

        def timed1(name, thunk):
            thunk()                    # warm
            best = float("inf")
            for _ in range(3):         # min-of-3 per the r3 verdict
                t0 = time.time()
                thunk()
                best = min(best, time.time() - t0)
            t1[name] = round(best, 3)

        timed1("corpus_pipeline",
               lambda: pipeline.corpus_lines(pages1).count())
        timed1("training_corpus",
               lambda: cc.build_training_corpus(
                   pages1, gopher_thresholds=Q.TRAINING_GOPHER_TH).count())
        timed1("cell_metrics",
               lambda: pipeline.cell_metrics(pages1).count())
        for name in ("corpus_lines", "pii_scrub", "union_segments",
                     "minhash_pairs", "doc_fingerprint", "word_ngrams",
                     "simhash", "c4_span_dedup"):
            sql = Q.QUERY_BUILDERS[name](SPARK)
            timed1(name, lambda s=sql: spark.sql(s).count())
        # production near-dup fast path (xxhash64 family) vs the
        # cross-engine md5 family the graded query uses: same module,
        # same plan shape, cheaper per-shingle hash (r4)
        from ccspark import dedup as dedup_mod
        timed1("minhash_pairs_md5_module",
               lambda: dedup_mod.minhash_near_dups(
                   docs1, num_hashes=12, bands=4).count())
        timed1("minhash_pairs_xxh64_module",
               lambda: dedup_mod.minhash_near_dups(
                   docs1, num_hashes=12, bands=4,
                   hash_family="xxhash64").count())
        # decontamination production path at 10x (corpus-shuffle-free
        # broadcast overlap; benchmark synthesized from the same docs)
        from ccspark import decontam as decon_mod
        bench_df = spark.sql(Q._decon_bench_sql(SPARK))
        timed1("decontamination_module",
               lambda: decon_mod.decontaminate(
                   docs1.select("doc_id", "text"), bench_df).count())
        timed1("winnow_fingerprints_xxh64",
               lambda: dedup_mod.winnow_fingerprints(
                   docs1, hash_family="xxhash64").count())
        # cross-crawl near-dup screen at 10x: history = first half of
        # the replicated corpus as a PERSISTED-shape signature table
        # (computed once, excluded - that is its production lifecycle),
        # new crawl = second half; the timed probe reads only signatures
        hist1 = docs1.where("doc_id % 2 = 0")
        new1 = docs1.where("doc_id % 2 = 1")
        hist_sig1 = dedup_mod.minhash_signature_table(hist1).persist()
        hist_sig1.count()
        timed1("incremental_near_screen",
               lambda: dedup_mod.incremental_near_dups(
                   new1, hist_sig1, threshold=0.9).count())
        hist_sig1.unpersist()
        # end-to-end semantic dedup at 10x: every vector gets 10 exact
        # copies (cosine 1.0, shared sign bucket), so the pairs stage
        # sees real duplicate multiplicity and CC sees 10-node stars
        from ccspark import similarity as sim_mod
        emb1 = replicate(spark.read.parquet(
            f"{sf_dir}/embeddings.parquet"), num_cols=("vec_id",)).persist()
        emb1.count()
        timed1("embedding_dedup_module",
               lambda: sim_mod.dedup_near_embeddings(
                   emb1, threshold=0.9).count())
        timed1("embedding_dedup_pre_exact",
               lambda: sim_mod.dedup_near_embeddings(
                   emb1, threshold=0.9, pre_exact=True).count())
        timed1("embedding_dedup_arrow",
               lambda: sim_mod.dedup_near_embeddings(
                   emb1, threshold=0.9, engine="arrow").count())
        emb1.unpersist()
        pages1.unpersist()
        docs1.unpersist()
        out["queries_sf1"] = t1
        out["n_docs_sf1"] = n1
        out["sf1_reps"] = reps
        out["docs_per_sec_sf1"] = round(
            n1 / max(t1["corpus_pipeline"], 1e-9), 1)

    print(json.dumps(out))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
