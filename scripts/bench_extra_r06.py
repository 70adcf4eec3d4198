"""r6 noop-sink isolation bench (guide par.1.4): the bench-surface
queries at the sf1-section replicate scale (x$REPS of $SF_DIR, default
x10 of sf0.1 = the driver's sf=1.0 row counts for the main section),
timed against a noop sink so the computation is measured, not the sink.
This is the measurement harness behind the numbers in
OPTIMIZATION_r06.md; bench.py (frozen) remains the driver's meter.

Run: python scripts/bench_extra_r06.py   (quiet host; ~4 min)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("REPS", "10"))
    from ccspark.session import get_spark
    from pyspark.sql import functions as F
    from ccspark import queries as Q
    from ccspark.sqlgen import SPARK

    spark = get_spark("bench_extra_r06", cores=32)
    Q.ensure_views(spark, sf_dir)
    from ccspark.fixtures_sql import pages_spark
    pages = pages_spark(spark, sf_dir, materialize=True)

    def replicate(df, str_cols=(), num_cols=()):
        r = df.crossJoin(spark.range(reps).withColumnRenamed("id", "copy"))
        for c in str_cols:
            r = r.withColumn(c, F.concat_ws("#", c, "copy"))
        for c in num_cols:
            r = r.withColumn(c, F.col(c) * reps + F.col("copy"))
        return r.drop("copy")

    pages1 = (replicate(pages, ("url",), ("doc_id",))
              .select("doc_id", "url", "text", "lang").persist())
    pages1.count()
    pages1.createOrReplaceTempView("pages_src")
    docs1 = replicate(spark.read.parquet(f"{sf_dir}/documents.parquet"),
                      num_cols=("doc_id",)).persist()
    docs1.count()
    docs1.createOrReplaceTempView("documents")
    emb1 = replicate(spark.read.parquet(f"{sf_dir}/embeddings.parquet"),
                     num_cols=("vec_id",)).persist()
    emb1.count()
    emb1.createOrReplaceTempView("embeddings")

    out: dict[str, float] = {}

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def timed(name, thunk, n=2):
        spark.sparkContext.setJobDescription(f"r06x: {name}")
        thunk()
        best = float("inf")
        for _ in range(n):
            t0 = time.time()
            thunk()
            best = min(best, time.time() - t0)
        out[name] = round(best, 3)

    for name in ("corpus_lines", "cell_metrics", "dedup_keep_none",
                 "pii_scrub", "union_segments", "perplexity_outliers",
                 "minhash_pairs", "doc_fingerprint", "word_ngrams",
                 "simhash", "knn_cosine", "c4_span_dedup"):
        sql = Q.QUERY_BUILDERS[name](SPARK)
        timed(name, lambda s=sql: noop(spark.sql(s)))
    lsh = Q.q_sign_lsh_suite(SPARK)
    timed("sign_lsh_suite", lambda: noop(spark.sql(lsh)))

    from ccspark import dedup as D, pipeline, similarity as S
    timed("corpus_pipeline_module",
          lambda: pipeline.corpus_lines(pages1).count())
    timed("minhash_md5_module",
          lambda: D.minhash_near_dups(docs1, num_hashes=12, bands=4).count())
    timed("minhash_xxh64_module",
          lambda: D.minhash_near_dups(docs1, num_hashes=12, bands=4,
                                      hash_family="xxhash64").count())
    timed("winnow_xxh64_module",
          lambda: D.winnow_fingerprints(docs1,
                                        hash_family="xxhash64").count())
    timed("embedding_dedup_module",
          lambda: S.dedup_near_embeddings(emb1, threshold=0.9).count())

    print(json.dumps({"sf_dir": sf_dir, "reps": reps, "queries": out}))


if __name__ == "__main__":
    main()
