"""Similarity search over an embedding column (array<float>).

Not in the reference (its similarity needs were corpus-level, via the
corpus_similarity import in deduplication.py:11); a first-class component
of a training-data pipeline, so implemented Spark-first:

  * brute-force cosine top-k - the exact baseline: a broadcast join of the
    (small) query set against the full table, dot products in pure
    Catalyst higher-order functions (zip_with + aggregate), top-k via a
    window.  Scales linearly with the table; the queries are broadcast so
    the scan stays shuffle-free.
  * IVF (inverted file) top-k - the scale path: k-means coarse quantizer
    (pyspark.ml, seeded), each vector assigned to its nearest centroid
    list; a query probes only its nprobe nearest lists.  At 10^9+ vectors
    this turns a full scan into reading ~nprobe/nlists of the table, with
    the partition layout (partitionBy(list_id)) giving partition pruning.
  * sign-LSH bucketing (queries.q_ann_sign_lsh) - the no-training
    alternative; kept as a SQL template for the oracle gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def _cos(a: str, b: str):
    dot = F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
        f"cast(0.0 as double), (acc, v) -> acc + v)")
    na = F.expr(
        f"sqrt(aggregate(transform({a}, x -> x * x), "
        f"cast(0.0 as double), (acc, v) -> acc + v))")
    nb = F.expr(
        f"sqrt(aggregate(transform({b}, x -> x * x), "
        f"cast(0.0 as double), (acc, v) -> acc + v))")
    return dot / (na * nb)


def cosine_knn(table: DataFrame, queries: DataFrame, k: int = 5,
               id_col: str = "vec_id", vec_col: str = "embedding"
               ) -> DataFrame:
    """Exact top-k: broadcast the query set over the table scan."""
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("q_vec"))
    t = table.select(F.col(id_col).alias("neighbor_id"),
                     F.col(vec_col).alias("t_vec"))
    pairs = (t.crossJoin(F.broadcast(q))
             .where(F.col("neighbor_id") != F.col("query_id"))
             .withColumn("cosine", F.round(_cos("q_vec", "t_vec"), 6)))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), "neighbor_id")
    return (pairs.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= k)
            .select("query_id", "neighbor_id", "cosine", "rk"))


def build_ivf(table: DataFrame, n_lists: int = 8,
              vec_col: str = "embedding", seed: int = 42):
    """Train the coarse quantizer and assign every vector to a list.
    Returns (assigned_table_with_list_id, centroids_df)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    ml = table.withColumn("_features", array_to_vector(F.col(vec_col)))
    km = KMeans(k=n_lists, seed=seed, featuresCol="_features",
                predictionCol="list_id")
    model = km.fit(ml)
    assigned = model.transform(ml).drop("_features")
    spark = table.sparkSession
    cents = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in
         enumerate(model.clusterCenters())],
        "list_id int, centroid array<double>")
    return assigned, cents


def ivf_knn(assigned: DataFrame, centroids: DataFrame, queries: DataFrame,
            k: int = 5, nprobe: int = 2,
            id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Probe the nprobe nearest lists per query, exact rerank within."""
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("q_vec"))
    qc = (q.crossJoin(F.broadcast(centroids))
          .withColumn("c_sim", _cos("q_vec", "centroid")))
    w = Window.partitionBy("query_id").orderBy(F.desc("c_sim"), "list_id")
    probes = (qc.withColumn("p", F.row_number().over(w))
              .where(F.col("p") <= nprobe)
              .select("query_id", "q_vec", "list_id"))
    t = assigned.select(F.col(id_col).alias("neighbor_id"),
                        F.col(vec_col).alias("t_vec"), "list_id")
    pairs = (t.join(F.broadcast(probes), "list_id")
             .where(F.col("neighbor_id") != F.col("query_id"))
             .withColumn("cosine", F.round(_cos("q_vec", "t_vec"), 6)))
    w2 = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), "neighbor_id")
    return (pairs.withColumn("rk", F.row_number().over(w2))
            .where(F.col("rk") <= k)
            .select("query_id", "neighbor_id", "cosine", "rk"))
