"""Similarity search (exact + IVF), multimodal binary plumbing, and
structured-streaming pipeline tests."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from ccspark import multimodal, similarity, streaming
from ccspark.fixtures_sql import pages_spark


# ---------------- similarity ----------------

def emb(spark, sf="/root/testdata/sf0.001"):
    return spark.read.parquet(f"{sf}/embeddings.parquet")


def test_cosine_knn_exact(spark):
    e = emb(spark)
    q = e.where(F.col("vec_id") < 3)
    out = similarity.cosine_knn(e, q, k=5)
    rows = out.collect()
    assert len(rows) == 15
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, rs in by_q.items():
        rs = sorted(rs, key=lambda r: r.rk)
        assert [r.rk for r in rs] == [1, 2, 3, 4, 5]
        assert all(rs[i].cosine >= rs[i + 1].cosine for i in range(4))
        assert all(r.neighbor_id != qid for r in rs)


def test_ivf_knn_recall(spark):
    e = emb(spark)
    q = e.where(F.col("vec_id") < 5)
    exact = similarity.cosine_knn(e, q, k=3).collect()
    assigned, cents = similarity.build_ivf(e, n_lists=4)
    approx = similarity.ivf_knn(assigned, cents, q, k=3, nprobe=2).collect()
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.5, recall          # nprobe=2 of 4 lists
    # full probe == exact
    full = similarity.ivf_knn(assigned, cents, q, k=3, nprobe=4).collect()
    assert {(r.query_id, r.neighbor_id) for r in full} == exact_set


def test_ivf_partial_probe_recall_on_clustered_vectors(spark):
    """The scale-path claim: on data with real cluster structure, probing
    2 of 10 lists keeps recall@5 >= 0.9 while scanning ~20% of the table.
    (The driver's fixture embeddings are near-uniform noise - same-label
    neighbor fraction 0.13 - so this bar needs clustered vectors; the
    driver-gated ivf_recall query asserts full-probe == exact instead.)"""
    import numpy as np
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(10, 16)) * 5.0
    rows = []
    for i in range(400):
        c = i % 10
        v = centers[c] + rng.normal(size=16) * 0.3
        rows.append((i, [float(x) for x in v], c))
    e = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>, label int")
    q = e.where(F.col("vec_id") < 20)
    exact = similarity.cosine_knn(e, q, k=5).collect()
    assigned, cents = similarity.build_ivf(e, n_lists=10)
    approx = similarity.ivf_knn(assigned, cents, q, k=5, nprobe=2).collect()
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.9, recall


def test_pq_shortlist_rerank_exact_on_clustered_vectors(spark):
    """PQ is the memory-side scale path (8 int codes per vector here vs
    16 doubles): the two-stage shortlist+rerank must recover the exact
    top-5 on clustered vectors, and codes must be within the nbits
    range."""
    import numpy as np
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(10, 16)) * 5.0
    rows = [(i, [float(x) for x in centers[i % 10] +
                 rng.normal(size=16) * 0.3], i % 10) for i in range(400)]
    e = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>, label int")
    codes, books = similarity.build_pq(e, m=8, nbits=4)
    crow = codes.first()
    assert len(crow.pq_code) == 8
    assert all(0 <= c < 16 for c in crow.pq_code)
    assert books.shape == (8, 16, 2)
    q = e.where(F.col("vec_id") < 20)
    exact = {(r.query_id, r.neighbor_id)
             for r in similarity.cosine_knn(e, q, k=5).collect()}
    rr = {(r.query_id, r.neighbor_id)
          for r in similarity.pq_knn(codes, books, q, k=5,
                                     rerank_with=e,
                                     shortlist=50).collect()}
    assert rr == exact
    # deterministic: rebuild gives identical codes
    codes2, _ = similarity.build_pq(e, m=8, nbits=4)
    a = sorted((r.vec_id, tuple(r.pq_code)) for r in codes.collect())
    b = sorted((r.vec_id, tuple(r.pq_code)) for r in codes2.collect())
    assert a == b


# ---------------- multimodal ----------------

def test_dedup_near_embeddings(spark):
    """End-to-end semantic dedup: scaled copies and tiny perturbations of
    a vector collapse transitively to the min-id representative; sign-
    distinct and low-cosine vectors survive.  A negated vector lands in
    the opposite sign bucket (never compared) AND has cosine -1 - safe
    either way."""
    base = [1.0] * 64
    tweaked = [1.0] * 64
    tweaked[2] = 0.7                       # cosine ~0.999 vs base
    alt = [(-1.0 if i % 2 == 0 else 1.0) for i in range(64)]  # dim1<0:
    rows = [                               # other bucket, cosine 0 anyway
        Row(vec_id=0, label=0, embedding=base),
        Row(vec_id=1, label=0, embedding=[2.0 * x for x in base]),
        Row(vec_id=2, label=0, embedding=tweaked),
        Row(vec_id=3, label=1, embedding=alt),
        Row(vec_id=4, label=1, embedding=[-x for x in base]),
    ]
    e = spark.createDataFrame(rows)
    pairs = similarity.sign_lsh_pairs(e, threshold=0.9)
    got = {(r.vec_a, r.vec_b) for r in pairs.collect()}
    assert got == {(0, 1), (0, 2), (1, 2)}
    kept = {r.vec_id for r in
            similarity.dedup_near_embeddings(e, threshold=0.9).collect()}
    assert kept == {0, 3, 4}
    # transitive chain: 0~1 and 1~2 suffice even if 0~2 were missed
    chain = spark.createDataFrame(rows[:3])
    kept2 = {r.vec_id for r in similarity.dedup_near_embeddings(
        chain, threshold=0.9).collect()}
    assert kept2 == {0}
    # pre_exact identity at 10x copy multiplicity: every vector gets 10
    # byte-identical copies; survivors must equal the direct path's
    many = spark.createDataFrame(
        [Row(vec_id=r.vec_id + 100 * c, label=r.label,
             embedding=r.embedding)
         for r in rows for c in range(10)])
    direct = {r.vec_id for r in similarity.dedup_near_embeddings(
        many, threshold=0.9, pre_exact=False).collect()}
    pre = {r.vec_id for r in similarity.dedup_near_embeddings(
        many, threshold=0.9, pre_exact=True).collect()}
    assert direct == pre == {0, 3, 4}, (direct, pre)
    # the r6 facade DEFAULT is pre_exact=True: same survivors here
    dflt = {r.vec_id for r in similarity.dedup_near_embeddings(
        many, threshold=0.9).collect()}
    assert dflt == pre, dflt
    # the per-bucket BLAS kernel: identical pairs and survivors (these
    # cosines sit nowhere near the round-4 threshold boundary)
    pa = {(r.vec_a, r.vec_b) for r in similarity.sign_lsh_pairs(
        e, threshold=0.9, engine="arrow").collect()}
    assert pa == got
    arrow = {r.vec_id for r in similarity.dedup_near_embeddings(
        many, threshold=0.9, engine="arrow").collect()}
    assert arrow == direct


def test_media_meta_sniffs_types(spark):
    rows = [
        Row(doc_id=0, html=bytearray(b"\xff\xd8\xff\xe0rest-of-jpeg")),
        Row(doc_id=1, html=bytearray(b"\x89PNG\r\n\x1a\nrest")),
        Row(doc_id=2, html=bytearray(b"<htmlfoo")),
        Row(doc_id=3, html=bytearray(b"\x00\x01\x02\x03")),
    ]
    df = spark.createDataFrame(rows)
    got = {r.doc_id: r for r in multimodal.media_meta(df).collect()}
    assert got[0].media_type == "jpeg"
    assert got[1].media_type == "png"
    assert got[2].media_type == "html"
    assert got[3].media_type == "unknown"
    assert got[0].size_bytes == len(rows[0].html)


def test_decode_images_stub_deterministic(spark):
    pages = pages_spark(spark, "/root/testdata/sf0.001", materialize=True)
    out = multimodal.decode_images(pages.limit(20))
    rows = out.collect()
    assert len(rows) == 20
    assert out.schema.simpleString() == (
        "struct<doc_id:bigint,width:int,height:int,channels:int,"
        "format:string,ok:boolean>")
    again = {r.doc_id: (r.width, r.height)
             for r in multimodal.decode_images(pages.limit(20)).collect()}
    for r in rows:
        assert again[r.doc_id] == (r.width, r.height)
        assert r.ok


def test_decode_strict_raises_without_codec(spark):
    pages = pages_spark(spark, "/root/testdata/sf0.001", materialize=True)
    if multimodal._try_real_decoder() is None:
        with pytest.raises(NotImplementedError):
            multimodal.decode_images(pages, strict=True)


def test_resize_stage_size_contract(spark):
    """The resize stage's output-size contract holds regardless of codec:
    len(pixels) == width*height*3 for every ok row; None blobs fail soft."""
    df = spark.createDataFrame([
        Row(doc_id=0, html=bytes([1, 2, 3, 4, 5])),
        Row(doc_id=1, html=b"x" * 1000),
        Row(doc_id=2, html=None),
    ])
    got = {r.doc_id: r for r in
           multimodal.resize_images(df, width=8, height=4).collect()}
    assert got[0].ok and len(got[0].pixels) == 8 * 4 * 3
    assert got[1].ok and len(got[1].pixels) == 8 * 4 * 3
    assert not got[2].ok and got[2].pixels is None
    # deterministic across runs
    again = {r.doc_id: r for r in
             multimodal.resize_images(df, width=8, height=4).collect()}
    assert bytes(again[1].pixels) == bytes(got[1].pixels)


def test_extract_features_feeds_similarity(spark):
    """The feature stage emits unit-norm array<float> embeddings that plug
    straight into the ANN operators; identical blobs embed identically."""
    df = spark.createDataFrame([
        Row(doc_id=0, html=b"aaaa bbbb cccc dddd" * 10),
        Row(doc_id=1, html=b"aaaa bbbb cccc dddd" * 10),   # exact dup
        Row(doc_id=2, html=bytes(range(256)) * 4),
        Row(doc_id=3, html=None),
    ])
    emb = multimodal.extract_features(df, dim=16)
    rows = {r.doc_id: r for r in emb.collect()}
    assert rows[0].embedding == rows[1].embedding
    assert rows[0].embedding != rows[2].embedding
    assert not rows[3].ok
    import math
    assert math.isclose(sum(x * x for x in rows[0].embedding), 1.0,
                        rel_tol=1e-5)
    ok = emb.where("ok").withColumnRenamed("doc_id", "vec_id") \
        .withColumn("embedding", F.expr(
            "transform(embedding, x -> cast(x as double))"))
    knn = similarity.cosine_knn(ok, ok.where("vec_id = 0"), k=2)
    got = [(r.neighbor_id, r.cosine) for r in
           knn.orderBy("rk").collect()]
    assert got[0] == (1, 1.0)          # the dup is the nearest neighbor


def test_multimodal_strict_raises_without_codecs(spark):
    df = spark.createDataFrame([Row(doc_id=0, html=b"zz")])
    import pytest as _pt
    with _pt.raises(NotImplementedError):
        multimodal.resize_images(df, strict=True)
    with _pt.raises(NotImplementedError):
        multimodal.extract_features(df, strict=True)


def test_sample_frames_fanout(spark):
    pages = pages_spark(spark, "/root/testdata/sf0.001", materialize=True)
    out = multimodal.sample_frames(pages.limit(5), n_frames=3).collect()
    assert len(out) == 15
    assert {r.frame_idx for r in out} == {0, 1, 2}
    assert all(r.frame is not None for r in out)


# ---------------- streaming ----------------

def test_stream_corpus_matches_batch(spark, tmp_path):
    pages = pages_spark(spark, "/root/testdata/sf0.001", materialize=True)
    in_dir = str(tmp_path / "in")
    pages.limit(100).repartition(4).write.parquet(in_dir)

    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    streaming.stream_corpus_build(spark, in_dir, out_dir, ckpt)
    got = spark.read.parquet(out_dir)

    from ccspark import pipeline
    batch_in = spark.read.parquet(in_dir)
    df = pipeline.clean_and_filter(
        pipeline.explode_lines(pipeline.with_geo(batch_in)))
    batch_hashes = {r.hash for r in
                    df.withColumn("hash", F.xxhash64("text"))
                      .select("hash").distinct().collect()}
    assert {r.hash for r in got.select("hash").collect()} == batch_hashes
    # idempotent restart: checkpoint knows all files are done -> no new rows
    streaming.stream_corpus_build(spark, in_dir, out_dir, ckpt)
    assert spark.read.parquet(out_dir).count() == len(batch_hashes)


def test_stream_dedup_within_watermark_across_batches(spark, tmp_path):
    """Duplicates landing in DIFFERENT micro-batches but within the
    watermark delay must still be dropped (bounded-state streaming dedup);
    output matches the batch dropDuplicates ground truth when every dup
    falls inside the delay."""
    import datetime as dt
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    # 3 files -> 3 micro-batches; (user_id, value) keys repeat across files
    rows_by_file = [
        [(1, 10.0, base), (2, 20.0, base)],
        [(1, 10.0, base + dt.timedelta(minutes=5)),     # dup of batch 1
         (3, 30.0, base + dt.timedelta(minutes=5))],
        [(2, 20.0, base + dt.timedelta(minutes=10)),    # dup of batch 1
         (3, 31.0, base + dt.timedelta(minutes=10))],   # new value -> kept
    ]
    in_dir = str(tmp_path / "in")
    for i, rows in enumerate(rows_by_file):
        spark.createDataFrame(
            rows, "user_id long, value double, ts timestamp") \
            .coalesce(1).write.mode("append").parquet(in_dir)
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    streaming.stream_dedup_events(spark, in_dir, out_dir, ckpt,
                                  delay="1 hour")
    got = sorted((r.user_id, r.value)
                 for r in spark.read.parquet(out_dir).collect())
    want = sorted((r.user_id, r.value)
                  for r in spark.read.parquet(in_dir)
                  .dropDuplicates(["user_id", "value"]).collect())
    assert got == want == [(1, 10.0), (2, 20.0), (3, 30.0), (3, 31.0)]


def test_stream_corpus_build_watermarked_dedup_matches_exact(
        spark, tmp_path):
    """The bounded-state corpus stream must produce the same rows as the
    exact-dedup stream on a finite backlog (all dups within the delay)."""
    src = pages_spark(spark, "/root/testdata/sf0.001")
    in_dir = str(tmp_path / "pages")
    src.write.parquet(in_dir)
    out_w = str(tmp_path / "out_w")
    streaming.stream_corpus_build(
        spark, in_dir, out_w, str(tmp_path / "ck_w"),
        dedup_watermark="24 hours")
    out_e = str(tmp_path / "out_e")
    streaming.stream_corpus_build(
        spark, in_dir, out_e, str(tmp_path / "ck_e"))
    w = sorted((r.url, r.pos, r.text)
               for r in spark.read.parquet(out_w).collect())
    e = sorted((r.url, r.pos, r.text)
               for r in spark.read.parquet(out_e).collect())
    assert w == e and len(w) > 0


def test_windowed_event_counts_batch_mode(spark):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = streaming.windowed_event_counts(spark, events).collect()
    assert out
    total = sum(r.n_events for r in out)
    assert total == events.count()
    for r in out:
        assert (r.window_end - r.window_start).total_seconds() == 600


def test_stateful_user_totals_across_microbatches(spark, tmp_path):
    events = (spark.read.parquet("/root/testdata/sf0.001/events.parquet")
              .select("user_id", "value", "ts").limit(600))
    in_dir = str(tmp_path / "ev_in")
    events.repartition(3).write.parquet(in_dir)     # 3 files -> 3 batches

    out_dir = str(tmp_path / "ev_out")
    ckpt = str(tmp_path / "ev_ckpt")
    streaming.stateful_user_totals(spark, in_dir, out_dir, ckpt)
    got = spark.read.parquet(out_dir)

    # every user emits once per micro-batch it appears in; the MAX row is
    # the final state and must equal batch ground truth
    final = (got.groupBy("user_id")
             .agg(F.max("events_so_far").alias("n"),
                  F.max("value_so_far").alias("v")))
    truth = (spark.read.parquet(in_dir).groupBy("user_id")
             .agg(F.count("*").alias("n"),
                  F.round(F.sum("value"), 2).alias("v")))
    f = {r.user_id: (r.n, r.v) for r in final.collect()}
    t = {r.user_id: (r.n, r.v) for r in truth.collect()}
    assert f == t
    # state genuinely accumulated across batches: some user emitted
    # more than one snapshot with increasing counts
    multi = (got.groupBy("user_id").count().where(F.col("count") > 1))
    assert multi.count() > 0


def test_stream_plus_compactor_equals_batch_pipeline(spark, tmp_path):
    """The incremental path end-to-end.  dedup=False stream (defer dedup
    to the compactor's deterministic tie-break) must equal the one-shot
    batch pipeline EXACTLY; a stream-deduped sink (arrival-order
    keep-first) must still yield the identical distinct-text set."""
    from ccspark import pipeline
    src = pages_spark(spark, "/root/testdata/sf0.001")
    in_dir = str(tmp_path / "pages")
    src.write.parquet(in_dir)
    batch = pipeline.corpus_lines(spark.read.parquet(in_dir))
    b = sorted((r.url, r.line_id, r.text) for r in batch.collect())

    out = str(tmp_path / "out")
    streaming.stream_corpus_build(spark, in_dir, out, str(tmp_path / "ck"),
                                  dedup=False)
    compacted = streaming.compact_stream_output(spark, out)
    a = sorted((r.url, r.line_id, r.text) for r in compacted.collect())
    assert a == b and len(a) > 0

    out2 = str(tmp_path / "out2")
    streaming.stream_corpus_build(spark, in_dir, out2,
                                  str(tmp_path / "ck2"),
                                  dedup_watermark="24 hours")
    c2 = streaming.compact_stream_output(spark, out2)
    assert sorted(r.text for r in c2.collect()) == sorted(
        r.text for r in batch.collect())


def test_stream_screen_new_crawl_matches_batch(spark, tmp_path):
    """foreachBatch cross-crawl screen over multiple micro-batches ==
    the batch screen over the union (per-row vs static history, so
    stream == batch by construction - asserted anyway)."""
    from ccspark import dedup
    base = " ".join(f"s{i}" for i in range(40))
    hist = spark.createDataFrame([
        Row(doc_id=0, text=base),
        Row(doc_id=1, text=" ".join(f"h{i}" for i in range(40))),
    ])
    hashes = hist.select(F.xxhash64("text").alias("hash"))
    sig = dedup.minhash_signature_table(hist)
    new_rows = [
        Row(doc_id=100, text=base),                           # exact
        Row(doc_id=101, text=base.replace("s39", "edit")),    # near
        Row(doc_id=102, text=" ".join(f"n{i}" for i in range(40))),
        Row(doc_id=103, text=" ".join(f"m{i}" for i in range(40))),
    ]
    in_dir = str(tmp_path / "in")
    # two appended files -> maxFilesPerTrigger=1 forces two micro-batches
    for chunk in (new_rows[:2], new_rows[2:]):
        spark.createDataFrame(chunk).coalesce(1) \
            .write.mode("append").parquet(in_dir)
    out_dir = str(tmp_path / "out")
    streaming.stream_screen_new_crawl(
        spark, in_dir, out_dir, str(tmp_path / "ckpt"),
        history_hashes=hashes, history_sig=sig, near_threshold=0.9,
        max_files_per_trigger=1)
    got = {r.doc_id for r in spark.read.parquet(out_dir).collect()}
    batch = dedup.incremental_near_dups(
        dedup.incremental_new_rows(
            spark.read.parquet(in_dir)
            .withColumn("hash", F.xxhash64("text")), hashes).drop("hash"),
        sig, threshold=0.9)
    assert got == {r.doc_id for r in batch.collect()} == {102, 103}


def test_sign_lsh_zero_norm_vectors_both_engines(spark):
    """r4 advice: Spark 4 runs ANSI mode, so 0.0/0.0 RAISES - a
    zero-norm embedding sharing a bucket used to crash the exact
    engine's cosine.  An all-zero vector lands in the all-'1' sign
    bucket (every element >= 0), i.e. the SAME bucket as an
    all-positive vector - the collision is guaranteed here, not
    hypothetical.  Both engines must exclude zero-norm vectors from
    pairing; dedup keeps every zero copy on the direct path and
    collapses them under pre_exact (exact byte copies)."""
    base = [1.0] * 64
    rows = [
        Row(vec_id=0, embedding=base),
        Row(vec_id=1, embedding=[2.0 * x for x in base]),
        Row(vec_id=2, embedding=[0.0] * 64),       # same bucket as 0/1
        Row(vec_id=3, embedding=[0.0] * 64),
    ]
    e = spark.createDataFrame(rows)
    for engine in ("exact", "arrow"):
        got = {(r.vec_a, r.vec_b) for r in similarity.sign_lsh_pairs(
            e, threshold=0.9, engine=engine).collect()}
        assert got == {(0, 1)}, engine
        kept = {r.vec_id for r in similarity.dedup_near_embeddings(
            e, threshold=0.9, engine=engine, pre_exact=False).collect()}
        assert kept == {0, 2, 3}, engine            # zero copies survive
        pre = {r.vec_id for r in similarity.dedup_near_embeddings(
            e, threshold=0.9, engine=engine, pre_exact=True).collect()}
        assert pre == {0, 2}, engine                # byte copies collapse
