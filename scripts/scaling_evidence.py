"""North-rule scaling evidence: the same corpus-pipeline job at two
parallelism levels (local[8] vs local[32] - N and 4N cores on identical
input), reporting docs/sec at both plus scaling efficiency
T_N / (4 * T_4N).  Default N=4 (so 4N=16 stays within the 32-CPU box:
local-mode JVM task threads + python UDF workers both burn CPU, and
oversubscribing the host would understate the scaling a real 4N-executor
cluster achieves; override with SCALING_N).  Run in separate subprocesses (one SparkContext each);
input is the sf0.1 pages replicated (sized by argv[1], distinct urls per
replica) so compute dominates fixed overheads.  Appends results to
BENCH.md.

Size bound: replicas beyond ~1800 (9M docs) overflow the 24g local
JVM heap once the input is persisted (MEMORY_AND_DISK cache thrash at
27M docs) - at larger sizes switch the persist to DISK_ONLY or run on a
real cluster; the 9M-doc quiet-host sample is the headline number.

Usage: python scripts/scaling_evidence.py [replicas]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

SNIPPET = r"""
import json, sys, time
cores = int(sys.argv[1]); replicas = int(sys.argv[2])
sys.path.insert(0, ".")
from ccspark.session import get_spark
from ccspark.fixtures_sql import pages_spark
from ccspark import pipeline
from pyspark.sql import functions as F

spark = get_spark("scaling", cores=cores)
# partition-size targets proportional to this toy input, as one would set
# 64-128MB targets at the 100TB scale; without this AQE coalesces the
# ~20MB shuffle into 1-2 partitions and serializes every stage.
spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
pages = pages_spark(spark, "/root/testdata/sf0.1", materialize=True)
pages = (pages.crossJoin(spark.range(replicas).withColumnRenamed("id", "copy"))
         .withColumn("url", F.concat_ws("#", "url", "copy"))
         .withColumn("doc_id", F.col("doc_id") * replicas + F.col("copy"))
         .drop("copy")
         .repartition(128, "url"))      # input splits, same for both runs
pages = pages.persist()                 # timed region = the pipeline only,
n = pages.count()                       # not the replication fixture prep
pipeline.corpus_lines(pages).count()          # warm (JVM+python workers)
t = float("inf")                              # min-of-3 AFTER warm, same k
rows = 0                                      # in both phases: the ratio
for _ in range(3):                            # T_N/(4*T_4N) is pathologically
    t0 = time.time()                          # sensitive to pairing one
    rows = pipeline.corpus_lines(pages).count()   # phase's best sample with
    t = min(t, time.time() - t0)              # the other's worst (r4 analysis
                                              # in BENCH.md), so push both
                                              # mins toward their true floor
print(json.dumps({"cores": cores, "docs": n, "rows": rows,
                  "sec": round(t, 2),
                  "docs_per_sec": round(n / t, 1)}))
"""


def run(cores: int, replicas: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", SNIPPET, str(cores), str(replicas)],
        capture_output=True, text=True, cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    n_small = int(os.environ.get("SCALING_N", "4"))
    r8 = run(n_small, replicas)
    r32 = run(n_small * 4, replicas)
    eff = round(r8["sec"] / (4 * r32["sec"]), 3)
    print(json.dumps({"N8": r8, "N32": r32, "scaling_efficiency": eff}))
    md = f"""
## Scaling evidence ({r8['docs']} docs, corpus pipeline, same input)

| cores | wall sec | docs/sec |
| --- | --- | --- |
| {r8['cores']} (N) | {r8['sec']} | {r8['docs_per_sec']} |
| {r32['cores']} (4N) | {r32['sec']} | {r32['docs_per_sec']} |

Scaling efficiency N -> 4N = T_N / (4 * T_4N) = **{eff}**
(north_rule target >= 0.8).
"""
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH.md"), "a") as fh:
        fh.write(md)


if __name__ == "__main__":
    main()
