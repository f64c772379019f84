"""Two-parallelism scaling of the CATALYST-ONLY pipeline operators
(MinHash-LSH dedup + benchmark decontamination) — the control for the
encode-job scaling story: these plans are pure JVM whole-stage codegen
(md5, higher-order array transforms, one banded shuffle; zero Python
workers, zero Arrow crossing), so their N->4N efficiency shows what
this box gives Spark plans that are NOT bound by the Python/substrate
crossing the encode job pays.

Input: the sf0.1 documents table replicated k times with offset ids
(deterministic; near-dup families survive replication, so the LSH join
has real work). Each level runs in its own subprocess (fresh JVM),
interleaved best-of like bench/fused_scaling.py. Appends kind=pipeline
to BENCH/runs.jsonl.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, sys, time
sys.path.insert(0, "__REPO__")
from pyspark.sql import SparkSession, functions as F
from orc_haskell_spark.pipeline import decontam, dedup

cpus, reps, path = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
spark = (SparkSession.builder.master(f"local[{cpus}]")
         .config("spark.sql.shuffle.partitions", str(cpus))
         .config("spark.driver.memory", "48g")
         .config("spark.sql.session.timeZone", "UTC")
         .appName(f"pipeline-scaling-{cpus}").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(path)
n_docs = docs.count()
raw_bytes = docs.agg(F.sum(F.octet_length("text"))).collect()[0][0]
bench = docs.filter("doc_id % 1000 = 0").select(
    F.col("doc_id").alias("bid"), "text")

def work():
    pairs = dedup.minhash_lsh_pairs(docs, "doc_id", "text",
                                    threshold=0.8).count()
    bad = decontam.contamination(docs, "doc_id", "text", bench, n=8) \
        .agg(F.sum(F.col("contaminated").cast("int"))).collect()[0][0]
    return pairs, bad

work()                                         # warm codegen + JIT
best = None
for _ in range(reps):
    t0 = time.perf_counter()
    pairs, bad = work()
    dt = time.perf_counter() - t0
    best = dt if best is None else min(best, dt)
print(json.dumps({"cpus": cpus, "wall": best, "docs": n_docs,
                  "raw_bytes": int(raw_bytes), "pairs": int(pairs),
                  "contaminated": int(bad),
                  "docs_per_s": n_docs / best}))
spark.stop()
"""

_GEN = r"""
import sys
sys.path.insert(0, "__REPO__")
from pyspark.sql import SparkSession, functions as F

k, src, path = int(sys.argv[1]), sys.argv[2], sys.argv[3]
spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.session.timeZone", "UTC")
         .appName("pipeline-scaling-gen").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(src)
out = docs.crossJoin(spark.range(k).withColumnRenamed("id", "rep")) \
    .withColumn("doc_id", F.col("doc_id") + F.col("rep") * 1000000) \
    .drop("rep").repartition(64)
out.write.parquet(path)
spark.stop()
"""


def _run(code: str, args: list[str]) -> dict:
    out = subprocess.run([sys.executable, "-c",
                          code.replace("__REPO__", REPO), *args],
                         capture_output=True, text=True,
                         check=True, cwd=REPO)
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    return json.loads(line[-1]) if line else {}


def main() -> None:
    reps = int(os.environ.get("SCALE_REPS", "2"))
    rounds = int(os.environ.get("SCALE_ROUNDS", "2"))
    n_lo = int(os.environ.get("SCALE_N", "2"))
    k = int(os.environ.get("SCALE_REPLICATE", "4"))     # 5000 -> 20k docs
    src = os.environ.get("SPARK_GRAFT_SF_DIR",
                         "/root/testdata/sf0.1") + "/documents.parquet"
    lo = hi = None
    with tempfile.TemporaryDirectory(prefix="pipe_scale_") as tmp:
        path = os.path.join(tmp, "docs")
        subprocess.run([sys.executable, "-c", _GEN.replace("__REPO__", REPO),
                        str(k), src, path], check=True,
                       capture_output=True, cwd=REPO)
        for _ in range(rounds):
            r_lo = _run(_CHILD, [str(n_lo), str(reps), path])
            r_hi = _run(_CHILD, [str(4 * n_lo), str(reps), path])
            if lo is None or r_lo["wall"] < lo["wall"]:
                lo = r_lo
            if hi is None or r_hi["wall"] < hi["wall"]:
                hi = r_hi
    eff = hi["docs_per_s"] / (4 * lo["docs_per_s"])
    rec = {"kind": "pipeline", "lo": lo, "hi": hi, "eff": round(eff, 3)}
    if os.environ.get("SCALE_NO_RECORD") != "1":
        with open(os.path.join(REPO, "BENCH", "runs.jsonl"), "a") as f:
            f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
