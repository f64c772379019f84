"""Two-parallelism scaling of the fused SINK job
(manifest.encode_parquet_to_dir): the full write path — split planning,
pyarrow row-group scan, stripe encode AND the encoded-parquet output
write all inside Python workers, ledger commit at the end. VERDICT r3
item 7: pin the per-node operating point of the sink at the SAME 2->8
span the agg variant was measured on (0.71-0.76), writing to tmpfs
(/dev/shm) so the measurement sees the engine, not the sandbox's
~115 MB/s disk cap.

Each rep writes to a FRESH output dir (the sink is resumable: a reused
dir would encode zero splits on the second rep). One subprocess per
level, levels interleaved across rounds (co-tenant drift), per-level
best-of. Appends kind=sink to BENCH/runs.jsonl.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_GEN = r"""
import sys
sys.path.insert(0, %(repo)r)
from pyspark.sql import SparkSession
from orc_haskell_spark import gen

rows, path = int(sys.argv[1]), sys.argv[2]
spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.driver.memory", "48g")
         .appName("sink-scaling-gen").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
gen.pages_df(spark, rows, num_partitions=64).write.parquet(path)
spark.stop()
"""

_CHILD = r"""
import json, shutil, sys, tempfile, time
sys.path.insert(0, %(repo)r)
from pyspark.sql import SparkSession, functions as F
from orc_haskell_spark import manifest

cpus = int(sys.argv[1])
rows = int(sys.argv[2])
reps = int(sys.argv[3])
path = sys.argv[4]
out_base = sys.argv[5]
spark = (SparkSession.builder.master(f"local[{cpus}]")
         .config("spark.sql.shuffle.partitions", str(cpus))
         .config("spark.driver.memory", "48g")
         .config("spark.sql.session.timeZone", "UTC")
         .appName(f"sink-scaling-{cpus}").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
pages = spark.read.parquet(path)
raw_bytes = pages.agg(
    F.sum(F.octet_length("html") + F.octet_length("text")
          + F.octet_length("url"))).collect()[0][0]
best = None
for rep in range(reps + 1):  # rep 0 = warmup (workers + page cache)
    out = tempfile.mkdtemp(prefix=f"sink{cpus}_", dir=out_base)
    t0 = time.perf_counter()
    r = manifest.encode_parquet_to_dir(spark, path, out,
                                       num_partitions=cpus * 2,
                                       source="sink-scaling")
    dt = time.perf_counter() - t0
    assert r["splits_encoded"] == r["splits_total"] > 0, r
    shutil.rmtree(out, ignore_errors=True)
    if rep:
        best = dt if best is None else min(best, dt)
print(json.dumps({"cpus": cpus, "wall": best, "raw_bytes": int(raw_bytes),
                  "gbps": raw_bytes / best / 1e9}))
spark.stop()
"""


def _run(code: str, args: list[str]) -> str:
    out = subprocess.run([sys.executable, "-c", code % {"repo": REPO}] + args,
                         capture_output=True, text=True, check=True, cwd=REPO)
    return out.stdout


def run_level(cpus: int, rows: int, reps: int, path: str,
              out_base: str) -> dict:
    out = _run(_CHILD, [str(cpus), str(rows), str(reps), path, out_base])
    line = [ln for ln in out.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main():
    rows = int(os.environ.get("SCALE_ROWS", "200000"))
    reps = int(os.environ.get("SCALE_REPS", "2"))
    rounds = int(os.environ.get("SCALE_ROUNDS", "2"))
    n_lo = int(os.environ.get("SCALE_N", "2"))
    out_base = os.environ.get("SCALE_OUT", "/dev/shm")
    if not os.path.isdir(out_base):
        out_base = tempfile.gettempdir()
    lo = hi = None
    with tempfile.TemporaryDirectory(prefix="sink_scale_") as tmp:
        path = os.path.join(tmp, "pages")
        _run(_GEN, [str(rows), path])
        for _ in range(rounds):
            r_lo = run_level(n_lo, rows, reps, path, out_base)
            r_hi = run_level(4 * n_lo, rows, reps, path, out_base)
            if lo is None or r_lo["wall"] < lo["wall"]:
                lo = r_lo
            if hi is None or r_hi["wall"] < hi["wall"]:
                hi = r_hi
    eff = hi["gbps"] / (4 * lo["gbps"])
    rec = {"kind": "sink", "lo": lo, "hi": hi, "eff": round(eff, 3)}
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "runs.jsonl"), "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
