"""Job-level scaling with the scan substrate removed (round-2 VERDICT
item 8): the pages table is generated once and CACHED in executor
memory, so the timed stage is exactly JVM->Arrow crossing + encode
kernels — the stages a real cluster multiplies with nodes — with no
parquet scan and no shuffle. One subprocess per parallelism level (a
JVM cannot change master in-process), best-of-N within one session.

Prints one JSON line {"lo": .., "hi": .., "eff": ..} and appends to
BENCH/runs.jsonl with kind=cached.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, sys, time
sys.path.insert(0, %(repo)r)
from pyspark.sql import SparkSession, functions as F
from orc_haskell_spark import engine, gen

cpus = int(sys.argv[1])
rows = int(sys.argv[2])
reps = int(sys.argv[3])
spark = (SparkSession.builder.master(f"local[{cpus}]")
         .config("spark.sql.shuffle.partitions", str(cpus))
         .config("spark.driver.memory", "48g")
         .config("spark.sql.session.timeZone", "UTC")
         .appName(f"cached-scaling-{cpus}").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
df = gen.pages_df(spark, rows).repartition(cpus * 2).cache()
raw_bytes = df.agg(
    F.sum(F.octet_length("html") + F.octet_length("text")
          + F.octet_length("url"))).collect()[0][0]
df.count()  # materialize the cache
best = None
for _ in range(reps):
    t0 = time.perf_counter()
    enc = engine.encode_table(df)
    out = enc.agg(F.sum("enc_bytes"), F.sum("n_rows")).collect()
    dt = time.perf_counter() - t0
    assert out[0][1] == rows
    best = dt if best is None else min(best, dt)
print(json.dumps({"cpus": cpus, "wall": best, "raw_bytes": int(raw_bytes),
                  "gbps": raw_bytes / best / 1e9}))
spark.stop()
"""


def run_level(cpus: int, rows: int, reps: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", _CHILD % {"repo": REPO},
         str(cpus), str(rows), str(reps)],
        capture_output=True, text=True, check=True, cwd=REPO)
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main():
    rows = int(os.environ.get("SCALE_ROWS", "200000"))
    reps = int(os.environ.get("SCALE_REPS", "3"))
    n_lo = int(os.environ.get("SCALE_N", "8"))
    lo = run_level(n_lo, rows, reps)
    hi = run_level(4 * n_lo, rows, reps)
    eff = hi["gbps"] / (4 * lo["gbps"])
    rec = {"kind": "cached", "lo": lo, "hi": hi, "eff": round(eff, 3)}
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "runs.jsonl"), "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
