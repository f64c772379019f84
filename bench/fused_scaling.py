"""Two-parallelism scaling of the FUSED encode job (encode_parquet):
the full production path — split discovery, pyarrow row-group scan and
stripe encode all inside Python workers, zero JVM payload crossing, no
shuffle. This is the north rule's two-cluster-size criterion evidenced
the only way this sandbox allows: the same job at local[N] and
local[4N] over the identical on-disk input (one generation, both levels
read the same files; 405 MB fits in page cache so the scan is
memory-bandwidth, not disk-seek, bound — the shared-substrate caveat
BENCH/BASELINE.md documents).

One subprocess per level (a JVM cannot change master in-process),
best-of-N reps within one session. Prints one JSON line
{"lo": .., "hi": .., "eff": ..} and appends to BENCH/runs.jsonl with
kind=fused.

SCALE_PIN=1 pins each level to exactly its core count with
taskset -c 0..N-1. Unpinned local[N] understates efficiency: the JVM's
GC/shuffle/scheduler threads and the forked Python workers of the LOW
level overflow onto the box's idle cores (31 spare at local[1]),
inflating the denominator's per-core throughput in a way no real
N-core executor enjoys. Pinning makes local[N] a true N-core machine —
the faithful single-box analogue of an N-executor cluster.
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
         .appName("fused-scaling-gen").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
gen.pages_df(spark, rows, num_partitions=64).write.parquet(path)
spark.stop()
"""

_CHILD = r"""
import json, sys, time
sys.path.insert(0, %(repo)r)
from pyspark.sql import SparkSession, functions as F
from orc_haskell_spark import engine

cpus = int(sys.argv[1])
rows = int(sys.argv[2])
reps = int(sys.argv[3])
path = sys.argv[4]
spark = (SparkSession.builder.master(f"local[{cpus}]")
         .config("spark.sql.shuffle.partitions", str(cpus))
         .config("spark.driver.memory", "48g")
         .config("spark.sql.session.timeZone", "UTC")
         .appName(f"fused-scaling-{cpus}").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
pages = spark.read.parquet(path)
raw_bytes = pages.agg(
    F.sum(F.octet_length("html") + F.octet_length("text")
          + F.octet_length("url"))).collect()[0][0]
# warm workers + page cache, then measure steady state
engine.encode_parquet(spark, path, num_partitions=cpus * 2) \
    .agg(F.sum("enc_bytes")).collect()
best = None
for _ in range(reps):
    t0 = time.perf_counter()
    out = engine.encode_parquet(spark, path, num_partitions=cpus * 2) \
        .agg(F.sum("enc_bytes"), F.sum("n_rows")).collect()
    dt = time.perf_counter() - t0
    assert out[0][1] == rows, (out[0][1], rows)
    best = dt if best is None else min(best, dt)
print(json.dumps({"cpus": cpus, "wall": best, "raw_bytes": int(raw_bytes),
                  "gbps": raw_bytes / best / 1e9}))
spark.stop()
"""


def _run(code: str, args: list[str], pin_cpus: int | None = None) -> str:
    cmd = [sys.executable, "-c", code % {"repo": REPO}] + args
    if pin_cpus is not None:
        cmd = ["taskset", "-c", f"0-{pin_cpus - 1}"] + cmd
    out = subprocess.run(cmd, capture_output=True, text=True, check=True,
                         cwd=REPO)
    return out.stdout


def run_level(cpus: int, rows: int, reps: int, path: str,
              pin: bool = False) -> dict:
    out = _run(_CHILD, [str(cpus), str(rows), str(reps), path],
               pin_cpus=cpus if pin else None)
    line = [ln for ln in out.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main():
    rows = int(os.environ.get("SCALE_ROWS", "200000"))
    reps = int(os.environ.get("SCALE_REPS", "2"))
    rounds = int(os.environ.get("SCALE_ROUNDS", "2"))
    n_lo = int(os.environ.get("SCALE_N", "8"))
    pin = os.environ.get("SCALE_PIN", "0") == "1"
    # INTERLEAVE the two levels (lo,hi,lo,hi,...): co-tenant load on
    # this box drifts on minute scales, so back-to-back blocks bias
    # whichever level runs in the quiet window; alternating spreads the
    # drift over both and per-level best-of picks the cleanest sample
    lo = hi = None
    with tempfile.TemporaryDirectory(prefix="fused_scale_") as tmp:
        path = os.path.join(tmp, "pages")
        _run(_GEN, [str(rows), path])
        for _ in range(rounds):
            r_lo = run_level(n_lo, rows, reps, path, pin=pin)
            r_hi = run_level(4 * n_lo, rows, reps, path, pin=pin)
            if lo is None or r_lo["wall"] < lo["wall"]:
                lo = r_lo
            if hi is None or r_hi["wall"] < hi["wall"]:
                hi = r_hi
    eff = hi["gbps"] / (4 * lo["gbps"])
    rec = {"kind": "fused_pinned" if pin else "fused",
           "lo": lo, "hi": hi, "eff": round(eff, 3)}
    # SCALE_NO_RECORD=1: probe/canary invocations (gated_lowspan's
    # reference run) must not masquerade as measurements in runs.jsonl
    if os.environ.get("SCALE_NO_RECORD") != "1":
        os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
        with open(os.path.join(REPO, "BENCH", "runs.jsonl"), "a") as f:
            f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
