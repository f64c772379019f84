"""Two-CLUSTER-SIZE scaling on a real multi-executor Spark standalone
cluster (localhost): the north rule's "N and 4N executors" criterion
evidenced with actual separate executor JVMs, not local[N] threads.

Topology: one master + four 2-core workers, each worker JVM pinned
with taskset to its own DISJOINT core pair (0-1, 2-3, 4-5, 6-7) — the
executor JVM and its forked Python workers inherit the affinity, so
every "executor" really owns exactly 2 cores, like a cluster node
would. Both levels run against the same registered workers; the level
is selected per submit with spark.cores.max (2 -> 1 executor,
8 -> 4 executors), so lo/hi interleave with zero worker churn.

The job is the production ship path: ``spark-submit --master
spark://... --py-files dist/orc_haskell_spark.zip`` from a scratch
cwd (executors import the engine from the zip only), running the
fused encode (``engine.encode_parquet``) over a pre-generated pages
parquet. Prints one JSON line and appends kind=cluster to
BENCH/runs.jsonl.

Shared-substrate caveat: all "nodes" still share one memory bus; this
isolates the JVM/executor-multiplication axis (real scheduler, real
per-executor processes) but not memory bandwidth. Interpret together
with BENCH/BASELINE.md §1 (kernel-level) and §2b (crossing-free job).
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_HOME = None  # resolved in main()
MASTER_PORT = int(os.environ.get("CLUSTER_PORT", "7177"))
MASTER = f"spark://127.0.0.1:{MASTER_PORT}"

_CHILD = r"""
import json, sys, time
from pyspark.sql import SparkSession, functions as F

rows, reps, path, want = (int(sys.argv[1]), int(sys.argv[2]),
                          sys.argv[3], int(sys.argv[4]))
spark = SparkSession.builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
from orc_haskell_spark import engine          # from the --py-files zip
deadline = time.time() + 90                   # all executors registered?
# defaultParallelism floors at 2 in standalone mode, so it can only
# confirm registration for want >= 2; for want=1 the submit-side
# minRegisteredResourcesRatio=1.0 already blocked until the core
# registered, and `want` is the authoritative size either way.
while spark.sparkContext.defaultParallelism < want:  # no-op for want<=2
    if time.time() > deadline:
        raise SystemExit(f"only {spark.sparkContext.defaultParallelism} "
                         f"of {want} cores registered")
    time.sleep(1)
cores = want
pages = spark.read.parquet(path)
raw_bytes = pages.agg(F.sum(F.octet_length("html") + F.octet_length("text")
                            + F.octet_length("url"))).collect()[0][0]
engine.encode_parquet(spark, path, num_partitions=cores * 2) \
    .agg(F.sum("enc_bytes")).collect()         # warm executors+cache
best = None
for _ in range(reps):
    t0 = time.perf_counter()
    out = engine.encode_parquet(spark, path, num_partitions=cores * 2) \
        .agg(F.sum("enc_bytes"), F.sum("n_rows")).collect()
    dt = time.perf_counter() - t0
    assert out[0][1] == rows, (out[0][1], rows)
    best = dt if best is None else min(best, dt)
print(json.dumps({"cores": cores, "wall": best,
                  "raw_bytes": int(raw_bytes),
                  "gbps": raw_bytes / best / 1e9}))
spark.stop()
"""

_GEN = r"""
import sys
sys.path.insert(0, %(repo)r)
from pyspark.sql import SparkSession
from orc_haskell_spark import gen

rows, path = int(sys.argv[1]), sys.argv[2]
spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.driver.memory", "48g")
         .appName("cluster-scaling-gen").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
gen.pages_df(spark, rows, num_partitions=64).write.parquet(path)
spark.stop()
"""


def _spark_class(*args: str, pin: str | None = None,
                 env: dict | None = None) -> subprocess.Popen:
    cmd = [os.path.join(SPARK_HOME, "bin", "spark-class"), *args]
    if pin is not None:
        cmd = ["taskset", "-c", pin] + cmd
    return subprocess.Popen(cmd, stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL, env=env,
                            start_new_session=True)


def start_cluster(n_workers: int, cores_per: int) -> list[subprocess.Popen]:
    procs = [_spark_class("org.apache.spark.deploy.master.Master",
                          "-h", "127.0.0.1", "-p", str(MASTER_PORT),
                          "--webui-port", str(MASTER_PORT + 1000))]
    time.sleep(8)
    ncpu = os.cpu_count() or 1
    if n_workers * cores_per > ncpu:
        raise SystemExit(
            f"host has {ncpu} cores; {n_workers} x {cores_per}-core "
            f"pinned workers need {n_workers * cores_per}")
    base = int(os.environ.get("CLUSTER_CORE_BASE", "24"))
    if base + n_workers * cores_per > ncpu:   # smaller host: shift down
        base = max(0, ncpu - n_workers * cores_per)
    for i in range(n_workers):
        # high cores by default: kernel housekeeping and stray host
        # processes gravitate to low core ids
        pin = f"{base + i * cores_per}-{base + (i + 1) * cores_per - 1}"
        env = dict(os.environ,
                   SPARK_WORKER_DIR=f"/tmp/cluster_scale_w{i}",
                   SPARK_LOCAL_HOSTNAME="127.0.0.1")
        procs.append(_spark_class(
            "org.apache.spark.deploy.worker.Worker", MASTER,
            "-c", str(cores_per), "-m", "8g", "-h", "127.0.0.1",
            "--webui-port", str(MASTER_PORT + 1100 + i),
            pin=pin, env=env))
    time.sleep(10)
    return procs


def stop_cluster(procs: list[subprocess.Popen]) -> None:
    for p in reversed(procs):
        try:
            os.killpg(p.pid, signal.SIGTERM)
        except (ProcessLookupError, PermissionError):
            pass


def submit(cores_max: int, cores_per: int, rows: int, reps: int,
           path: str, child: str, scratch: str) -> dict:
    zip_path = os.path.join(REPO, "dist", "orc_haskell_spark.zip")
    cmd = [os.path.join(SPARK_HOME, "bin", "spark-submit"),
           "--master", MASTER, "--py-files", zip_path,
           "--conf", f"spark.cores.max={cores_max}",
           "--conf", f"spark.executor.cores={cores_per}",
           "--conf", "spark.executor.memory=6g",
           "--conf", "spark.locality.wait=0",
           "--conf", "spark.scheduler.minRegisteredResourcesRatio=1.0",
           "--conf", "spark.scheduler.maxRegisteredResourcesWaitingTime=60s",
           "--conf", "spark.sql.session.timeZone=UTC",
           child, str(rows), str(reps), path, str(cores_max)]
    out = subprocess.run(cmd, capture_output=True, text=True, cwd=scratch,
                         timeout=900)
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    if not lines:
        raise RuntimeError(out.stderr[-3000:])
    return json.loads(lines[-1])


def main() -> None:
    global SPARK_HOME
    import pyspark
    SPARK_HOME = os.path.dirname(pyspark.__file__)
    rows = int(os.environ.get("SCALE_ROWS", "200000"))
    reps = int(os.environ.get("SCALE_REPS", "2"))
    rounds = int(os.environ.get("SCALE_ROUNDS", "2"))
    # CLUSTER_CORES_PER=1 keeps the 4-executor aggregate under the
    # box's memory-bandwidth ceiling (~0.2 GB/s fused on this host),
    # which is the honest emulation of a real cluster: added nodes
    # bring their own DRAM, so per-executor bandwidth stays flat —
    # the one thing a single box cannot reproduce at saturation.
    cores_per = int(os.environ.get("CLUSTER_CORES_PER", "2"))
    subprocess.run(["bash", os.path.join(REPO, "scripts",
                                         "build_artifact.sh")],
                   check=True, capture_output=True)
    lo = hi = None
    with tempfile.TemporaryDirectory(prefix="cluster_scale_") as tmp:
        path = os.path.join(tmp, "pages")
        scratch = os.path.join(tmp, "scratch")
        os.makedirs(scratch)
        child = os.path.join(tmp, "child.py")
        with open(child, "w") as f:
            f.write(_CHILD)
        subprocess.run([sys.executable, "-c", _GEN % {"repo": REPO},
                        str(rows), path], check=True, capture_output=True)
        procs = start_cluster(n_workers=4, cores_per=cores_per)
        try:
            for _ in range(rounds):   # interleave lo/hi, best-of
                r_lo = submit(cores_per, cores_per, rows, reps, path,
                              child, scratch)
                r_hi = submit(4 * cores_per, cores_per, rows, reps,
                              path, child, scratch)
                assert r_lo["cores"] == cores_per, r_lo
                assert r_hi["cores"] == 4 * cores_per, r_hi
                if lo is None or r_lo["wall"] < lo["wall"]:
                    lo = r_lo
                if hi is None or r_hi["wall"] < hi["wall"]:
                    hi = r_hi
        finally:
            stop_cluster(procs)
    eff = hi["gbps"] / (4 * lo["gbps"])
    rec = {"kind": "cluster", "executors_lo": 1, "executors_hi": 4,
           "cores_per_executor": cores_per, "pinned": True,
           "lo": lo, "hi": hi, "eff": round(eff, 3)}
    with open(os.path.join(REPO, "BENCH", "runs.jsonl"), "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
