"""Two-parallelism scaling evidence (BASELINE.json north_rule).

No real cluster exists in this sandbox, so the N -> 4N executor
criterion is evidenced by running the identical encode job at two local
parallelism levels on identical input:

    efficiency = throughput(4N) / (4 x throughput(N))

Runs bench.py in subprocesses (a JVM can't change master in-process),
parses the JSON lines, and writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(cpus: int, sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), SPARK_GRAFT_SF_DIR=sf_dir)
    out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                         env=env, capture_output=True, text=True, check=True)
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def best_of(n_runs: int, cpus: int, sf_dir: str) -> dict:
    """This host's wall times vary 2-3x across sessions (page cache, JIT,
    THP); best-of-N per level is the steady-state estimate."""
    runs = [run_bench(cpus, sf_dir) for _ in range(n_runs)]
    return min(runs, key=lambda r: r["queries"]["encode_pages"])


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_lo = int(os.environ.get("SCALE_N", "8"))
    reps = int(os.environ.get("SCALE_REPS", "2"))
    n_hi = 4 * n_lo
    lo = best_of(reps, n_lo, sf_dir)
    hi = best_of(reps, n_hi, sf_dir)

    def thr(r):  # encode throughput, GB/s of raw input bytes
        return r["pages_raw_bytes"] / r["queries"]["encode_pages"] / 1e9

    t_lo, t_hi = thr(lo), thr(hi)
    eff = t_hi / (4 * t_lo)
    doc_lo = lo["pages_rows"] / lo["queries"]["encode_pages"]
    doc_hi = hi["pages_rows"] / hi["queries"]["encode_pages"]

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    # append raw results; BENCH/BASELINE.md is the curated summary of all runs
    with open(os.path.join(REPO, "BENCH", "runs.jsonl"), "a") as f:
        f.write(json.dumps({"lo": lo, "hi": hi, "eff": eff}) + "\n")
    md = f"""# BENCH/last_run.md — most recent two-parallelism run

North rule: encode-throughput scaling efficiency >= 0.8 from N to 4N
executors. Sandbox stand-in: the identical encode job (deterministic
pages table, {lo['pages_rows']} rows, {lo['pages_raw_bytes'] / 1e6:.0f} MB raw,
repartitionByRange on xxhash64(url) -> mapInArrow encode -> parquet
write) at two local parallelism levels on identical input.

| parallelism | encode wall (s) | GB/s raw | docs/sec |
|---|---|---|---|
| local[{n_lo}]  (N)  | {lo['queries']['encode_pages']:.1f} | {t_lo:.4f} | {doc_lo:.0f} |
| local[{n_hi}] (4N) | {hi['queries']['encode_pages']:.1f} | {t_hi:.4f} | {doc_hi:.0f} |

**Scaling efficiency = throughput(4N) / (4 x throughput(N)) = {eff:.3f}**

Compression: ratio {hi['compression_ratio_pages']:.2f}x raw;
vs pyarrow-ORC(zstd) oracle: {hi['vs_pyarrow_orc']:.3f}x
(>1 = our encoded output is smaller than the reference ORC writer's).

Full bench JSON:

```json
{json.dumps(lo)}
{json.dumps(hi)}
```
"""
    with open(os.path.join(REPO, "BENCH", "last_run.md"), "w") as f:
        f.write(md)
    print(json.dumps({"eff": round(eff, 3), "thr_lo_gbps": round(t_lo, 4),
                      "thr_hi_gbps": round(t_hi, 4)}))


if __name__ == "__main__":
    main()
