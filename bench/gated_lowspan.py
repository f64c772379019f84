"""Load-gated capture of the LOW-core scaling spans (1->4 and 2->8).

The low spans are the single-box analogue of independent executors:
neither level saturates the shared memory bus, so a clean window gives
the truest per-4x efficiency this sandbox can produce. Co-tenant bursts
hurt low-core runs the most (one stolen core is 100% of local[1]), so
each attempt is gated on loadavg AND a single-thread CPU probe, and
only attempts whose probe stayed clean are kept. Results append to
BENCH/runs.jsonl with kind=fused (the fused_scaling.py harness does
the actual interleaved best-of measurement).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def probe() -> float:
    t0 = time.perf_counter()
    sum(range(10**7))
    return time.perf_counter() - t0


def quiet(max_probe: float, max_load: float) -> bool:
    load1 = float(open("/proc/loadavg").read().split()[0])
    return load1 < max_load and probe() < max_probe


def reference_gbps() -> float:
    """Unpinned 8-core fused encode, 1 rep — the throughput canary.
    Clean-window level on this box is ~0.37-0.41 GB/s; values far below
    mean co-tenant contention that would poison a scaling sample."""
    env = dict(os.environ, SCALE_N="2", SCALE_REPS="1", SCALE_ROUNDS="1",
               SCALE_PIN="0", SCALE_NO_RECORD="1")
    r = subprocess.run([sys.executable,
                        os.path.join(REPO, "bench", "fused_scaling.py")],
                       env=env, capture_output=True, text=True)
    line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
    if not line:
        return 0.0
    return json.loads(line[-1])["hi"]["gbps"]


def main() -> None:
    attempts = int(os.environ.get("GATE_ATTEMPTS", "6"))
    max_probe = float(os.environ.get("GATE_PROBE", "0.19"))
    max_load = float(os.environ.get("GATE_LOAD", "1.5"))
    min_ref = float(os.environ.get("GATE_MIN_REF", "0.30"))
    spans = [int(s) for s in
             os.environ.get("GATE_SPANS", "1,2").split(",")]
    done = 0
    while done < attempts:
        if not quiet(max_probe, max_load):
            time.sleep(30)
            continue
        if min_ref > 0:
            ref = reference_gbps()
            print(json.dumps({"ref_gbps": round(ref, 4),
                              "clean": ref >= min_ref}), flush=True)
            if ref < min_ref:
                time.sleep(120)
                continue
        kind = os.environ.get("GATE_KIND", "fused")
        n = spans[done % len(spans)]
        env = dict(os.environ, SCALE_N=str(n), SCALE_REPS="2",
                   SCALE_ROUNDS="2",
                   SCALE_PIN=os.environ.get("GATE_PIN", "1"))
        script = ("cluster_scaling.py" if kind == "cluster"
                  else "fused_scaling.py")
        t0 = time.time()
        r = subprocess.run([sys.executable,
                            os.path.join(REPO, "bench", script)],
                           env=env, capture_output=True, text=True)
        line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
        post = probe()
        rec = {"kind": kind,
               "span": "1->4 executors" if kind == "cluster"
               else f"{n}->{4*n}",
               "wall": round(time.time() - t0, 1),
               "post_probe": round(post, 3),
               "clean": post < max_probe,
               "result": json.loads(line[-1]) if line else None}
        print(json.dumps(rec), flush=True)
        done += 1


if __name__ == "__main__":
    main()
