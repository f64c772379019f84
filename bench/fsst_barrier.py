"""Barrier-synchronized FSST encode scaling: N spawned workers, one
25 MB real-text buffer each, all start together. Prints per-core and
aggregate MB/s at each worker count. The kernel-scaling evidence for
BENCH/BASELINE.md (see round-2 methodology)."""
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow.parquet as pq


def worker(data_bytes, barrier, out, i):
    from orc_haskell_spark.codecs import fsst
    data = np.frombuffer(data_bytes, np.uint8)
    tab = fsst.train(data)
    fsst.compress(data[:1 << 16], tab)  # warm .so/compile before barrier
    barrier.wait()
    t0 = time.perf_counter()
    fsst.compress(data, tab)
    out[i] = time.perf_counter() - t0


def main():
    ctx = mp.get_context("spawn")
    t = pq.read_table("/root/testdata/sf0.01/documents.parquet")
    txt = "".join(t.column("text").to_pylist())
    mbytes = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    big = (txt * (mbytes * 10**6 // len(txt) + 1))[:mbytes * 10**6].encode()
    mb = len(big) / 1e6
    for nproc in (8, 32):
        barrier = ctx.Barrier(nproc)
        out = ctx.Array("d", nproc)
        ps = [ctx.Process(target=worker, args=(big, barrier, out, i))
              for i in range(nproc)]
        [p.start() for p in ps]
        [p.join() for p in ps]
        percore = sorted(mb / x for x in out)
        print(f"nproc={nproc}: per-core median {percore[nproc // 2]:.0f} "
              f"MB/s, agg {sum(percore):.0f} MB/s")


if __name__ == "__main__":
    main()
