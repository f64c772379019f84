"""Barrier-synchronized FULL stripe-encode pipeline scaling (codec
selector + FSST + RLEv2 + zstd + stripe assembly = stripe.encode_stripe
on real generated pages). N spawned workers, one private ~50 MB copy
each, all start together after per-worker codec-table warmup. The §1
kernel evidence for BENCH/BASELINE.md."""
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

STRIPE_ROWS = 8192


def worker(parquet_path, barrier, out, i):
    from orc_haskell_spark import stripe
    from orc_haskell_spark.engine import clamp_worker_threads

    clamp_worker_threads()
    table = pq.read_table(parquet_path)
    batches = table.combine_chunks().to_batches(max_chunksize=STRIPE_ROWS)
    nbytes = sum(b.nbytes for b in batches)
    cache: dict = {}
    stripe.encode_stripe(batches[0], None, cache)  # warm tables + .so
    barrier.wait()
    t0 = time.perf_counter()
    cache = {}
    for b in batches:
        stripe.encode_stripe(b, None, cache)
    out[i] = nbytes / (time.perf_counter() - t0)


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 25000  # ~50 MB
    import tempfile

    from pyspark.sql import SparkSession

    from orc_haskell_spark import gen

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    d = tempfile.mkdtemp()
    p = os.path.join(d, "pages.parquet")
    pa_table = pa.Table.from_pandas(gen.pages_df(spark, rows).toPandas())
    pq.write_table(pa_table, p)
    spark.stop()
    print(f"pages sample: {pa_table.num_rows} rows, "
          f"{pa_table.nbytes / 1e6:.0f} MB")

    ctx = mp.get_context("spawn")
    for nproc in (8, 32):
        barrier = ctx.Barrier(nproc)
        out = ctx.Array("d", nproc)
        ps = [ctx.Process(target=worker, args=(p, barrier, out, i))
              for i in range(nproc)]
        [x.start() for x in ps]
        [x.join() for x in ps]
        percore = sorted(v / 1e6 for v in out)
        print(f"nproc={nproc}: per-core median {percore[nproc // 2]:.0f} "
              f"MB/s, aggregate {sum(percore):.0f} MB/s")


if __name__ == "__main__":
    main()
