"""Round-6 isolation benchmarks (guide §1.4): decompose the frozen
bench.py headline queries into their physical components with the noop
sink, so each optimization targets the component that actually costs.

NOT part of the driver contract — bench.py stays the measured surface.
Prints one JSON line per component: {"component": ..., "samples": [...]}.

Components for encode_pages (the partition_on path):
  scan_noop          JVM parquet scan only
  scan_shuffle_noop  + repartition(32, xxhash64(url))  [the exchange]
  shuffle_cross_noop + identity mapInArrow             [the JVM->Py crossing]
  shuffle_encode_noop+ the real encode fn              [adds kernel compute]
  encode_pages_noop  full encode_table(partition_on)   [= bench op, noop sink]
  encode_pages_write full encode_table + parquet write [= bench op exactly]
  fused_noop         encode_parquet (zero-crossing)    [the fused twin]
  cross_only_noop    scan + identity mapInArrow (no shuffle)

Same session confs as bench.py so numbers are comparable.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SF = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else 0.1
PAGES_ROWS = int(os.environ.get("SPARK_GRAFT_PAGES_ROWS",
                                max(2000, int(200_000 * SF / 0.1))))
N_SAMPLES = int(os.environ.get("OHS_EXTRA_SAMPLES", "3"))
ONLY = set(sys.argv[1:])


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from orc_haskell_spark import engine, gen

    spark = (SparkSession.builder.master(f"local[{CPUS}]")
             .appName("ohs-bench-extra")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.shuffle.partitions", str(CPUS))
             .config("spark.sql.execution.arrow.maxRecordsPerBatch", "16384")
             .config("spark.sql.files.maxPartitionBytes", "16m")
             .config("spark.driver.memory", "48g")
             .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="ohs_extra_")
    try:
        # warm-up exactly like bench.py
        gen.pages_df(spark, 4 * CPUS, num_partitions=CPUS) \
            .write.mode("overwrite").parquet(f"{tmp}/warmup")
        pages_path = f"{tmp}/pages"
        gen.pages_df(spark, PAGES_ROWS, num_partitions=CPUS * 2) \
            .write.mode("overwrite").parquet(pages_path)
        pages = spark.read.parquet(pages_path)
        engine.encode_table(pages.limit(5000)).agg(
            F.sum("enc_bytes")).collect()
        engine.encode_parquet(spark, pages_path, num_partitions=CPUS) \
            .agg(F.sum("enc_bytes")).collect()

        def noop(df):
            df.write.format("noop").mode("overwrite").save()

        def identity_fn(batches):
            yield from batches

        shuffled = pages.repartition(CPUS, F.xxhash64("url"))

        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        li32 = li.repartition(CPUS)

        enc_pages_path = f"{tmp}/enc_pages"

        def encode_pages_write():
            shutil.rmtree(enc_pages_path, ignore_errors=True)
            engine.encode_table(pages, partition_on="url",
                                num_partitions=CPUS) \
                .write.option("compression", "uncompressed") \
                .parquet(enc_pages_path)

        components = {
            "scan_noop": lambda: noop(pages),
            "scan_shuffle_noop": lambda: noop(shuffled),
            "cross_only_noop": lambda: noop(
                pages.mapInArrow(identity_fn, pages.schema)),
            "shuffle_cross_noop": lambda: noop(
                shuffled.mapInArrow(identity_fn, pages.schema)),
            "shuffle_encode_noop": lambda: noop(
                shuffled.mapInArrow(engine.make_encode_fn(),
                                    engine.ENCODED_DDL)),
            "encode_pages_noop": lambda: noop(
                engine.encode_table(pages, partition_on="url",
                                    num_partitions=CPUS)),
            "encode_pages_write": encode_pages_write,
            "fused_noop": lambda: noop(
                engine.encode_parquet(spark, pages_path,
                                      num_partitions=CPUS)),
            # lineitem decomposition (bench: repartition(CPUS) + encode)
            "li_scan_noop": lambda: noop(li),
            "li_shuffle_noop": lambda: noop(li32),
            "li_cross_noop": lambda: noop(
                li32.mapInArrow(identity_fn, li.schema)),
            "li_encode_noop": lambda: noop(
                engine.encode_table(li32)),
            "li_fused_noop": lambda: noop(
                engine.encode_parquet(
                    spark, f"{SF_DIR}/lineitem.parquet",
                    num_partitions=CPUS)),
        }
        for name, fn in components.items():
            if ONLY and name not in ONLY:
                continue
            spark.sparkContext.setJobDescription(f"extra:{name}")
            samples = []
            for _ in range(N_SAMPLES):
                t0 = time.time()
                fn()
                samples.append(round(time.time() - t0, 3))
            print(json.dumps({"component": name, "samples": samples,
                              "min": min(samples)}), flush=True)
            spark.sparkContext.setJobDescription(None)
    finally:
        spark.stop()
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
