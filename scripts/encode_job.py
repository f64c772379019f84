"""Cluster encode job: spark-submit entry point.

    spark-submit --py-files dist/orc_haskell_spark.zip scripts/encode_job.py \
        --input <parquet/iceberg path> --output <dir> --partitions 4096 \
        [--key url] [--stripe-rows 65536] [--resume]

Encodes the input table into output/stripes with a checkpointed
manifest; re-running with --resume skips completed partitions
(BASELINE.json north_rule: resumable from checkpoint with per-partition
lineage + metrics).
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--partitions", type=int, default=1024)
    ap.add_argument("--key", default="url")
    ap.add_argument("--stripe-rows", type=int, default=65536)
    ap.add_argument("--compression", default="zstd")
    ap.add_argument("--string-codec", default="auto")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from orc_haskell_spark import manifest

    spark = (SparkSession.builder.appName("orc-haskell-spark-encode")
             .config("spark.sql.session.timeZone", "UTC")
             .getOrCreate())
    df = spark.read.parquet(args.input)
    summary = manifest.encode_to_dir(
        df, args.output, partition_key=args.key,
        num_partitions=args.partitions, stripe_rows=args.stripe_rows,
        config={"compression": args.compression,
                "string_codec": args.string_codec},
        source=args.input)
    m = manifest.metrics(spark, args.output)
    m.orderBy("part_id").show(20, truncate=False)
    print("summary:", summary)
    spark.stop()


if __name__ == "__main__":
    main()
