"""Dump .explain('formatted') for the bench headline query shapes into
plans/<tag>/<query>_<phase>.txt (phase = before|after). Usage:
    python bench/dump_plans.py r06 before
Uses a small pages table (same plan shape, cheaper to build)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TAG = sys.argv[1] if len(sys.argv) > 1 else "r06"
PHASE = sys.argv[2] if len(sys.argv) > 2 else "before"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    import tempfile

    from pyspark.sql import SparkSession

    from orc_haskell_spark import engine, gen

    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", TAG)
    os.makedirs(out_dir, exist_ok=True)
    spark = (SparkSession.builder.master("local[8]")
             .appName("ohs-plan-dump")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="ohs_plans_")
    try:
        pages_path = f"{tmp}/pages"
        gen.pages_df(spark, 20000, num_partitions=8) \
            .write.mode("overwrite").parquet(pages_path)
        pages = spark.read.parquet(pages_path)
        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        li8 = li.repartition(8)

        enc_pages = engine.encode_table(pages, partition_on="url",
                                        num_partitions=8)
        enc_pages_path = f"{tmp}/enc_pages"
        enc_pages.write.option("compression", "uncompressed") \
            .parquet(enc_pages_path)
        enc_pages_df = spark.read.parquet(enc_pages_path)

        enc_li = engine.encode_table(li8)
        enc_li_path = f"{tmp}/enc_li"
        enc_li.write.option("compression", "uncompressed") \
            .parquet(enc_li_path)
        enc_li_df = spark.read.parquet(enc_li_path)

        plans = {
            "gen_pages": gen.pages_df(spark, 20000, num_partitions=8),
            "encode_pages": engine.encode_table(
                pages, partition_on="url", num_partitions=8),
            "encode_pages_fused": engine.encode_parquet(
                spark, pages_path, num_partitions=8),
            "decode_pages": engine.decode_table(enc_pages_df, pages.schema),
            "encode_lineitem": engine.encode_table(li8),
            "decode_lineitem": engine.decode_table(enc_li_df, li.schema),
        }
        for name, df in plans.items():
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(out_dir, f"{name}_{PHASE}.txt"),
                      "w") as f:
                f.write(txt)
            print("wrote", name, PHASE, len(txt), "bytes")
    finally:
        spark.stop()
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
