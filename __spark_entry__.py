"""Driver contract for the spark-graft builder (PySpark target).

The engine is a per-column lightweight-compression engine (SURVEY.md §2),
so its "queries" are encode→decode roundtrips: the Spark side runs the
full distributed pipeline (mapInArrow encode → encoded-stripes DataFrame
→ mapInArrow decode) and must return exactly the rows DuckDB reads from
the raw parquet — the reference's own correctness bar (bit-identical
roundtrip, test/Test/Orc/Logical.hs:103-138) expressed as an oracle
comparison. Additional entries pin each codec path (dict / fsst / rle1 /
rle2) and the manifest metrics.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from orc_haskell_spark import engine, gen  # noqa: E402

_TABLE_COLS = {
    "documents": ["doc_id", "text", "lang", "source", "n_chars"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
                 "l_quantity", "l_extendedprice", "l_discount", "l_tax",
                 "l_returnflag", "l_linestatus", "l_shipdate"],
    "orders": ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
               "o_orderdate", "o_orderpriority"],
    "events": ["event_id", "ts", "user_id", "event_type", "value", "props"],
    "customer": ["c_custkey", "c_name", "c_nationkey", "c_acctbal",
                 "c_mktsegment"],
    "part": None,
    "supplier": None,
    "nation": None,
    "region": None,
}

_STRIPE_ROWS = 8192


def _load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def _roundtrip(spark: SparkSession, sf_dir: str, table: str,
               config: dict | None = None) -> DataFrame:
    df = _load(spark, sf_dir, table)
    enc = engine.encode_table(df, stripe_rows=_STRIPE_ROWS, config=config)
    return engine.decode_table(enc, df.schema)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full encode→decode of the documents table at sf0.001,
    summarized per lang (exercises dict/fsst/rle paths end-to-end)."""
    sf_dir = "/root/testdata/sf0.001"
    dec = _roundtrip(spark, sf_dir, "documents")
    return (dec.groupBy("lang")
            .agg(F.count("*").alias("docs"),
                 F.sum("n_chars").alias("chars"),
                 F.min("doc_id").alias("min_doc"),
                 F.max("doc_id").alias("max_doc"))
            .orderBy("lang"))


def _mk_roundtrip(table: str, config: dict | None = None):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _roundtrip(spark, sf_dir, table, config)
    return q


def _decoded_agg_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    dec = _roundtrip(spark, sf_dir, "lineitem")
    return (dec.filter(F.col("l_quantity") > 10)
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum("l_quantity").alias("sum_qty"),
                 F.sum("l_extendedprice").alias("sum_price"),
                 F.count("*").alias("cnt")))


def _decoded_window_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    dec = _roundtrip(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    return (dec.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("o_custkey", "o_orderkey", "o_totalprice"))


def _manifest_rows_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _load(spark, sf_dir, "documents")
    enc = engine.encode_table(df, stripe_rows=_STRIPE_ROWS)
    return engine.manifest_df(enc).agg(
        F.sum("n_rows").alias("n_rows"),
        F.max("n_cols").cast("bigint").alias("n_cols"))


def _embeddings_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    dec = _roundtrip(spark, sf_dir, "embeddings")
    return dec.select(
        "vec_id",
        F.col("label").cast("bigint").alias("label"),
        F.size("embedding").cast("bigint").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_elem"),
        F.element_at("embedding", -1).cast("double").alias("last_elem"))


def _pages_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    # synthetic pages table (no parquet twin -> rows-only check)
    df = gen.pages_df(spark, 2000, num_partitions=4)
    enc = engine.encode_table(df, stripe_rows=500, partition_on="url",
                              num_partitions=4)
    dec = engine.decode_table(enc, df.schema)
    joined = (df.select("url", F.col("text").alias("t0"))
              .join(dec.select("url", F.col("text").alias("t1")), "url"))
    return (joined
            .agg(F.count("*").alias("rows"),
                 F.sum(F.when(F.col("t0") == F.col("t1"), 0).otherwise(1))
                 .alias("text_mismatches")))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for table in ["documents", "lineitem", "orders", "events", "customer",
                  "part", "supplier", "nation", "region"]:
        q[f"roundtrip_{table}"] = _mk_roundtrip(table)
    # pin each codec path explicitly (operator coverage, SURVEY.md §2.1)
    q["roundtrip_rle1_lineitem"] = _mk_roundtrip(
        "lineitem", {"int_codec": "rle1"})
    q["roundtrip_fsst_documents"] = _mk_roundtrip(
        "documents", {"string_codec": "fsst"})
    q["roundtrip_dict_documents"] = _mk_roundtrip(
        "documents", {"string_codec": "dict"})
    q["roundtrip_direct_documents"] = _mk_roundtrip(
        "documents", {"string_codec": "direct"})
    q["roundtrip_nocomp_events"] = _mk_roundtrip(
        "events", {"compression": "none"})
    q["roundtrip_zlib_orders"] = _mk_roundtrip(
        "orders", {"compression": "zlib"})
    q["decoded_agg_lineitem"] = _decoded_agg_lineitem
    q["decoded_window_orders"] = _decoded_window_orders
    q["manifest_rows_documents"] = _manifest_rows_documents
    q["roundtrip_embeddings"] = _embeddings_checked
    q["pages_roundtrip"] = _pages_roundtrip
    return q


def _select_sql(table: str) -> str:
    cols = _TABLE_COLS.get(table)
    return f"SELECT {', '.join(cols) if cols else '*'} FROM {table}"


def oracle_sql() -> dict[str, str]:
    o: dict[str, str] = {}
    for table in ["documents", "lineitem", "orders", "events", "customer",
                  "part", "supplier", "nation", "region"]:
        o[f"roundtrip_{table}"] = _select_sql(table)
    o["roundtrip_rle1_lineitem"] = _select_sql("lineitem")
    o["roundtrip_fsst_documents"] = _select_sql("documents")
    o["roundtrip_dict_documents"] = _select_sql("documents")
    o["roundtrip_direct_documents"] = _select_sql("documents")
    o["roundtrip_nocomp_events"] = _select_sql("events")
    o["roundtrip_zlib_orders"] = _select_sql("orders")
    o["decoded_agg_lineitem"] = (
        "SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, "
        "sum(l_extendedprice) AS sum_price, count(*) AS cnt "
        "FROM lineitem WHERE l_quantity > 10 "
        "GROUP BY l_returnflag, l_linestatus")
    o["decoded_window_orders"] = (
        "SELECT o_custkey, o_orderkey, o_totalprice FROM ("
        "SELECT o_custkey, o_orderkey, o_totalprice, "
        "row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn "
        "FROM orders) WHERE rn = 1")
    o["manifest_rows_documents"] = (
        "SELECT count(*) AS n_rows, CAST(5 AS BIGINT) AS n_cols FROM documents")
    o["roundtrip_embeddings"] = (
        "SELECT vec_id, CAST(label AS BIGINT) AS label, "
        "CAST(len(embedding) AS BIGINT) AS dim, "
        "CAST(embedding[1] AS DOUBLE) AS first_elem, "
        "CAST(embedding[-1] AS DOUBLE) AS last_elem FROM embeddings")
    # pages_roundtrip intentionally has no oracle (synthetic input)
    return o
