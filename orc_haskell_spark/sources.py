"""Input sources: Iceberg-style tables, parquet directories, streams.

The engine is source-agnostic — encode_table takes any DataFrame — but
the north rule names Iceberg tables of Common-Crawl-style pages as the
canonical input. This sandbox has no Iceberg runtime jar, so
``read_table`` resolves in order: catalog table name (Iceberg/hive when
the runtime is on the classpath) → parquet path. On a real cluster the
Iceberg path gives us partition pruning and snapshot isolation for free
through Catalyst's DataSourceV2; nothing in the engine changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.errors import AnalysisException


def read_table(spark: SparkSession, source: str) -> DataFrame:
    """Read an input table: catalog name (e.g. 'crawl.pages') or a
    parquet path. Iceberg tables resolve through the catalog when the
    iceberg-spark-runtime jar is present.

    Only TABLE_OR_VIEW_NOT_FOUND falls through to the parquet path: a
    genuine catalog error (permissions, bad snapshot, misconfigured
    Iceberg) must surface as itself, not as an unrelated 'parquet path
    not found'.
    """
    if "/" not in source and "\\" not in source:
        try:
            return spark.read.table(source)
        except AnalysisException as e:
            cond = (e.getCondition() or "") if hasattr(e, "getCondition") else ""
            if "TABLE_OR_VIEW_NOT_FOUND" not in cond and \
                    "cannot be found" not in str(e):
                raise
    return spark.read.parquet(source)


def read_stream(spark: SparkSession, source: str, schema) -> DataFrame:
    """Streaming source: file-drop directory (or rate: for tests)."""
    if source.startswith("rate"):
        return spark.readStream.format("rate").load()
    return spark.readStream.schema(schema).parquet(source)
