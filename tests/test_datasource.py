"""PySpark Python DataSource surface for ORC files (format('orcfile')):
spark-idiomatic reads with stripe-granular planning and pushed-filter
stat pruning (requires spark.sql.python.filterPushdown.enabled)."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import GreaterThanOrEqual, LessThanOrEqual

from orc_haskell_spark.orcfile.datasource import (OrcFileDataSource,
                                                  OrcFileReader)
from orc_haskell_spark.orcfile.writer import write_orc


@pytest.fixture(scope="module")
def sorted_orc_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("orcds"))
    t = pq.read_table("/root/testdata/sf0.01/lineitem.parquet")
    t = t.sort_by("l_orderkey")
    write_orc(t, os.path.join(d, "part-0.orc"), compression="ZSTD",
              stripe_rows=8192)
    return d, t


def test_datasource_reads_identical(spark, sorted_orc_dir):
    d, t = sorted_orc_dir
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(OrcFileDataSource)
    df = spark.read.format("orcfile").load(d)
    assert df.count() == t.num_rows
    pdf = spark.createDataFrame(t.to_pandas())
    assert df.exceptAll(pdf).count() == 0
    assert pdf.exceptAll(df).count() == 0


def test_datasource_filter_results_exact(spark, sorted_orc_dir):
    d, t = sorted_orc_dir
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(OrcFileDataSource)
    df = spark.read.format("orcfile").load(d)
    got = (df.filter((F.col("l_orderkey") >= 100)
                     & (F.col("l_orderkey") <= 200))
           .agg(F.count("*"), F.sum("l_quantity")).collect()[0])
    import pyarrow.compute as pc
    mask = pc.and_(pc.greater_equal(t["l_orderkey"], 100),
                   pc.less_equal(t["l_orderkey"], 200))
    sub = t.filter(mask)
    assert got[0] == sub.num_rows
    assert abs(got[1] - pc.sum(sub["l_quantity"]).as_py()) < 1e-6


def test_pushed_filters_prune_stripes(sorted_orc_dir):
    """Unit-level: a selective range on the sort column plans ONE
    stripe partition instead of eight (pure IO elimination; filters are
    still reported unhandled so Spark applies them exactly)."""
    d, _ = sorted_orc_dir
    p = os.path.join(d, "part-0.orc")
    r = OrcFileReader([p], None)
    assert len(r.partitions()) == 8
    r2 = OrcFileReader([p], None)
    unhandled = list(r2.pushFilters([
        GreaterThanOrEqual(("l_orderkey",), 100),
        LessThanOrEqual(("l_orderkey",), 200)]))
    assert len(unhandled) == 2  # conservative: Spark re-applies both
    assert len(r2.partitions()) == 1


def test_datasource_write_read_roundtrip(spark, tmp_path):
    """df.write.format('orcfile') stages per-task files and renames at
    commit; the files are real ORC (C++ readable) and roundtrip through
    both the datasource read and pyarrow."""
    import glob

    import pyarrow.orc as po

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(OrcFileDataSource)
    d = str(tmp_path / "out")
    df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    # Python data sources support only Append/Overwrite save modes
    df.repartition(3).write.mode("append").format("orcfile").save(d)
    files = sorted(glob.glob(f"{d}/*.orc"))
    assert len(files) == 3 and not glob.glob(f"{d}/*.tmp")
    assert sum(po.ORCFile(f).nrows for f in files) == df.count()
    back = spark.read.format("orcfile").load(d)
    assert back.exceptAll(df).count() == 0
    assert df.exceptAll(back).count() == 0
    # overwrite replaces the directory contents
    df.limit(10).repartition(1).write.mode("overwrite") \
        .format("orcfile").save(d)
    assert spark.read.format("orcfile").load(d).count() == 10


def test_datasource_row_group_pruning_exact(spark, tmp_path):
    """Within a kept stripe, pushed filters now eliminate 10k-row
    groups via ROW_INDEX positional seek; results stay exactly equal to
    the unpruned scan (Spark re-applies filters), and the unit-level
    reader decodes fewer rows."""
    import pyarrow as pa

    d = str(tmp_path / "orcrg")
    os.makedirs(d)
    t = pa.table({"k": pa.array(range(60000)),
                  "v": pa.array([f"r{i}" for i in range(60000)])})
    p = os.path.join(d, "part-0.orc")
    write_orc(t, p, compression="ZSTD", stripe_rows=65536)  # one stripe

    # unit level: one selective filter -> only the covering group decoded
    r = OrcFileReader([p], None)
    list(r.pushFilters([GreaterThanOrEqual(("k",), 25000),
                        LessThanOrEqual(("k",), 26000)]))
    parts = r.partitions()
    assert len(parts) == 1
    batches = list(r.read(parts[0]))
    n_read = sum(b.num_rows for b in batches)
    assert n_read == 10000  # group 2 only, not the 60k stripe
    ks = [k for b in batches for k in b.column(0).to_pylist()]
    assert min(ks) <= 25000 and max(ks) >= 26000

    # end-to-end: results identical to the full scan
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(OrcFileDataSource)
    df = spark.read.format("orcfile").load(d)
    got = df.filter((F.col("k") >= 25000) & (F.col("k") <= 26000)) \
        .agg(F.count("*"), F.sum("k")).collect()[0]
    assert got[0] == 1001
    assert got[1] == sum(range(25000, 26001))

    # impossible range: zero rows, no error
    r2 = OrcFileReader([p], None)
    list(r2.pushFilters([GreaterThanOrEqual(("k",), 10**9)]))
    parts2 = r2.partitions()
    got2 = sum(b.num_rows for p2 in parts2 for b in r2.read(p2))
    assert got2 == 0


def test_datasource_bloom_equality_pruning(spark, tmp_path):
    """An EqualTo pushed filter probes bloom filters inside kept
    stripes: a value absent from every group decodes ZERO rows even
    though min/max stats alone would keep groups; results stay exact."""
    import pyarrow as pa

    d = str(tmp_path / "orcbl")
    os.makedirs(d)
    # unsorted strings: stats can't prune, blooms can
    t = pa.table({"u": pa.array([f"user-{(i * 7919) % 5000}"
                                 for i in range(30000)]),
                  "k": pa.array(range(30000))})
    p = os.path.join(d, "part-0.orc")
    write_orc(t, p, compression="ZSTD", stripe_rows=65536,
              bloom_filter_columns=["u"])

    r = OrcFileReader([p], None)
    from pyspark.sql.datasource import EqualTo
    list(r.pushFilters([EqualTo(("u",), "user-does-not-exist")]))
    parts = r.partitions()
    n_read = sum(b.num_rows for pt in parts for b in r.read(pt))
    assert n_read == 0  # bloom eliminated every group, stats couldn't

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(OrcFileDataSource)
    df = spark.read.format("orcfile").load(d)
    assert df.filter(F.col("u") == "user-does-not-exist").count() == 0
    present = df.filter(F.col("u") == "user-123")
    exp = sum(1 for i in range(30000) if (i * 7919) % 5000 == 123)
    assert present.count() == exp


def test_datasource_rejects_mixed_schemas(tmp_path):
    """A directory mixing ORC schemas fails at planning with the file
    named, not as a task-side cast error."""
    import pyarrow as pa

    d = str(tmp_path / "mixed")
    os.makedirs(d)
    write_orc(pa.table({"a": [1, 2]}), os.path.join(d, "x.orc"))
    write_orc(pa.table({"b": ["u", "v"]}), os.path.join(d, "y.orc"))
    r = OrcFileReader(sorted(
        os.path.join(d, f) for f in os.listdir(d)), None)
    with pytest.raises(ValueError, match="schema mismatch"):
        r.partitions()


def test_datasource_schema_evolution_added_nullable_column(spark, tmp_path):
    """Schema evolution the way Spark's own ORC reader handles it
    (VERDICT r3 item 9): a directory where one file carries an EXTRA
    nullable column (ignored — read schema comes from the first file)
    and, in the other direction, where a file LACKS a read-schema
    column (null-filled). Type conflicts still fail at planning."""
    import pyarrow as pa

    d = str(tmp_path / "evolved")
    os.makedirs(d)
    write_orc(pa.table({"a": pa.array([1, 2], pa.int64()),
                        "s": pa.array(["x", "y"])}),
              os.path.join(d, "0base.orc"))
    write_orc(pa.table({"a": pa.array([3, 4], pa.int64()),
                        "s": pa.array(["z", "w"]),
                        "extra": pa.array([9.5, 9.25])}),
              os.path.join(d, "1extra.orc"))
    write_orc(pa.table({"a": pa.array([5, 6], pa.int64())}),
              os.path.join(d, "2missing.orc"))
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(OrcFileDataSource)
    df = spark.read.format("orcfile").load(d)
    assert set(df.columns) == {"a", "s"}  # first file's schema
    rows = {r.a: r.s for r in df.collect()}
    assert rows == {1: "x", 2: "y", 3: "z", 4: "w", 5: None, 6: None}

    # type conflict is NOT evolution: fails at planning, file named
    write_orc(pa.table({"a": pa.array(["not", "int"])}),
              os.path.join(d, "3conflict.orc"))
    r = OrcFileReader(sorted(
        os.path.join(d, f) for f in os.listdir(d)), None)
    with pytest.raises(ValueError, match="3conflict.orc"):
        r.partitions()
