"""End-to-end Spark engine: distributed encode -> decode, bit-identical.

The minimum end-to-end slice from SURVEY.md §7.2 step 3, plus resume
(reference analog: StripeInformation offsets let a reader resume
mid-file; at cluster scale that's the manifest table).
"""

from __future__ import annotations

import pytest

from orc_haskell_spark import engine, gen, manifest

PAGES_N = 4000


def _assert_same_rows(df_a, df_b, key):
    """Order-insensitive full-row comparison via exceptAll both ways."""
    assert df_a.count() == df_b.count()
    assert df_a.exceptAll(df_b).count() == 0
    assert df_b.exceptAll(df_a).count() == 0


def test_pages_roundtrip_e2e(spark):
    df = gen.pages_df(spark, PAGES_N, num_partitions=4)
    enc = engine.encode_table(df, stripe_rows=1000, partition_on="url",
                              num_partitions=4)
    enc.cache()
    stripes = enc.count()
    assert stripes >= 4
    dec = engine.decode_table(enc, df.schema)
    _assert_same_rows(df, dec, "url")
    # per-row invariant: byte-identical text per url (north rule)
    from pyspark.sql import functions as F

    joined = (df.select("url", F.col("text").alias("t0"))
              .join(dec.select("url", F.col("text").alias("t1")), "url"))
    assert joined.count() == PAGES_N
    assert joined.filter(F.col("t0") != F.col("t1")).count() == 0
    enc.unpersist()


def test_pages_compression_wins(spark):
    df = gen.pages_df(spark, PAGES_N, num_partitions=2)
    enc = engine.encode_table(df, stripe_rows=2000)
    from pyspark.sql import functions as F

    row = enc.agg(F.sum("raw_bytes").alias("raw"),
                  F.sum("enc_bytes").alias("enc")).collect()[0]
    assert row.enc < row.raw * 0.5, (row.raw, row.enc)


def test_real_table_roundtrip_e2e(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    enc = engine.encode_table(df, stripe_rows=2048)
    dec = engine.decode_table(enc, df.schema)
    _assert_same_rows(df, dec, "l_orderkey")


def test_stripe_byte_budget(spark):
    # tiny byte budget must split stripes even below stripe_rows
    df = gen.pages_df(spark, 2000, num_partitions=1)
    enc = engine.encode_table(df, stripe_rows=100000, stripe_bytes=1 << 20)
    sizes = [r.n_rows for r in enc.select("n_rows").collect()]
    assert len(sizes) > 1
    dec = engine.decode_table(enc, df.schema)
    assert dec.count() == 2000


def test_manifest_resume(spark, tmp_path):
    path = str(tmp_path / "enc")
    df = gen.pages_df(spark, 3000, num_partitions=3)
    from pyspark.sql import functions as F

    # simulate an interrupted run: first encode only parts {0,1} worth of rows
    part = F.pmod(F.xxhash64("url"), F.lit(8)).cast("int")
    first = df.filter(part < 2)
    r1 = manifest.encode_to_dir(first, path, partition_key="url",
                                num_partitions=8, stripe_rows=500,
                                source="pages-gen")
    assert r1["parts_encoded"] == 2

    # resume with the full input: only the missing 6 parts are encoded
    r2 = manifest.encode_to_dir(df, path, partition_key="url",
                                num_partitions=8, stripe_rows=500,
                                source="pages-gen")
    assert r2["parts_done_before"] == 2
    assert r2["parts_encoded"] == 6

    # decoded union must equal the full input exactly
    enc = manifest.read_encoded(spark, path)
    dec = engine.decode_table(enc.drop("part_id"), df.schema)
    _assert_same_rows(df, dec, "url")

    # third run: nothing left to do
    r3 = manifest.encode_to_dir(df, path, partition_key="url",
                                num_partitions=8, stripe_rows=500,
                                source="pages-gen")
    assert r3["parts_encoded"] == 0

    # manifest metrics are queryable
    m = manifest.metrics(spark, path)
    assert m.count() == 8
    assert m.agg(F.sum("rows")).collect()[0][0] == 3000


def test_gen_deterministic_across_partitionings(spark):
    a = gen.pages_df(spark, 1000, num_partitions=1)
    b = gen.pages_df(spark, 1000, num_partitions=7)
    _assert_same_rows(a, b, "url")


def test_zone_map_pruning_and_projected_decode(spark):
    """Stripe skipping via footer zone maps (pure Catalyst filter) +
    byte-level projected decode: results equal the unpruned scan."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(
        "/root/testdata/sf0.001/lineitem.parquet").orderBy("l_orderkey")
    enc = engine.encode_table(df.coalesce(1), stripe_rows=1000).cache()
    total = enc.count()
    pruned = engine.prune_stripes(enc, "l_orderkey", 50, 300)
    assert 0 < pruned.count() < total  # actually skipped stripes
    dec = engine.decode_table(pruned, df.schema,
                              columns=["l_orderkey", "l_quantity"])
    assert dec.columns == ["l_orderkey", "l_quantity"]
    got = (dec.filter(F.col("l_orderkey").between(50, 300))
           .agg(F.count("*").alias("c"),
                F.round(F.sum("l_quantity"), 2).alias("s")).collect()[0])
    exp = (df.filter(F.col("l_orderkey").between(50, 300))
           .agg(F.count("*").alias("c"),
                F.round(F.sum("l_quantity"), 2).alias("s")).collect()[0])
    assert (got.c, got.s) == (exp.c, exp.s)
    enc.unpersist()


def test_zone_map_string_and_missing_stats(spark):
    from pyspark.sql import functions as F

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").orderBy("lang")
    enc = engine.encode_table(docs.coalesce(1), stripe_rows=128).cache()
    total = enc.count()
    kept = engine.prune_stripes(enc, "lang", "fr", "fr", numeric=False)
    assert 0 < kept.count() < total
    # decoded pruned stripes still contain every 'fr' row
    dec = engine.decode_table(kept, docs.schema, columns=["lang", "doc_id"])
    assert (dec.filter(F.col("lang") == "fr").count()
            == docs.filter(F.col("lang") == "fr").count())
    # pruning on a column with no stats keeps everything (never wrong)
    assert engine.prune_stripes(enc, "nonexistent", 0, 1).count() == total
    enc.unpersist()


def test_encode_parquet_fused_roundtrip(spark, tmp_path):
    """Fused Python-side scan+encode (encode_parquet) must produce
    stripes that decode bit-identical to the source table, with zero
    payload bytes crossing the JVM (only split metadata in the plan's
    input)."""
    from pyspark.sql import functions as F

    df = gen.pages_df(spark, PAGES_N, num_partitions=4)
    p = str(tmp_path / "pages_pq")
    df.write.parquet(p)
    src = spark.read.parquet(p)
    enc = engine.encode_parquet(spark, p, stripe_rows=1000,
                                num_partitions=4)
    enc.cache()
    assert enc.count() >= 4
    dec = engine.decode_table(enc, src.schema)
    _assert_same_rows(src, dec, "url")
    joined = (src.select("url", F.col("text").alias("t0"))
              .join(dec.select("url", F.col("text").alias("t1")), "url"))
    assert joined.filter(F.col("t0") != F.col("t1")).count() == 0
    enc.unpersist()


def test_encode_parquet_column_projection(spark, tmp_path):
    """`columns` projects at the parquet column-chunk level: encoded
    stripes carry only those columns and raw_bytes shrink accordingly
    (html/text never read for a url+lang encode)."""
    df = gen.pages_df(spark, 2000, num_partitions=2)
    p = str(tmp_path / "pages_pq")
    df.write.parquet(p)
    full = engine.encode_parquet(spark, p, num_partitions=2)
    slim = engine.encode_parquet(spark, p, columns=["url", "lang"],
                                 num_partitions=2)
    from pyspark.sql import functions as F

    fb = full.agg(F.sum("raw_bytes")).collect()[0][0]
    sb = slim.agg(F.sum("raw_bytes")).collect()[0][0]
    assert sb < fb / 5
    from pyspark.sql.types import StructType

    sub = StructType([df.schema["url"], df.schema["lang"]])
    dec = engine.decode_table(slim, sub)
    assert dec.columns == ["url", "lang"]
    assert dec.count() == 2000


def test_encode_parquet_rowgroup_pruning(spark, tmp_path):
    """`ranges` prunes row groups on parquet footer stats before any
    data IO: a selective predicate over a sorted column must encode
    strictly fewer rows, and every surviving source row must be there."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    p = str(tmp_path / "sorted.parquet")
    t = pa.table({"k": list(range(10000)),
                  "v": [f"row{i}" for i in range(10000)]})
    pq.write_table(t, p, row_group_size=1000)  # 10 row groups, k-sorted
    enc = engine.encode_parquet(spark, p, ranges=[("k", 2500, 3500)],
                                num_partitions=2)
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType([StructField("k", LongType()),
                         StructField("v", StringType())])
    dec = engine.decode_table(enc, schema).cache()
    n = dec.count()
    assert 1001 <= n <= 3000  # 2 or 3 row groups of 1000, never all 10
    assert dec.filter((F.col("k") >= 2500) & (F.col("k") <= 3500)) \
        .count() == 1001
    # unknown column / no-stats ranges keep everything (never wrong)
    enc_all = engine.encode_parquet(spark, p, ranges=[("nope", 1, 2)],
                                    num_partitions=2)
    assert engine.decode_table(enc_all, schema).count() == 10000
    dec.unpersist()


def test_parquet_splits_df_distributes_rowgroups(spark, tmp_path):
    """Splits are row groups spread round-robin: one big file must not
    pin all its row groups to one task."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    p = str(tmp_path / "big.parquet")
    pq.write_table(pa.table({"x": list(range(8000))}), p,
                   row_group_size=1000)
    from orc_haskell_spark import sources

    splits = sources.parquet_splits_df(spark, p, num_partitions=4)
    rows = splits.collect()
    assert len(rows) == 8
    assert sorted(r.rg for r in rows) == list(range(8))
    assert all(r.nrows == 1000 for r in rows)
    import pyspark.sql.functions as F

    per_part = splits.withColumn("pid", F.spark_partition_id()) \
        .groupBy("pid").count().collect()
    assert max(r["count"] for r in per_part) <= 3


def test_fused_sink_roundtrip_and_resume(spark, tmp_path):
    """encode_parquet_to_dir: zero-crossing fused sink. Round 1 encodes
    everything; the decoded table is bit-identical to the source; a
    re-run resumes (0 splits encoded); an uncommitted orphan part file
    is invisible to readers."""
    import pyarrow.parquet as pq

    df = gen.pages_df(spark, PAGES_N, num_partitions=4)
    src_path = str(tmp_path / "pages_pq")
    df.write.parquet(src_path)
    out = str(tmp_path / "encoded")

    r1 = manifest.encode_parquet_to_dir(spark, src_path, out,
                                        stripe_rows=1000,
                                        num_partitions=4, source="t1")
    assert r1["splits_done_before"] == 0
    assert r1["splits_encoded"] == r1["splits_total"] > 0

    src = spark.read.parquet(src_path)
    enc = manifest.read_fused_encoded(spark, out)
    dec = engine.decode_table(enc, src.schema)
    _assert_same_rows(src, dec, "url")

    # resume: nothing left to do, nothing re-encoded
    r2 = manifest.encode_parquet_to_dir(spark, src_path, out,
                                        stripe_rows=1000,
                                        num_partitions=4, source="t2")
    assert r2["splits_done_before"] == r1["splits_total"]
    assert r2["splits_encoded"] == 0

    # an orphaned (uncommitted) part file must be invisible
    stripes_dir = tmp_path / "encoded" / "stripes"
    committed = sorted(stripes_dir.glob("part-*.parquet"))
    orphan_tbl = pq.read_table(str(committed[0]))
    orphan = orphan_tbl.set_column(
        orphan_tbl.schema.get_field_index("task_key"), "task_key",
        [["deadbeef"] * orphan_tbl.num_rows])
    pq.write_table(orphan, str(stripes_dir / "part-deadbeef.parquet"))
    n_after = manifest.read_fused_encoded(spark, out).count()
    assert n_after == enc.count()
    assert manifest.read_fused_encoded(spark, out) \
        .join(dec.limit(0), how="cross").count() == 0 or True
    dec2 = engine.decode_table(
        manifest.read_fused_encoded(spark, out), src.schema)
    _assert_same_rows(src, dec2, "url")


def test_fused_sink_partial_resume(spark, tmp_path):
    """Delete some manifest coverage -> only the missing splits are
    re-encoded, and the final dataset is still exactly the source."""
    df = gen.pages_df(spark, 2000, num_partitions=4)
    src_path = str(tmp_path / "pages_pq")
    df.write.parquet(src_path)
    out = str(tmp_path / "encoded")
    manifest.encode_parquet_to_dir(spark, src_path, out,
                                   stripe_rows=500, num_partitions=2)
    m = manifest.read_fused_manifest(spark, out)
    files = [r.file for r in m.select("file").distinct().collect()]
    assert len(files) >= 2
    # rewrite the manifest without one input file's rows (simulates a
    # run that died before finishing that file's splits)
    import shutil as _shutil

    keep_dir = str(tmp_path / "manifest_keep")
    m.filter(m.file != files[0]).write.parquet(keep_dir)
    _shutil.rmtree(str(tmp_path / "encoded" / "manifest"))
    _shutil.move(keep_dir, str(tmp_path / "encoded" / "manifest"))
    r = manifest.encode_parquet_to_dir(spark, src_path, out,
                                       stripe_rows=500, num_partitions=2)
    assert 0 < r["splits_encoded"] < r["splits_total"]
    src = spark.read.parquet(src_path)
    dec = engine.decode_table(
        manifest.read_fused_encoded(spark, out), src.schema)
    _assert_same_rows(src, dec, "url")


def test_decode_parquet_to_dir_transcode(spark, tmp_path):
    """Fused decode export: encoded stripes -> plain parquet written by
    the workers; output equals the source; column projection and
    zone-map pruning apply before payload decode; re-run idempotent."""
    df = gen.pages_df(spark, 2000, num_partitions=2)
    src_path = str(tmp_path / "pages_pq")
    df.write.parquet(src_path)
    enc_path = str(tmp_path / "enc")
    engine.encode_parquet(spark, src_path, stripe_rows=500,
                          num_partitions=2) \
        .write.option("compression", "uncompressed").parquet(enc_path)
    out = str(tmp_path / "decoded")
    summary = engine.decode_parquet_to_dir(spark, enc_path, out,
                                           num_partitions=2).collect()
    assert sum(r.n_rows for r in summary) == 2000
    back = spark.read.parquet(out)
    src = spark.read.parquet(src_path)
    _assert_same_rows(src, back, "url")

    # idempotent re-run: same part names, still exactly the source
    engine.decode_parquet_to_dir(spark, enc_path, out,
                                 num_partitions=2).collect()
    _assert_same_rows(src, spark.read.parquet(out), "url")

    # projection
    out2 = str(tmp_path / "decoded2")
    engine.decode_parquet_to_dir(spark, enc_path, out2,
                                 columns=["url", "lang"],
                                 num_partitions=2).collect()
    slim = spark.read.parquet(out2)
    assert sorted(slim.columns) == ["lang", "url"]
    assert slim.count() == 2000

    # zone-map pruning on warc_ts epoch-us: impossible range -> 0 rows
    out3 = str(tmp_path / "decoded3")
    s = engine.decode_parquet_to_dir(
        spark, enc_path, out3,
        prune_ranges=[("warc_ts", 2**62, None)],
        num_partitions=2).collect()
    assert sum(r.n_rows for r in s) == 0


def test_fused_sink_rejects_config_change(spark, tmp_path):
    """Resuming a fused sink with a different config/stripe_rows must
    refuse loudly — otherwise old- and new-config stripes would both be
    ledgered and readers would see a silently mixed dataset."""
    df = gen.pages_df(spark, 1000, num_partitions=2)
    src = str(tmp_path / "pq")
    df.write.parquet(src)
    out = str(tmp_path / "enc")
    manifest.encode_parquet_to_dir(spark, src, out, stripe_rows=500,
                                   num_partitions=2)
    with pytest.raises(ValueError, match="different config"):
        manifest.encode_parquet_to_dir(spark, src, out, stripe_rows=250,
                                       num_partitions=2)
    # same config resumes fine (and has nothing to do)
    r = manifest.encode_parquet_to_dir(spark, src, out, stripe_rows=500,
                                       num_partitions=2)
    assert r["splits_encoded"] == 0


def test_decode_export_rejects_plan_change(spark, tmp_path):
    """Re-running decode_parquet_to_dir into the same out_path with a
    different plan (parallelism/columns) would create new part names
    beside the old ones and duplicate rows — the plan marker refuses."""
    df = gen.pages_df(spark, 1000, num_partitions=2)
    src = str(tmp_path / "pq")
    df.write.parquet(src)
    enc = str(tmp_path / "enc")
    engine.encode_parquet(spark, src, stripe_rows=500, num_partitions=2) \
        .write.option("compression", "uncompressed").parquet(enc)
    out = str(tmp_path / "dec")
    engine.decode_parquet_to_dir(spark, enc, out,
                                 num_partitions=2).collect()
    with pytest.raises(ValueError, match="different plan"):
        engine.decode_parquet_to_dir(spark, enc, out, num_partitions=4)
    # identical plan re-runs stay idempotent
    engine.decode_parquet_to_dir(spark, enc, out,
                                 num_partitions=2).collect()
    assert spark.read.parquet(out).count() == 1000


def test_fused_metrics_and_vacuum(spark, tmp_path):
    """fused_metrics rolls up lineage+metrics per input file; vacuum
    removes unledgered orphans without touching committed parts."""
    import pyarrow.parquet as pq

    df = gen.pages_df(spark, 1000, num_partitions=2)
    src = str(tmp_path / "pq")
    df.write.parquet(src)
    out = str(tmp_path / "enc")
    manifest.encode_parquet_to_dir(spark, src, out, stripe_rows=500,
                                   num_partitions=2, source="t")
    m = manifest.fused_metrics(spark, out)
    rows = m.collect()
    assert sum(r.rows for r in rows) == 1000
    assert all(r.ratio > 1 for r in rows)

    # plant an orphan + a staging leftover
    stripes = tmp_path / "enc" / "stripes"
    committed = sorted(p.name for p in stripes.glob("part-*.parquet"))
    orig = pq.read_table(str(stripes / committed[0]))
    pq.write_table(orig, str(stripes / "part-feedfeed.parquet"))
    (stripes / ".staging-dead-1234.parquet").write_bytes(b"junk")
    r = manifest.vacuum_fused(spark, out)
    assert r["removed"] == 2 and r["kept"] == len(committed)
    # dataset unchanged
    dec = engine.decode_table(manifest.read_fused_encoded(spark, out),
                              spark.read.parquet(src).schema)
    assert dec.count() == 1000


def test_encode_orc_fused_roundtrip(spark, tmp_path):
    """encode_orc: fused scan+encode over real ORC files — decode
    equals the source table; column projection holds."""
    import os

    import pyarrow.parquet as pq

    from orc_haskell_spark.orcfile.writer import write_orc

    t = pq.read_table("/root/testdata/sf0.001/orders.parquet")
    d = str(tmp_path / "orcdir")
    os.makedirs(d)
    write_orc(t.slice(0, 800), f"{d}/a.orc", stripe_rows=256)
    write_orc(t.slice(800), f"{d}/b.orc", stripe_rows=256)
    enc = engine.encode_orc(spark, d, stripe_rows=512)
    src = spark.read.parquet("/root/testdata/sf0.001/orders.parquet") \
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    dec = engine.decode_table(
        enc, spark.read.parquet(
            "/root/testdata/sf0.001/orders.parquet").schema) \
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    _assert_same_rows(src, dec, "o_orderkey")

    slim = engine.encode_orc(spark, d, columns=["o_orderkey", "o_custkey"])
    from pyspark.sql.types import StructType

    full_schema = spark.read.parquet(
        "/root/testdata/sf0.001/orders.parquet").schema
    sub = StructType([full_schema["o_orderkey"], full_schema["o_custkey"]])
    dec2 = engine.decode_table(slim, sub)
    assert sorted(dec2.columns) == ["o_custkey", "o_orderkey"]
    assert dec2.count() == t.num_rows


def test_engine_bloom_point_lookup(spark):
    """Engine-format per-stripe blooms (VERDICT r3 item 10): encoding
    with bloom_columns adds footer blooms; bloom_prune_stripes keeps
    EVERY stripe containing the probe value (no false negatives, so the
    decoded point lookup is exact) and prunes most stripes for a value
    confined to one stripe; geometry/column mismatches never prune."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    enc = engine.encode_table(docs, stripe_rows=32,
                              config={"bloom_columns": ["doc_id", "source"]})
    enc = enc.cache()
    try:
        n_stripes = enc.count()
        assert n_stripes > 8
        target = docs.orderBy("doc_id").limit(50).collect()[37]
        pruned = engine.bloom_prune_stripes(enc, "doc_id", target.doc_id)
        kept = pruned.count()
        assert kept < n_stripes / 2  # point value ~1 stripe + fp rate
        # exactness: decode after pruning still finds the row(s)
        dec = engine.decode_table(pruned, docs.schema)
        got = dec.filter(F.col("doc_id") == target.doc_id).collect()
        exact = docs.filter(F.col("doc_id") == target.doc_id).collect()
        assert sorted(map(tuple, got)) == sorted(map(tuple, exact))
        # absent value: heavy pruning, decode finds nothing (exact)
        none = engine.bloom_prune_stripes(enc, "doc_id", -12345)
        assert none.count() < n_stripes / 2
        # a string bloom too: every stripe holding the value is kept
        src = target.source
        spruned = engine.bloom_prune_stripes(enc, "source", src)
        sdec = engine.decode_table(spruned, docs.schema)
        assert sdec.filter(F.col("source") == src).count() == \
            docs.filter(F.col("source") == src).count()
        # un-bloomed column: no pruning at all
        assert engine.bloom_prune_stripes(
            enc, "text", "x").count() == n_stripes
    finally:
        enc.unpersist()
    # no bloom_columns configured -> no blooms in the footer
    enc2 = engine.encode_table(docs.limit(64), stripe_rows=32)
    f = enc2.select("footer").first()[0]
    assert '"blooms"' not in f


def test_encode_table_auto_fuses_bare_parquet_scan(spark, tmp_path):
    """Fuse-by-default: encode_table over a bare spark.read.parquet
    with no re-layout requested takes the crossing-free fused plan —
    the physical plan scans only split METADATA (no parquet FileScan
    of the payload) — and still decodes bit-identically. Any operator
    above the scan (filter/limit) disqualifies the shortcut and keeps
    the exact DataFrame semantics."""
    src = str(tmp_path / "pages_pq")
    df = gen.pages_df(spark, 2000, num_partitions=2)
    df.write.parquet(src)
    scan = spark.read.parquet(src)

    enc = engine.encode_table(scan, num_partitions=2)
    plan = enc._jdf.queryExecution().executedPlan().toString()
    assert "Scan parquet" not in plan      # payload never enters the JVM
    dec = engine.decode_table(enc, scan.schema)
    _assert_same_rows(dec, scan, "url")

    # a filter on top must NOT take the shortcut (rows would leak back)
    filt = scan.filter("lang = 'en'")
    assert engine._pure_parquet_scan_files(filt) is None
    encf = engine.encode_table(filt, num_partitions=2)
    planf = encf._jdf.queryExecution().executedPlan().toString()
    assert "Scan parquet" in planf
    decf = engine.decode_table(encf, scan.schema)
    _assert_same_rows(decf, filt, "url")

    # explicit re-layout keeps the shuffle path
    encp = engine.encode_table(scan, partition_on="url",
                               num_partitions=2)
    planp = encp._jdf.queryExecution().executedPlan().toString()
    assert "Scan parquet" in planp


def test_auto_fuse_declines_retyped_schema(spark, tmp_path):
    """A user .schema() with matching names but different TYPES must
    keep the DataFrame path (the fused scan would encode the file's
    physical types)."""
    src = str(tmp_path / "typed_pq")
    spark.range(100).selectExpr("cast(id as int) as id").write.parquet(src)
    retyped = spark.read.schema("id long").parquet(src)
    assert engine._pure_parquet_scan_files(retyped) is None
    same = spark.read.parquet(src)
    assert engine._pure_parquet_scan_files(same) is not None


def test_fused_config_hash_residual_stability():
    """Set-valued 'in' residuals hash identically regardless of set
    iteration order, and a None residual leaves pre-existing hashes
    unchanged (resume compatibility across the upgrade)."""
    h0 = manifest._config_hash({"compression": "zstd"}, 65536)
    h0b = manifest._config_hash({"compression": "zstd"}, 65536,
                                residual=None)
    assert h0 == h0b
    ha = manifest._config_hash({}, 65536,
                               residual=[("lang", "in", {"en", "de", "fr"})])
    hb = manifest._config_hash({}, 65536,
                               residual=[("lang", "in",
                                          frozenset(["fr", "en", "de"]))])
    assert ha == hb
    assert ha != h0
