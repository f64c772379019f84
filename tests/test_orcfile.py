"""Real ORC file interop, cross-validated against the C++ implementation
(pyarrow's bundled ORC) in BOTH directions — the reference's own
correctness bar is whole-file ("all files from the examples given in
the ORC repository work", /root/reference/README.md:16-20).

- pyarrow writes -> our reader decodes bit-identical
- our writer writes -> pyarrow (C++) decodes bit-identical
- every compression kind, every RLEv2 sub-mode, nested types, nulls,
  pre-1970 timestamps, dictionary + direct strings, RLEv1 (0.11) files
"""

from __future__ import annotations

import datetime
import decimal
import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.orc as po
import pytest

from orc_haskell_spark.orcfile import ORCFile, read_orc
from orc_haskell_spark.orcfile.writer import write_orc

D = decimal.Decimal


def _roundtrip_pa_to_us(t: pa.Table, **write_kw) -> pa.Table:
    path = tempfile.mktemp(suffix=".orc")
    try:
        po.write_table(t, path, **write_kw)
        got = read_orc(path)
        exp = po.read_table(path)
        assert got.equals(exp), f"mismatch vs pyarrow read: {write_kw}"
        return got
    finally:
        os.unlink(path)


def _roundtrip_us_to_pa(t: pa.Table, **write_kw):
    path = tempfile.mktemp(suffix=".orc")
    try:
        write_orc(t, path, **write_kw)
        got = po.read_table(path).combine_chunks()
        ours = read_orc(path).combine_chunks()
        t = t.combine_chunks()
        for c in t.column_names:
            for name, g in (("pyarrow", got[c]), ("own", ours[c])):
                g = g.combine_chunks()
                e = t[c].combine_chunks()
                if g.type != e.type:
                    g = g.cast(e.type)
                assert g.equals(e), f"{name} read mismatch col {c}"
    finally:
        os.unlink(path)


def _wide_table(n: int = 2000) -> pa.Table:
    rng = np.random.default_rng(11)
    outliers = rng.integers(0, 100, n)
    outliers[::97] = 10**12
    q = n // 4
    ts = [datetime.datetime(1969, 12, 31, 23, 59, 59, 123456),
          datetime.datetime(1900, 1, 1, 0, 0, 0, 1), None,
          datetime.datetime(2024, 6, 1, 12, 0, 0, 250000)] * q
    return pa.table({
        "sorted": pa.array(np.arange(n) * 3 + 7),
        "const": pa.array(np.full(n, 42)),
        "rand": pa.array(rng.integers(-2**40, 2**40, n)),
        "outl": pa.array(outliers),
        "dict": pa.array([["red", "green", "blue"][i % 3] for i in range(n)]),
        "uniq": pa.array([f"u-{i}-{rng.integers(0, 10**9)}" for i in range(n)]),
        "ts": pa.array(ts, pa.timestamp("us")),
        "date": pa.array([datetime.date(1969, 1, 1), datetime.date(2020, 5, 5),
                          None, datetime.date(2030, 1, 1)] * q),
        "dec": pa.array([D("123.45"), D("-0.01"), None,
                         D("99999999999999.99")] * q, pa.decimal128(16, 2)),
        "bin": pa.array([b"\x00\x01", None, b"", b"\xff" * 10] * q, pa.binary()),
        "i8": pa.array([1, -2, None, 127] * q, pa.int8()),
        "b": pa.array([True, False, None, True] * q),
        "f32": pa.array(rng.standard_normal(n).astype(np.float32)),
        "f64": pa.array(rng.standard_normal(n)),
        "lst": pa.array([[1, 2], None, [], [3, None, 5]] * q,
                        pa.list_(pa.int64())),
        "mp": pa.array([{"a": 1}, {}, {"c": 3}, {"d": None}] * q,
                       pa.map_(pa.string(), pa.int64())),
        "st": pa.array([{"x": 1, "y": "a"}, None, {"x": None, "y": "b"},
                        {"x": 4, "y": None}] * q,
                       pa.struct([("x", pa.int64()), ("y", pa.string())])),
    })


@pytest.mark.parametrize("comp", ["uncompressed", "zlib", "snappy", "zstd",
                                  "lz4"])
def test_read_pyarrow_files_all_compressions(comp):
    _roundtrip_pa_to_us(_wide_table(), compression=comp)


def test_read_multi_stripe_and_dictionary():
    n = 50000
    t = pa.table({
        "x": pa.array(np.arange(n, dtype=np.int64)),
        "s": pa.array([f"w{i % 50}" for i in range(n)]),
    })
    path = tempfile.mktemp(suffix=".orc")
    try:
        po.write_table(t, path, compression="zlib", stripe_size=65536,
                       dictionary_key_size_threshold=0.9)
        f = ORCFile(path)
        assert len(f.stripes) > 1
        assert f.read().equals(po.read_table(path))
    finally:
        os.unlink(path)


def test_read_rlev1_hive011_files():
    n = 5000
    t = pa.table({
        "i": pa.array(np.arange(n, dtype=np.int64)),
        "s": pa.array([f"w{i % 7}" for i in range(n)]),
    })
    _roundtrip_pa_to_us(t, compression="zlib", file_version="0.11")


def test_read_edge_tables():
    _roundtrip_pa_to_us(pa.table({"n": pa.array([None] * 50, pa.int64()),
                                  "s": pa.array([None] * 50, pa.string())}))
    _roundtrip_pa_to_us(pa.table({"a": pa.array([], pa.int64())}))
    _roundtrip_pa_to_us(pa.table({"u": pa.array(
        ["héllo", "日本語", "🚀🚀🚀", "", None] * 100)}))


@pytest.mark.parametrize("comp", ["NONE", "ZLIB", "SNAPPY", "ZSTD", "LZ4"])
def test_write_files_cpp_reads_all_compressions(comp):
    _roundtrip_us_to_pa(_wide_table(), compression=comp)


def test_write_multi_stripe_cpp_reads():
    _roundtrip_us_to_pa(_wide_table(4000), compression="ZLIB",
                        stripe_rows=1000)


def test_write_patched_base_cpp_reads():
    """Every outlier-magnitude class through PATCHED_BASE, decoded by
    the independent C++ implementation (catches mirror-bugs our own
    decoder can't: pl==0 rejection, closestFixedBits patch packing)."""
    rng = np.random.default_rng(3)
    cols = {}
    for k, mag in enumerate([10**6, 10**9, 10**12, 10**15, 2**62]):
        v = rng.integers(0, 50, 3000)
        v[::113] = mag
        v[7::211] = mag - 3
        cols[f"c{k}"] = pa.array(v)
    _roundtrip_us_to_pa(pa.table(cols), compression="ZLIB")
    # and the reverse: C++-written patched files through our reader
    _roundtrip_pa_to_us(pa.table(cols), compression="zlib")


def test_write_garbage_rejected():
    with pytest.raises(ValueError):
        read_orc(b"not an orc file at all, definitely")
    with pytest.raises((ValueError, IndexError, KeyError)):
        read_orc(b"\x00" * 100 + b"ORC\x05")


def test_postscript_roundtrip_fields():
    t = pa.table({"x": pa.array([1, 2, 3], pa.int64())})
    path = tempfile.mktemp(suffix=".orc")
    try:
        write_orc(t, path, compression="ZSTD")
        f = ORCFile(path)
        assert f.compression == "ZSTD"
        assert f.num_rows == 3
        assert f.postscript["magic"] == "ORC"
        assert [x for x in f.postscript["version"]] == [0, 12]
    finally:
        os.unlink(path)


def test_distributed_write_read_roundtrip(spark, tmp_path):
    from orc_haskell_spark.orcfile.spark_source import (
        read_orc_distributed, write_orc_distributed)

    df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    d = str(tmp_path / "orc")
    man = write_orc_distributed(df.repartition(3), d,
                                compression="ZSTD",
                                stripe_rows=1000).collect()
    assert len(man) == 3 and sum(r.rows for r in man) == df.count()
    back = read_orc_distributed(spark, d)
    assert back.schema == df.schema
    assert back.exceptAll(df).count() == 0
    assert df.exceptAll(back).count() == 0
    # stripe-parallel: more read tasks than files
    assert back.rdd.getNumPartitions() >= 3
    # each per-partition file is readable by the C++ implementation
    total = sum(po.read_table(r.file).num_rows for r in man)
    assert total == df.count()


def test_distributed_read_of_cpp_file(spark, tmp_path):
    import pyarrow.parquet as pq

    from orc_haskell_spark.orcfile.spark_source import read_orc_distributed

    t = pq.read_table("/root/testdata/sf0.001/events.parquet")
    path = str(tmp_path / "events.orc")
    po.write_table(t, path, compression="zstd", stripe_size=256 * 1024)
    df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    back = read_orc_distributed(spark, str(tmp_path))
    assert back.count() == df.count()
    assert back.exceptAll(df).count() == 0


def test_column_projection_byte_level():
    t = pa.table({"k": pa.array(np.arange(5000, dtype=np.int64)),
                  "s": pa.array([f"row{i:05d}" for i in range(5000)]),
                  "f": pa.array(np.linspace(0, 1, 5000))})
    path = tempfile.mktemp(suffix=".orc")
    try:
        write_orc(t, path, compression="ZLIB", stripe_rows=1000)
        proj = read_orc(path, columns=["s", "k"])
        assert proj.column_names == ["s", "k"]
        assert proj["s"].combine_chunks().equals(t["s"].combine_chunks())
        assert proj["k"].combine_chunks().equals(t["k"].combine_chunks())
    finally:
        os.unlink(path)


def test_stripe_stats_pruning_int_string_double():
    t = pa.table({"k": pa.array(np.arange(10000, dtype=np.int64)),
                  "s": pa.array([f"row{i:05d}" for i in range(10000)]),
                  "f": pa.array(np.linspace(0, 1, 10000))})
    path = tempfile.mktemp(suffix=".orc")
    try:
        write_orc(t, path, compression="ZLIB", stripe_rows=2000)
        f = ORCFile(path)
        assert len(f.stripes) == 5 and len(f.stripe_stats) == 5
        assert f.prune_stripes("k", 4500, 4700) == [2]
        assert f.prune_stripes("s", "row09", None) == [4]
        assert f.prune_stripes("f", None, 0.05) == [0]
        # pruning is never wrong: reading kept stripes covers the range
        kept = pa.Table.from_batches(
            [f.read_stripe(i) for i in f.prune_stripes("k", 4500, 4700)])
        vals = kept["k"].to_pylist()
        assert set(range(4500, 4701)) <= set(vals)
        # the C++ reader still accepts files carrying our Metadata
        assert po.read_table(path).equals(t)
        # and C++-written stats parse through the same path
        path2 = tempfile.mktemp(suffix=".orc")
        po.write_table(t, path2, compression="zlib")
        assert ORCFile(path2).stripe_stats  # pyarrow writes Metadata
        os.unlink(path2)
    finally:
        os.unlink(path)


def test_distributed_projection_and_pruning(spark, tmp_path):
    from orc_haskell_spark.orcfile.spark_source import (
        read_orc_distributed, write_orc_distributed)

    df = spark.range(0, 20000).selectExpr(
        "id as k", "concat('v', lpad(cast(id as string), 6, '0')) as s")
    d = str(tmp_path / "orc")
    write_orc_distributed(df.orderBy("k").coalesce(1), d,
                          stripe_rows=4000).collect()
    proj = read_orc_distributed(spark, d, columns=["s"])
    assert proj.columns == ["s"]
    assert proj.count() == 20000
    pruned = read_orc_distributed(spark, d, prune=("k", 9000, 9100))
    # only the one stripe containing [9000, 9100] is scheduled
    assert pruned.count() == 4000
    assert pruned.filter("k between 9000 and 9100").count() == 101


# ---- property test: random tables, our writer <-> C++ reader ----
from hypothesis import given, settings, strategies as st


@st.composite
def _rand_table(draw):
    n = draw(st.integers(1, 300))
    cols = {}
    ncols = draw(st.integers(1, 4))
    for k in range(ncols):
        kind = draw(st.sampled_from(
            ["i64", "i32", "f64", "str", "bool", "ts", "bin"]))
        nullable = draw(st.booleans())
        def maybe(v):
            return st.none() | v if nullable else v
        if kind == "i64":
            vals = draw(st.lists(maybe(st.integers(-2**63, 2**63 - 1)),
                                 min_size=n, max_size=n))
            arr = pa.array(vals, pa.int64())
        elif kind == "i32":
            vals = draw(st.lists(maybe(st.integers(-2**31, 2**31 - 1)),
                                 min_size=n, max_size=n))
            arr = pa.array(vals, pa.int32())
        elif kind == "f64":
            vals = draw(st.lists(
                maybe(st.floats(allow_nan=False, width=64)),
                min_size=n, max_size=n))
            arr = pa.array(vals, pa.float64())
        elif kind == "str":
            vals = draw(st.lists(maybe(st.text(max_size=20)),
                                 min_size=n, max_size=n))
            arr = pa.array(vals, pa.string())
        elif kind == "bool":
            vals = draw(st.lists(maybe(st.booleans()),
                                 min_size=n, max_size=n))
            arr = pa.array(vals, pa.bool_())
        elif kind == "bin":
            vals = draw(st.lists(maybe(st.binary(max_size=16)),
                                 min_size=n, max_size=n))
            arr = pa.array(vals, pa.binary())
        else:
            vals = draw(st.lists(
                maybe(st.integers(-2**50, 2**50)), min_size=n, max_size=n))
            arr = pa.array(vals, pa.timestamp("us"))
        cols[f"c{k}"] = arr
    return pa.table(cols)


@settings(max_examples=30, deadline=None)
@given(_rand_table())
def test_property_our_writer_cpp_reads(t):
    path = tempfile.mktemp(suffix=".orc")
    try:
        write_orc(t, path, compression="ZLIB", stripe_rows=97)
        got = po.read_table(path).combine_chunks()
        exp = t.combine_chunks()
        for c in exp.column_names:
            g = got[c].combine_chunks()
            e = exp[c].combine_chunks()
            if g.type != e.type:
                g = g.cast(e.type)
            assert g.equals(e), c
    finally:
        if os.path.exists(path):
            os.unlink(path)


def test_union_orc_files_both_directions():
    """File-level UNION (kind 13) — the reference reads union ORC files
    (src/Orc/Table/Striped.hs:387-397); ours writes AND reads them,
    cross-validated with the C++ implementation in both directions."""
    du = pa.UnionArray.from_dense(
        pa.array([0, 1, 0, 2, 1, 0] * 50, pa.int8()),
        pa.array(sum([[i * 3, i * 2, i * 3 + 1, i, i * 2 + 1, i * 3 + 2]
                      for i in range(50)], []), pa.int32()),
        [pa.array(list(range(150)), pa.int64()),
         pa.array([f"s{i}" for i in range(100)]),
         pa.array(np.linspace(0, 1, 50))],
        ["i", "s", "f"], [0, 1, 2])
    t = pa.table({"u": du, "k": pa.array(range(300))})
    p1 = tempfile.mktemp(suffix=".orc")
    try:
        po.write_table(t, p1)
        assert read_orc(p1).equals(po.read_table(p1))  # C++ writes, we read
    finally:
        os.unlink(p1)
    p2 = tempfile.mktemp(suffix=".orc")
    try:
        write_orc(t, p2, compression="ZLIB")
        got = po.read_table(p2)                        # we write, C++ reads
        assert got["u"].to_pylist() == t["u"].to_pylist()
        assert read_orc(p2)["u"].to_pylist() == t["u"].to_pylist()
    finally:
        os.unlink(p2)


def test_write_all_null_and_all_empty_columns_cpp_reads():
    """Regression (subprocess fuzzing): zero-length DATA/LENGTH streams
    must still be DECLARED or the C++ reader aborts with 'stream not
    found' on all-null / all-empty columns."""
    t = pa.table({
        "f_null": pa.array([None, None, None], pa.float64()),
        "ts_null": pa.array([None] * 3, pa.timestamp("us")),
        "s_empty": pa.array(["", "", ""]),
        "b_empty": pa.array([b"", b"", b""], pa.binary()),
        "b_nullish": pa.array([None, b"", None], pa.binary()),
        "i_null": pa.array([None] * 3, pa.int64()),
        "bool_null": pa.array([None] * 3, pa.bool_()),
    })
    _roundtrip_us_to_pa(t, compression="ZLIB")


def test_lzo_rejected_at_open():
    """Unsupported codecs fail at open time with the codec's name,
    mirroring the reference's explicit error
    (Internal/Compression.hs:95-118)."""
    from orc_haskell_spark.orcfile import proto
    from orc_haskell_spark.orcfile.reader import parse_tail

    ps = proto.encode("PostScript", {
        "footerLength": 0, "compression": proto.COMPRESSION["LZO"],
        "compressionBlockSize": 262144, "version": [0, 12],
        "metadataLength": 0, "writerVersion": 1, "magic": "ORC"})
    tail = ps + bytes([len(ps)])
    with pytest.raises(ValueError, match="LZO"):
        parse_tail(tail)


def test_decimal_vectorized_1m_rows_fast_and_cpp_identical(tmp_path):
    """precision<=18 decimals take the vectorized path (int64 mantissas
    straight from decimal128 storage, varint kernel, no per-row Python):
    1M rows must write+read in well under 2s each and stay bit-identical
    with the C++ reader; precision>18 falls back per-row, same oracle."""
    import decimal
    import time

    import pyarrow.orc as po

    rng = np.random.default_rng(3)
    n = 1_000_000
    ints = rng.integers(-10**15, 10**15, n)
    arr = pa.array(
        [decimal.Decimal(int(x)).scaleb(-4) for x in ints.tolist()],
        type=pa.decimal128(18, 4))
    mask = rng.random(n) < 0.05
    arr = pa.compute.if_else(pa.array(~mask), arr, pa.nulls(n, arr.type))
    p = str(tmp_path / "dec.orc")
    t0 = time.perf_counter()
    write_orc(pa.table({"d": arr}), p, compression="ZLIB")
    t_write = time.perf_counter() - t0
    f = ORCFile(p)
    t0 = time.perf_counter()
    got = pa.concat_arrays(
        [f.read_stripe(i).column(0) for i in range(len(f.stripes))])
    t_read = time.perf_counter() - t0
    assert got.equals(arr.combine_chunks()
                      if isinstance(arr, pa.ChunkedArray) else arr)
    assert po.ORCFile(p).read()["d"].combine_chunks().equals(got)
    assert t_write < 2 and t_read < 2, (t_write, t_read)

    wide = pa.array([decimal.Decimal("123456789012345678901234.5"), None,
                     decimal.Decimal("-" + "9" * 25 + ".0")],
                    type=pa.decimal128(38, 1))
    p2 = str(tmp_path / "wide.orc")
    write_orc(pa.table({"d": wide}), p2, compression="NONE")
    got2 = ORCFile(p2).read_stripe(0).column(0)
    assert got2.equals(wide)
    assert po.ORCFile(p2).read()["d"].combine_chunks().equals(got2)


@pytest.mark.parametrize("zone", [
    "America/Los_Angeles",   # DST, negative offset
    "Asia/Kolkata",          # +05:30, no DST
    "Australia/Sydney",      # southern-hemisphere DST
    "Asia/Tokyo",            # fixed +09:00
    "America/Recife",        # 2000: DST enacted then repealed 7d apart
    "Africa/Casablanca",     # Ramadan DST suspensions
    "Pacific/Chatham",       # +12:45 base offset with DST
])
def test_non_utc_writer_timezone_matches_cpp(tmp_path, zone):
    """TIMESTAMP values from files stamped with a non-UTC writerTimezone
    must decode bit-identical to the C++ reader (the rule is DST-aware:
    wall = stored + epoch(tz) + gmtOffset(tz, stored + epoch))."""
    import datetime as dt

    import pyarrow.orc as po

    import orc_haskell_spark.orcfile.writer as W

    vals = [dt.datetime(2015, 1, 1), dt.datetime(2015, 7, 1, 12, 30),
            dt.datetime(2020, 3, 8, 2, 30), dt.datetime(2020, 3, 8, 1, 59, 59),
            dt.datetime(2020, 11, 1, 1, 30), dt.datetime(2023, 10, 1, 2, 30),
            dt.datetime(1969, 12, 31, 23, 59, 59, 500000),
            dt.datetime(1900, 1, 1), dt.datetime(2038, 6, 1, 6, 0, 0),
            dt.datetime(1850, 6, 1),  # pre-first-transition (LMT era)
            dt.datetime(2055, 7, 10, 12),  # POSIX-footer rule region
            None]
    # Recife 2000: two transitions 7 days apart — probing heuristics
    # that assume sparse transitions decode this window wrong
    vals += [dt.datetime(2000, 10, 8) + dt.timedelta(hours=h)
             for h in range(0, 24 * 14, 5)]
    rng = np.random.default_rng(11)
    vals += [dt.datetime(1970, 1, 1)
             + dt.timedelta(seconds=int(s), microseconds=int(us))
             for s, us in zip(rng.integers(-3 * 10**9, 3 * 10**9, 300),
                              rng.integers(0, 10**6, 300))]
    t = pa.table({"ts": pa.array(vals, type=pa.timestamp("us"))})
    p = str(tmp_path / f"{zone.replace('/', '_')}.orc")
    orig = W.proto.encode

    def stamped(name, msg):
        if name == "StripeFooter":
            msg = dict(msg)
            msg["writerTimezone"] = zone
        return orig(name, msg)

    W.proto.encode = stamped
    try:
        write_orc(t, p, compression="ZLIB")
    finally:
        W.proto.encode = orig
    us = pa.timestamp("us")
    cpp = po.ORCFile(p).read()["ts"].combine_chunks().cast(us)
    ours = ORCFile(p).read_stripe(0).column(0).cast(us)
    assert ours.equals(cpp)


def test_unknown_writer_timezone_raises(tmp_path):
    import datetime as dt

    import orc_haskell_spark.orcfile.writer as W

    t = pa.table({"ts": pa.array([dt.datetime(2020, 1, 1)],
                                 type=pa.timestamp("us"))})
    p = str(tmp_path / "bad.orc")
    orig = W.proto.encode

    def stamped(name, msg):
        if name == "StripeFooter":
            msg = dict(msg)
            msg["writerTimezone"] = "Not/AZone"
        return orig(name, msg)

    W.proto.encode = stamped
    try:
        write_orc(t, p, compression="NONE")
    finally:
        W.proto.encode = orig
    with pytest.raises(ValueError, match="writer timezone"):
        ORCFile(p).read_stripe(0)


def test_null_union_rows_match_cpp(tmp_path):
    """UNION columns with null ROWS (Hive can write them; Arrow cannot
    represent them at the top level): our reader must produce exactly
    what the C++ reader produces — tag 0 with a null child-0 value."""
    from orc_haskell_spark.codecs import bitpack, byte_rle, rle2
    from orc_haskell_spark.orcfile import proto
    from orc_haskell_spark.orcfile.writer import write_raw_stripe

    types = [
        {"kind": proto.KIND["STRUCT"], "subtypes": [1], "fieldNames": ["u"]},
        {"kind": proto.KIND["UNION"], "subtypes": [2, 3]},
        {"kind": proto.KIND["LONG"]},
        {"kind": proto.KIND["STRING"]},
    ]
    present = np.array([1, 0, 1, 1, 0, 1], bool)
    streams = [
        (1, "PRESENT", byte_rle.encode(
            np.frombuffer(bitpack.pack_bools(present), np.uint8))),
        (1, "DATA", byte_rle.encode(np.array([0, 1, 0, 1], np.uint8))),
        (2, "DATA", rle2.encode(np.array([42, 7], np.int64), True)),
        (3, "DATA", b"hiyo"),
        (3, "LENGTH", rle2.encode(np.array([2, 2], np.int64), False)),
    ]
    enc = {0: {"kind": proto.ENCODING["DIRECT"]},
           1: {"kind": proto.ENCODING["DIRECT"]},
           2: {"kind": proto.ENCODING["DIRECT_V2"]},
           3: {"kind": proto.ENCODING["DIRECT_V2"]}}
    p = str(tmp_path / "nullunion.orc")
    write_raw_stripe(p, types, streams, enc, 6)

    import pyarrow.orc as po

    cpp = po.ORCFile(p).read()["u"].combine_chunks()
    ours = ORCFile(p).read_stripe(0).column(0)
    assert cpp.to_pylist() == [42, None, "hi", 7, None, "yo"]
    assert ours.to_pylist() == cpp.to_pylist()
    assert ours.type_codes.to_pylist() == cpp.type_codes.to_pylist()
    # selected slots of each child must agree (unselected are don't-care)
    for f in (0, 1):
        sel = [i for i, tc in enumerate(cpp.type_codes.to_pylist())
               if tc == f]
        assert [ours.field(f)[i].as_py() for i in sel] == \
               [cpp.field(f)[i].as_py() for i in sel]


def test_null_map_rows_cross_engine(tmp_path):
    """MAP columns with null rows: read a C++-written file identically,
    and roundtrip our own writer's output through the C++ reader."""
    import pyarrow.orc as po

    m = pa.array([[("a", 1), ("b", 2)], None, [], [("c", None)], None],
                 type=pa.map_(pa.string(), pa.int64()))
    t = pa.table({"m": m})
    p_cpp = str(tmp_path / "cpp.orc")
    po.write_table(t, p_cpp)
    ours = ORCFile(p_cpp).read_stripe(0).column(0)
    assert ours.to_pylist() == m.to_pylist()

    p_own = str(tmp_path / "own.orc")
    write_orc(t, p_own, compression="ZLIB")
    assert po.ORCFile(p_own).read()["m"].to_pylist() == m.to_pylist()
    assert ORCFile(p_own).read_stripe(0).column(0).to_pylist() == m.to_pylist()


def test_corrupted_files_never_crash(tmp_path):
    """300 seeded single/multi-byte corruptions of a valid ORC file:
    every read must either succeed (flip hit dead/ignorable bytes) or
    raise a Python exception — never hang or kill the process (the C
    kernels carry explicit bounds checks; this drives them with
    adversarial inputs). Runs in a subprocess so a crash would surface
    as a return-code failure, not a dead test harness."""
    import subprocess
    import sys

    t = pa.table({
        "i": pa.array(np.arange(4000, dtype=np.int64) * 7),
        "s": pa.array([f"w{i % 19}" for i in range(4000)]),
        "f": pa.array(np.linspace(0, 1, 4000)),
    })
    p = str(tmp_path / "base.orc")
    write_orc(t, p, compression="ZLIB", stripe_rows=1000)
    code = r"""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
from orc_haskell_spark.orcfile.reader import ORCFile
raw = bytearray(open(sys.argv[1], "rb").read())
rng = np.random.default_rng(1234)
bad = 0
for trial in range(300):
    buf = bytearray(raw)
    for _ in range(int(rng.integers(1, 4))):
        i = int(rng.integers(0, len(buf)))
        buf[i] ^= int(rng.integers(1, 256))
    path = sys.argv[1] + ".fuzz"
    open(path, "wb").write(buf)
    try:
        f = ORCFile(path)
        for k in range(len(f.stripes)):
            f.read_stripe(k)
    except Exception:
        bad += 1
print(f"OK raised_or_read=300 exceptions={bad}")
"""
    r = subprocess.run([sys.executable, "-c", code, p],
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, (r.returncode, r.stderr[-2000:])
    assert "OK" in r.stdout


def test_nan_stripes_survive_pruning(tmp_path):
    """Spark orders NaN above every double, but pc.min/max exclude it:
    stats over a NaN-bearing stripe must be OMITTED so pushed-filter
    pruning can never drop rows (review finding, reproduced)."""
    p = str(tmp_path / "nan.orc")
    write_orc(pa.table({"x": pa.array([1.0, 2.0, float("nan")])}), p,
              compression="NONE")
    f = ORCFile(p)
    assert f.prune_stripes("x", 10.0, None) == [0]
    got = f.read_stripe(0).column(0).to_pylist()
    assert got[:2] == [1.0, 2.0] and got[2] != got[2]


def test_huge_string_stats_omitted(tmp_path):
    """html-sized string values must NOT be embedded in stripe/file
    statistics (two full documents per column per stripe would bloat
    the tail every reader fetches); short strings keep min/max."""
    p = str(tmp_path / "s.orc")
    write_orc(pa.table({"big": pa.array(["x" * 5000, "y" * 5000]),
                        "small": pa.array(["a", "b"])}), p,
              compression="NONE")
    f = ORCFile(p)
    names = f.footer["types"][0]["fieldNames"]
    cs = f.stripe_stats[0]
    big = cs[f.footer["types"][0]["subtypes"][names.index("big")]]
    small = cs[f.footer["types"][0]["subtypes"][names.index("small")]]
    assert "stringStatistics" not in big
    assert small["stringStatistics"] == {"minimum": "a", "maximum": "b"}


@pytest.mark.parametrize("comp", ["ZSTD", "NONE"])
def test_row_group_reads_match_cpp_slices(tmp_path, comp):
    """ROW_INDEX positional seek: decoding only selected row groups of
    C++-written files must equal the corresponding table slices, for
    every primitive type, with and without nulls, both compressions.
    Positions exercise mid-run RLE skips, bit-level PRESENT offsets and
    chunk-boundary seeks."""
    import datetime as dt
    import decimal as d

    n = 25000  # 3 row groups (stride 10000)
    rng = np.random.default_rng(7)
    ints = rng.integers(-10**12, 10**12, n)
    vals = {
        "i": pa.array(ints),
        "i_null": pa.array([None if i % 7 == 0 else int(v)
                            for i, v in enumerate(ints)], pa.int64()),
        "f": pa.array(rng.random(n)),
        "b": pa.array((ints % 3 == 0).tolist()),
        "s": pa.array([f"val-{i % 997}-{'x' * (i % 13)}"
                       for i in range(n)]),
        "s_null": pa.array([None if i % 11 == 3 else f"s{i}"
                            for i in range(n)]),
        "bin": pa.array([bytes([i % 251, (i * 7) % 256])
                         for i in range(n)], pa.binary()),
        "ts": pa.array([dt.datetime(2020, 1, 1)
                        + dt.timedelta(seconds=int(s), microseconds=int(u))
                        for s, u in zip(rng.integers(0, 10**8, n),
                                        rng.integers(0, 10**6, n))],
                       pa.timestamp("us")),
        "dte": pa.array([dt.date(2000, 1, 1) + dt.timedelta(days=int(v))
                         for v in rng.integers(0, 9000, n)]),
        "dec": pa.array([d.Decimal(int(v)).scaleb(-2)
                         for v in rng.integers(-10**6, 10**6, n)],
                        pa.decimal128(12, 2)),
        "tiny": pa.array(rng.integers(-128, 128, n), pa.int8()),
        "f_null": pa.array([None if i % 13 == 2 else float(v)
                            for i, v in enumerate(rng.random(n))],
                           pa.float64()),
        "b_null": pa.array([None if i % 17 == 5 else bool(i % 2)
                            for i in range(n)], pa.bool_()),
        "ts_null": pa.array([None if i % 19 == 7 else
                             dt.datetime(2019, 6, 1)
                             + dt.timedelta(seconds=i * 37)
                             for i in range(n)], pa.timestamp("us")),
        "dec_null": pa.array([None if i % 23 == 11 else
                              d.Decimal(i - 5000).scaleb(-2)
                              for i in range(n)], pa.decimal128(12, 2)),
    }
    t = pa.table(vals)
    p = str(tmp_path / "rg.orc")
    import pyarrow.orc as paorc

    paorc.write_table(t, p, compression=comp.lower()
                      if comp != "NONE" else "uncompressed")
    f = ORCFile(p)
    stride = f.footer["rowIndexStride"]
    assert stride == 10000
    for sel in ([0], [1], [2], [1, 2], [0, 2]):
        got = pa.Table.from_batches([f.read_stripe_row_groups(0, sel)])
        exp = pa.concat_tables([t.slice(g * stride, stride)
                                for g in sel])
        for name in t.column_names:
            a = got.column(name).combine_chunks()
            b = exp.column(name).combine_chunks()
            if a.type != b.type:
                b = b.cast(a.type)
            assert a.equals(b), (comp, sel, name)
    # column projection composes with group selection
    slim = f.read_stripe_row_groups(0, [2], columns=["s", "i_null"])
    assert slim.schema.names == ["s", "i_null"]
    assert pa.Table.from_batches([slim]).column("i_null").combine_chunks() \
        .equals(t.slice(2 * stride, stride).column("i_null").combine_chunks())


def test_prune_row_groups_statistics(tmp_path):
    """Row-group elimination on ROW_INDEX entry statistics: a sorted
    column prunes to exactly the covering groups; unknown stats keep."""
    import pyarrow.orc as paorc

    t = pa.table({"k": pa.array(range(30000)),
                  "s": pa.array([f"r{i}" for i in range(30000)])})
    p = str(tmp_path / "sorted.orc")
    paorc.write_table(t, p, compression="zstd")
    f = ORCFile(p)
    assert f.prune_row_groups(0, "k", 12000, 13000) == [1]
    assert f.prune_row_groups(0, "k", 5000, 25000) == [0, 1, 2]
    assert f.prune_row_groups(0, "k", 10**9, None) == []
    got = f.read_stripe_row_groups(0, f.prune_row_groups(0, "k", 12000, 13000))
    ks = pa.Table.from_batches([got]).column("k").to_pylist()
    assert min(ks) <= 12000 and max(ks) >= 13000


def test_own_writer_row_index_roundtrip(tmp_path):
    """Our writer's ROW_INDEX streams: per-group restarts give zero-skip
    positions; our positional reader (itself validated bit-identical
    against C++-written files above, so its position consumption
    matches the C++ readers') must decode every group exactly, and the
    C++ reader must still full-read the indexed file."""
    import datetime as dt
    import decimal as d

    n = 25000
    rng = np.random.default_rng(3)
    ints = rng.integers(-10**9, 10**9, n)
    t = pa.table({
        "i": pa.array(ints),
        "i_null": pa.array([None if i % 5 == 0 else int(v)
                            for i, v in enumerate(ints)], pa.int64()),
        "f": pa.array(rng.random(n)),
        "b": pa.array((ints % 2 == 0).tolist()),
        "s_dict": pa.array([f"k{i % 40}" for i in range(n)]),
        "s_direct": pa.array([f"u{i}-{'y' * (i % 9)}" for i in range(n)]),
        "bin": pa.array([bytes([i % 256])
                         for i in range(n)], pa.binary()),
        "ts": pa.array([dt.datetime(2021, 3, 1)
                        + dt.timedelta(seconds=int(v))
                        for v in rng.integers(0, 10**7, n)],
                       pa.timestamp("us")),
        "dte": pa.array([dt.date(2010, 1, 1) + dt.timedelta(days=int(v))
                         for v in rng.integers(0, 5000, n)]),
        "dec": pa.array([d.Decimal(int(v)).scaleb(-3)
                         for v in rng.integers(-10**8, 10**8, n)],
                        pa.decimal128(14, 3)),
    })
    for comp in ("ZSTD", "NONE", "ZLIB"):
        p = str(tmp_path / f"own_{comp}.orc")
        write_orc(t, p, compression=comp)
        f = ORCFile(p)
        stride = f.footer["rowIndexStride"]
        assert stride == 10000
        assert f.stripes[0]["indexLength"] > 0
        for sel in ([0], [2], [1, 2]):
            got = pa.Table.from_batches([f.read_stripe_row_groups(0, sel)])
            exp = pa.concat_tables([t.slice(g * stride, stride)
                                    for g in sel])
            for name in t.column_names:
                a = got.column(name).combine_chunks()
                b = exp.column(name).combine_chunks()
                if a.type != b.type:
                    b = b.cast(a.type)
                assert a.equals(b), (comp, sel, name)
    # C++ cross-read of the indexed file (positions skipped, layout valid)
    from pyarrow import orc as paorc

    cpp = paorc.ORCFile(str(tmp_path / "own_ZSTD.orc")).read()
    assert cpp.num_rows == n
    assert cpp.column("s_dict").to_pylist() == t.column("s_dict").to_pylist()


def test_own_writer_row_group_pruning_and_fallbacks(tmp_path):
    """prune_row_groups works on our files; nested schemas fall back to
    an unindexed file; stride must be byte-aligned."""
    t = pa.table({"k": pa.array(range(30000))})
    p = str(tmp_path / "s.orc")
    write_orc(t, p, compression="ZSTD")
    f = ORCFile(p)
    assert f.prune_row_groups(0, "k", 15000, 15500) == [1]
    got = f.read_stripe_row_groups(0, [1], columns=["k"])
    assert got.column(0).to_pylist() == list(range(10000, 20000))

    nested = pa.table({"l": pa.array([[1, 2], [3]] * 100)})
    p2 = str(tmp_path / "n.orc")
    write_orc(nested, p2, compression="ZSTD")
    f2 = ORCFile(p2)
    assert f2.footer.get("rowIndexStride", 0) == 0
    assert f2.stripes[0].get("indexLength", 0) == 0
    import pytest as _pt

    with _pt.raises(ValueError, match="row index"):
        f2.read_stripe_row_groups(0, [0])
    with _pt.raises(ValueError, match="multiple of 8"):
        write_orc(t, str(tmp_path / "bad.orc"), row_index_stride=1234)


def test_distributed_scan_row_group_pruning(spark, tmp_path):
    """read_orc_distributed with prune= now eliminates row groups
    inside surviving stripes; results equal the unpruned read."""
    from orc_haskell_spark.orcfile.spark_source import read_orc_distributed

    t = pa.table({"k": pa.array(range(40000)),
                  "v": pa.array([f"s{i}" for i in range(40000)])})
    d = tmp_path / "orcdir"
    d.mkdir()
    write_orc(t, str(d / "a.orc"), compression="ZSTD", stripe_rows=65536)
    df = read_orc_distributed(spark, str(d), prune=("k", 21000, 22000))
    rows = df.collect()
    ks = sorted(r.k for r in rows)
    assert len(rows) == 10000  # one group decoded, not 40k rows
    assert ks[0] <= 21000 and ks[-1] >= 22000
    # exact-result check after Spark-side refilter
    from pyspark.sql import functions as F

    n = df.filter(F.col("k").between(21000, 22000)).count()
    assert n == 1001
    # fully-pruned stripe yields nothing and no error
    assert read_orc_distributed(spark, str(d),
                                prune=("k", 10**9, None)).count() == 0


def test_row_group_seek_across_compression_chunks(tmp_path):
    """Positions with NON-ZERO chunk offsets: streams bigger than one
    256 KiB compression chunk make row-group boundaries land in later
    chunks; the positioned suffix decompression must start there. Both
    C++-written and our own indexed files."""
    rng = np.random.default_rng(9)
    n = 150_000
    t = pa.table({
        "s": pa.array([f"payload-{i}-" + "x" * int(rng.integers(20, 120))
                       for i in range(n)]),
        "i": pa.array(rng.integers(-10**15, 10**15, n)),
        "i_null": pa.array([None if i % 7 == 0 else int(v) for i, v in
                            enumerate(rng.integers(0, 10**9, n))],
                           pa.int64()),
    })
    import pyarrow.orc as paorc

    for name, write in (("cpp", lambda p: paorc.write_table(
                             t, p, compression="zstd",
                             stripe_size=512 * 1024 * 1024)),
                        ("ours", lambda p: write_orc(
                             t, p, compression="ZSTD",
                             stripe_rows=1 << 20))):
        p = str(tmp_path / f"{name}.orc")
        write(p)
        f = ORCFile(p)
        stride = f.footer["rowIndexStride"]
        ri = f.read_row_index(0)
        data_col = f.footer["types"][0]["subtypes"][0]
        first_pos = [e["positions"][0] for e in ri[data_col]
                     if e.get("positions")]
        assert max(first_pos) > 0, name  # boundaries beyond chunk 0
        for g in (0, 7, n // stride - 1):
            got = pa.Table.from_batches([f.read_stripe_row_groups(0, [g])])
            exp = t.slice(g * stride, min(stride, n - g * stride))
            for cname in t.column_names:
                a = got.column(cname).combine_chunks()
                b = exp.column(cname).combine_chunks()
                if a.type != b.type:
                    b = b.cast(a.type)
                assert a.equals(b), (name, g, cname)


def test_parquet_to_orc_fused_conversion(spark, tmp_path):
    """Fused parquet -> real ORC conversion: workers stream row groups
    through write_orc (zero payload JVM crossing); output is
    C++-readable, row-indexed, and equals the source exactly."""
    import pyarrow.parquet as pq2

    from orc_haskell_spark.orcfile.spark_source import (
        parquet_to_orc, read_orc_distributed)

    src = str(tmp_path / "pq")
    t = pq2.read_table("/root/testdata/sf0.001/lineitem.parquet")
    import os as _os
    _os.makedirs(src)
    pq2.write_table(t.slice(0, 3000), f"{src}/a.parquet",
                    row_group_size=1000)
    pq2.write_table(t.slice(3000), f"{src}/b.parquet",
                    row_group_size=1000)
    out = str(tmp_path / "orc")
    summary = parquet_to_orc(spark, src, out, num_partitions=3).collect()
    assert sum(r.rows for r in summary) == t.num_rows
    assert all(r.file.endswith(".orc") for r in summary)

    # C++ reads the converted files bit-identical to the source
    import pyarrow.orc as paorc

    got = pa.concat_tables(
        [paorc.ORCFile(r.file).read() for r in summary])
    assert got.num_rows == t.num_rows
    # (l_orderkey, l_linenumber) is NOT unique in the synthetic table:
    # sort on enough columns to make the row order deterministic
    keys = [(c, "ascending") for c in
            ("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
             "l_extendedprice", "l_quantity")]
    a = got.sort_by(keys)
    b = t.sort_by(keys)
    for name in t.column_names:
        x = a.column(name).combine_chunks()
        y = b.column(name).combine_chunks()
        if x.type != y.type:
            y = y.cast(x.type)
        assert x.equals(y), name
    # files carry row indexes
    f0 = ORCFile(summary[0].file)
    assert f0.footer.get("rowIndexStride") == 10000

    # and our distributed reader round-trips them through Spark
    df = read_orc_distributed(spark, out)
    assert df.count() == t.num_rows


def test_parquet_to_orc_preserves_nanoseconds_and_guards_plan(
        spark, tmp_path):
    """The converter must NOT truncate sub-microsecond timestamps (ORC
    stores real nanoseconds; only Spark's Arrow bridge is us-only), and
    a re-run with a different plan must refuse instead of duplicating
    part files."""
    import pyarrow.parquet as pq2

    from orc_haskell_spark.orcfile.spark_source import parquet_to_orc

    t = pa.table({"ts": pa.array([1_000_000_123, 99_000_000_456_789],
                                 pa.timestamp("ns")),
                  "k": pa.array([1, 2])})
    src = str(tmp_path / "ns.parquet")
    pq2.write_table(t, src)
    out = str(tmp_path / "orc")
    parquet_to_orc(spark, src, out, num_partitions=1).collect()
    import glob

    f = ORCFile(glob.glob(f"{out}/part-*.orc")[0])
    got = f.read().column("ts").cast(pa.int64()).to_pylist()
    assert got == [1_000_000_123, 99_000_000_456_789]  # ns intact

    with pytest.raises(ValueError, match="different plan"):
        parquet_to_orc(spark, src, out, num_partitions=2)
    # identical plan re-runs fine (idempotent part names)
    parquet_to_orc(spark, src, out, num_partitions=1).collect()
    assert len(glob.glob(f"{out}/part-*.orc")) == 1

    # corrupt marker: clear recovery error, not a JSON parse crash
    with open(f"{out}/_export_plan.json", "w") as fh:
        fh.write("{truncated")
    with pytest.raises(ValueError, match="unreadable export-plan"):
        parquet_to_orc(spark, src, out, num_partitions=1)


def test_row_group_reads_property(tmp_path):
    """Property: for random primitive tables (random null densities,
    value regimes, string lengths) written by the C++ ORC writer, every
    random row-group selection decodes exactly the matching slices."""
    import datetime as dt

    import pyarrow.orc as paorc
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    tmpdir = str(tmp_path)
    counter = [0]

    @settings(max_examples=6, deadline=None,
              suppress_health_check=list(HealthCheck))
    @given(st.data())
    def run(data):
        rng = np.random.default_rng(data.draw(st.integers(0, 2**31)))
        n = data.draw(st.integers(10_001, 16_000))  # >= 2 row groups
        null_p = data.draw(st.sampled_from([0.0, 0.02, 0.4]))

        card = data.draw(st.sampled_from([5, 5000]))

        def nullify(values):
            if null_p == 0.0:
                return values
            mask = rng.random(n) < null_p
            return [None if m else v for v, m in zip(values, mask)]

        cols = {
            "i": pa.array(nullify(rng.integers(-10**12, 10**12, n).tolist()),
                          pa.int64()),
            "f": pa.array(nullify(rng.random(n).tolist()), pa.float64()),
            "b": pa.array(nullify((rng.random(n) > 0.5).tolist()),
                          pa.bool_()),
            "s": pa.array(nullify(
                [f"v{int(v) % card}"
                 for v in rng.integers(0, 10**6, n)]), pa.string()),
            "ts": pa.array(nullify(
                [dt.datetime(2000, 1, 1) + dt.timedelta(seconds=int(v))
                 for v in rng.integers(0, 10**9, n)]), pa.timestamp("us")),
        }
        t = pa.table(cols)
        counter[0] += 1
        p = f"{tmpdir}/prop{counter[0]}.orc"
        paorc.write_table(t, p, compression="zstd",
                          stripe_size=512 * 1024 * 1024)
        f = ORCFile(p)
        stride = f.footer["rowIndexStride"]
        n_groups = -(-n // stride)
        k = data.draw(st.integers(1, n_groups))
        sel = sorted(rng.choice(n_groups, size=k, replace=False).tolist())
        got = pa.Table.from_batches([f.read_stripe_row_groups(0, sel)])
        exp = pa.concat_tables(
            [t.slice(g * stride, stride) for g in sel])
        for name in t.column_names:
            a = got.column(name).combine_chunks()
            b = exp.column(name).combine_chunks()
            if a.type != b.type:
                b = b.cast(a.type)
            assert a.equals(b), (name, sel, null_p)

    run()


def test_bloom_filters_cross_validated_with_cpp(tmp_path):
    """BLOOM_FILTER_UTF8 hashing calibrated bit-exact against the C++
    writer: every present int/string/double value tests positive (zero
    false negatives — the property a single hash mistake destroys) and
    absent values are mostly negative at the configured fpp."""
    import pyarrow.orc as paorc
    import pyarrow.parquet as pq2

    t = pq2.read_table("/root/testdata/sf0.01/lineitem.parquet")
    names = t.column_names
    p = str(tmp_path / "bl.orc")
    paorc.write_table(
        t, p, compression="zstd", bloom_filter_fpp=0.05,
        bloom_filter_columns=[names.index("l_orderkey") + 1,
                              names.index("l_returnflag") + 1,
                              names.index("l_extendedprice") + 1])
    f = ORCFile(p)
    stride = f.footer["rowIndexStride"]
    for col, conv in (("l_orderkey", int), ("l_returnflag", str),
                      ("l_extendedprice", float)):
        blooms = f.read_bloom_index(0, col)
        assert blooms and all(b is not None for b in blooms)
        vals = t.column(col).to_pylist()
        fn = sum(0 if blooms[g].might_contain(conv(v)) else 1
                 for g in range(len(blooms))
                 for v in set(vals[g * stride:(g + 1) * stride]))
        assert fn == 0, col
    rng = np.random.default_rng(1)
    bl = f.read_bloom_index(0, "l_orderkey")[0]
    fp = sum(1 for v in rng.integers(10**9, 10**10, 400)
             if bl.might_contain(int(v)))
    assert fp < 40  # ~2-6% observed at fpp=0.05
    # no bloom stream -> empty list, eq-pruning falls back to stats
    assert f.read_bloom_index(0, "l_partkey") == []
    assert f.prune_row_groups_eq(0, "l_partkey", 1) \
        == f.prune_row_groups(0, "l_partkey", 1, 1)


def test_own_writer_bloom_filters(tmp_path):
    """Our writer's blooms: zero false negatives via our reader, absent
    values mostly negative, equality pruning narrows to the right
    groups, and the C++ reader still full-reads the file."""
    import datetime as dt

    import pyarrow.orc as paorc

    n = 30000
    rng = np.random.default_rng(4)
    t = pa.table({
        "k": pa.array(range(n)),
        "s": pa.array([f"user-{i % 7000}" for i in range(n)]),
        "f": pa.array(rng.random(n)),
        "ts": pa.array([dt.datetime(2022, 1, 1)
                        + dt.timedelta(seconds=i) for i in range(n)],
                       pa.timestamp("us")),
    })
    p = str(tmp_path / "own_bloom.orc")
    write_orc(t, p, compression="ZSTD",
              bloom_filter_columns=["k", "s", "f", "ts"])
    f = ORCFile(p)
    stride = f.footer["rowIndexStride"]
    for col, conv in (("k", int), ("s", str), ("f", float)):
        blooms = f.read_bloom_index(0, col)
        vals = t.column(col).to_pylist()
        fn = sum(0 if blooms[g].might_contain(conv(v)) else 1
                 for g in range(len(blooms))
                 for v in set(vals[g * stride:(g + 1) * stride]))
        assert fn == 0, col
    # equality pruning: k is sorted -> exactly one group survives
    assert f.prune_row_groups_eq(0, "k", 15000) == [1]
    # value in no group: bloom kills groups stats alone would keep
    assert f.prune_row_groups_eq(0, "s", "user-99999") == []
    bl = f.read_bloom_index(0, "k")[0]
    fp = sum(1 for v in rng.integers(10**8, 10**9, 400)
             if bl.might_contain(int(v)))
    assert fp < 40
    # C++ still reads the file whole
    cpp = paorc.ORCFile(p).read()
    assert cpp.num_rows == n
    assert cpp.column("k").to_pylist() == list(range(n))


def test_bloom_edge_cases_negative_zero_ns_and_domains(tmp_path):
    """Review-found edge cases: -0.0 probes match rows written as -0.0
    (Spark equality semantics); bloom-enabled writes of true-ns
    timestamps don't crash; cross-domain probes (int literal on DOUBLE
    column and vice versa) coerce into the column's hash domain."""
    t = pa.table({"f": pa.array([-0.0, 1.5] * 6000),
                  "i": pa.array([3, 7] * 6000)})
    p = str(tmp_path / "edge.orc")
    write_orc(t, p, bloom_filter_columns=["f", "i"])
    f = ORCFile(p)
    assert f.prune_row_groups_eq(0, "f", 0.0) == \
        f.prune_row_groups(0, "f", 0.0, 0.0)
    assert f.prune_row_groups_eq(0, "f", 3) == []      # absent, coerced
    assert f.prune_row_groups_eq(0, "i", 3.0) == \
        f.prune_row_groups(0, "i", 3, 3)               # float->int probe
    assert f.prune_row_groups_eq(0, "i", 3.5) == []    # non-integral

    t2 = pa.table({"ts": pa.array([1_000_000_001] * 12000,
                                  pa.timestamp("ns"))})
    write_orc(t2, str(tmp_path / "ns.orc"), bloom_filter_columns=["ts"])

    # vectorized insert must equal scalar insert bit-for-bit
    from orc_haskell_spark.orcfile import bloom as bm

    vals = np.random.default_rng(2).integers(-10**12, 10**12, 3000)
    b1 = bm.BloomFilterUtf8.build(3000)
    b2 = bm.BloomFilterUtf8.build(3000)
    for v in vals:
        b1.add_value(int(v))
    b2.add_hashes(bm.hash64_long_array(vals.astype(np.int64)))
    assert np.array_equal(b1.bitset, b2.bitset)


def test_index_region_corruption_never_silent(tmp_path):
    """Seeded bit flips inside the index region (ROW_INDEX + bloom
    streams): row-group reads and bloom probes must either raise or
    return the right row COUNT — never hang, never crash the process.
    (The stats inside entries may change -> pruning may keep more or
    fewer groups, which is fine; decoding a chosen group must not
    silently yield a wrong-shaped result.)"""
    t = pa.table({"k": pa.array(range(30000)),
                  "s": pa.array([f"x{i % 100}" for i in range(30000)])})
    p = str(tmp_path / "fz.orc")
    write_orc(t, p, compression="ZSTD", bloom_filter_columns=["s"])
    raw = bytearray(open(p, "rb").read())
    f0 = ORCFile(p)
    off = f0.stripes[0]["offset"]
    ilen = f0.stripes[0]["indexLength"]
    rng = np.random.default_rng(7)
    silent = 0
    for _ in range(40):
        b = bytearray(raw)
        i = off + int(rng.integers(0, ilen))
        b[i] ^= int(rng.integers(1, 256))
        try:
            f = ORCFile(bytes(b))
            got = f.read_stripe_row_groups(0, [1])
            if got.num_rows != 10000:
                silent += 1
            f.prune_row_groups_eq(0, "s", "x42")
        except Exception:
            pass  # loud failure is acceptable
    assert silent == 0


def test_vectorized_murmur_matches_scalar():
    """hash64_bytes_array is bit-identical to the scalar calibrated
    hash64 (the C++-validated string bloom domain) across lengths 0-64,
    8-multiples, and random bytes; float path matches hash64_double
    incl. -0.0 normalization."""
    import random

    from orc_haskell_spark.orcfile import bloom

    rng = random.Random(123)
    vals = [bytes(rng.randrange(256) for _ in range(n))
            for n in list(range(0, 40)) + [64, 127, 8, 16, 24]]
    vals += [bytes(rng.randrange(256) for _ in range(rng.randrange(80)))
             for _ in range(300)]
    vec = bloom.hash64_bytes_array(vals)
    assert [int(x) for x in vec] == [bloom.hash64(v) for v in vals]
    d = np.array([0.0, -0.0, 1.5, -2.25, 1e300, -1e-300], np.float64)
    dn = d.copy()
    dn[dn == 0.0] = 0.0
    got = bloom.hash64_long_array(dn.view(np.int64))
    assert [int(x) for x in got] == [bloom.hash64_double(float(v))
                                     for v in d]
