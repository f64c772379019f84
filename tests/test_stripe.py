"""Stripe layer: RecordBatch -> streams -> RecordBatch, bit-identical.

Mirrors the reference's logical roundtrip suite
(test/Test/Orc/Logical.hs:103-138: random tables incl. ~10% nulls,
roundtripped in memory and across compression kinds and stripe sizes).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from orc_haskell_spark import stripe

RNG = np.random.default_rng(42)


def roundtrip(batch: pa.RecordBatch, cfg=None) -> pa.RecordBatch:
    footer, payload = stripe.encode_stripe(batch, cfg)
    back = stripe.decode_stripe(footer, payload)
    assert back.schema.equals(batch.schema), f"{back.schema} != {batch.schema}"
    assert back.equals(batch)
    return back


def _with_nulls(values, frac=0.1):
    out = list(values)
    for i in RNG.choice(len(out), size=int(len(out) * frac), replace=False):
        out[i] = None
    return out


def _mixed_batch(n=1000, nulls=False):
    f = _with_nulls if nulls else (lambda x: list(x))
    cols = {
        "i8": pa.array(f(RNG.integers(-128, 128, n).tolist()), pa.int8()),
        "i32": pa.array(f(RNG.integers(-2**31, 2**31, n).tolist()), pa.int32()),
        "i64": pa.array(f(RNG.integers(-2**62, 2**62, n).tolist()), pa.int64()),
        "f32": pa.array(f(RNG.normal(size=n).astype(np.float32).tolist()), pa.float32()),
        "f64": pa.array(f(RNG.normal(size=n).tolist()), pa.float64()),
        "b": pa.array(f(RNG.integers(0, 2, n).astype(bool).tolist()), pa.bool_()),
        "s": pa.array(f([f"value-{i % 37}" for i in range(n)]), pa.string()),
        "bin": pa.array(
            f([bytes(RNG.integers(0, 256, i % 20, dtype=np.uint8)) for i in range(n)]),
            pa.binary()),
        "ts": pa.array(
            f((RNG.integers(0, 2**44, n)).tolist()), pa.timestamp("us", tz="UTC")),
        "d": pa.array(f(RNG.integers(-10000, 30000, n).tolist()), pa.date32()),
        "arr": pa.array(
            f([RNG.normal(size=i % 5).astype(np.float32).tolist() for i in range(n)]),
            pa.list_(pa.float32())),
    }
    return pa.RecordBatch.from_pydict(cols)


def test_mixed_types_roundtrip():
    roundtrip(_mixed_batch(1000, nulls=False))


def test_mixed_types_roundtrip_with_nulls():
    roundtrip(_mixed_batch(1000, nulls=True))


@pytest.mark.parametrize("n", [0, 1, 2, 512, 513])
def test_stripe_sizes(n):
    roundtrip(_mixed_batch(max(n, 0), nulls=n > 2))


@pytest.mark.parametrize("comp", ["none", "zlib", "zstd"])
def test_compression_kinds(comp):
    # reference roundtrips across all compression kinds (Logical.hs:118-138)
    roundtrip(_mixed_batch(500, nulls=True), {"compression": comp})


@pytest.mark.parametrize("int_codec", ["rle1", "rle2"])
def test_int_codecs(int_codec):
    roundtrip(_mixed_batch(500), {"int_codec": int_codec})


@pytest.mark.parametrize("string_codec", ["direct", "dict", "fsst", "auto"])
def test_string_codecs(string_codec):
    n = 2000
    batch = pa.RecordBatch.from_pydict({
        "low_card": pa.array([f"lang-{i % 10}" for i in range(n)]),
        "high_card": pa.array([f"https://example-{i}.com/path/{i*7}" for i in range(n)]),
        "texty": pa.array(["the quick brown fox " * (i % 9) for i in range(n)]),
    })
    roundtrip(batch, {"string_codec": string_codec})


def test_null_patterns():
    # FIXTURES.md F6: all-present, all-null, alternating, leading/trailing runs
    n = 257
    pats = {
        "all_present": [1] * n,
        "all_null": [None] * n,
        "alternating": [1 if i % 2 else None for i in range(n)],
        "leading": [None] * 50 + [1] * (n - 50),
        "trailing": [1] * (n - 50) + [None] * 50,
    }
    batch = pa.RecordBatch.from_pydict(
        {k: pa.array(v, pa.int64()) for k, v in pats.items()})
    roundtrip(batch)


def test_all_null_string():
    batch = pa.RecordBatch.from_pydict(
        {"s": pa.array([None] * 100, pa.string())})
    roundtrip(batch)


def test_empty_batch():
    batch = pa.RecordBatch.from_pydict({"x": pa.array([], pa.int64()),
                                        "s": pa.array([], pa.string())})
    roundtrip(batch)


def test_timestamp_extremes():
    vals = [0, -1, 1, -62135596800000000, 253402300799999999, 1420070400000000]
    batch = pa.RecordBatch.from_pydict(
        {"ts": pa.array(vals, pa.timestamp("us", tz="UTC"))})
    roundtrip(batch)


def test_map_column():
    batch = pa.RecordBatch.from_pydict({
        "m": pa.array([{"a": 1, "b": 2}, {}, None, {"c": 3}] * 50,
                      pa.map_(pa.string(), pa.int64())),
        "deep": pa.array([{"k": [1.5, 2.5]}, None] * 100,
                         pa.map_(pa.string(), pa.list_(pa.float64()))),
    })
    roundtrip(batch)


def test_struct_column():
    n = 300
    batch = pa.RecordBatch.from_pydict({
        "st": pa.array(
            [{"a": int(i), "b": f"s{i % 7}"} if i % 11 else None for i in range(n)],
            pa.struct([("a", pa.int64()), ("b", pa.string())])),
    })
    roundtrip(batch)


def test_real_tables_roundtrip():
    # every driver-provided table must roundtrip bit-identically
    for name in ["region", "nation", "customer", "supplier", "part", "orders",
                 "lineitem", "events", "documents", "embeddings"]:
        t = pq.read_table(f"/root/testdata/sf0.001/{name}.parquet")
        batch = t.combine_chunks().to_batches()[0] if t.num_rows else \
            pa.RecordBatch.from_pydict({c: t[c].combine_chunks() for c in t.column_names})
        footer, payload = stripe.encode_stripe(batch)
        back = stripe.decode_stripe(footer, payload)
        assert back.equals(batch), name


def test_compression_actually_compresses():
    t = pq.read_table("/root/testdata/sf0.01/documents.parquet")
    batch = t.combine_chunks().to_batches()[0]
    footer, payload = stripe.encode_stripe(batch)
    raw = sum(c["raw_bytes"] for c in footer["columns"])
    assert len(payload) < raw * 0.7, (len(payload), raw)


def test_union_dense_roundtrip():
    """UNION analog (reference src/Orc/Table/Striped.hs:33): tag byte
    stream + per-variant children."""
    import pyarrow as pa

    du = pa.UnionArray.from_dense(
        pa.array([0, 1, 0, 2, 1, 0], pa.int8()),
        pa.array([0, 0, 1, 0, 1, 2], pa.int32()),
        [pa.array([10, None, 30], pa.int64()), pa.array(["a", "b"]),
         pa.array([1.5])],
        ["i", "s", "f"], [0, 1, 2])
    meta, streams = stripe.encode_column("u", du, {}, {})
    back = stripe.decode_column(meta, streams, du.type)
    assert back.equals(du)


def test_union_sparse_roundtrip_values():
    import pyarrow as pa

    su = pa.UnionArray.from_sparse(
        pa.array([0, 1, 1, 0], pa.int8()),
        [pa.array([1, 0, 0, 4], pa.int64()),
         pa.array(["x", "y", "z", "w"])], ["i", "s"], [0, 1])
    meta, streams = stripe.encode_column("u", su, {}, {})
    back = stripe.decode_column(meta, streams, su.type)
    # sparse unions compare by logical value (unselected slots differ)
    assert back.to_pylist() == su.to_pylist()


def test_stripe_format_version_rejected():
    """A footer from a different format version must fail loudly, not
    mis-decode (resumable stripe dirs persist across engine versions)."""
    batch = pa.RecordBatch.from_pydict({"x": [1, 2, 3]})
    footer, payload = stripe.encode_stripe(batch)
    assert footer["v"] == stripe.STRIPE_FORMAT_VERSION
    # v3 (BSS) and v4 (ALP) are accepted; anything past them, and
    # legacy v1, reject
    footer["v"] = stripe.ALP_FORMAT_VERSION + 1
    with pytest.raises(ValueError, match="stripe format"):
        stripe.decode_stripe(footer, payload)
    footer["v"] = 1
    with pytest.raises(ValueError, match="stripe format"):
        stripe.decode_stripe(footer, payload)


def test_truncated_payload_raises():
    """Garbage/short payload bytes must raise, never silently decode
    (resume paths can hand a partially-written blob to the decoder)."""
    batch = pa.RecordBatch.from_pydict({"x": [1, 2, 3], "s": ["a", "b", "c"]})
    footer, payload = stripe.encode_stripe(batch)
    with pytest.raises(ValueError, match="truncated"):
        stripe.decode_stripe(footer, payload[:4])
