"""Hypothesis property tests for the codec kernels.

The reference's correctness story is hedgehog property tests (1000
cases per codec, test/Test/Orc/Streams/*.hs); these are the direct
analog, letting hypothesis shrink any failure to a minimal case.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from orc_haskell_spark.codecs import byte_rle, fsst, rle1, rle2, varint

I64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)
U64 = st.integers(min_value=0, max_value=2**64 - 1)


def u8(b: bytes) -> np.ndarray:
    return np.frombuffer(b, dtype=np.uint8)


@settings(max_examples=200, deadline=None)
@given(st.lists(U64, max_size=300))
def test_varint_roundtrip(xs):
    u = np.array(xs, dtype=np.uint64)
    payload, lens = varint.encode_unsigned(u)
    got, used = varint.decode_unsigned(u8(payload), 0, len(xs))
    assert used == len(payload) == int(lens.sum())
    assert got.tolist() == xs


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(0, 255), max_size=400))
def test_byte_rle_roundtrip(xs):
    a = np.array(xs, dtype=np.uint8)
    assert byte_rle.decode(u8(byte_rle.encode(a))).tolist() == xs


@settings(max_examples=150, deadline=None)
@given(st.lists(I64, max_size=300), st.booleans())
def test_rle1_roundtrip(xs, signed):
    v = np.array(xs, dtype=np.int64)
    if not signed:
        v = v.view(np.uint64)
    got = rle1.decode(u8(rle1.encode(v, signed)), signed)
    assert got.tolist() == v.tolist()


@settings(max_examples=150, deadline=None)
@given(st.lists(I64, max_size=600), st.booleans())
def test_rle2_roundtrip(xs, signed):
    v = np.array(xs, dtype=np.int64)
    if not signed:
        v = v.view(np.uint64)
    got = rle2.decode(u8(rle2.encode(v, signed)), signed)
    assert got.tolist() == v.tolist()


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=3000))
def test_fsst_roundtrip(raw):
    data = np.frombuffer(raw, dtype=np.uint8)
    table, payload = fsst.compress(data)
    back = fsst.decompress(u8(table), u8(payload))
    assert back.tobytes() == raw


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(0, 2**40), min_size=1, max_size=500),
       st.integers(0, 2**30))
def test_rle2_monotone_delta(deltas, start):
    # cumulative sums exercise the delta encoder specifically
    v = (start + np.cumsum(np.array(deltas, dtype=np.int64))).astype(np.int64)
    got = rle2.decode(u8(rle2.encode(v, True)), True)
    assert got.tolist() == v.tolist()


@given(st.binary(min_size=0, max_size=6000))
@settings(max_examples=120, deadline=None)
def test_fsst_native_numpy_equivalence(raw):
    """Property: for ANY byte string, the C and numpy FSST encoders both
    roundtrip through BOTH decoders (payloads may differ; expansion must
    not)."""
    from orc_haskell_spark.codecs import fsst, native

    if native.load() is None:
        return  # no compiler: numpy-only environment
    data = np.frombuffer(raw, np.uint8)
    table = fsst.train(data)
    pays = [fsst._compress_piece_np(data, table)]
    pays.append(fsst._compress_piece_c(data, table, native.load()))
    for pay in pays:
        buf = np.frombuffer(pay, np.uint8)
        assert np.array_equal(fsst._decompress_piece(buf, table), data)
        assert np.array_equal(fsst._decompress_piece_np(buf, table), data)
