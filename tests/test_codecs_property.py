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


@given(st.integers(1, 64), st.data())
@settings(max_examples=150, deadline=None)
def test_bitpack_native_numpy_byte_identical(width, data):
    """pack/unpack C kernels must be BYTE-IDENTICAL to the numpy
    formulation for every width 1..64 (unlike FSST, the packed layout is
    part of the ORC wire format)."""
    from orc_haskell_spark.codecs import bitpack, native

    if native.load() is None:
        return
    n = data.draw(st.integers(0, 200))
    hi = (1 << width) - 1 if width < 64 else (1 << 64) - 1
    vals = np.array(
        data.draw(st.lists(st.integers(0, hi), min_size=n, max_size=n)),
        dtype=np.uint64)
    pc = bitpack.pack_width(vals, width)
    pn = bitpack._pack_width_np(vals, width) if n else b""
    assert pc == pn
    if n:
        buf = np.frombuffer(pc, np.uint8)
        assert np.array_equal(bitpack.unpack_width(buf, n, width), vals)
        assert np.array_equal(bitpack._unpack_width_np(buf, n, width), vals)


@given(st.lists(st.integers(-2**63, 2**63 - 1), min_size=0, max_size=1400))
@settings(max_examples=150, deadline=None)
def test_rle2_c_decoder_matches_numpy(vals):
    """Property: the C RLEv2 decoder and the numpy decoder produce
    identical values on arbitrary encoder output (both signed and, when
    possible, unsigned)."""
    from orc_haskell_spark.codecs import native, rle2

    if native.load() is None:
        return
    v = np.array(vals, dtype=np.int64)
    enc = rle2.encode(v, True)
    buf = np.frombuffer(enc, np.uint8)
    assert np.array_equal(rle2.decode(buf, True), v)
    assert np.array_equal(rle2._decode_np(buf, True), v)
    if len(vals) and min(vals) >= 0:
        u = v.view(np.uint64)
        encu = rle2.encode(u, False)
        bufu = np.frombuffer(encu, np.uint8)
        assert np.array_equal(rle2.decode(bufu, False), u)
        assert np.array_equal(rle2._decode_np(bufu, False), u)


@given(st.lists(st.integers(-2**63, 2**63 - 1), min_size=0, max_size=1200))
@settings(max_examples=200, deadline=None)
def test_rle2_c_encoder_byte_identical(vals):
    """Property: the C RLEv2 encoder is a BYTE-IDENTICAL port of the
    numpy encoder (same exact-cost argmin, same tie order) — one wire
    format regardless of which path a worker takes."""
    from orc_haskell_spark.codecs import native, rle2

    if native.load() is None:
        return
    v = np.array(vals, dtype=np.int64)
    assert rle2.encode(v, True) == rle2._encode_np(v, True)
    if len(vals) and min(vals) >= 0:
        u = v.view(np.uint64)
        assert rle2.encode(u, False) == rle2._encode_np(u, False)


@given(st.lists(st.integers(-2**63, 2**63 - 1), min_size=0, max_size=800))
@settings(max_examples=150, deadline=None)
def test_rle1_c_decoder_matches_numpy(vals):
    """Property: the C RLEv1 decoder equals the numpy decoder on
    arbitrary encoder output."""
    from orc_haskell_spark.codecs import native, rle1

    if native.load() is None:
        return
    v = np.array(vals, dtype=np.int64)
    enc = rle1.encode(v, True)
    buf = np.frombuffer(enc, np.uint8)
    assert np.array_equal(rle1.decode(buf, True), v)
    assert np.array_equal(rle1._decode_np(buf, True), v)
