"""Byte-stream-split float codec (codecs/floats.py + selector wiring):
bit-exact roundtrips, measured selection, stripe integration, and
backward compatibility with pre-BSS stripes."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from orc_haskell_spark import stripe
from orc_haskell_spark.codecs import floats, selector


@given(st.lists(st.floats(allow_nan=True, allow_infinity=True,
                          width=32), max_size=300),
       st.sampled_from(["<f4", "<f8"]))
@settings(max_examples=200, deadline=None)
def test_bss_roundtrip_bit_exact(xs, dt):
    vals = np.array(xs, dtype=dt)
    dec = floats.bss_decode(floats.bss_encode(vals), len(vals),
                            vals.dtype.itemsize)
    # compare bit patterns (NaN payloads included)
    assert np.array_equal(dec.view(np.uint8), vals.view(np.uint8))


def test_choose_raw_without_outer_compression():
    vals = np.random.default_rng(0).normal(size=50000).astype("<f4")
    # ALP-RD (left-dictionary bit split) shrinks full-precision floats
    # even without an outer codec, so it displaced raw here
    assert selector.choose_float_codec(vals, "none") == "alp_rd"
    assert selector.choose_float_codec(vals[:10], "zlib") == "raw"  # tiny


def test_choose_bss_when_it_wins():
    # normal-distributed f4 under zlib: BSS groups the skewed
    # sign/exponent bytes into compressible planes (measured ~7% win)
    vals = np.random.default_rng(1).normal(size=100000).astype("<f4")
    assert selector.choose_float_codec(vals, "zlib", 6) == "bss"


def test_stripe_roundtrip_records_codec_and_is_bit_exact():
    rng = np.random.default_rng(2)
    vals = rng.normal(size=60000).astype("<f4")
    arr = pa.array(vals, type=pa.float32())
    cfg = dict(stripe.DEFAULT_CONFIG, compression="zlib")
    meta, streams = stripe.encode_column("x", arr, cfg)
    assert meta["codec"] == "bss"
    dec = stripe.decode_column(meta, streams, pa.float32())
    assert np.array_equal(np.asarray(dec).view(np.uint8),
                          vals.view(np.uint8))
    # BSS stream must be smaller once the outer block layer compresses
    raw_meta, raw_streams = stripe.encode_column(
        "x", arr, dict(stripe.DEFAULT_CONFIG, compression="none",
                       float_codec="raw"))
    assert raw_meta["codec"] == "raw"
    import zlib
    assert len(zlib.compress(streams["DATA"], 6)) < \
        len(zlib.compress(raw_streams["DATA"], 6)) * 0.97


def test_pre_bss_stripes_still_decode():
    """Old stripes carry no 'codec' key in float meta — raw assumed."""
    vals = np.array([1.5, -2.25, float("inf")], dtype="<f8")
    arr = pa.array(vals, type=pa.float64())
    meta, streams = stripe.encode_column(
        "x", arr, dict(stripe.DEFAULT_CONFIG, compression="none"))
    meta.pop("codec")
    dec = stripe.decode_column(meta, streams, pa.float64())
    assert np.array_equal(np.asarray(dec), vals)


def test_bss_stripes_carry_format_v3():
    """Stripes containing BSS float payloads must be versioned so a
    pre-BSS reader (exact v2 check) rejects them loudly instead of
    frombuffer-ing transposed planes as raw floats."""
    rng = np.random.default_rng(3)
    fl = pa.record_batch({"x": pa.array(
        rng.normal(size=60000).astype("<f4"), type=pa.float32())})
    footer, payload = stripe.encode_stripe(
        fl, dict(stripe.DEFAULT_CONFIG, compression="zlib"))
    assert footer["v"] == stripe.BSS_FORMAT_VERSION
    got = stripe.decode_stripe(footer, payload)
    assert np.array_equal(np.asarray(got.column("x")).view(np.uint8),
                          np.asarray(fl.column("x")).view(np.uint8))
    # BSS-free stripes stay v2 (readable by pre-BSS readers)
    ints = pa.record_batch({"y": pa.array([1, 2, 3], pa.int64())})
    footer2, _ = stripe.encode_stripe(
        ints, dict(stripe.DEFAULT_CONFIG, compression="zlib"))
    assert footer2["v"] == stripe.STRIPE_FORMAT_VERSION
