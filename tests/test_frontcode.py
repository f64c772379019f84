"""Front-coded sorted dictionaries (codecs/strings.py front_code/
front_decode + stripe/selector wiring): vectorized prefix-share coding
of dictionary payloads, measured engagement, and the v4 format gate."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from orc_haskell_spark import stripe
from orc_haskell_spark.codecs.strings import (
    front_code,
    front_decode,
    string_parts,
)


def _roundtrip(entries: list[bytes]) -> None:
    arr = pa.array(entries, pa.binary())
    data, lens = string_parts(arr)
    plens, sdata = front_code(lens, data)
    assert np.array_equal(front_decode(plens, lens, sdata), data)


def _crawl_urls(n_distinct: int, n_rows: int, seed: int) -> list[str]:
    rng = np.random.default_rng(seed)
    hosts = [f"www.host-{i:04d}.example.org" for i in range(300)]
    cats = rng.choice(["news", "sports", "tech", "archive"], n_distinct)
    distinct = sorted({
        f"https://{hosts[rng.integers(0, 300)]}/{cats[i]}/"
        f"{rng.integers(0, 10**6):06d}/page-{i}.html"
        for i in range(n_distinct)})
    return [distinct[rng.integers(0, len(distinct))]
            for _ in range(n_rows)]


# ---------------------------------------------------------------- kernel


def test_url_dictionary_roundtrips_and_shrinks():
    urls = sorted({u.encode() for u in _crawl_urls(20_000, 20_000, 0)})
    arr = pa.array(urls, pa.binary())
    data, lens = string_parts(arr)
    plens, sdata = front_code(lens, data)
    assert sdata.size < 0.5 * data.size  # prefixes really were shared
    assert np.array_equal(front_decode(plens, lens, sdata), data)


def test_edge_cases():
    for case in ([], [b""], [b"", b""], [b"a"], [b"a", b"a", b"ab"],
                 [b"", b"a", b"aa", b"aab"],
                 [b"x" * 1000, b"x" * 1000 + b"y"],
                 [bytes([i]) for i in range(256)]):
        _roundtrip(sorted(case))


def test_prefix_cap_respected():
    # shared prefixes longer than FC_MAX_PREFIX are cut, not mis-coded
    longs = sorted(b"p" * 300 + bytes([i]) for i in range(64))
    arr = pa.array(longs, pa.binary())
    data, lens = string_parts(arr)
    plens, sdata = front_code(lens, data)
    assert plens.max() <= 255
    assert np.array_equal(front_decode(plens, lens, sdata), data)


@given(st.lists(st.binary(max_size=40), max_size=200))
@settings(max_examples=200, deadline=None)
def test_property_sorted_byte_strings_roundtrip(entries):
    _roundtrip(sorted(set(entries)))


# ---------------------------------------------------------------- stripe


def test_stripe_dict_fc_engages_on_crawl_urls_v4():
    urls = _crawl_urls(20_000, 60_000, 7)
    batch = pa.record_batch({"url": pa.array(urls)})
    footer, payload = stripe.encode_stripe(batch, stripe.DEFAULT_CONFIG)
    meta = footer["columns"][0]["meta"]
    assert meta["enc"] == "dict" and meta.get("fc") is True
    assert footer["v"] == stripe.ALP_FORMAT_VERSION
    got = stripe.decode_stripe(footer, payload)
    assert got.column("url").equals(batch.column("url"))
    # front coding must beat the plain dictionary ON THE WIRE
    plain_f, plain_p = stripe.encode_stripe(
        batch, dict(stripe.DEFAULT_CONFIG, string_codec="dict",
                    compression="none"))
    assert len(payload) < len(plain_p)


def test_stripe_fc_refused_when_zstd_already_wins():
    # template-y urls: the sorted dictionary zstd-compresses to almost
    # nothing, so front coding cannot pay for its prefix stream
    urls = [f"https://site-{i % 80}.example.com/sec/{i % 40}"
            for i in range(60_000)]
    batch = pa.record_batch({"url": pa.array(urls)})
    cfg = dict(stripe.DEFAULT_CONFIG, string_codec="dict")
    footer, payload = stripe.encode_stripe(batch, cfg)
    meta = footer["columns"][0]["meta"]
    assert meta["enc"] == "dict" and meta.get("fc") is None
    assert footer["v"] == stripe.STRIPE_FORMAT_VERSION  # stays v2
    got = stripe.decode_stripe(footer, payload)
    assert got.column("url").equals(batch.column("url"))


def test_stripe_fc_with_nulls():
    base = _crawl_urls(5_000, 20_000, 11)
    vals = [None if i % 13 == 0 else base[i] for i in range(len(base))]
    arr = pa.array(vals, pa.string())
    cfg = dict(stripe.DEFAULT_CONFIG, string_codec="dict")
    meta, streams = stripe.encode_column("u", arr, cfg)
    assert meta.get("fc") is True and meta["nullable"]
    dec = stripe.decode_column(meta, streams, pa.string())
    assert dec.to_pylist() == vals


# ------------------------------------------------------- C kernel parity


def _np_paths(monkeypatch):
    from orc_haskell_spark.codecs import native

    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", True)


def test_c_numpy_byte_identity_on_urls(monkeypatch):
    """frontcode_kernel.c must emit byte-identical (plens, suffixes) to
    the numpy reference, and each decoder must read the other's output."""
    from orc_haskell_spark.codecs import native

    if native.load() is None:
        import pytest

        pytest.skip("no C compiler available")
    urls = sorted({u.encode() for u in _crawl_urls(10_000, 10_000, 3)})
    arr = pa.array(urls, pa.binary())
    data, lens = string_parts(arr)
    plens_c, sdata_c = front_code(lens, data)
    dec_of_c = front_decode(plens_c, lens, sdata_c)
    _np_paths(monkeypatch)
    plens_np, sdata_np = front_code(lens, data)
    assert np.array_equal(plens_c, plens_np)
    assert np.array_equal(sdata_c, sdata_np)
    # numpy decoder over the C encoder's stream (and vice versa above)
    assert np.array_equal(front_decode(plens_c, lens, sdata_c), data)
    assert np.array_equal(dec_of_c, data)


@given(st.lists(st.binary(max_size=40), max_size=120))
@settings(max_examples=150, deadline=None)
def test_property_c_numpy_identity(entries):
    from orc_haskell_spark.codecs import native

    lib = native.load()
    if lib is None:
        return  # covered by the roundtrip property on the numpy path
    arr = pa.array(sorted(set(entries)), pa.binary())
    data, lens = string_parts(arr)
    plens_c, sdata_c = front_code(lens, data)
    # numpy reference without monkeypatch (hypothesis + monkeypatch
    # don't mix): call the module-level fallback by flipping the cache
    saved = (native._lib, native._tried)
    try:
        native._lib, native._tried = None, True
        plens_np, sdata_np = front_code(lens, data)
    finally:
        native._lib, native._tried = saved
    assert np.array_equal(plens_c, plens_np)
    assert np.array_equal(sdata_c, sdata_np)
    assert np.array_equal(front_decode(plens_c, lens, sdata_c), data)


def test_c_decoder_rejects_corrupt_stream():
    """Bounds-checked decode: plen exceeding either neighbour length or
    suffixes overrunning the buffer must raise, not read OOB."""
    from orc_haskell_spark.codecs import native

    if native.load() is None:
        import pytest

        pytest.skip("no C compiler available")
    import pytest

    lens = np.array([3, 3], np.int64)
    # plen[1]=5 > lens[0]: inconsistent chain
    with pytest.raises(ValueError):
        front_decode(np.array([0, 5], np.uint64), lens,
                     np.zeros(6, np.uint8))
    # suffix bytes overrun sdata
    with pytest.raises(ValueError):
        front_decode(np.array([0, 0], np.uint64), lens,
                     np.zeros(2, np.uint8))
