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
