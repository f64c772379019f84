"""Microbenchmark for the round-5 codec additions: ALP, ALP-RD and
front-coded dictionaries, against raw/BSS/plain-dict baselines on the
same data. Single-threaded kernel numbers (GB/s of RAW bytes processed)
plus wire ratios under zstd-3 — the per-core inputs to the fused job's
throughput model. Appends one JSON line to BENCH/runs.jsonl with
kind=codec_micro.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from orc_haskell_spark.codecs import alp, block, floats, rle2  # noqa: E402
from orc_haskell_spark.codecs.strings import (  # noqa: E402
    front_code, front_decode, string_parts)
import pyarrow as pa  # noqa: E402


def best_of(fn, reps=5):
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best, out


def main() -> None:
    rng = np.random.default_rng(0)
    res: dict = {"kind": "codec_micro"}

    # --- ALP on decimal-like doubles (prices, 2 decimals)
    prices = np.round(rng.uniform(0, 100_000, 2_000_000), 2)
    t_enc, enc = best_of(lambda: alp.encode(prices))
    e, f, ints, pos, exc = enc
    data = rle2.encode(ints, True)
    t_dec, dec = best_of(lambda: alp.decode(
        ints, e, f, pos, exc.tobytes(), np.float64))
    assert np.array_equal(dec.view(np.uint64), prices.view(np.uint64))
    wire = len(block.compress(data, "zstd", 3))
    raw_wire = len(block.compress(prices.tobytes(), "zstd", 3))
    res["alp"] = {
        "enc_gbps": round(prices.nbytes / t_enc / 1e9, 3),
        "dec_gbps": round(prices.nbytes / t_dec / 1e9, 3),
        "ratio_pre_outer": round(prices.nbytes / len(data), 2),
        "vs_raw_zstd": round(wire / raw_wire, 3)}

    # --- ALP-RD on full-precision doubles
    norm = rng.normal(size=2_000_000)
    t_enc, enc = best_of(lambda: alp.rd_encode(norm))
    r, dl, codes, right, pos, excl = enc
    from orc_haskell_spark.codecs import bitpack
    packed_r = bitpack.pack_width(right, r)
    packed_c = bitpack.pack_width(codes, alp.RD_DICT_BITS)
    t_dec, dec = best_of(lambda: alp.rd_decode(
        codes, right, r, dl, pos, excl.tobytes(), np.float64))
    assert np.array_equal(dec.view(np.uint64), norm.view(np.uint64))
    wire = (len(block.compress(packed_r, "zstd", 3)) + len(packed_c))
    raw_wire = len(block.compress(norm.tobytes(), "zstd", 3))
    bss_wire = len(block.compress(floats.bss_encode(norm), "zstd", 3))
    res["alp_rd"] = {
        "enc_gbps": round(norm.nbytes / t_enc / 1e9, 3),
        "dec_gbps": round(norm.nbytes / t_dec / 1e9, 3),
        "ratio_pre_outer": round(
            norm.nbytes / (len(packed_r) + len(packed_c)), 2),
        "vs_raw_zstd": round(wire / raw_wire, 3),
        "vs_bss_zstd": round(wire / bss_wire, 3)}

    # --- front coding on a crawl-URL dictionary
    hosts = [f"www.host-{i:04d}.example.org" for i in range(300)]
    urls = sorted({
        f"https://{hosts[rng.integers(0, 300)]}/c/"
        f"{rng.integers(0, 10**6):06d}/page-{i}.html"
        for i in range(200_000)})
    arr = pa.array([u.encode() for u in urls], pa.binary())
    data_b, lens = string_parts(arr)
    t_enc, enc = best_of(lambda: front_code(lens, data_b))
    plens, sdata = enc
    t_dec, back = best_of(lambda: front_decode(plens, lens, sdata))
    assert np.array_equal(back, data_b)
    p_stream = rle2.encode(plens, False)
    wire = len(block.compress(sdata.tobytes(), "zstd", 3)) + len(p_stream)
    raw_wire = len(block.compress(data_b.tobytes(), "zstd", 3))
    res["front_code"] = {
        "entries": len(urls),
        "enc_gbps": round(data_b.nbytes / t_enc / 1e9, 3),
        "dec_gbps": round(data_b.nbytes / t_dec / 1e9, 3),
        "ratio_pre_outer": round(
            data_b.nbytes / (sdata.nbytes + len(p_stream)), 2),
        "vs_plain_zstd": round(wire / raw_wire, 3)}

    if os.environ.get("SCALE_NO_RECORD") != "1":
        with open(os.path.join(REPO, "BENCH", "runs.jsonl"), "a") as fh:
            fh.write(json.dumps(res) + "\n")
    print(json.dumps(res))


if __name__ == "__main__":
    main()
