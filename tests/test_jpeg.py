"""Baseline JPEG codec: pixel-exact fixtures against independent
implementations, roundtrip tolerances, subsampling, restart markers,
and honest rejection of non-baseline modes (VERDICT r3 item 3)."""

from __future__ import annotations

import numpy as np
import pytest

from orc_haskell_spark.pipeline import jpeg, multimodal


def naive_idct_float(coeff: np.ndarray) -> np.ndarray:
    """Independent scalar IDCT straight from the T.81 formula (double
    loop, no shared code with the einsum path)."""
    out = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    s += cu * cv * coeff[u, v] * \
                        np.cos((2 * x + 1) * u * np.pi / 16) * \
                        np.cos((2 * y + 1) * v * np.pi / 16)
            out[x, y] = s / 4 + 128.0
    return out


def naive_idct_fixed(coeff: np.ndarray) -> np.ndarray:
    """Independent scalar FIXED-POINT IDCT: pure-Python int sums over
    a round(basis * 2^15) matrix built here from the T.81 cosines —
    the machine-independent reference the engine must match exactly."""
    import math

    def ci(u, x):
        a = math.sqrt(1 / 8) if u == 0 else math.sqrt(2 / 8)
        return int(round(a * math.cos((2 * x + 1) * u * math.pi / 16)
                         * 32768))

    out = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0
            for u in range(8):
                for v in range(8):
                    s += ci(u, x) * ci(v, y) * int(coeff[u, v])
            out[x, y] = s / float(1 << 30) + 128.0
    return out


def test_idct_matches_naive_formula():
    rng = np.random.default_rng(5)
    coeffs = rng.integers(-500, 500, (4, 8, 8)).astype(np.int64)
    fast = jpeg.idct_blocks(coeffs)
    for i in range(4):
        # bit-exact vs the independent fixed-point scalar reference
        assert np.array_equal(fast[i], naive_idct_fixed(coeffs[i]))
        # and within fixed-point tolerance of the true float formula
        ref = naive_idct_float(coeffs[i].astype(np.float64))
        assert np.allclose(fast[i], ref, atol=0.05)
    # rounded uint8 pixels IDENTICAL to the fixed-point reference
    a = np.rint(fast).clip(0, 255).astype(np.uint8)
    for i in range(4):
        b = np.rint(naive_idct_fixed(coeffs[i])) \
            .clip(0, 255).astype(np.uint8)
        assert np.array_equal(a[i], b)


def _minimal_gray_jpeg(dc_vals: list[int], w: int = 8, h: int = 8,
                       dri: int = 0) -> bytes:
    """Hand-crafted baseline JPEG, independent of the encoder: quant
    all-ones, custom 2-entry DC table {cat7: '00', cat0: '01'}, 1-entry
    AC table {EOB: '0'}, one DC-only block per MCU with category-7
    values. Expected pixels: each 8x8 block flat at rint(dc/8 + 128)."""
    out = bytearray(b"\xff\xd8")

    def seg(marker, body):
        out.extend(b"\xff" + bytes([marker]))
        out.extend((len(body) + 2).to_bytes(2, "big"))
        out.extend(body)

    seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    # DC: two codes of length 2 -> values [7, 0]; AC: one length-1 code
    dc_counts = [0, 2] + [0] * 14
    seg(0xC4, bytes([0x00]) + bytes(dc_counts) + bytes([7, 0]))
    ac_counts = [1] + [0] * 15
    seg(0xC4, bytes([0x10]) + bytes(ac_counts) + bytes([0x00]))
    if dri:
        seg(0xDD, dri.to_bytes(2, "big"))
    seg(0xC0, bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
        + bytes([1, 1, 0x11, 0]))
    seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))

    def block_bits(dc_diff):
        # '00' (cat 7) + 7 magnitude bits + '0' (EOB)
        assert 64 <= dc_diff <= 127  # category 7, positive
        return "00" + format(dc_diff, "07b") + "0"

    ent = bytearray()
    bits = ""
    prev = 0
    for i, dc in enumerate(dc_vals):
        if dri and i and i % dri == 0:
            bits += "1" * ((8 - len(bits) % 8) % 8)  # pad to byte
            for k in range(0, len(bits), 8):
                ent.append(int(bits[k:k + 8], 2))
            bits = ""
            ent += bytes([0xFF, 0xD0 + ((i // dri - 1) % 8)])
            prev = 0
        bits += block_bits(dc - prev)
        prev = dc
    bits += "1" * ((8 - len(bits) % 8) % 8)
    for k in range(0, len(bits), 8):
        b = int(bits[k:k + 8], 2)
        ent.append(b)
        if b == 0xFF:
            ent.append(0x00)
    out += ent
    out += b"\xff\xd9"
    return bytes(out)


def test_handcrafted_fixture_pixel_exact():
    """Decode a hand-built JPEG (not produced by our encoder): DC-only
    block with coefficient 80, quant 1 -> every pixel exactly
    rint(80/8 + 128) = 138."""
    img = jpeg.decode_jpeg(_minimal_gray_jpeg([80]))
    assert img.shape == (8, 8)
    assert np.all(img == 138)


def test_handcrafted_two_mcu_and_dc_prediction():
    """Two MCUs wide: second block's DC is coded as a DIFF from the
    first (80 then +80 -> 160): blocks flat at 138 and 148."""
    img = jpeg.decode_jpeg(_minimal_gray_jpeg([80, 160], w=16, h=8))
    assert img.shape == (8, 16)
    assert np.all(img[:, :8] == 138)
    assert np.all(img[:, 8:] == np.rint(160 / 8 + 128))


def test_handcrafted_restart_interval():
    """DRI=1 with an RST0 marker between MCUs: DC prediction resets, so
    both blocks carry absolute value 80 -> both flat 138."""
    img = jpeg.decode_jpeg(_minimal_gray_jpeg([80, 80], w=16, h=8, dri=1))
    assert img.shape == (8, 16)
    assert np.all(img == 138)


def test_roundtrip_gray_quality100_exact():
    """quality=100 scales the quant table to all-ones; grayscale
    roundtrip is then pixel-exact (only float rounding, < 0.5)."""
    yy, xx = np.mgrid[0:24, 0:33]
    img = ((xx * 3 + yy * 5) % 256).astype(np.uint8)
    dec = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=100))
    assert dec.shape == img.shape
    assert np.array_equal(dec, img)


def test_roundtrip_color_444_and_420():
    yy, xx = np.mgrid[0:21, 0:35]  # odd sizes: edge-padding paths
    img = np.stack([(xx * 7) % 256, (yy * 3) % 256, (xx + yy) % 256],
                   axis=-1).astype(np.uint8)
    d444 = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=100))
    assert d444.shape == img.shape
    # YCbCr transform round-trips within +-2 per channel at quality 100
    assert np.abs(d444.astype(int) - img.astype(int)).max() <= 2
    d420 = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=95,
                                             subsampling="420"))
    assert d420.shape == img.shape
    # chroma is subsampled: luma stays tight, mean error stays small
    lum = (0.299 * img[..., 0] + 0.587 * img[..., 1]
           + 0.114 * img[..., 2])
    lum2 = (0.299 * d420[..., 0] + 0.587 * d420[..., 1]
            + 0.114 * d420[..., 2])
    assert np.abs(lum - lum2).mean() < 4.0


def test_non_baseline_rejected():
    img = np.full((8, 8), 100, np.uint8)
    enc = bytearray(jpeg.encode_jpeg(img, quality=90))
    # locate the real SOF0 segment (marker + grayscale length 0x000b),
    # not a coincidental FF C0 inside a table body
    i = bytes(enc).find(b"\xff\xc0\x00\x0b")
    assert i > 0
    enc[i + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(NotImplementedError, match="SOF2"):
        jpeg.decode_jpeg(bytes(enc))
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(b"\x00\x01\x02")
    # truncated entropy stream must raise, not hang
    ok = jpeg.encode_jpeg(img, quality=90)
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(ok[:len(ok) - 12] + b"\xff\xd9")


def test_decode_image_dispatches_jpeg():
    yy, xx = np.mgrid[0:16, 0:16]
    px = np.stack([xx * 9 % 256, yy * 5 % 256, (xx + yy) % 256],
                  axis=-1).astype(np.uint8)
    payload = jpeg.encode_jpeg(px, quality=100)
    got = multimodal.decode_image(payload, {"codec": "jpeg"})
    assert got.shape == (16, 16, 3)
    assert np.abs(got.astype(int) - px.astype(int)).max() <= 2
    # grayscale payload comes back as (h, w, 3)
    g = multimodal.decode_image(
        jpeg.encode_jpeg(px[..., 0], quality=100), {"codec": "jpeg"})
    assert g.shape == (16, 16, 3)
    assert np.array_equal(g[..., 0], g[..., 1])


def test_synth_media_includes_real_jpeg():
    b = multimodal.synth_real_media_batch(0, 60)
    codecs = {m["codec"] for m in b.column("meta").to_pylist()}
    assert {"bmp", "png", "jpeg"} <= codecs
    for payload, meta in zip(b.column("payload").to_pylist(),
                             b.column("meta").to_pylist()):
        if meta["codec"] == "jpeg":
            img = multimodal.decode_image(payload, meta)
            assert img.shape == (meta["height"], meta["width"], 3)
