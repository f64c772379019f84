"""ORC integer RLE version 2: short-repeat / direct / patched-base / delta.

Decoder semantics follow the reference exactly
(src/Orc/Serial/Binary/Internal/Integers.hs:189-408 — getIntegerRLEv2,
getShortRepeat :237-249, getDirect :252-276, getPatchedBase :279-350,
getDelta :353-408; width table bitSizeLookup :434-444) and are validated
against the ORC-spec golden byte vectors copied from the reference's
tests (test/Test/Orc/Streams/Integer.hs:159-246).

The ENCODER does not exist in the reference (its writer emits RLEv1 only;
SURVEY.md §2.1 C9) — it is derived from the ORC v1 specification: per
window of ≤512 values, pick the cheapest of

- SHORT_REPEAT (3..10 equal values),
- DELTA (monotone; fixed-delta width-0 special case) — this is the
  frame-of-reference-on-deltas path that crawl timestamps hit,
- PATCHED_BASE (frame-of-reference + bit-packing; with an empty patch
  list this *is* plain FOR+bitpack, with patches it absorbs outliers),
- DIRECT (zigzag + bit-packing),

by exact byte-cost comparison (not heuristics — windows are small enough
that computing all four costs is a handful of numpy reductions).

Signedness: direct & short-repeat zigzag values; delta zigzags the base
varint (per-type) and always zigzags the initial delta (64-bit); the
remaining deltas are unsigned magnitudes with the initial delta's sign;
patched-base never zigzags — its base carries a sign-magnitude MSB.
"""

from __future__ import annotations

import numpy as np

from . import varint
from .bitpack import (
    closest_width,
    decode_width,
    pack_width,
    unpack_width,
    width_code,
)
from .zigzag import zigzag, unzigzag

MAX_WINDOW = 512

_U1 = np.uint64(1)


def bit_lengths(u: np.ndarray) -> np.ndarray:
    """Per-value bit length of uint64 values (0 for 0).

    Fast path: float64 exponent via frexp (exact for values < 2^53);
    values >= 2^53 (rare in real streams) get a branch-free shift loop.
    """
    big = u >= np.uint64(1 << 53)
    if big.any():
        bl = np.zeros(u.shape, dtype=np.int64)
        v = u.copy()
        for s in (32, 16, 8, 4, 2, 1):
            m = v >= (_U1 << np.uint64(s))
            bl += m * s
            v = v >> (m.astype(np.uint8) * np.uint8(s))
        bl += (v > 0).astype(np.int64)
        return bl
    return np.frexp(u.astype(np.float64))[1].astype(np.int64)


# ---------------------------------------------------------------- decode


def decode(buf: np.ndarray, signed: bool,
           limit: int | None = None) -> np.ndarray:
    """Decode a full RLEv2 stream -> int64 (signed) or uint64 array.

    Uses the C kernel (rle2_kernel.c) when available — the per-run
    Python dispatch otherwise dominates int-column decode; the numpy
    path below is the fallback and the semantics reference (both are
    exercised against the ORC-spec goldens and C++-written files).
    """
    from . import native

    lib = native.load()
    if lib is not None and buf.size:
        import ctypes

        cbuf = np.ascontiguousarray(buf, dtype=np.uint8)
        if limit is not None:
            # bounded decode: the kernel stops cleanly when out fills,
            # so a row-group read never decodes past its group
            out = np.empty(limit, dtype=np.uint64)
            n_out = lib.rle2_decode(
                native.ptr(cbuf, ctypes.c_uint8), cbuf.size,
                1 if signed else 0,
                native.ptr(out, ctypes.c_uint64), limit)
            if n_out < 0:
                raise ValueError(
                    f"corrupt RLE2 stream (code {n_out})")
            out = out[:n_out]
            return out.view(np.int64) if signed else out
        cap = int(min(max(1024, cbuf.size * 8), 1 << 22))
        hard_cap = cbuf.size * 130 + 1024
        while True:
            out = np.empty(cap, dtype=np.uint64)
            n_out = lib.rle2_decode(
                native.ptr(cbuf, ctypes.c_uint8), cbuf.size,
                1 if signed else 0,
                native.ptr(out, ctypes.c_uint64), cap)
            if n_out < 0:
                raise ValueError(f"corrupt RLEv2 stream (code {n_out})")
            if n_out < cap:
                out = out[:n_out]
                return out.view(np.int64) if signed else out
            if cap >= hard_cap:  # cannot happen for well-formed input
                raise ValueError("RLEv2 stream expands beyond format bound")
            cap = int(min(cap * 8, hard_cap))
    out = _decode_np(buf, signed)
    return out if limit is None else out[:limit]


def _decode_np(buf: np.ndarray, signed: bool) -> np.ndarray:
    pieces: list[np.ndarray] = []
    pos = 0
    size = buf.size
    while pos < size:
        mode = buf[pos] >> 6
        if mode == 0:
            piece, pos = _dec_short_repeat(buf, pos, signed)
        elif mode == 1:
            piece, pos = _dec_direct(buf, pos, signed)
        elif mode == 2:
            piece, pos = _dec_patched(buf, pos)
        else:
            piece, pos = _dec_delta(buf, pos, signed)
        pieces.append(piece)
    out = np.concatenate(pieces) if pieces else np.zeros(0, dtype=np.uint64)
    return out.view(np.int64) if signed else out


def _read_be(buf: np.ndarray, pos: int, nbytes: int) -> int:
    val = 0
    for i in range(nbytes):
        val = (val << 8) | int(buf[pos + i])
    return val


def _dec_short_repeat(buf, pos, signed):
    h = int(buf[pos])
    width = ((h >> 3) & 0x7) + 1
    repeats = (h & 0x7) + 3
    value = _read_be(buf, pos + 1, width)
    u = np.array([value], dtype=np.uint64)
    if signed:
        u = unzigzag(u).view(np.uint64)
    return np.full(repeats, u[0], dtype=np.uint64), pos + 1 + width


def _dec_direct(buf, pos, signed):
    header = _read_be(buf, pos, 2)
    width = decode_width((header >> 9) & 0x1F)
    repeats = (header & 0x1FF) + 1
    nbytes = (repeats * width + 7) // 8
    vals = unpack_width(buf[pos + 2: pos + 2 + nbytes], repeats, width)
    if signed:
        vals = unzigzag(vals).view(np.uint64)
    return vals, pos + 2 + nbytes


def _dec_patched(buf, pos):
    h = _read_be(buf, pos, 4)
    width = decode_width((h >> 25) & 0x1F)
    repeats = ((h >> 16) & 0x1FF) + 1
    base_width = ((h >> 13) & 0x7) + 1
    patch_width = decode_width((h >> 8) & 0x1F)
    pgw = ((h >> 5) & 0x7) + 1
    pll = h & 0x1F
    pos += 4
    raw_base = _read_be(buf, pos, base_width)
    sign_bit = 1 << (8 * base_width - 1)
    base = -(raw_base & ~sign_bit) if raw_base & sign_bit else raw_base
    pos += base_width
    data_bytes = (repeats * width + 7) // 8
    vals = unpack_width(buf[pos: pos + data_bytes], repeats, width)
    pos += data_bytes
    # entries are packed at closestFixedBits(pw + pgw), NOT the raw sum
    # (C++/Java writers' convention; found by cross-decoding with the
    # C++ implementation — both our encoder and mirror decoder had the
    # raw-sum bug and hid it from each other)
    entry_width = closest_width(patch_width + pgw)
    patch_bytes = (pll * entry_width + 7) // 8
    if pll:
        entries = unpack_width(buf[pos: pos + patch_bytes], pll, entry_width)
        gaps = entries >> np.uint64(patch_width)
        pvals = entries & ((_U1 << np.uint64(patch_width)) - _U1)
        idx = np.cumsum(gaps.astype(np.int64))
        vals[idx] |= pvals << np.uint64(width)
    pos += patch_bytes
    with np.errstate(over="ignore"):
        out = vals + np.uint64(base & 0xFFFFFFFFFFFFFFFF)
    return out, pos


def _dec_delta(buf, pos, signed):
    header = _read_be(buf, pos, 2)
    wcode = (header >> 9) & 0x1F
    width = 0 if wcode == 0 else decode_width(wcode)
    repeats = (header & 0x1FF) + 1  # total values incl. base
    delta_repeats = 0 if repeats == 1 else repeats - 2
    pos += 2
    bvals, used = varint.decode_unsigned(buf, pos, 1)
    pos += used
    base = unzigzag(bvals).view(np.uint64)[0] if signed else bvals[0]
    dvals, used = varint.decode_unsigned(buf, pos, 1)
    pos += used
    d0 = int(unzigzag(dvals)[0])
    mag0, sgn = abs(d0), (-1 if d0 < 0 else 1)
    nbytes = (delta_repeats * width + 7) // 8
    if repeats == 1:
        return np.array([base], dtype=np.uint64), pos
    if width == 0:
        mags = np.full(repeats - 1, np.uint64(mag0), dtype=np.uint64)
    else:
        deltas = unpack_width(buf[pos: pos + nbytes], delta_repeats, width)
        pos += nbytes
        mags = np.empty(repeats - 1, dtype=np.uint64)
        mags[0] = mag0
        mags[1:] = deltas
    with np.errstate(over="ignore"):
        steps = np.cumsum(mags)
        out = np.empty(repeats, dtype=np.uint64)
        out[0] = base
        if sgn >= 0:
            out[1:] = base + steps
        else:
            out[1:] = base - steps
    return out, pos


# ---------------------------------------------------------------- encode


def encode(values: np.ndarray, signed: bool) -> bytes:
    """Encode int64/uint64 values -> RLEv2 stream, per ≤512-value window.

    The C kernel (rle2_encode_kernel.c) is a BYTE-IDENTICAL port of the
    numpy window encoder below (same exact-cost argmin, same tie order),
    asserted by a hypothesis property test — so goldens, cross-engine
    suites and resumable stripe dirs see one format regardless of path.
    """
    if signed:
        v = np.ascontiguousarray(values, dtype=np.int64)
    else:
        v = np.ascontiguousarray(values, dtype=np.uint64)
    from . import native

    lib = native.load()
    if lib is not None and v.size:
        import ctypes

        n_windows = (v.size + MAX_WINDOW - 1) // MAX_WINDOW
        out = np.empty(n_windows * (16 + MAX_WINDOW * 8 + 64),
                       dtype=np.uint8)
        n = lib.rle2_encode(
            native.ptr(v.view(np.uint64), ctypes.c_uint64), v.size,
            1 if signed else 0, native.ptr(out, ctypes.c_uint8))
        return out[:n].tobytes()
    return _encode_np(v, signed)


def _encode_np(v: np.ndarray, signed: bool) -> bytes:
    out = bytearray()
    for start in range(0, v.size, MAX_WINDOW):
        _encode_window(out, v[start: start + MAX_WINDOW], signed)
    return bytes(out)


def _encode_window(out: bytearray, w: np.ndarray, signed: bool) -> None:
    n = w.size
    if n == 0:
        return
    wu = w.view(np.uint64)  # modular value domain
    zz = zigzag(w) if signed else wu  # wire domain for direct/short-repeat

    # --- candidate: short repeat / fixed delta for constant windows
    all_equal = bool((w == w[0]).all())
    if all_equal and 3 <= n <= 10:
        _emit_short_repeat(out, int(zz[0]), n)
        return
    if all_equal and n > 10:
        _emit_delta_fixed(out, w, signed)
        return

    costs: dict[str, int] = {}

    # --- candidate: direct
    direct_width = closest_width(int(bit_lengths(zz).max()))
    costs["direct"] = 2 + (n * direct_width + 7) // 8

    # --- candidate: delta (monotone windows only)
    delta_plan = _plan_delta(w, signed) if n >= 2 else None
    if delta_plan is not None:
        costs["delta"] = delta_plan["cost"]

    # --- candidate: patched base / FOR
    patch_plan = _plan_patched(w, wu, signed) if n >= 1 else None
    if patch_plan is not None:
        costs["patched"] = patch_plan["cost"]

    best = min(costs, key=costs.get)  # type: ignore[arg-type]
    if best == "delta":
        _emit_delta(out, delta_plan, n)
    elif best == "patched":
        _emit_patched(out, patch_plan, n)
    else:
        _emit_direct(out, zz, direct_width)


def _emit_short_repeat(out: bytearray, zz_value: int, n: int) -> None:
    width = max(1, (zz_value.bit_length() + 7) // 8)
    out.append((0 << 6) | ((width - 1) << 3) | (n - 3))
    out.extend(zz_value.to_bytes(width, "big"))


def _emit_direct(out: bytearray, zz: np.ndarray, width: int) -> None:
    n = zz.size
    header = (1 << 14) | (width_code(width) << 9) | (n - 1)
    out.extend(header.to_bytes(2, "big"))
    out.extend(pack_width(zz, width))


def _plan_delta(w: np.ndarray, signed: bool):
    """Monotone window -> delta plan dict, else None."""
    n = w.size
    if signed:
        # detect int64 overflow in diffs: sign of true diff vs wrapped diff
        with np.errstate(over="ignore"):
            d = w[1:] - w[:-1]
        inc = w[1:] >= w[:-1]
        if bool(((d >= 0) != inc).any()):
            return None  # diff overflowed int64
        di = d
    else:
        if bool((w[1:] >= w[:-1]).all()):
            with np.errstate(over="ignore"):
                di = (w[1:] - w[:-1]).view(np.int64)
            if bool((di < 0).any()):
                return None  # magnitude ≥ 2^63, unencodable
        elif bool((w[1:] <= w[:-1]).all()):
            with np.errstate(over="ignore"):
                dm = w[:-1] - w[1:]
                if bool((dm >> np.uint64(63)).any()):
                    return None  # magnitude ≥ 2^63, unencodable
                di = -(dm.view(np.int64))
        else:
            return None
    non_dec = bool((di >= 0).all())
    non_inc = bool((di <= 0).all())
    if not (non_dec or non_inc):
        return None
    d0 = int(di[0])
    if non_inc and d0 == 0 and bool((di != 0).any()):
        return None  # sign comes from first delta; 0 would decode as '+'
    fixed = bool((di == di[0]).all())
    mags = np.abs(di).view(np.uint64)
    base_u = zigzag(w[:1])[0] if signed else w.view(np.uint64)[0]
    base_payload, _ = varint.encode_unsigned(np.array([base_u], dtype=np.uint64))
    d0_payload, _ = varint.encode_unsigned(zigzag(np.array([d0], dtype=np.int64)))
    if fixed:
        width = 0
        packed = b""
    else:
        # width code 0 is reserved for fixed-delta in delta mode, so the
        # minimum packable width is 2 (as the ORC Java writer does)
        width = max(2, closest_width(int(bit_lengths(mags[1:]).max())))
        packed = pack_width(mags[1:], width)
    cost = 2 + len(base_payload) + len(d0_payload) + len(packed)
    return {
        "cost": cost,
        "width": width,
        "base_payload": base_payload,
        "d0_payload": d0_payload,
        "packed": packed,
    }


def _emit_delta(out: bytearray, plan: dict, n: int) -> None:
    wcode = 0 if plan["width"] == 0 else width_code(plan["width"])
    header = (3 << 14) | (wcode << 9) | (n - 1)
    out.extend(header.to_bytes(2, "big"))
    out.extend(plan["base_payload"])
    out.extend(plan["d0_payload"])
    out.extend(plan["packed"])


def _emit_delta_fixed(out: bytearray, w: np.ndarray, signed: bool) -> None:
    n = w.size
    base_u = zigzag(w[:1])[0] if signed else w.view(np.uint64)[0]
    base_payload, _ = varint.encode_unsigned(np.array([base_u], dtype=np.uint64))
    d0_payload, _ = varint.encode_unsigned(np.array([0], dtype=np.uint64))
    header = (3 << 14) | (0 << 9) | (n - 1)
    out.extend(header.to_bytes(2, "big"))
    out.extend(base_payload)
    out.extend(d0_payload)


def _plan_patched(w: np.ndarray, wu: np.ndarray, signed: bool):
    """Frame-of-reference plan: base = min, optionally with a patch list."""
    n = w.size
    base = int(w.min())
    mag = abs(base)
    if mag.bit_length() > 63:
        return None  # sign-magnitude base field holds ≤63 value bits
    base_width = max(1, (mag.bit_length() + 8) // 8)  # +1 sign bit
    with np.errstate(over="ignore"):
        reduced = wu - np.uint64(base & 0xFFFFFFFFFFFFFFFF)
    bl = bit_lengths(reduced)
    w100 = closest_width(int(bl.max()))
    # try widths from p90 up; compute exact patch cost; keep cheapest
    k = max(0, int(0.9 * (bl.size - 1)))
    p90 = int(np.partition(bl, k)[k]) if bl.size else 1
    w90 = closest_width(p90 or 1)
    best = None
    # ordered candidates (w90 first, ties keep the earlier) so the C
    # encoder can mirror the choice byte-for-byte
    for width in ([w90] + ([w100] if w100 != w90 else [])):
        plan = _plan_patched_at(reduced, bl, width, base, base_width, n)
        if plan is not None and (best is None or plan["cost"] < best["cost"]):
            best = plan
    return best


def _plan_patched_at(reduced, bl, width, base, base_width, n):
    over = np.flatnonzero(bl > width)
    if over.size > 31:
        return None
    if over.size == 0:
        # A zero-length patch list is rejected by the C++ reader
        # ("Corrupt PATCHED_BASE (pl==0)") — found by cross-decoding our
        # files with pyarrow. Emit one no-op patch (gap 0, value 0):
        # readers OR 0 into the high bits of element 0, a no-op.
        gaps = np.zeros(1, dtype=np.int64)
        pvals = np.zeros(1, dtype=np.uint64)
        entries = np.zeros(1, dtype=np.uint64)
        pw, pgw = 1, 1
    else:
        pvals = reduced[over] >> np.uint64(width)
        gaps = np.diff(np.concatenate(([0], over)))
        # spec: gaps > 255 need dummy entries (gap 255, patch 0)
        if gaps.size and int(gaps.max()) > 255:
            g2: list[int] = []
            p2: list[int] = []
            for g, p in zip(gaps.tolist(), pvals.tolist()):
                while g > 255:
                    g2.append(255)
                    p2.append(0)
                    g -= 255
                g2.append(g)
                p2.append(p)
            gaps = np.array(g2, dtype=np.int64)
            pvals = np.array(p2, dtype=np.uint64)
            if gaps.size > 31:
                return None
        pw = closest_width(int(bit_lengths(pvals).max()))
        pgw = max(1, int(gaps.max()).bit_length()) if gaps.size else 1
        if pw + pgw > 64:
            return None
        entries = (gaps.astype(np.uint64) << np.uint64(pw)) | pvals
    pll = int(entries.size)
    mask = np.uint64(0xFFFFFFFFFFFFFFFF) if width == 64 else (_U1 << np.uint64(width)) - _U1
    data = pack_width(reduced & mask, width)
    # spec/impl convention: entries packed at closestFixedBits(pw+pgw)
    patch_packed = pack_width(entries, closest_width(pw + pgw)) if pll else b""
    cost = 4 + base_width + len(data) + len(patch_packed)
    return {
        "cost": cost,
        "width": width,
        "base": base,
        "base_width": base_width,
        "data": data,
        "patch_packed": patch_packed,
        "pw": pw,
        "pgw": pgw,
        "pll": pll,
    }


def _emit_patched(out: bytearray, plan: dict, n: int) -> None:
    h = (
        (2 << 30)
        | (width_code(plan["width"]) << 25)
        | ((n - 1) << 16)
        | ((plan["base_width"] - 1) << 13)
        | (width_code(plan["pw"]) << 8)
        | ((plan["pgw"] - 1) << 5)
        | plan["pll"]
    )
    out.extend(h.to_bytes(4, "big"))
    base = plan["base"]
    raw = abs(base) | ((1 << (8 * plan["base_width"] - 1)) if base < 0 else 0)
    out.extend(raw.to_bytes(plan["base_width"], "big"))
    out.extend(plan["data"])
    out.extend(plan["patch_packed"])
