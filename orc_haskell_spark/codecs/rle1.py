"""ORC integer RLE version 1.

Reference semantics: src/Orc/Serial/Binary/Internal/Integers.hs:144-172
(getIntegerRLEv1) and the C encoder csrc/integers.c:81-219 — header byte
h ≥ 0: a run of (h+3) values starting at a varint with a fixed signed
byte delta ∈ [-128,127]; h < 0: (-h) varint literals. Run max 130,
literal max 128, minimum run 3 (three consecutive equal deltas in the C
encoder, csrc/integers.c:99-116).

Signed streams zigzag each varint (reference OrcNum class); the run's
delta byte is a plain signed byte applied in the *value* domain
(Storable.enumFromStepN, Integers.hs:158-159 == np.arange FOR form).
All arithmetic is modular uint64, matching two's-complement wraparound.

Encode is vectorized run detection (np.diff + segment boundaries), not a
port of the C greedy scan; literals are bulk-varint-encoded and split at
128-value boundaries via the per-value length array — no per-value Python.
"""

from __future__ import annotations

import numpy as np

from . import varint
from .zigzag import zigzag, unzigzag

MIN_RUN = 3
MAX_RUN = 130
MAX_LITERAL = 128

_U127 = np.uint64(127)
_UNEG128 = np.uint64(0xFFFFFFFFFFFFFF80)  # -128 mod 2^64


def decode(buf: np.ndarray, signed: bool,
           limit: int | None = None) -> np.ndarray:
    """Decode a full RLEv1 stream -> int64 (signed) or uint64 array.

    C kernel when available (rle1_kernel.c — the per-group Python loop
    below otherwise runs hive-0.11 file reads at ~1 MB/s); the numpy
    path is the fallback and semantics reference.
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
            n_out = lib.rle1_decode(
                native.ptr(cbuf, ctypes.c_uint8), cbuf.size,
                1 if signed else 0,
                native.ptr(out, ctypes.c_uint64), limit)
            if n_out < 0:
                raise ValueError(
                    f"corrupt RLE1 stream (code {n_out})")
            out = out[:n_out]
            return out.view(np.int64) if signed else out
        cap = int(min(max(1024, cbuf.size * 8), 1 << 22))
        hard_cap = cbuf.size * 44 + 1024  # run = 130 values / 3 bytes
        while True:
            out = np.empty(cap, dtype=np.uint64)
            n_out = lib.rle1_decode(
                native.ptr(cbuf, ctypes.c_uint8), cbuf.size,
                1 if signed else 0,
                native.ptr(out, ctypes.c_uint64), cap)
            if n_out < 0:
                raise ValueError("corrupt RLEv1 stream (truncated)")
            if n_out < cap:
                out = out[:n_out]
                return out.view(np.int64) if signed else out
            if cap >= hard_cap:
                raise ValueError("RLEv1 stream expands beyond format bound")
            cap = int(min(cap * 8, hard_cap))
    out = _decode_np(buf, signed)
    return out if limit is None else out[:limit]


def _decode_np(buf: np.ndarray, signed: bool) -> np.ndarray:
    pieces: list[np.ndarray] = []
    pos = 0
    size = buf.size
    arange_cache = np.arange(MAX_RUN, dtype=np.uint64)
    while pos < size:
        h = int(buf[pos])
        if h < 128:  # run of h+3 values, fixed signed-byte delta
            run = h + 3
            delta = int(np.int8(buf[pos + 1]))
            pos += 2
            vals, used = varint.decode_unsigned(buf, pos, 1)
            pos += used
            start = unzigzag(vals)[0].astype(np.uint64) if signed else vals[0]
            with np.errstate(over="ignore"):
                step = np.uint64(delta & 0xFFFFFFFFFFFFFFFF)
                seq = start + arange_cache[:run] * step
            pieces.append(seq)
        else:  # literal group of 256-h varints
            cnt = 256 - h
            pos += 1
            vals, used = varint.decode_unsigned(buf, pos, cnt)
            pos += used
            if signed:
                vals = unzigzag(vals).view(np.uint64)
            pieces.append(vals)
    out = np.concatenate(pieces) if pieces else np.zeros(0, dtype=np.uint64)
    return out.view(np.int64) if signed else out


def encode(values: np.ndarray, signed: bool) -> bytes:
    """Encode int64/uint64 values -> RLEv1 stream bytes."""
    if signed:
        v = np.ascontiguousarray(values, dtype=np.int64)
        u = zigzag(v)  # varint (wire) domain
        vu = v.view(np.uint64)  # value domain, modular
    else:
        u = np.ascontiguousarray(values, dtype=np.uint64)
        vu = u
    n = vu.size
    out = bytearray()
    if n == 0:
        return b""
    if n < MIN_RUN:
        _emit_literals(out, u, 0, n)
        return bytes(out)

    with np.errstate(over="ignore"):
        d = vu[1:] - vu[:-1]  # modular deltas
    small = (d <= _U127) | (d >= _UNEG128)
    # run can begin at value index i iff deltas i and i+1 are equal and small
    can_run = small[:-1] & (d[:-1] == d[1:])
    run_begin = np.flatnonzero(can_run)
    # maximal equal-delta segment end (exclusive, in delta index space)
    d_change = np.flatnonzero(d[1:] != d[:-1]) + 1  # segment starts (excl. 0)

    pos = 0
    while pos < n:
        k = int(np.searchsorted(run_begin, pos))
        rstart = int(run_begin[k]) if k < run_begin.size else n
        if rstart > pos:
            _emit_literals(out, u, pos, min(rstart, n))
            pos = rstart
            continue
        # equal-delta segment containing delta index pos ends at:
        j = int(np.searchsorted(d_change, pos, side="right"))
        seg_end = int(d_change[j]) if j < d_change.size else d.size
        run_values = seg_end - pos + 1  # deltas pos..seg_end-1 cover +1 values
        du = d[pos]
        dbyte = int(du) if du <= _U127 else int(du) - (1 << 64)
        while run_values >= MIN_RUN:
            chunk = min(run_values, MAX_RUN)
            if 0 < run_values - chunk < MIN_RUN:
                chunk = run_values - MIN_RUN
            out.append(chunk - 3)
            out.append(dbyte & 0xFF)
            payload, _ = varint.encode_unsigned(u[pos: pos + 1])
            out.extend(payload)
            pos += chunk
            run_values -= chunk
        if 0 < run_values < MIN_RUN:
            # tail too short for a run: it will join the following block;
            # emit as literals only if no further run begins here
            k2 = int(np.searchsorted(run_begin, pos))
            nxt = int(run_begin[k2]) if k2 < run_begin.size else n
            if nxt > pos:
                _emit_literals(out, u, pos, min(nxt, n))
                pos = nxt if nxt > pos else n
    return bytes(out)


def _emit_literals(out: bytearray, u: np.ndarray, start: int, end: int) -> None:
    payload, lens = varint.encode_unsigned(u[start:end])
    boundaries = np.cumsum(lens)
    pos = start
    byte_pos = 0
    while pos < end:
        chunk = min(end - pos, MAX_LITERAL)
        out.append((256 - chunk) & 0xFF)
        chunk_end = int(boundaries[pos - start + chunk - 1])
        out.extend(payload[byte_pos:chunk_end])
        byte_pos = chunk_end
        pos += chunk
