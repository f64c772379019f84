"""ORC byte-level run-length encoding.

Reference semantics: src/Orc/Serial/Binary/Internal/Bytes.hs:103-201 and
csrc/bytes.c:24-107 — header byte h ∈ [0,127] means a run of (h+3) copies
of the next byte; h ∈ [-128,-1] (two's complement) means (-h) literal
bytes follow. Run length max 130, literal group max 128, minimum run 3.

Encode is numpy run-detection (np.flatnonzero over value changes), not a
port of the C greedy scan — the emitted blocks decode identically and the
all-repeat golden (100×7 -> run headers) matches.
"""

from __future__ import annotations

import numpy as np

MIN_REPEAT = 3
MAX_REPEAT = 130  # header 127 + 3
MAX_LITERAL = 128


def decode(buf: np.ndarray, n_hint: int | None = None,
           limit: int | None = None) -> np.ndarray:
    """Decode a byte-RLE stream (uint8 array) -> uint8 values array.

    C kernel when available (byte_rle_kernel.c; the per-run Python
    loop below measures ~3 MB/s on realistic PRESENT streams), numpy
    fallback as the semantics reference. ``limit`` stops decoding after
    that many values (row-group reads never decode past their group)."""
    from . import native

    lib = native.load()
    if lib is not None and buf.size:
        import ctypes

        cbuf = np.ascontiguousarray(buf, dtype=np.uint8)
        if limit is None:
            n = lib.byte_rle_decode_size(
                native.ptr(cbuf, ctypes.c_uint8), cbuf.size)
            if n < 0:
                raise ValueError("byte-RLE literal group truncated")
        else:
            n = limit
        out = np.empty(n, dtype=np.uint8)
        got = lib.byte_rle_decode(native.ptr(cbuf, ctypes.c_uint8),
                                  cbuf.size,
                                  native.ptr(out, ctypes.c_uint8), n)
        if got < 0 or (limit is None and got != n):
            raise ValueError("byte-RLE stream corrupt")
        return out[:got]
    out = _decode_np(buf, n_hint)
    return out if limit is None else out[:limit]


def _decode_np(buf: np.ndarray, n_hint: int | None = None) -> np.ndarray:
    pieces: list[np.ndarray] = []
    pos = 0
    size = buf.size
    while pos < size:
        h = int(buf[pos])
        if h < 128:  # run
            run = h + 3
            pieces.append(np.full(run, buf[pos + 1], dtype=np.uint8))
            pos += 2
        else:  # literals, count = 256 - h
            cnt = 256 - h
            end = pos + 1 + cnt
            if end > size:
                raise ValueError("byte-RLE literal group truncated")
            pieces.append(buf[pos + 1: end])
            pos = end
    if not pieces:
        return np.zeros(0, dtype=np.uint8)
    return np.concatenate(pieces)


def encode(values: np.ndarray) -> bytes:
    """Encode uint8 values -> byte-RLE stream (C kernel when
    available, byte-identical to the numpy path below)."""
    a = np.ascontiguousarray(values, dtype=np.uint8)
    n = a.size
    if n == 0:
        return b""
    from . import native

    lib = native.load()
    if lib is not None:
        import ctypes

        out = np.empty(n + n // 128 + 4, dtype=np.uint8)
        w = lib.byte_rle_encode(native.ptr(a, ctypes.c_uint8), n,
                                native.ptr(out, ctypes.c_uint8))
        return out[:w].tobytes()
    return _encode_np(a)


def _encode_np(a: np.ndarray) -> bytes:
    n = a.size
    # maximal equal-value segments
    change = np.flatnonzero(a[1:] != a[:-1])
    seg_start = np.empty(change.size + 1, dtype=np.int64)
    seg_start[0] = 0
    seg_start[1:] = change + 1
    seg_end = np.empty_like(seg_start)
    seg_end[:-1] = seg_start[1:]
    seg_end[-1] = n
    seg_len = seg_end - seg_start
    is_run = seg_len >= MIN_REPEAT

    out = bytearray()
    run_idx = np.flatnonzero(is_run)
    lit_from = 0  # start of pending literal span (value index)
    for si in run_idx:
        rs, rl = int(seg_start[si]), int(seg_len[si])
        if rs > lit_from:
            _emit_literals(out, a, lit_from, rs)
        _emit_run(out, int(a[rs]), rl)
        lit_from = rs + rl
    if lit_from < n:
        _emit_literals(out, a, lit_from, n)
    return bytes(out)


def _emit_run(out: bytearray, value: int, length: int) -> None:
    while length >= MIN_REPEAT:
        chunk = min(length, MAX_REPEAT)
        # avoid leaving a sub-minimum tail
        if 0 < length - chunk < MIN_REPEAT:
            chunk = length - MIN_REPEAT
        out.append(chunk - 3)
        out.append(value)
        length -= chunk
    if length:  # tail < 3 -> literals
        out.append((256 - length) & 0xFF)
        out.extend(bytes([value]) * length)


def _emit_literals(out: bytearray, a: np.ndarray, start: int, end: int) -> None:
    pos = start
    while pos < end:
        chunk = min(end - pos, MAX_LITERAL)
        out.append((256 - chunk) & 0xFF)
        out.extend(a[pos: pos + chunk].tobytes())
        pos += chunk
