"""Byte-stream-split for float columns (absent in the reference, which
stores floats raw-LE only — src/Orc/Serial/Binary/Striped.hs float path;
our raw mode is that exact layout).

BSS transposes the column's byte matrix: all 0th bytes of every value,
then all 1st bytes, ... (the Parquet BYTE_STREAM_SPLIT layout). It is
size-neutral alone but groups the nearly-constant sign/exponent bytes
into long runs, so the OUTER block codec (zstd/zlib) compresses it far
better on real-valued data like embeddings. The stripe encoder picks
raw vs bss by measuring both under the configured outer compression on
a sample (codecs/selector.py::choose_float_codec); decode reverses the
transpose exactly, so roundtrips stay bit-identical.
"""

from __future__ import annotations

import numpy as np


def bss_encode(vals: np.ndarray) -> bytes:
    """Transpose an f4/f8 (little-endian) value array into per-byte
    planes. Empty input encodes to b''."""
    if vals.size == 0:
        return b""
    raw = np.ascontiguousarray(vals).view(np.uint8)
    return raw.reshape(vals.size, vals.dtype.itemsize).T.tobytes()


def bss_decode(buf: bytes | np.ndarray, n: int, itemsize: int) -> np.ndarray:
    """Inverse transpose -> little-endian f4/f8 values."""
    dt = np.dtype("<f4") if itemsize == 4 else np.dtype("<f8")
    if n == 0:
        return np.empty(0, dt)
    planes = np.frombuffer(buf, np.uint8, count=n * itemsize)
    return np.ascontiguousarray(
        planes.reshape(itemsize, n).T).view(dt).reshape(n)
