"""Timestamp stream codec: ORC 2015 epoch rebase + nanosecond packing.

Reference semantics:
- epoch: seconds are stored relative to 2015-01-01T00:00:00Z
  (src/Orc/Data/Time.hs:84-86,128-130 — offset 16436 days = 1420070400 s).
- nanoseconds (SECONDARY stream) strip trailing decimal zeros and store
  the zero count in the low 3 bits
  (src/Orc/Serial/Binary/Internal/Integers.hs:452-487; goldens
  test/Test/Orc/Data/Time.hs:66-80: 1000 -> 0x0a, 100000 -> 0x0c).

Spark timestamps are int64 microseconds since the 1970 epoch; the split
here is lossless at µs precision (nanos are always a multiple of 1000).
"""

from __future__ import annotations

import numpy as np

ORC_EPOCH_SECONDS = 1420070400  # 2015-01-01 minus 1970-01-01, in seconds
_U3 = np.uint64(3)
_U7 = np.uint64(7)
_POW10 = np.array([10**k for k in range(10)], dtype=np.uint64)


def encode_nanos(nanos: np.ndarray) -> np.ndarray:
    """uint64 nanoseconds [0, 1e9) -> packed uint64 per reference rule."""
    n = np.ascontiguousarray(nanos, dtype=np.uint64)
    stripped = n.copy()
    zeros = np.zeros(n.shape, dtype=np.uint64)
    for _ in range(9):
        m = (stripped != 0) & (stripped % np.uint64(10) == 0)
        if not m.any():
            break
        stripped[m] //= np.uint64(10)
        zeros[m] += np.uint64(1)
    out = np.where(zeros > 1, (stripped << _U3) | (zeros - np.uint64(1)), n << _U3)
    out[n == 0] = 0
    return out


def decode_nanos(packed: np.ndarray) -> np.ndarray:
    """Inverse of encode_nanos."""
    p = np.ascontiguousarray(packed, dtype=np.uint64)
    zeros = p & _U7
    result = p >> _U3
    mul = _POW10[np.minimum(zeros + np.uint64(1), np.uint64(9)).astype(np.int64)]
    return np.where(zeros == 0, result, result * mul)


def split_micros(micros: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """int64 epoch-µs -> (int64 seconds since 2015 epoch, uint64 nanos)."""
    us = np.ascontiguousarray(micros, dtype=np.int64)
    secs = np.floor_divide(us, 1_000_000) - ORC_EPOCH_SECONDS
    nanos = (np.mod(us, 1_000_000).astype(np.uint64)) * np.uint64(1000)
    return secs, nanos


def join_micros(seconds: np.ndarray, nanos: np.ndarray) -> np.ndarray:
    """Inverse of split_micros (nanos truncated to µs, lossless for our data)."""
    secs = np.ascontiguousarray(seconds, dtype=np.int64) + ORC_EPOCH_SECONDS
    return secs * 1_000_000 + (np.ascontiguousarray(nanos, dtype=np.uint64)
                               // np.uint64(1000)).astype(np.int64)
