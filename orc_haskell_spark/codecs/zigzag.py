"""ZigZag fold between signed and unsigned integers, vectorized.

Reference semantics: src/Orc/Serial/Binary/Internal/OrcNum.hs:123-180
(class OrcNum; signed types zigzag, unsigned types are identity) and the
C twin csrc/integers.c:11-14,38-41.

All kernels work on the widest lane (int64/uint64); narrower ORC types
(byte/short/int) are widened by the caller before encoding — the wire
format is width-agnostic (varints / bit-packing carry only value bits).
"""

from __future__ import annotations

import numpy as np

_ONE = np.uint64(1)
_S63 = np.int64(63)


def zigzag(values: np.ndarray) -> np.ndarray:
    """int64 -> uint64: (v << 1) ^ (v >> 63) with arithmetic shift."""
    v = np.asarray(values)
    if v.dtype != np.int64:
        v = v.astype(np.int64)
    with np.errstate(over="ignore"):
        return ((v << np.int64(1)) ^ (v >> _S63)).view(np.uint64)


def unzigzag(values: np.ndarray) -> np.ndarray:
    """uint64 -> int64: (u >> 1) ^ -(u & 1)."""
    u = np.asarray(values)
    if u.dtype != np.uint64:
        u = u.astype(np.uint64)
    with np.errstate(over="ignore"):
        neg = np.negative(u & _ONE)  # wraps: 0 -> 0, 1 -> 0xFFFF...F
        return ((u >> _ONE) ^ neg).view(np.int64)
