"""Bit-level packing kernels: MSB-first boolean bitmaps and fixed-width
big-endian bit-packing (the RLEv2 "readLongs" kernel).

Reference semantics:
- boolean bit-pack: src/Orc/Serial/Binary/Internal/Bytes.hs:205-246
  (decodeBits / putBits) — MSB-first within each byte, trailing bits zero.
- fixed-width unpack: csrc/bytes.c:110-138 (readLongs) — values of
  ``width`` bits, big-endian bit order, packed contiguously, padded to a
  byte boundary at the end of the run.

numpy's packbits/unpackbits are MSB-first, which matches ORC exactly; the
fixed-width kernels route every value through a 64-bit big-endian lane so
any width 1..64 works (the FastLanes-style transposed layout is not needed
at stripe granularity — np.packbits is already a compiled kernel).
"""

from __future__ import annotations

import numpy as np

# ORC RLEv2 width table: 5-bit codes -> bit widths
# (reference bitSizeLookup, src/Orc/Serial/Binary/Internal/Integers.hs:434-444)
WIDTH_TABLE = np.array(
    [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19,
     20, 21, 22, 23, 24, 26, 28, 30, 32, 40, 48, 56, 64],
    dtype=np.int64,
)
_CODE_OF_WIDTH = {int(w): i for i, w in enumerate(WIDTH_TABLE)}


def closest_width(bits: int) -> int:
    """Smallest table width >= bits (bits 0 -> 1; direct mode has no 0)."""
    bits = max(1, int(bits))
    idx = int(np.searchsorted(WIDTH_TABLE, bits))
    return int(WIDTH_TABLE[idx])


def width_code(width: int) -> int:
    return _CODE_OF_WIDTH[int(width)]


def decode_width(code: int) -> int:
    return int(WIDTH_TABLE[code])


def pack_bools(mask: np.ndarray) -> bytes:
    """bool array -> MSB-first bitmap bytes (trailing bits 0)."""
    return np.packbits(np.ascontiguousarray(mask, dtype=bool)).tobytes()


def unpack_bools(buf: np.ndarray, n: int) -> np.ndarray:
    """MSB-first bitmap bytes -> bool array of length n."""
    if n == 0:
        return np.zeros(0, dtype=bool)
    bits = np.unpackbits(buf[: (n + 7) // 8], count=n)
    return bits.view(bool)


def pack_width(u: np.ndarray, width: int) -> bytes:
    """Pack uint64 values into ``width``-bit big-endian slots.

    C kernel when available (bitpack_kernel.c, byte-identical layout),
    numpy unpackbits/packbits otherwise.
    """
    u = np.ascontiguousarray(u, dtype=np.uint64)
    n = u.size
    if n == 0 or width == 0:
        return b""
    import ctypes

    from . import native

    lib = native.load()
    if lib is not None:
        out = np.empty((n * width + 7) // 8, dtype=np.uint8)
        lib.orc_pack_width(native.ptr(u, ctypes.c_uint64), n, width,
                           native.ptr(out, ctypes.c_uint8))
        return out.tobytes()
    return _pack_width_np(u, width)


def _pack_width_np(u: np.ndarray, width: int) -> bytes:
    if width == 64:
        return np.ascontiguousarray(u, dtype=np.uint64).byteswap().tobytes()
    n = u.size
    be = u.byteswap().view(np.uint8).reshape(n, 8)
    bits = np.unpackbits(be, axis=1)[:, 64 - width:]
    return np.packbits(bits.ravel()).tobytes()


def unpack_width(buf: np.ndarray, n: int, width: int) -> np.ndarray:
    """Unpack ``n`` ``width``-bit big-endian values -> uint64 array."""
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    if width == 0:
        return np.zeros(n, dtype=np.uint64)
    need = (n * width + 7) // 8
    if buf.size < need:
        raise ValueError(f"bit-packed stream truncated: need {need} bytes, have {buf.size}")
    import ctypes

    from . import native

    lib = native.load()
    if lib is not None:
        buf = np.ascontiguousarray(buf[:need])
        out = np.empty(n, dtype=np.uint64)
        lib.orc_unpack_width(native.ptr(buf, ctypes.c_uint8), n, width,
                             native.ptr(out, ctypes.c_uint64))
        return out
    return _unpack_width_np(buf, n, width)


def _unpack_width_np(buf: np.ndarray, n: int, width: int) -> np.ndarray:
    if width == 64:
        return (
            np.frombuffer(buf[: n * 8].tobytes(), dtype=">u8")
            .astype(np.uint64)
        )
    bits = np.unpackbits(buf[: (n * width + 7) // 8], count=n * width).reshape(n, width)
    full = np.zeros((n, 64), dtype=np.uint8)
    full[:, 64 - width:] = bits
    packed = np.packbits(full, axis=1)
    return np.frombuffer(np.ascontiguousarray(packed).tobytes(), dtype=">u8").astype(
        np.uint64
    )
