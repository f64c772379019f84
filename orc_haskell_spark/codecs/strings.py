"""String/binary column codecs: DIRECT and sorted DICTIONARY.

Reference semantics:
- DIRECT (C11): DATA = concatenated bytes, LENGTH = int-RLE of per-value
  lengths; decode is zero-copy offset slicing
  (src/Orc/Serial/Binary/Striped.hs:459-468,838-845; offsets are an
  exclusive prefix sum — src/Orc/Data/Segmented.hs:41-42 == np.cumsum).
- DICTIONARY (C12/C13): DATA = index stream, LENGTH = dictionary entry
  lengths, DICTIONARY_DATA = concatenated dictionary bytes
  (src/Orc/Serial/Binary/Striped.hs:471-497,795-858). The reference
  emits the dictionary in first-occurrence order (its sort at :815-817
  orders by index); we emit a *sorted* dictionary (ORC DICTIONARY_V2
  convention) which also makes index streams smaller on skewed data.
  The reference's cardinality gate — dictionary iff distinct < 0.5 × n
  (:826-835) — lives in selector.py.

An Arrow StringArray *is* (offsets, data) — these kernels are thin,
zero-copy reshapes plus Arrow's C++ dictionary_encode/take.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _offsets_dtype(typ: pa.DataType):
    if pa.types.is_large_string(typ) or pa.types.is_large_binary(typ):
        return np.int64
    return np.int32


def string_parts(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(data uint8 array, lengths int64 array) from a no-null string/binary array."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.zeros(0, dtype=np.uint8), np.zeros(0, dtype=np.int64)
    bufs = arr.buffers()
    odt = _offsets_dtype(arr.type)
    off = np.frombuffer(bufs[1], dtype=odt, count=n + 1,
                        offset=arr.offset * np.dtype(odt).itemsize).astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8, count=int(off[-1] - off[0]),
                         offset=int(off[0]))
    lengths = np.diff(off)
    return data, lengths


def build_string_array(data: np.ndarray, lengths: np.ndarray,
                       typ: pa.DataType) -> pa.Array:
    """Rebuild a string/binary array from concat bytes + lengths (zero-copy)."""
    n = lengths.size
    off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=off[1:])
    if off[-1] > np.iinfo(np.int32).max or pa.types.is_large_string(typ) \
            or pa.types.is_large_binary(typ):
        out_type = (pa.large_binary() if pa.types.is_binary(typ)
                    or pa.types.is_large_binary(typ) else pa.large_utf8())
        obuf = pa.py_buffer(off.tobytes())
    else:
        out_type = typ
        obuf = pa.py_buffer(off.astype(np.int32).tobytes())
    arr = pa.Array.from_buffers(
        out_type, n, [None, obuf, pa.py_buffer(np.ascontiguousarray(data).tobytes())]
    )
    return arr.cast(typ) if arr.type != typ else arr


def dictionary_encode_sorted(arr: pa.Array) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """No-null string/binary array -> (indices uint64, dict lengths, dict data).

    The dictionary is lexicographically sorted; indices reference the
    sorted dictionary (pandas.factorize / pa.dictionary_encode + rank remap).
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    denc = pc.dictionary_encode(arr)  # first-occurrence dictionary
    dic = denc.dictionary
    idx = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    order = pc.array_sort_indices(dic).to_numpy(zero_copy_only=False).astype(np.int64)
    rank = np.empty(order.size, dtype=np.int64)
    rank[order] = np.arange(order.size)
    new_idx = rank[idx].astype(np.uint64)
    sorted_dic = dic.take(pa.array(order))
    ddata, dlens = string_parts(sorted_dic)
    return new_idx, dlens, ddata


def dictionary_decode(indices: np.ndarray, dict_lengths: np.ndarray,
                      dict_data: np.ndarray, typ: pa.DataType) -> pa.Array:
    """Gather dictionary entries by index -> plain string/binary array."""
    dic = build_string_array(dict_data, dict_lengths, typ)
    return dic.take(pa.array(indices.astype(np.int64)))


# --------------------------------------------------------- front coding
# Sorted dictionaries of URLs/paths share long per-entry prefixes that
# zstd's entropy stage only partially exploits (measured 64% smaller
# post-zstd on the pages generator's url dictionary). Front coding
# stores, per entry, the byte length shared with the PREVIOUS sorted
# entry plus the remaining suffix. Both directions are vectorized —
# encode compares consecutive entries as a padded byte matrix; decode
# resolves each byte column's provenance with a running maximum over
# "last entry whose prefix ends at or before this column".

FC_MAX_PREFIX = 255  # bound the padded-matrix width (and 1-byte-ish plens)
_FC_CHUNK_BYTES = 64 << 20


def _padded_matrix(data: np.ndarray, offs: np.ndarray, lens: np.ndarray,
                   width: int) -> np.ndarray:
    """(n, width) uint8 matrix of entry prefixes, zero-padded."""
    idx = offs[:, None] + np.arange(width, dtype=np.int64)[None, :]
    mask = np.arange(width, dtype=np.int64)[None, :] < lens[:, None]
    safe = np.minimum(idx, max(data.size - 1, 0))
    return np.where(mask, data[safe] if data.size else np.uint8(0), 0)


def front_code(dlens: np.ndarray, ddata: np.ndarray
               ) -> tuple[np.ndarray, np.ndarray]:
    """Sorted dict (lengths, concat bytes) -> (prefix lens, suffix bytes).

    C kernel when available (frontcode_kernel.c — one sequential pass;
    the numpy matrix compare below is the semantics reference and the
    ORC_HS_NO_NATIVE fallback)."""
    n = dlens.size
    if n == 0:
        return np.zeros(0, np.uint64), np.zeros(0, np.uint8)
    from . import native

    lib = native.load()
    if lib is not None:
        import ctypes

        lens64 = np.ascontiguousarray(dlens, dtype=np.int64)
        data = np.ascontiguousarray(ddata, dtype=np.uint8)
        plens = np.empty(n, dtype=np.int64)
        out = np.empty(max(data.size, 1), dtype=np.uint8)
        m = lib.front_code_encode(
            native.ptr(data, ctypes.c_uint8),
            native.ptr(lens64, ctypes.c_int64), n, FC_MAX_PREFIX,
            native.ptr(plens, ctypes.c_int64),
            native.ptr(out, ctypes.c_uint8))
        if m >= 0:
            return plens.astype(np.uint64), out[:m]
    lens = dlens.astype(np.int64)
    offs = np.zeros(n, np.int64)
    np.cumsum(lens[:-1], out=offs[1:])
    width = min(int(lens.max(initial=0)), FC_MAX_PREFIX)
    plens = np.zeros(n, np.int64)
    if width > 0 and n > 1:
        rows_per_chunk = max(1, _FC_CHUNK_BYTES // max(width, 1))
        for lo in range(1, n, rows_per_chunk):
            hi = min(n, lo + rows_per_chunk)
            cur = _padded_matrix(ddata, offs[lo:hi], lens[lo:hi], width)
            prev = _padded_matrix(ddata, offs[lo - 1:hi - 1],
                                  lens[lo - 1:hi - 1], width)
            limit = np.minimum(np.minimum(lens[lo:hi],
                                          lens[lo - 1:hi - 1]), width)
            eq = (cur == prev) & (
                np.arange(width, dtype=np.int64)[None, :] < limit[:, None])
            plens[lo:hi] = np.cumprod(eq, axis=1).sum(axis=1)
    # gather suffixes: all bytes past each entry's prefix
    pos = np.arange(ddata.size, dtype=np.int64)
    entry = np.searchsorted(np.cumsum(lens), pos, side="right")
    keep = (pos - offs[entry]) >= plens[entry]
    return plens.astype(np.uint64), ddata[keep]


def front_decode(plens: np.ndarray, full_lens: np.ndarray,
                 sdata: np.ndarray) -> np.ndarray:
    """(prefix lens, full entry lens, suffix bytes) -> concat full bytes.

    Byte column j of entry i resolves to the suffix of the latest entry
    k <= i with plen[k] <= j (prefix chains only ever copy from the
    immediate predecessor), which a running maximum computes per column.
    """
    n = plens.size
    if n == 0:
        return np.zeros(0, np.uint8)
    from . import native

    lib = native.load()
    if lib is not None:
        import ctypes

        plens64 = np.ascontiguousarray(plens, dtype=np.int64)
        full64 = np.ascontiguousarray(full_lens, dtype=np.int64)
        sdata64 = np.ascontiguousarray(sdata, dtype=np.uint8)
        out = np.empty(max(int(full64.sum()), 1), dtype=np.uint8)
        m = lib.front_code_decode(
            native.ptr(plens64, ctypes.c_int64),
            native.ptr(full64, ctypes.c_int64), n,
            native.ptr(sdata64, ctypes.c_uint8), sdata64.size,
            native.ptr(out, ctypes.c_uint8))
        if m < 0:
            raise ValueError("front-coded dictionary stream corrupt")
        return out[:m]
    plens = plens.astype(np.int64)
    full = full_lens.astype(np.int64)
    slens = full - plens
    s_offs = np.zeros(n, np.int64)
    np.cumsum(slens[:-1], out=s_offs[1:])
    out_offs = np.zeros(n, np.int64)
    np.cumsum(full[:-1], out=out_offs[1:])
    total = int(full.sum())
    out = np.zeros(total, np.uint8)
    # suffix region (byte j >= plen of its own entry): ONE scatter —
    # sdata is already laid out in (entry, position) order
    pos = np.arange(total, dtype=np.int64)
    entry = np.searchsorted(np.cumsum(full), pos, side="right")
    rel = pos - out_offs[entry]
    out[pos[rel >= plens[entry]]] = sdata[:]
    # prefix region: one pass per byte column up to the deepest prefix
    # (<= FC_MAX_PREFIX); provenance via running maximum
    rows = np.arange(n, dtype=np.int64)
    for j in range(int(plens.max(initial=0))):
        need = j < plens  # j < plen implies j < full
        if not need.any():
            continue
        src = np.maximum.accumulate(np.where(plens <= j, rows, -1))
        sel = need & (src >= 0)
        take = s_offs[src[sel]] + j - plens[src[sel]]
        out[out_offs[sel] + j] = sdata[take]
    return out
