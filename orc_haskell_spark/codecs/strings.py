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
