"""Per-column codec auto-selection.

The reference has exactly one data-dependent encoding decision: strings
use a dictionary iff distinct < 0.5 × total (putStringColumn,
src/Orc/Serial/Binary/Striped.hs:826-835); everything else is hardwired
DIRECT + RLEv1 (:681-747). Its only other adaptive behavior is the
per-chunk store-if-incompressible escape (Internal/Compression.hs:160-166).

This module generalizes both: estimate encoded bytes per candidate codec
from cheap column statistics (and small samples for FSST), pick argmin.
Integer mode selection is already exact inside rle2 (per-512 window);
here we choose between string representations and outer compression.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

DICT_CARDINALITY_GATE = 0.5  # reference threshold (Striped.hs:828-830)
FSST_MIN_BYTES = 65536  # below this, symbol table overhead dominates
SAMPLE_BYTES = 1 << 19  # 512 KiB measurement sample


def choose_string_codec(arr: pa.Array, data: "np.ndarray",
                        allowed: tuple[str, ...],
                        compression: str = "none",
                        compression_level: int | None = None) -> str:
    """Pick 'dict' | 'fsst' | 'direct' for a no-null string/binary array.

    The dictionary decision is the reference's cardinality gate; the
    fsst-vs-direct decision is *measured* on a sample: FSST(+outer
    block codec) vs outer block codec alone — whichever yields fewer
    bytes wins. (With a strong outer compressor, FSST only sometimes
    pays; without one, it almost always does.)
    """
    n = len(arr)
    data_nbytes = int(data.nbytes)
    if n == 0:
        return "direct"
    if "dict" in allowed:
        distinct = pc.count_distinct(arr).as_py()
        if distinct < DICT_CARDINALITY_GATE * n:
            # estimated: sorted-dict indices RLE2 ≈ n * ceil(log2(card))/8,
            # plus the dictionary payload once
            idx_bits = max(1, int(np.ceil(np.log2(max(distinct, 2)))))
            dict_bytes = data_nbytes * distinct / n  # distinct share of bytes
            est_dict = dict_bytes + n * idx_bits / 8
            if est_dict < 0.8 * data_nbytes:
                return "dict"
    if "fsst" in allowed and data_nbytes >= FSST_MIN_BYTES:
        from . import block, fsst

        sample = data[:SAMPLE_BYTES]
        table, payload = fsst.compress(sample)
        fsst_bytes = len(table) + len(payload)
        direct_bytes = sample.nbytes
        if compression != "none":
            fsst_bytes = len(block.compress(
                bytes(payload), compression, compression_level)) + len(table)
            direct_bytes = len(block.compress(
                sample.tobytes(), compression, compression_level))
        if fsst_bytes < 0.95 * direct_bytes:
            return "fsst"
    return "direct"
