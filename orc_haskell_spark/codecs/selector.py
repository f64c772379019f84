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
FSST_MIN_BYTES = 4096  # below this, symbol table overhead dominates


def choose_string_codec(arr: pa.Array, data_nbytes: int,
                        allowed: tuple[str, ...]) -> str:
    """Pick 'dict' | 'fsst' | 'direct' for a no-null string/binary array."""
    n = len(arr)
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
        return "fsst"
    return "direct"
