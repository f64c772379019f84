"""Pure numpy codec kernels — no Spark imports.

Layering mirrors the reference's module DAG
(src/Orc/Serial/Binary/Internal/*): zigzag/varint at the bottom, then
byte-RLE + boolean bit-pack, integer RLEv1/RLEv2, dictionary, FSST, and
chunked block compression on top, with the auto-selector choosing per
column per stripe.
"""

from . import bitpack, byte_rle, rle1, rle2, varint, zigzag  # noqa: F401
