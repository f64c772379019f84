"""orc_haskell_spark — a PySpark-native per-column lightweight-compression engine.

A from-scratch re-expression of the capabilities of HuwCampbell/orc-haskell
(a native ORC reader/writer) as an idiomatic Spark engine:

- numpy/Arrow vectorized codec kernels (``orc_haskell_spark.codecs``):
  zigzag, base-128 varint, byte-RLE, boolean bit-pack, integer RLEv1,
  integer RLEv2 (short-repeat / direct / patched-base / delta, which also
  subsumes frame-of-reference + bit-packing), sorted dictionary, FSST,
  and chunked block compression (zlib/snappy/zstd/lz4) with the
  store-if-incompressible escape bit.
- a stripe layer (``stripe.py``) mapping Arrow RecordBatches to per-column
  ORC-style streams (PRESENT / DATA / LENGTH / DICTIONARY_DATA / SECONDARY)
  with null compaction, exactly as the reference's striped layer does
  (reference: src/Orc/Table/Striped.hs, src/Orc/Serial/Binary/Striped.hs).
- a Spark engine layer (``engine.py``) running encode/decode entirely in
  ``mapInArrow`` (no per-row Python), with explicit range partitioning,
  salting hooks, and checkpointed per-partition stripe manifests
  (``manifest.py``) for resumable re-runs.

The unit of work is one Arrow RecordBatch == one ORC "stripe"
(reference README.md:40-45: "we use Storable.Vector for column types, and
gather entire stripes into memory").
"""

__version__ = "0.1.0"
