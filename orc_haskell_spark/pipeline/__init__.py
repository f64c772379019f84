"""Training-data pipeline operators over web-scale text/embedding tables.

Beyond the reference's codec surface, these are the operations a
100 TB training-data pipeline runs on the same tables the engine
encodes: deduplication (exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine), similarity search (brute-force and LSH-bucketed
cosine top-k), text analysis (language id, quality scores, token
counts, fingerprints), and multimodal column plumbing.

Everything here is Catalyst-first: pure pyspark.sql.functions
expressions (whole-stage codegen, no Python in the hot path) except the
multimodal feature kernels, which are Arrow-batched by construction.
"""

from . import dedup, multimodal, similarity, text  # noqa: F401
