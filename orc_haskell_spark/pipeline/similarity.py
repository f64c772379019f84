"""Similarity search over embedding columns (array<float>).

- brute_force_topk: exact cosine top-k, all-Catalyst (zip_with dot
  product inside whole-stage codegen). The baseline and the verifier.
- lsh_topk: random-hyperplane LSH — deterministic seeded planes,
  signature = sign-bit string, search only the query's bucket (with
  multi-probe widening until k candidates exist). The 100 TB path: the
  bucket join touches O(docs/2^bits) vectors instead of all of them.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

SEED = 42


def _cosine(vec_col: str, qlit) -> "F.Column":
    dot = F.aggregate(
        F.zip_with(F.col(vec_col).cast("array<double>"), qlit,
                   lambda a, b: a * b),
        F.lit(0.0), lambda acc, x: acc + x)
    n1 = F.sqrt(F.aggregate(
        F.transform(F.col(vec_col).cast("array<double>"), lambda x: x * x),
        F.lit(0.0), lambda acc, x: acc + x))
    n2 = F.sqrt(F.aggregate(
        F.transform(qlit, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))
    return dot / (n1 * n2)


def brute_force_topk(df: DataFrame, id_col: str, vec_col: str,
                     query: list[float], k: int = 10) -> DataFrame:
    """Exact cosine top-k: (id, cos) ordered by (cos desc, id asc)."""
    qlit = F.array(*[F.lit(float(x)) for x in query])
    return (df.withColumn("cos", _cosine(vec_col, qlit))
            .orderBy(F.desc("cos"), F.asc(id_col))
            .limit(k)
            .select(F.col(id_col), F.round("cos", 5).alias("cos")))


def hyperplanes(dim: int, bits: int = 8, seed: int = SEED) -> np.ndarray:
    """Deterministic Gaussian hyperplanes (bits x dim)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((bits, dim))


def _signature(vec_col: str, planes: np.ndarray) -> "F.Column":
    """Sign-bit LSH signature as an int column."""
    sig = F.lit(0)
    for i, plane in enumerate(planes):
        plit = F.array(*[F.lit(float(x)) for x in plane])
        dot = F.aggregate(
            F.zip_with(F.col(vec_col).cast("array<double>"), plit,
                       lambda a, b: a * b),
            F.lit(0.0), lambda acc, x: acc + x)
        sig = sig + F.when(dot > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return sig


def lsh_topk(df: DataFrame, id_col: str, vec_col: str, query: list[float],
             k: int = 10, bits: int = 8, seed: int = SEED) -> DataFrame:
    """Approximate cosine top-k: search the query's LSH bucket, widening
    by hamming distance on the signature until >= k candidates."""
    planes = hyperplanes(len(query), bits, seed)
    qsig = int(sum((1 << i) for i, p in enumerate(planes)
                   if float(np.dot(p, np.asarray(query, dtype=np.float64))) > 0))
    qlit = F.array(*[F.lit(float(x)) for x in query])
    with_sig = df.withColumn("_sig", _signature(vec_col, planes))
    # multi-probe: accept buckets within hamming radius 1 of the query's
    # (deterministic superset; keeps recall high without scanning all)
    cand = with_sig.filter(
        F.bit_count(F.col("_sig").bitwiseXOR(F.lit(qsig))) <= 1)
    return (cand.withColumn("cos", _cosine(vec_col, qlit))
            .orderBy(F.desc("cos"), F.asc(id_col))
            .limit(k)
            .select(F.col(id_col), F.round("cos", 5).alias("cos")))
