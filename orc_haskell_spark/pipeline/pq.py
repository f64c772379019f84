"""Product quantization (PQ): a lossy codec for embedding columns.

The vector twin of the string/int codecs in `codecs/`: an
`array<float>` column is split into `m` subspaces and each subvector
is replaced by the index of its nearest codebook centroid — m small
integers (here 4 x 4-bit codes = 2 bytes) instead of dim x 4 raw
bytes, a 128x reduction for dim=64 float32. Queries score compressed
codes through a per-query lookup table (asymmetric distance
computation, ADC) without ever reconstructing the vectors — the
serving shape used by IVF-PQ systems (Jegou et al., "Product
Quantization for Nearest Neighbor Search", TPAMI 2011).

Everything is oracle-checkable by construction, in the style of
`similarity.ivf_first_rows_centroids`:

- the codebook for subspace s is the s-th slice of the first `ksub`
  rows (by id), L2-normalized with left-to-right float folds — an
  independent SQL engine reproduces every centroid coordinate;
- encode is pure Catalyst (folds over zip_with inside whole-stage
  codegen, no UDFs, no shuffle): nearest centroid by
  ||c||^2 - 2<u,c> with first-minimum tie-breaks, matching DuckDB's
  list_inner_product / list_position semantics bit-for-bit;
- ADC scores add the m lookup values in explicit left-to-right
  association so both engines produce identical doubles.

Codebook QUALITY (first-rows vs trained k-means) only moves which
centroid a vector lands on; the codec's mechanics — and everything the
oracle checks — are independent of it. `pq_codebooks_kmeans` exists
for real deployments (driver-side Lloyd on a bounded sample, like
`similarity.ivf_centroids`).

At 100 TB: encode is a single projection over the corpus (no shuffle,
no crossing); the code table is ~0.8% the size of the raw vectors, so
an exhaustive ADC scan touches GB where brute force touches TB, and
`write_ivfpq_index` buckets the codes by coarse IVF list so a probe
scans only `SelectedBucketsCount` buckets of 2-byte codes.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

from .similarity import (SEED, _list_assignment, _drop_index_table,
                         ivf_first_rows_centroids, sum_l2r)

__all__ = [
    "pq_codebooks_first_rows", "pq_codebooks_kmeans", "pq_encode",
    "adc_lut", "pq_adc_topk", "write_ivfpq_index", "query_ivfpq_index",
]


def _normalize_l2r(vec: list[float]) -> list[float]:
    """L2-normalize with a left-to-right square fold — the exact
    arithmetic Spark's F.aggregate and DuckDB's list_inner_product
    perform, so all three engines hold identical doubles."""
    v = [float(x) for x in vec]
    acc = 0.0
    for x in v:
        acc += x * x
    nrm = acc ** 0.5 or 1.0
    return [x / nrm for x in v]


def pq_codebooks_first_rows(df: DataFrame, id_col: str, vec_col: str,
                            m: int = 4, ksub: int = 16) -> np.ndarray:
    """(m, ksub, dsub) codebooks: centroid j of subspace s is the s-th
    slice of the NORMALIZED vector with id == j. Deterministic and
    reproducible in SQL from the same table (ids 0..ksub-1)."""
    rows = (df.filter(F.col(id_col) < ksub).orderBy(id_col)
            .select(vec_col).collect())
    if len(rows) < ksub:
        raise ValueError(f"need ids 0..{ksub - 1} for first-rows codebooks")
    dim = len(rows[0][0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    full = np.array([_normalize_l2r(r[0]) for r in rows], dtype=np.float64)
    return np.stack([full[:, s * dsub:(s + 1) * dsub] for s in range(m)])


def pq_codebooks_kmeans(df: DataFrame, id_col: str, vec_col: str,
                        m: int = 4, ksub: int = 16, sample: int = 2048,
                        iters: int = 4, seed: int = SEED) -> np.ndarray:
    """Trained codebooks: per-subspace Lloyd iterations on a bounded
    driver-side sample (the deployment quantizer; not the oracle one).
    Sampling is the same deterministic smallest-xxhash64 draw as
    similarity.ivf_centroids — a per-partition top-k, not a sort."""
    h = F.xxhash64(F.col(id_col).cast("string"))
    rows = (df.select(F.col(vec_col), h.alias("_h"), F.col(id_col))
            .orderBy("_h", id_col).limit(sample).select(vec_col).collect())
    x = np.array([_normalize_l2r(r[0]) for r in rows], dtype=np.float64)
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    rng = np.random.default_rng(seed)
    books = []
    for s in range(m):
        xs = x[:, s * dsub:(s + 1) * dsub]
        cent = xs[rng.choice(xs.shape[0], size=min(ksub, xs.shape[0]),
                             replace=False)]
        for _ in range(iters):
            d2 = ((xs[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(cent.shape[0]):
                msk = assign == c
                if msk.any():
                    cent[c] = xs[msk].mean(axis=0)
        books.append(cent)
    return np.stack(books)


def _norm_vec_col(vec_col: str) -> "F.Column":
    """The L2-normalized array<double> of ``vec_col`` as one Catalyst
    expression (left-to-right square fold, zero-norm guard)."""
    vd = F.col(vec_col).cast("array<double>")
    ss = F.aggregate(F.transform(vd, lambda x: x * x), F.lit(0.0),
                     lambda acc, x: acc + x)
    nrm = F.when(F.sqrt(ss) == 0.0, F.lit(1.0)).otherwise(F.sqrt(ss))
    return F.transform(vd, lambda x: x / nrm)


def _ip_lit(sub: "F.Column", c: np.ndarray) -> "F.Column":
    """<sub, c> as a left-to-right fold against a literal centroid."""
    clit = F.array(*[F.lit(float(x)) for x in c])
    return F.aggregate(F.zip_with(sub, clit, lambda a, b: a * b),
                       F.lit(0.0), lambda acc, x: acc + x)


def pq_encode(df: DataFrame, vec_col: str, books: np.ndarray,
              keep_ips: bool = False) -> DataFrame:
    """Append `_code{s}` (int, nearest-centroid index per subspace)
    — plus `_ips{s}` (per-centroid inner products) when ``keep_ips``.

    Pure projection: no shuffle, no Python. Nearest centroid minimizes
    ||u - c||^2, compared as ||c||^2 - 2<u,c> (the per-row ||u||^2
    term is constant across j); ties take the smallest j via
    array_position's first match, DuckDB list_position's twin."""
    m, ksub, dsub = books.shape
    vn = _norm_vec_col(vec_col)
    out = df.withColumn("_vn", vn)
    for s in range(m):
        sub = F.slice(F.col("_vn"), s * dsub + 1, dsub)
        ips = F.array(*[_ip_lit(sub, books[s, j]) for j in range(ksub)])
        out = out.withColumn(f"_ips{s}", ips)
        cc = [sum_l2r(books[s, j], books[s, j]) for j in range(ksub)]
        dists = F.array(*[
            F.lit(cc[j]) - 2.0 * F.element_at(F.col(f"_ips{s}"), j + 1)
            for j in range(ksub)])
        out = out.withColumn(
            f"_code{s}",
            (F.array_position(dists, F.array_min(dists)) - 1).cast("int"))
    if not keep_ips:
        out = out.drop(*[f"_ips{s}" for s in range(m)])
    return out.drop("_vn")


def adc_lut(query: list[float], books: np.ndarray) -> np.ndarray:
    """(m, ksub) ADC lookup table: <q_s, c_{s,j}> for the NORMALIZED
    query, with the same left-to-right folds as everything else."""
    m, ksub, dsub = books.shape
    qn = _normalize_l2r(query)
    return np.array([[sum_l2r(qn[s * dsub:(s + 1) * dsub], books[s, j])
                      for j in range(ksub)] for s in range(m)])


def _adc_score(lut: np.ndarray, code_cols: list[str]) -> "F.Column":
    """sum_s lut[s][code_s] in explicit left-to-right association, so
    the SQL oracle's ((t0+t1)+t2)+t3 reproduces the double exactly."""
    score = None
    for s, cname in enumerate(code_cols):
        lut_s = F.array(*[F.lit(float(x)) for x in lut[s]])
        term = F.element_at(lut_s, F.col(cname) + 1)
        score = term if score is None else score + term
    return score


def pq_adc_topk(df: DataFrame, id_col: str, vec_col: str,
                query: list[float], k: int = 10, m: int = 4,
                ksub: int = 16,
                books: np.ndarray | None = None) -> DataFrame:
    """Exhaustive ADC top-k: encode the corpus (projection only), score
    2-byte codes against the query's (m x ksub) lookup table, take the
    top k by (score desc, id asc). The compressed-domain twin of
    similarity.brute_force_topk — the scan reads codes, not vectors."""
    if books is None:
        books = pq_codebooks_first_rows(df, id_col, vec_col, m, ksub)
    lut = adc_lut(query, books)
    coded = pq_encode(df, vec_col, books)
    score = _adc_score(lut, [f"_code{s}" for s in range(books.shape[0])])
    return (coded.withColumn("score", score)
            .orderBy(F.desc("score"), F.asc(id_col))
            .limit(k)
            .select(F.col(id_col), F.round("score", 5).alias("score")))


def write_ivfpq_index(df: DataFrame, table: str, id_col: str,
                      vec_col: str, n_lists: int = 16, m: int = 4,
                      ksub: int = 16) -> np.ndarray:
    """Materialize the IVF-PQ serving index: (id, _list, _code0..m-1)
    bucketed on the coarse list — the corpus compressed to ~2 bytes +
    ids per row, probe-pruned at the FILE level — plus the coarse
    centroids and codebooks as `{table}_centroids` / `{table}_books`
    side tables (tiny) so queries never touch the corpus. Returns the
    codebooks for convenience."""
    spark = df.sparkSession
    cent = ivf_first_rows_centroids(df, id_col, vec_col, n_lists)
    books = pq_codebooks_first_rows(df, id_col, vec_col, m, ksub)
    _drop_index_table(spark, table)
    _drop_index_table(spark, f"{table}_centroids")
    _drop_index_table(spark, f"{table}_books")
    coded = pq_encode(df, vec_col, books).withColumn(
        "_list", _list_assignment(vec_col, cent))
    cols = [id_col, "_list"] + [f"_code{s}" for s in range(m)]
    (coded.select(*cols).write.format("parquet").mode("overwrite")
     .bucketBy(max(n_lists, 1), "_list").sortBy("_list")
     .saveAsTable(table))
    cdf = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(cent)],
        "list_id int, centroid array<double>")
    cdf.write.format("parquet").mode("overwrite") \
        .saveAsTable(f"{table}_centroids")
    bdf = spark.createDataFrame(
        [(s, j, [float(x) for x in books[s, j]])
         for s in range(m) for j in range(ksub)],
        "s int, j int, centroid array<double>")
    bdf.write.format("parquet").mode("overwrite") \
        .saveAsTable(f"{table}_books")
    return books


def query_ivfpq_index(spark, table: str, query: list[float], k: int = 10,
                      n_probe: int = 4, id_col: str = "vec_id") -> DataFrame:
    """Probe an IVF-PQ index: pick n_probe lists from the centroid side
    table, ADC-score only those buckets' codes. Work per query is
    O(probed codes) lookups — no vector arithmetic in the scan at all."""
    rows = spark.table(f"{table}_centroids").orderBy("list_id").collect()
    qn = _normalize_l2r(query)
    dots = np.array([sum_l2r(r["centroid"], qn) for r in rows])
    probe = [int(x) for x in np.argsort(-dots, kind="stable")[:n_probe]]
    brows = spark.table(f"{table}_books").orderBy("s", "j").collect()
    m = 1 + max(r["s"] for r in brows)
    ksub = 1 + max(r["j"] for r in brows)
    books = np.zeros((m, ksub, len(brows[0]["centroid"])))
    for r in brows:
        books[r["s"], r["j"]] = r["centroid"]
    lut = adc_lut(query, books)
    cand = spark.table(table).filter(F.col("_list").isin(probe))
    score = _adc_score(lut, [f"_code{s}" for s in range(m)])
    return (cand.withColumn("score", score)
            .orderBy(F.desc("score"), F.asc(id_col))
            .limit(k)
            .select(F.col(id_col), F.round("score", 5).alias("score")))
