"""Product quantization (pipeline/pq.py): code validity, determinism,
exact DuckDB mirror on synthetic data, trained-vs-first-rows quality,
IVF-PQ index equivalence + bucket pruning, and shape errors.

The sf0.001 gate-preflight mirrors live in test_entry_queries.py; this
suite covers the operator on its own synthetic corpora."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from orc_haskell_spark.pipeline import pq


def _corpus(spark, n=120, dim=32, seed=7):
    rng = np.random.default_rng(seed)
    vecs = rng.standard_normal((n, dim))
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>")
    return df, vecs


def test_codes_valid_and_deterministic(spark):
    df, _ = _corpus(spark)
    books = pq.pq_codebooks_first_rows(df, "vec_id", "embedding",
                                       m=4, ksub=16)
    assert books.shape == (4, 16, 8)
    a = pq.pq_encode(df, "embedding", books).collect()
    b = pq.pq_encode(df, "embedding", books).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    for row in a:
        for s in range(4):
            assert 0 <= row[f"_code{s}"] < 16  # 4-bit codes
    # first ksub rows are their own centroids: code == own id per
    # subspace only for id 0..15 where the subvector IS centroid id
    d = {r["vec_id"]: r for r in a}
    for j in range(16):
        assert [d[j][f"_code{s}"] for s in range(4)] == [j] * 4


def test_zero_vector_guard(spark):
    """A zero vector normalizes through the guard (norm -> 1) and still
    gets a valid code instead of NaNs."""
    rows = [(i, [float(i == j) for j in range(16)]) for i in range(16)]
    rows.append((16, [0.0] * 16))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    books = pq.pq_codebooks_first_rows(df, "vec_id", "embedding",
                                       m=4, ksub=16)
    out = {r["vec_id"]: r for r in
           pq.pq_encode(df, "embedding", books).collect()}
    assert all(0 <= out[16][f"_code{s}"] < 16 for s in range(4))


def test_duckdb_mirror_synthetic(spark):
    """The all-Catalyst encode matches an independent DuckDB recompute
    (normalization, codebooks, argmin ties, l2r folds) on a corpus the
    gate never sees."""
    import duckdb

    df, vecs = _corpus(spark, n=80, dim=32, seed=23)
    books = pq.pq_codebooks_first_rows(df, "vec_id", "embedding",
                                       m=4, ksub=16)
    coded = pq.pq_encode(df, "embedding", books)
    got = {r["vec_id"]: tuple(r[f"_code{s}"] for s in range(4))
           for r in coded.collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE embeddings(vec_id BIGINT, embedding FLOAT[])")
    con.executemany("INSERT INTO embeddings VALUES (?, ?)",
                    [(i, [float(x) for x in v])
                     for i, v in enumerate(vecs)])
    dsub = 8
    exp = con.execute(f"""
WITH raw AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
nrm AS (SELECT vec_id, CASE WHEN sqrt(list_inner_product(v,v)) = 0
             THEN 1.0 ELSE sqrt(list_inner_product(v,v)) END AS nr, v
        FROM raw),
nv AS (SELECT vec_id, list_transform(v, x -> x / nr) AS v FROM nrm),
cent AS (SELECT s, vec_id AS j, v[s*{dsub}+1 : s*{dsub}+{dsub}] AS c
         FROM nv, range(4) t(s) WHERE vec_id < 16),
sub AS (SELECT vec_id, s, v[s*{dsub}+1 : s*{dsub}+{dsub}] AS u
        FROM nv, range(4) t(s)),
d AS (SELECT sub.vec_id, sub.s, cent.j,
             list_inner_product(cent.c, cent.c)
               - 2 * list_inner_product(sub.u, cent.c) AS dist
      FROM sub JOIN cent ON cent.s = sub.s),
code AS (SELECT vec_id, s, j FROM d
         QUALIFY row_number() OVER (PARTITION BY vec_id, s
                                    ORDER BY dist ASC, j ASC) = 1)
SELECT vec_id, MAX(CASE WHEN s=0 THEN j END), MAX(CASE WHEN s=1 THEN j END),
       MAX(CASE WHEN s=2 THEN j END), MAX(CASE WHEN s=3 THEN j END)
FROM code GROUP BY vec_id""").fetchall()
    assert {r[0]: tuple(int(x) for x in r[1:]) for r in exp} == got


def test_adc_topk_self_hit_and_recall(spark):
    """ADC is lossy but must (a) rank the query vector itself first
    when it is a codebook row, and (b) overlap the exact brute-force
    top-k substantially on clustered data."""
    from orc_haskell_spark.pipeline import similarity

    rng = np.random.default_rng(3)
    centers = rng.standard_normal((8, 32)) * 4
    vecs = np.vstack([c + rng.standard_normal((25, 32)) * 0.3
                      for c in centers])
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>")
    q = [float(x) for x in vecs[0]]
    adc = [r[0] for r in pq.pq_adc_topk(df, "vec_id", "embedding", q,
                                        10, m=4, ksub=16).collect()]
    assert 0 in adc  # the query vector itself survives quantization
    exact = [r[0] for r in similarity.brute_force_topk(
        df, "vec_id", "embedding", q, 10).collect()]
    assert len(set(adc) & set(exact)) >= 5  # same cluster dominates
    # every ADC hit comes from the query's cluster (ids 0..24)
    assert all(i < 25 for i in adc)


def test_kmeans_books_reduce_distortion(spark):
    """Trained codebooks quantize strictly better than first-rows ones
    on the k-means objective: mean squared reconstruction error
    ||u - dequant(code)||^2 over the corpus drops."""
    df, vecs = _corpus(spark, n=200, dim=32, seed=11)
    norm = np.linalg.norm(vecs, axis=1, keepdims=True)
    un = vecs / np.where(norm == 0, 1.0, norm)

    def mse(books):
        coded = {r["vec_id"]: [r[f"_code{s}"] for s in range(4)]
                 for r in pq.pq_encode(df, "embedding", books).collect()}
        errs = []
        for i, u in enumerate(un):
            rec = np.concatenate([books[s, coded[i][s]] for s in range(4)])
            errs.append(((u - rec) ** 2).sum())
        return float(np.mean(errs))

    fr = mse(pq.pq_codebooks_first_rows(df, "vec_id", "embedding",
                                        m=4, ksub=16))
    km = mse(pq.pq_codebooks_kmeans(df, "vec_id", "embedding",
                                    m=4, ksub=16, sample=200))
    assert km < fr


def test_ivfpq_index_matches_inline_and_prunes(spark):
    """The persisted IVF-PQ index returns exactly the inline
    ADC result restricted to the probed lists, and the probe scan is
    bucket-pruned."""
    import re

    from orc_haskell_spark.pipeline.similarity import (
        _list_assignment, ivf_first_rows_centroids)

    df, vecs = _corpus(spark, n=160, dim=32, seed=19)
    q = [float(x) for x in vecs[5]]
    books = pq.write_ivfpq_index(df, "ivfpq_idx_test", "vec_id",
                                 "embedding", n_lists=16, m=4, ksub=16)
    got = pq.query_ivfpq_index(spark, "ivfpq_idx_test", q, 5, n_probe=4)
    got_rows = [tuple(r) for r in got.collect()]

    # inline twin: same coarse quantizer, same probe set, same ADC
    cent = ivf_first_rows_centroids(df, "vec_id", "embedding", 16)
    qn = pq._normalize_l2r(q)
    from orc_haskell_spark.pipeline.similarity import sum_l2r
    dots = np.array([sum_l2r(c, qn) for c in cent])
    probe = [int(x) for x in np.argsort(-dots, kind="stable")[:4]]
    lut = pq.adc_lut(q, books)
    inline = (pq.pq_encode(df, "embedding", books)
              .withColumn("_list", _list_assignment("embedding", cent))
              .filter(F.col("_list").isin(probe))
              .withColumn("score", pq._adc_score(
                  lut, [f"_code{s}" for s in range(4)]))
              .orderBy(F.desc("score"), F.asc("vec_id")).limit(5)
              .select("vec_id", F.round("score", 5).alias("score")))
    assert got_rows == [tuple(r) for r in inline.collect()]

    spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        plan = pq.query_ivfpq_index(
            spark, "ivfpq_idx_test", q, 5,
            n_probe=4)._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.unset(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled")
    m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    assert m and int(m.group(1)) < int(m.group(2))


def test_encode_plan_is_pure_projection(spark):
    """PQ encode must not shuffle: the physical plan is scan->project
    (whole-stage codegen), no Exchange."""
    df, _ = _corpus(spark, n=50, dim=32)
    books = pq.pq_codebooks_first_rows(df, "vec_id", "embedding",
                                       m=4, ksub=16)
    plan = pq.pq_encode(df, "embedding", books) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_shape_errors(spark):
    df, _ = _corpus(spark, n=40, dim=30)  # 30 % 4 != 0
    with pytest.raises(ValueError, match="not divisible"):
        pq.pq_codebooks_first_rows(df, "vec_id", "embedding", m=4)
    few = spark.createDataFrame(
        [(i, [1.0, 2.0]) for i in range(5)],
        "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="first-rows"):
        pq.pq_codebooks_first_rows(few, "vec_id", "embedding",
                                   m=1, ksub=16)
