"""Incremental MinHash-LSH dedup against a persisted index
(orc_haskell_spark/pipeline/dedup.py::dedup_incremental): batch-by-batch
processing must reproduce the whole-corpus batch operator exactly."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from orc_haskell_spark.pipeline import dedup

SF = "/root/testdata/sf0.01"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF), reason="driver testdata not present")


def _pairs(df):
    return {(r.id_a, r.id_b, r.jacc) for r in df.collect()}


def test_incremental_equals_batch(spark, tmp_path):
    """Processing two halves sequentially yields exactly the batch
    operator's pairs: batch-1 internal pairs from the first call,
    everything touching batch 2 from the second."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    b1 = docs.filter("doc_id % 2 = 0")
    b2 = docs.filter("doc_id % 2 = 1")
    want = _pairs(dedup.minhash_lsh_pairs(docs, "doc_id", "text"))
    assert want                               # corpus has near-dups
    idx = str(tmp_path / "mh_index")
    p1 = _pairs(dedup.dedup_incremental(spark, b1, "doc_id", "text",
                                        idx, batch_id="b1"))
    p2 = _pairs(dedup.dedup_incremental(spark, b2, "doc_id", "text",
                                        idx, batch_id="b2"))
    assert p1 | p2 == want
    # second call reported no batch-1-internal pair again
    b1_ids = {r.doc_id for r in b1.select("doc_id").collect()}
    assert not any(a in b1_ids and b in b1_ids for a, b, _ in p2)


def test_replay_same_batch_is_idempotent(spark, tmp_path):
    """Crash-replay: the second call runs with the batch's OWN stale
    index partition on disk — it must be excluded, or every pair row
    multiplies through the doubled shingle joins."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(120)
    idx = str(tmp_path / "mh_index")
    first = dedup.dedup_incremental(spark, docs, "doc_id", "text",
                                    idx, batch_id="b1").collect()
    again = dedup.dedup_incremental(spark, docs, "doc_id", "text",
                                    idx, batch_id="b1").collect()
    key = lambda rows: sorted((r.id_a, r.id_b, r.jacc) for r in rows)
    assert key(first) == key(again)
    # ROW-level: no duplicated pair rows (set-compare would hide them)
    assert len(again) == len(set(key(again)))
    n_bands = spark.read.parquet(os.path.join(idx, "bands")).count()
    assert n_bands == 120 * 16                # 64 perms / r=4 -> 16 bands


def test_recrawled_id_supersedes_old_index_rows(spark, tmp_path):
    """The same id re-ingested in a later batch replaces its indexed
    text: pairs verify against the NEW shingles, once, and an id never
    pairs with its own older version."""
    idx = str(tmp_path / "mh_index")
    base = "alpha beta gamma delta epsilon zeta eta theta"
    b1 = spark.createDataFrame(
        [("u1", base), ("u2", "totally different words here now ok")],
        ["doc_id", "text"])
    dedup.dedup_incremental(spark, b1, "doc_id", "text", idx,
                            batch_id="b1").collect()
    # batch 2: u1 RECRAWLED with changed text; u3 duplicates the NEW u1
    b2 = spark.createDataFrame(
        [("u1", base + " extra"), ("u3", base + " extra")],
        ["doc_id", "text"])
    rows = dedup.dedup_incremental(spark, b2, "doc_id", "text", idx,
                                   batch_id="b2").collect()
    got = sorted((r.id_a, r.id_b, r.jacc) for r in rows)
    # exactly one u1-u3 pair at jacc 1.0 (new text vs new text), no
    # duplicate rows from the superseded b1 copy of u1
    assert got == [("u1", "u3", 1.0)]
    # batch 3: u4 duplicates u1's SUPERSEDED b1 text — older partitions
    # still hold it on disk, but only u1's LATEST version may verify:
    # jacc vs current text is 6/7 (not the stale 1.0), exactly once
    b3 = spark.createDataFrame([("u4", base)], ["doc_id", "text"])
    rows3 = dedup.dedup_incremental(spark, b3, "doc_id", "text", idx,
                                    batch_id="b3").collect()
    got3 = sorted((r.id_a, r.id_b, round(r.jacc, 4)) for r in rows3)
    assert got3 == [("u1", "u4", 0.8571), ("u3", "u4", 0.8571)], got3
    assert len(rows3) == 2                 # no duplicate stale rows
    with pytest.raises(ValueError, match="batch_id"):
        dedup.dedup_incremental(spark, b3, "doc_id", "text", idx,
                                batch_id="007")


def test_dry_run_leaves_index_unchanged(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
    idx = str(tmp_path / "mh_index")
    dedup.dedup_incremental(spark, docs, "doc_id", "text", idx,
                            batch_id="b1").collect()
    before = spark.read.parquet(os.path.join(idx, "bands")).count()
    more = spark.read.parquet(f"{SF}/documents.parquet") \
        .filter("doc_id >= 50").limit(30)
    dedup.dedup_incremental(spark, more, "doc_id", "text", idx,
                            batch_id="b2", commit=False).collect()
    assert spark.read.parquet(os.path.join(idx, "bands")).count() == before


def test_random_corpora_incremental_equals_batch(spark, tmp_path):
    """Property over randomized corpora: for random docs with seeded
    near-dup families and a random 3-way batch split, processing the
    batches in order reproduces minhash_lsh_pairs of the whole corpus
    exactly. (Deterministic seeds; hypothesis-style without the Spark
    session cost per example.)"""
    import random

    for seed in (1, 7, 42):
        rng = random.Random(seed)
        vocab = [f"w{i}" for i in range(50)]
        docs = []
        for i in range(60):
            words = [rng.choice(vocab) for _ in range(rng.randint(6, 20))]
            docs.append((i, " ".join(words)))
            if rng.random() < 0.3:      # seeded near-dup: mutate 1 word
                mut = list(words)
                mut[rng.randrange(len(mut))] = rng.choice(vocab)
                docs.append((1000 + i, " ".join(mut)))
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        want = _pairs(dedup.minhash_lsh_pairs(
            df, "doc_id", "text", threshold=0.6))
        idx = str(tmp_path / f"idx{seed}")
        got = set()
        splits = [rng.randrange(3) for _ in docs]
        for k in range(3):
            ids = [d[0] for d, s in zip(docs, splits) if s == k]
            b = df.filter(F.col("doc_id").isin(ids))
            if not ids:
                continue
            got |= _pairs(dedup.dedup_incremental(
                spark, b, "doc_id", "text", idx, batch_id=f"b{k}",
                threshold=0.6))
        assert got == want, (seed, got ^ want)


def test_config_mismatch_refused(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(10)
    idx = str(tmp_path / "mh_index")
    dedup.dedup_incremental(spark, docs, "doc_id", "text", idx,
                            batch_id="b1").collect()
    with pytest.raises(ValueError, match="built with"):
        dedup.dedup_incremental(spark, docs, "doc_id", "text", idx,
                                batch_id="b2", num_perm=32)
    with pytest.raises(ValueError, match="batch_id"):
        dedup.dedup_incremental(spark, docs, "doc_id", "text", idx,
                                batch_id="a/b")
