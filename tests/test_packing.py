"""Sequence packing (orc_haskell_spark/pipeline/packing.py): hand
goldens, an exact DuckDB twin of the plan over the real documents
table (sharded by its source column), and materialized sequences
checked against a Python reconstruction."""

from __future__ import annotations

import os
import re

import duckdb

from orc_haskell_spark.pipeline import packing

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")

PLAN_ORACLE = r"""
WITH d AS (
  SELECT source AS shard, doc_id,
         len(string_split_regex(text, '\s+')) AS n_tokens
  FROM documents
), c AS (
  SELECT shard, doc_id, n_tokens,
         (sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
              ROWS UNBOUNDED PRECEDING) - n_tokens)::BIGINT
           AS stream_start
  FROM d WHERE n_tokens > 0
), e AS (
  SELECT shard, doc_id, n_tokens, stream_start, seq_id
  FROM c, unnest(generate_series(stream_start // {B},
       (stream_start + n_tokens - 1) // {B})) AS t(seq_id)
)
SELECT shard, seq_id, doc_id,
       greatest(stream_start, seq_id * {B}) - stream_start AS tok_start,
       least(stream_start + n_tokens, seq_id * {B} + {B})
         - greatest(stream_start, seq_id * {B}) AS tok_len,
       greatest(stream_start, seq_id * {B}) - seq_id * {B}
         AS seq_tok_start
FROM e ORDER BY shard, seq_id, doc_id
"""


def test_pack_plan_golden(spark):
    # doc 1: 3 toks, doc 2: 4 toks, doc 3: 7 toks; budget 5
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "d e f g"), (3, "h i j k l m n")],
        ["doc_id", "text"])
    got = sorted(packing.pack_plan(df, "doc_id", "text", 5).collect(),
                 key=lambda r: (r.seq_id, r.doc_id))
    rows = [(r.seq_id, r.doc_id, r.tok_start, r.tok_len, r.seq_tok_start)
            for r in got]
    # stream: [a b c | d e] [f g | h i j] [k l m n]
    assert rows == [
        (0, 1, 0, 3, 0), (0, 2, 0, 2, 3),
        (1, 2, 2, 2, 0), (1, 3, 0, 3, 2),
        (2, 3, 3, 4, 0),
    ]


def test_pack_tokens_golden_and_budget_invariant(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "d e f g"), (3, "h i j k l m n")],
        ["doc_id", "text"])
    got = {r.seq_id: r for r in
           packing.pack_tokens(df, "doc_id", "text", 5).collect()}
    assert got[0].tokens == ["a", "b", "c", "d", "e"]
    assert got[1].tokens == ["f", "g", "h", "i", "j"]
    assert got[2].tokens == ["k", "l", "m", "n"]     # last: short
    assert [got[i].n_tokens for i in range(3)] == [5, 5, 4]


def test_pack_plan_matches_duckdb_oracle(spark):
    budget = 64
    path = os.path.join(SF_DIR, "documents.parquet")
    docs = spark.read.parquet(path)
    got = packing.pack_plan(docs, "doc_id", "text", budget,
                            shard_col="source") \
        .orderBy("shard", "seq_id", "doc_id").collect()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{path}')")
    want = con.execute(PLAN_ORACLE.format(B=budget)).fetchall()
    assert len(got) == len(want) and len(got) > docs.count()
    for g, w in zip(got, want):
        assert (g.shard, g.seq_id, g.doc_id, g.tok_start, g.tok_len,
                g.seq_tok_start) == w


def test_pack_tokens_matches_python_reconstruction(spark):
    budget = 100
    path = os.path.join(SF_DIR, "documents.parquet")
    docs = spark.read.parquet(path).limit(200)
    got = {(r.shard, r.seq_id): r.tokens for r in
           packing.pack_tokens(docs, "doc_id", "text", budget,
                               shard_col="source").collect()}
    # reconstruct: per shard, concat tokens in doc_id order, chop
    by_shard: dict = {}
    for r in sorted(docs.collect(), key=lambda r: (r.source, r.doc_id)):
        by_shard.setdefault(r.source, []).extend(re.split(r"\s+", r.text))
    want = {}
    for shard, stream in by_shard.items():
        for s in range((len(stream) + budget - 1) // budget):
            want[(shard, s)] = stream[s * budget:(s + 1) * budget]
    assert got == want
    # every sequence full except each shard's last
    last = {s: max(k[1] for k in want if k[0] == s) for s in by_shard}
    assert all(len(v) == budget for k, v in want.items()
               if k[1] != last[k[0]])


def test_pack_plan_rejects_bad_budget(spark):
    df = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    import pytest
    with pytest.raises(ValueError, match="budget"):
        packing.pack_plan(df, "doc_id", "text", 0)
