"""Benchmark decontamination (orc_haskell_spark/pipeline/decontam.py):
hand-computed goldens, an exact DuckDB twin over the real documents
table, and the broadcast-join plan shape."""

from __future__ import annotations

import os

import duckdb
import pytest

from orc_haskell_spark.pipeline import decontam

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")

ORACLE = r"""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), g AS (
  SELECT doc_id,
         array_to_string(list_slice(w, i, i + {m}), ' ') AS gram
  FROM d, unnest(generate_series(1, len(w) - {m})) AS t(i)
), b AS (
  SELECT DISTINCT array_to_string(list_slice(w, i, i + {m}), ' ') AS gram
  FROM (SELECT string_split(text, ' ') AS w FROM bench) bb,
       unnest(generate_series(1, len(w) - {m})) AS t(i)
), s AS (
  SELECT d.doc_id,
         count(g.gram) AS ngram_count,
         count(b.gram) AS contaminated_ngrams
  FROM d
  LEFT JOIN g USING (doc_id)
  LEFT JOIN b ON g.gram = b.gram
  GROUP BY d.doc_id
)
SELECT doc_id, ngram_count, contaminated_ngrams,
       round(CASE WHEN ngram_count > 0
                  THEN contaminated_ngrams / ngram_count
                  ELSE 0.0 END, 6) AS contamination_frac,
       (CASE WHEN ngram_count > 0
             THEN contaminated_ngrams / ngram_count
             ELSE 0.0 END) > {thr} AS contaminated
FROM s ORDER BY doc_id
"""


def test_contamination_golden(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "totally unrelated words here nothing shared at all"),
         (3, "too short")],
        ["doc_id", "text"])
    bench = spark.createDataFrame(
        [(1, "we saw the quick brown fox jumps far away")], ["bid", "text"])
    got = {r.doc_id: r for r in decontam.contamination(
        df, "doc_id", "text", bench, n=4).collect()}
    # doc 1: 6 4-grams, hits = 'the quick brown fox', 'quick brown fox
    # jumps' (bench has both); 'brown fox jumps over' not in bench
    assert got[1].ngram_count == 6
    assert got[1].contaminated_ngrams == 2
    assert got[1].contamination_frac == pytest.approx(2 / 6, abs=1e-6)
    assert got[1].contaminated is True
    assert got[2].contaminated_ngrams == 0 and got[2].contaminated is False
    # < n words: still a row, counted clean
    assert got[3].ngram_count == 0
    assert got[3].contamination_frac == 0.0 and got[3].contaminated is False


def test_decontaminate_drops_exactly_the_flagged(spark):
    df = spark.createDataFrame(
        [(i, f"doc {i} body alpha beta gamma delta epsilon") for i in
         range(6)] + [(9, "shared secret eval passage appears verbatim ok")],
        ["doc_id", "text"])
    bench = spark.createDataFrame(
        [(1, "the shared secret eval passage appears verbatim too")],
        ["bid", "text"])
    kept = decontam.decontaminate(df, "doc_id", "text", bench, n=5)
    assert sorted(r.doc_id for r in kept.collect()) == list(range(6))
    # threshold relaxed above the hit fraction -> nothing dropped
    kept_all = decontam.decontaminate(df, "doc_id", "text", bench, n=5,
                                      max_hit_frac=0.99)
    assert kept_all.count() == 7


def test_contamination_matches_duckdb_oracle(spark):
    """Exact twin over the real documents table: the eval set is 8 real
    document texts (guaranteed hits) plus synthetic misses."""
    n = 8
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    bench_rows = [(i, r.text) for i, r in enumerate(
        docs.orderBy("doc_id").limit(8).collect())]
    bench_rows += [(100 + i, f"z{i} " * 40) for i in range(4)]
    bench = spark.createDataFrame(bench_rows, ["bid", "text"])

    got = decontam.contamination(
        docs, "doc_id", "text", bench, n=n).orderBy("doc_id").collect()
    assert any(r.contaminated for r in got)          # the 8 seeds hit
    assert not all(r.contaminated for r in got)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{os.path.join(SF_DIR, 'documents.parquet')}')")
    con.execute("CREATE TABLE bench (bid INT, text VARCHAR)")
    con.executemany("INSERT INTO bench VALUES (?, ?)", bench_rows)
    want = con.execute(
        ORACLE.format(m=n - 1, thr=0.0)).fetchall()
    assert len(got) == len(want) == docs.count()
    for g, w in zip(got, want):
        assert (g.doc_id, g.ngram_count, g.contaminated_ngrams) == w[:3]
        assert g.contamination_frac == pytest.approx(w[3], abs=1e-9)
        assert g.contaminated == w[4]


def test_bench_grams_broadcast_in_plan(spark):
    docs = spark.createDataFrame([(1, "a b c d e f")], ["doc_id", "text"])
    bench = spark.createDataFrame([(1, "a b c d")], ["bid", "text"])
    plan = decontam.contamination(
        docs, "doc_id", "text", bench, n=3)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # corpus gram rows must NOT shuffle: the only exchange below the
    # final agg is the broadcast one plus the doc-id-keyed partial agg
    assert "SortMergeJoin" not in plan
