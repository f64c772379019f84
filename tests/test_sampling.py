"""Deterministic sampling (orc_haskell_spark/pipeline/sampling.py):
exact DuckDB mirrors on real testdata, determinism across
repartitionings, rate accuracy, quota semantics, and growth stability."""

from __future__ import annotations

import os

import pytest

from orc_haskell_spark.pipeline import sampling

SF = "/root/testdata/sf0.01"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF), reason="driver testdata not present")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_hash_sample_matches_duckdb(spark, docs):
    import duckdb

    got = sorted(r.doc_id for r in
                 sampling.hash_sample(docs, "doc_id", 0.25).collect())
    con = duckdb.connect()
    want = [r[0] for r in con.execute(
        f"SELECT doc_id FROM read_parquet('{SF}/documents.parquet') "
        f"WHERE {sampling.hash_sample_sql('doc_id', 0.25)} "
        f"ORDER BY doc_id").fetchall()]
    assert got == want and len(got) > 0
    # rate lands near 25% of 500 docs (binomial, generous bound)
    assert 80 <= len(got) <= 170


def test_hash_sample_partitioning_invariant(spark, docs):
    a = sorted(r.doc_id for r in
               sampling.hash_sample(docs, "doc_id", 0.1).collect())
    b = sorted(r.doc_id for r in
               sampling.hash_sample(docs.repartition(7), "doc_id",
                                    0.1).collect())
    assert a == b


def test_hash_sample_rate_edges(spark, docs):
    assert sampling.hash_sample(docs, "doc_id", 0.0).count() == 0
    # rate 1.0 must keep every row of this corpus (threshold 'ffffffff'
    # excludes only an md5 prefix of exactly ffffffff — none here)
    assert sampling.hash_sample(docs, "doc_id", 1.0).count() == 500
    with pytest.raises(ValueError):
        sampling.hash_sample(docs, "doc_id", 1.5)


def test_stratified_quota_matches_duckdb(spark, docs):
    import duckdb

    got = sorted((r.lang, r.doc_id) for r in
                 sampling.stratified_quota(docs, "lang", "doc_id",
                                           10).collect())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = sorted(con.execute(
        "SELECT lang, doc_id FROM (" +
        sampling.stratified_quota_sql("documents", "lang", "doc_id", 10)
        + ")").fetchall())
    assert got == want
    per_lang = {}
    for lang, _ in got:
        per_lang[lang] = per_lang.get(lang, 0) + 1
    assert all(v <= 10 for v in per_lang.values())
    assert max(per_lang.values()) == 10   # big strata hit the quota


def test_stratified_quota_growth_stable(spark, docs):
    """Adding rows only replaces sample members that hash higher — the
    retained set is monotone-consistent as the corpus grows."""
    half = docs.filter("doc_id < 250")
    s_half = {r.doc_id for r in
              sampling.stratified_quota(half, "lang", "doc_id", 5)
              .collect()}
    s_full = {r.doc_id for r in
              sampling.stratified_quota(docs, "lang", "doc_id", 5)
              .collect()}
    # every full-corpus pick drawn from the first half must also have
    # been picked when only the first half existed
    assert {d for d in s_full if d < 250} <= s_half


def test_null_key_not_silently_dropped(spark):
    """md5(NULL) is NULL, and NULL < threshold filters the row out —
    the sentinel coalesce keeps null-keyed rows samplable (rate 1.0
    keeps everything)."""
    edge = spark.createDataFrame([(None,), (1,), (2,)], "doc_id int")
    assert sampling.hash_sample(edge, "doc_id", 1.0).count() == 3


def test_quota_preserves_user_hr_column(spark):
    """A pre-existing '_hr' column must survive (the window temp picks
    a non-colliding name)."""
    df = spark.createDataFrame(
        [(1, "en", 7), (2, "en", 8)], ["doc_id", "lang", "_hr"])
    out = sampling.stratified_quota(df, "lang", "doc_id", 1)
    assert out.columns == ["doc_id", "lang", "_hr"]
    assert [r._hr for r in out.collect()] in ([7], [8])


def test_quota_zero_and_negative(spark, docs):
    assert sampling.stratified_quota(docs, "lang", "doc_id", 0).count() == 0
    with pytest.raises(ValueError):
        sampling.stratified_quota(docs, "lang", "doc_id", -1)


def test_token_budget_mix_golden(spark):
    # 'en' budget 7 tokens: rows rank by hash; running total stops
    # inside the budget. 'de' unlisted -> dropped entirely.
    df = spark.createDataFrame(
        [(1, "en", "a b c"), (2, "en", "d e f"), (3, "en", "g h"),
         (4, "de", "x y")], ["doc_id", "lang", "text"])
    got = sampling.token_budget_mix(
        df, "lang", "doc_id", "text", {"en": 7})
    rows = got.collect()
    assert all(r.lang == "en" for r in rows)
    total = sum(len(r.text.split()) for r in rows)
    assert 0 < total <= 7
    # budget 0: nothing survives anywhere
    assert sampling.token_budget_mix(
        df, "lang", "doc_id", "text", {"en": 0}).count() == 0
    with pytest.raises(ValueError):
        sampling.token_budget_mix(df, "lang", "doc_id", "text", {"en": -1})


def test_token_budget_mix_matches_duckdb(spark, docs):
    import duckdb

    budgets = {"en": 4000, "de": 1500}
    got = sorted(r.doc_id for r in sampling.token_budget_mix(
        docs, "lang", "doc_id", "text", budgets).collect())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = sorted(r[0] for r in con.execute(
        "SELECT doc_id FROM (" + sampling.token_budget_mix_sql(
            "documents", "lang", "doc_id", "text", budgets) + ")"
    ).fetchall())
    assert got == want and len(got) > 0


def test_token_budget_mix_partitioning_invariant_and_growth(spark, docs):
    budgets = {"en": 3000}
    a = sorted(r.doc_id for r in sampling.token_budget_mix(
        docs, "lang", "doc_id", "text", budgets).collect())
    b = sorted(r.doc_id for r in sampling.token_budget_mix(
        docs.repartition(17), "lang", "doc_id", "text", budgets).collect())
    assert a == b and a
    # growth stability: with half the corpus, the mix is a superset of
    # the full-corpus mix restricted to surviving ids (new rows can
    # only push out rows that hash AFTER them)
    half = docs.filter("doc_id % 2 = 0")
    h = sorted(r.doc_id for r in sampling.token_budget_mix(
        half, "lang", "doc_id", "text", budgets).collect())
    full_even = [i for i in a if i % 2 == 0]
    assert set(full_even) <= set(h)
