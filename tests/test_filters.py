"""Webtext quality filters: Gopher shape/repetition stats, C4 line
cleaning, PII redaction (orc_haskell_spark/pipeline/filters.py).
Goldens are hand-computed; the oracle-exactness of the two gate queries
built on these operators is pinned in tests/test_entry_queries.py."""

from __future__ import annotations

import pytest

from orc_haskell_spark.pipeline import filters


def _one(df):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0]


def test_gopher_stats_golden(spark):
    df = spark.createDataFrame(
        [(1, "The cat and the dog runs fast")], ["doc_id", "text"])
    r = _one(filters.gopher_stats(df, "doc_id", "text"))
    assert r.word_count == 7
    assert r.mean_word_len == pytest.approx(23 / 7, abs=1e-5)
    assert r.alpha_word_frac == 1.0
    assert r.dup_word_frac == 0.0       # 'The' != 'the': all distinct
    assert r.stopword_hits == 2         # and, the (case-sensitive)
    assert r.keep is False              # word_count < 50


def test_gopher_keep_thresholds(spark):
    # 60 words, all alpha, stopword-rich -> keep
    good = " ".join(["the cat and dog ran fast"] * 10)
    # same length but numeric words -> alpha_word_frac fails
    bad = " ".join(["123 456 and the dog 789"] * 10)
    df = spark.createDataFrame(
        [(1, good), (2, bad)], ["doc_id", "text"])
    got = {r.doc_id: r for r in
           filters.gopher_stats(df, "doc_id", "text").collect()}
    assert got[1].keep is True
    assert got[2].keep is False
    assert got[1].dup_word_frac == pytest.approx(1 - 6 / 60, abs=1e-5)


def test_ngram_repetition_golden(spark):
    df = spark.createDataFrame([(1, "a b a b a b c")], ["doc_id", "text"])
    r = _one(filters.ngram_repetition(df, "doc_id", "text"))
    assert r.n_chars == 13
    assert r.top_gram == "a b" and r.top_cnt == 3
    # 3 occurrences x len('a b')=3 chars / 13
    assert r.top2gram_char_frac == pytest.approx(9 / 13, abs=1e-5)
    # duplicated trigrams: 'a b a' x2 + 'b a b' x2, len 5 each
    assert r.dup3gram_char_frac == pytest.approx(20 / 13, abs=1e-5)


def test_ngram_repetition_short_doc_emits_row(spark):
    df = spark.createDataFrame(
        [(1, "hello"), (2, "x y"), (3, "")], ["doc_id", "text"])
    got = {r.doc_id: r for r in
           filters.ngram_repetition(df, "doc_id", "text").collect()}
    assert got[1].top_gram is None and got[1].top_cnt == 0
    assert got[1].top2gram_char_frac == 0.0
    assert got[1].dup3gram_char_frac == 0.0
    assert got[2].top_gram == "x y" and got[2].top_cnt == 1
    assert got[2].dup3gram_char_frac == 0.0  # no trigrams, still a row
    # empty text: n_chars 0 must not divide-by-zero under ANSI mode
    assert got[3].n_chars == 0 and got[3].top2gram_char_frac == 0.0


def test_ngram_repetition_tie_break_deterministic(spark):
    # 'b c' and 'a b' both occur once; tie -> lexicographically greatest
    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    r = _one(filters.ngram_repetition(df, "doc_id", "text"))
    assert r.top_gram == "b c" and r.top_cnt == 1


def test_redact_pii_golden(spark):
    txt = ("mail bob@x.co call +44-123-4567 ssn 078-05-1120 "
           "ip 192.168.0.1 done")
    df = spark.createDataFrame([(1, txt)], ["doc_id", "text"])
    r = _one(filters.redact_pii(df, ["text"]))
    assert r.text == ("mail <EMAIL> call <PHONE> ssn <SSN> "
                      "ip <IP> done")


def test_redact_pii_phone_with_extension_and_clean_text(spark):
    df = spark.createDataFrame(
        [(1, "x +1-555-0123-4567 y"), (2, "no pii here 12 34")],
        ["doc_id", "text"])
    got = {r.doc_id: r.text
           for r in filters.redact_pii(df, ["text"]).collect()}
    assert got[1] == "x <PHONE> y"
    assert got[2] == "no pii here 12 34"   # untouched


def test_clean_lines_golden(spark):
    txt = "one two three.\nshort\nfour five six seven\none two three."
    df = spark.createDataFrame([(1, txt)], ["doc_id", "text"])
    r = _one(filters.clean_lines(df, "doc_id", "text", min_words=3))
    assert r.n_lines == 4 and r.n_kept == 3
    assert r.clean_text == ("one two three.\nfour five six seven\n"
                            "one two three.")
    assert r.dup_line_frac == 0.25      # one duplicated line of four
    rt = _one(filters.clean_lines(df, "doc_id", "text", min_words=3,
                                  require_terminal=True))
    assert rt.n_kept == 2               # terminal-punctuation rule


def test_ngram_repetition_single_scan(spark, tmp_path):
    """The plan must read the source ONCE: both gram sizes explode from
    one projection and zero-gram docs ride the groupBy (no union of
    re-scans, no join-back)."""
    p = str(tmp_path / "d.parquet")
    spark.createDataFrame([(1, "a b c a b")], ["doc_id", "text"]) \
        .write.parquet(p)
    plan = filters.ngram_repetition(spark.read.parquet(p), "doc_id",
                                    "text")._jdf \
        .queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1


def test_gopher_stats_fuses_into_single_projection(spark):
    """The flags are projection-only: the optimized plan must contain
    no exchange (shuffle) at all."""
    df = spark.createDataFrame(
        [(i, f"doc {i} text here") for i in range(10)],
        ["doc_id", "text"])
    plan = filters.gopher_stats(df, "doc_id", "text")._jdf \
        .queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
