"""Benchmark decontamination: flag/drop training documents that share
word n-grams with an evaluation set (the GPT-3 appendix-C / PaLM
hygiene step — any shared 13-gram marks a training doc contaminated).

Reference scope note: the reference engine (HuwCampbell/orc-haskell) is
a columnar codec; like the rest of ``pipeline/``, this is the
corpus-hygiene layer a crawl-scale training pipeline needs around the
codec. Pure Catalyst with an exact DuckDB twin (pinned in
tests/test_decontam.py).

100 TB shape:
- The eval set is SMALL by construction (benchmarks are thousands of
  documents, not billions): its distinct n-grams build once and
  BROADCAST, so the gram join is map-side — no shuffle of the corpus's
  exploded grams.
- Each document explodes to ~word_count gram rows, but those rows live
  only inside one stage: the broadcast join and the map-side partial
  aggregation collapse them back to one row per document before the
  single (skew-free, doc-id-keyed) shuffle.
- At petabyte corpus scale the gram strings never shuffle — only
  per-doc partial counts do. For an eval set too big to broadcast as
  strings, pre-hash both sides (xxhash64) to shrink the broadcast 10x;
  the string default keeps the oracle twin exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .filters import WORD_SEP, _gram_col

DEFAULT_N = 13


def benchmark_ngrams(bench_df: DataFrame, text_col: str,
                     n: int = DEFAULT_N) -> DataFrame:
    """Distinct word n-grams of the evaluation set: one column ``gram``.
    Small enough to broadcast (distinct grams of an eval set)."""
    return (bench_df
            .select(F.split(F.col(text_col), WORD_SEP).alias("w"))
            .select(F.explode(_gram_col(n)).alias("gram"))
            .distinct())


def contamination(df: DataFrame, id_col: str, text_col: str,
                  bench_df: DataFrame, bench_text_col: str = "text",
                  n: int = DEFAULT_N,
                  max_hit_frac: float = 0.0) -> DataFrame:
    """Per-document contamination statistics against an eval set:

    - ``ngram_count``: the doc's word-``n``-gram occurrences
    - ``contaminated_ngrams``: occurrences matching any eval-set gram
    - ``contamination_frac``: their ratio (0.0 for docs with < n words)
    - ``contaminated``: frac > ``max_hit_frac`` (default 0.0 = the
      GPT-3 rule: ANY shared n-gram contaminates)

    Docs shorter than ``n`` words still emit a row (explode_outer keeps
    a null-gram row), counted as clean.
    """
    grams = (df
             .select(F.col(id_col), F.split(F.col(text_col),
                                            WORD_SEP).alias("w"))
             .select(id_col, F.explode_outer(_gram_col(n)).alias("gram")))
    bench = benchmark_ngrams(bench_df, bench_text_col, n) \
        .withColumn("hit", F.lit(1))
    joined = grams.join(F.broadcast(bench), "gram", "left")
    agg = joined.groupBy(id_col).agg(
        F.count("gram").alias("ngram_count"),
        F.count("hit").alias("contaminated_ngrams"))
    frac = F.when(F.col("ngram_count") > 0,
                  F.col("contaminated_ngrams") / F.col("ngram_count")) \
        .otherwise(F.lit(0.0))
    return agg.select(
        id_col, "ngram_count", "contaminated_ngrams",
        F.round(frac, 6).alias("contamination_frac"),
        (frac > max_hit_frac).alias("contaminated"))


def decontaminate(df: DataFrame, id_col: str, text_col: str,
                  bench_df: DataFrame, bench_text_col: str = "text",
                  n: int = DEFAULT_N,
                  max_hit_frac: float = 0.0) -> DataFrame:
    """The training rows that survive decontamination: ``df`` minus
    documents whose contamination exceeds ``max_hit_frac``. The
    contaminated-id side of the anti-join is a tiny fraction of the
    corpus in practice; AQE converts it to a broadcast anti-join at
    runtime when it is."""
    bad = contamination(df, id_col, text_col, bench_df, bench_text_col,
                        n, max_hit_frac) \
        .filter("contaminated").select(id_col)
    return df.join(bad, id_col, "left_anti")
