"""Webtext quality filtering for training-data pipelines: Gopher-style
document shape/repetition statistics, C4-style line cleaning, and PII
redaction.

Reference scope note: the reference engine (HuwCampbell/orc-haskell) is
a columnar codec; these operators are the pipeline layer a crawl-scale
corpus needs *around* the codec (the same role as `pipeline/text.py` /
`pipeline/dedup.py`). Everything here is pure Catalyst — projections,
higher-order array functions, and (for n-gram repetition only) an
explode → partial-aggregate groupBy keyed by (doc, gram) — so plans stay
in whole-stage codegen with no Python in the hot path, and every
operator has an exact DuckDB-SQL twin for the driver's oracle check.

100 TB shape:
- ``gopher_stats`` / ``redact_pii`` / ``clean_lines`` are row-wise
  projections over one scan: no shuffle, trivially scalable.
- ``ngram_repetition`` shuffles on (id, n, gram) — the doc id is in the
  key, so the shuffle is skew-free regardless of gram popularity, and
  Spark's partial aggregation combines map-side. A second agg keyed by
  id reduces to one row per doc. This is the scalable alternative to
  computing an in-array mode via O(words^2) higher-order lambdas.

Threshold defaults follow the published Gopher rules (Rae et al. 2021,
"Scaling Language Models", table A1) and C4 (Raffel et al. 2020 §2.2),
adapted where the corpus shape demands (word-level rather than
line-level repetition when source text is single-line).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from .text import STOPWORDS

# plain single-space split, mirrored by DuckDB string_split(text, ' ');
# \s+ would differ from DuckDB's regex dialect on exotic whitespace
WORD_SEP = " "

# (pattern, replacement) applied IN ORDER (phone before SSN: the SSN
# shape [0-9]{3}-[0-9]{2}-[0-9]{4} can match inside a longer phone).
# Patterns are in the Java-regex / RE2 common subset so the Spark
# expression and the DuckDB oracle behave identically.
PII_RULES = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\+[0-9]{1,3}-[0-9]{3}-[0-9]{3,4}-?[0-9]{0,4}", "<PHONE>"),
    (r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    (r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
]


def _words(text_col: str) -> Column:
    return F.split(F.col(text_col), WORD_SEP)


def gopher_cols(text_col: str, min_words: int = 50, max_words: int = 100000,
                min_mean_word_len: float = 3.0,
                max_mean_word_len: float = 10.0,
                min_alpha_word_frac: float = 0.80,
                min_stopword_hits: int = 2) -> list[Column]:
    """Gopher document-shape statistics + keep flag as one projection.

    - word_count bounds (Gopher: 50..100k words)
    - mean word length bounds (Gopher: 3..10 chars)
    - fraction of purely-alphabetic words (Gopher: >=80% words must
      contain an alphabetic character; our corpus is tokenized enough
      that all-alpha is the faithful analog)
    - duplicate-word fraction (word-level analog of Gopher's duplicate
      line fraction, for single-line source text)
    - English stopword hits (Gopher: >=2 of a small "the/of/to/and"
      list must appear)
    """
    w = _words(text_col)
    wc = F.size(w)
    char_sum = F.aggregate(w, F.lit(0).cast("bigint"),
                           lambda acc, x: acc + F.length(x))
    mean_wl = char_sum / wc
    alpha = F.size(F.filter(w, lambda x: x.rlike("^[A-Za-z]+$"))) / wc
    dupf = 1 - F.size(F.array_distinct(w)) / wc
    stop = F.size(F.filter(w, lambda x: x.isin(STOPWORDS["en"])))
    keep = ((wc >= min_words) & (wc <= max_words)
            & (mean_wl >= min_mean_word_len)
            & (mean_wl <= max_mean_word_len)
            & (alpha >= min_alpha_word_frac)
            & (stop >= min_stopword_hits))
    return [
        wc.alias("word_count"),
        F.round(mean_wl, 5).alias("mean_word_len"),
        F.round(alpha, 5).alias("alpha_word_frac"),
        F.round(dupf, 5).alias("dup_word_frac"),
        stop.alias("stopword_hits"),
        keep.alias("keep"),
    ]


def gopher_stats(df: DataFrame, id_col: str, text_col: str,
                 **thresholds) -> DataFrame:
    """Per-document Gopher quality statistics and keep/drop flag.
    Pure projection — fuses into any scan."""
    return df.select(F.col(id_col), *gopher_cols(text_col, **thresholds))


def redact_cols(text_col: str) -> Column:
    """PII-redacted text expression: email, international phone, SSN,
    IPv4, applied in PII_RULES order (all occurrences each)."""
    out = F.col(text_col)
    for pat, rep in PII_RULES:
        out = F.regexp_replace(out, pat, rep)
    return out


def redact_pii(df: DataFrame, text_cols: list[str]) -> DataFrame:
    """Replace PII spans in the given text columns in place. Row-wise
    regexp_replace chain — whole-stage codegen, no shuffle."""
    for c in text_cols:
        df = df.withColumn(c, redact_cols(c))
    return df


def redact_sql(expr: str) -> str:
    """DuckDB twin of redact_cols for oracle construction."""
    out = expr
    for pat, rep in PII_RULES:
        p = pat.replace("'", "''")
        out = f"regexp_replace({out}, '{p}', '{rep}', 'g')"
    return out


def _gram_col(n: int) -> Column:
    """Word n-grams via transform(sequence(...)) — empty array when the
    doc has fewer than n words (sequence(0, negative) would count DOWN
    in Spark, so the guard is load-bearing)."""
    return F.expr(
        f"case when size(w) >= {n} then "
        f"transform(sequence(0, size(w) - {n}), "
        f"i -> concat_ws(' ', slice(w, i + 1, {n}))) "
        f"else array() end")


def ngram_repetition(df: DataFrame, id_col: str, text_col: str,
                     top_n: int = 2, dup_n: int = 3) -> DataFrame:
    """Gopher repetition statistics per document:

    - ``top{top_n}gram_char_frac``: characters covered by occurrences of
      the single most frequent word-``top_n``-gram, as a fraction of the
      doc's characters (Gopher rule: drop if top-2-gram frac > 0.20).
      Ties break to the lexicographically greatest gram (deterministic,
      mirrored in the oracle).
    - ``dup{dup_n}gram_char_frac``: characters covered by all
      occurrences of duplicated ``dup_n``-grams (count >= 2), as a
      fraction of doc characters (Gopher: drop if dup-3-gram > 0.18).
      Overlapping occurrences are counted independently, as in the
      published heuristic.

    Plan: ONE scan — both gram sizes are built as (n, gram) structs in
    a single projection, concatenated and explode_outer'd (the outer
    keeps zero-gram docs as a null-gram row, so no join-back to the doc
    list is needed), then one groupBy keyed (id, n, gram) with map-side
    partial aggregation, a per-doc window for the top gram, and a final
    groupBy(id) pivot.
    """
    from .dedup import _spread

    df = _spread(df)
    ns = sorted({top_n, dup_n})

    def _tag(n):
        # single-arg lambda: F.transform passes (element, index) to a
        # TWO-arg callable, so `lambda g, n=n:` would bind the array
        # index over the n-gram size
        return lambda g: F.struct(F.lit(n).alias("n"), g.alias("gram"))

    gram_arrays = [F.transform(_gram_col(n), _tag(n)) for n in ns]
    base = df.select(F.col(id_col), _words(text_col).alias("w"),
                     F.length(text_col).alias("n_chars"))
    ex = base.select(
        id_col, "n_chars",
        F.explode_outer(F.concat(*gram_arrays)).alias("g"))
    cnt = ex.groupBy(id_col, "g").agg(
        F.count("*").alias("cnt"), F.first("n_chars").alias("n_chars"))
    win = Window.partitionBy(id_col, F.col("g.n")).orderBy(
        F.col("cnt").desc(), F.col("g.gram").desc())
    ranked = cnt.withColumn("rn", F.row_number().over(win))
    # the null-g rows (zero-gram docs) contribute to no when() but keep
    # their doc id in the final groupBy — every doc emits a row
    per_doc = ranked.groupBy(id_col).agg(
        F.first("n_chars").alias("n_chars"),
        F.max(F.when((F.col("g.n") == top_n) & (F.col("rn") == 1),
                     F.col("g.gram"))).alias("top_gram"),
        F.max(F.when((F.col("g.n") == top_n) & (F.col("rn") == 1),
                     F.col("cnt"))).alias("_top_cnt"),
        F.sum(F.when((F.col("g.n") == top_n) & (F.col("rn") == 1),
                     F.col("cnt") * F.length("g.gram"))).alias("_topc"),
        F.sum(F.when((F.col("g.n") == dup_n) & (F.col("cnt") >= 2),
                     F.col("cnt") * F.length("g.gram"))).alias("_dupc"))
    # empty text has n_chars 0 and zero grams: divide by max(1, ...) so
    # the fractions come out 0.0 instead of an ANSI divide-by-zero
    denom = F.greatest(F.col("n_chars"), F.lit(1))
    return per_doc.select(
        F.col(id_col),
        F.col("n_chars"),
        F.col("top_gram"),
        F.coalesce("_top_cnt", F.lit(0)).alias("top_cnt"),
        F.round(F.coalesce(F.col("_topc"), F.lit(0)) / denom,
                5).alias(f"top{top_n}gram_char_frac"),
        F.round(F.coalesce(F.col("_dupc"), F.lit(0)) / denom,
                5).alias(f"dup{dup_n}gram_char_frac"))


def line_clean_cols(text_col: str, min_words: int = 3,
                    require_terminal: bool = False) -> list[Column]:
    """C4-style line cleaning expressions over newline-delimited text:
    keep lines with >= min_words words (C4 uses >=3 for the word filter)
    and, optionally, terminal punctuation (C4's end-in-punctuation
    rule). Also emits the duplicate-line fraction (Gopher rule)."""
    lines = F.split(F.col(text_col), "\n")
    word_ok = lambda l: F.size(F.split(F.trim(l), WORD_SEP)) >= min_words
    if require_terminal:
        keep_l = lambda l: word_ok(l) & l.rlike('[.!?"]$')
    else:
        keep_l = word_ok
    kept = F.filter(lines, keep_l)
    return [
        F.array_join(kept, "\n").alias("clean_text"),
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept"),
        F.round(1 - F.size(F.array_distinct(lines)) / F.size(lines),
                5).alias("dup_line_frac"),
    ]


def clean_lines(df: DataFrame, id_col: str, text_col: str,
                min_words: int = 3,
                require_terminal: bool = False) -> DataFrame:
    """C4-style line filter: rebuilt text from kept lines plus line
    counts and the duplicate-line fraction. Pure projection."""
    return df.select(F.col(id_col),
                     *line_clean_cols(text_col, min_words,
                                      require_terminal))
