"""Deterministic sampling for training-data mixes: hash-threshold
row sampling and stratified per-group quotas.

``df.sample()`` is nondeterministic across runs/partitionings — useless
for reproducible corpus mixes. These operators key every decision on
md5 of a stable row key, so the same (key, seed, rate) always selects
the same rows on any cluster layout, and the selection is exactly
reproducible in ANSI SQL (the oracle compares md5 STRINGS
lexicographically — hex digits are ASCII-ordered, so no engine-specific
hex->int conversion is needed).

100 TB shape: ``hash_sample`` is a pure filter (no shuffle, fuses into
the scan); ``stratified_quota`` is one window keyed by the stratum
(skew-safe for realistic strata like language — the hot stratum's rows
hash-sort within one partition chain; for a pathological single-stratum
corpus use hash_sample per stratum instead).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from .text import TOKEN_SPLIT

_SPAN = 1 << 32     # md5 8-hex-digit prefix space


def _rank_col(key_col: str, seed: str) -> Column:
    # coalesce: a NULL key must hash deterministically, not produce a
    # NULL rank — a null rank silently DROPS the row from hash_sample
    # even at rate 1.0 (null < threshold is null)
    key = F.coalesce(F.col(key_col).cast("string"), F.lit("<null>"))
    return F.md5(F.concat(F.lit(seed), F.lit("|"), key))


def _key_sql(key_expr: str, seed: str) -> str:
    return (f"md5('{seed}' || '|' || "
            f"coalesce(CAST({key_expr} AS VARCHAR), '<null>'))")


def _threshold(rate: float) -> str:
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return format(min(int(rate * _SPAN), _SPAN - 1), "08x")


def hash_sample(df: DataFrame, key_col: str, rate: float,
                seed: str = "ohs") -> DataFrame:
    """Keep rows whose md5(seed|key) falls below the rate threshold.
    Deterministic: same inputs -> same rows, independent of
    partitioning, run, or engine. Exact-SQL twin:
    ``WHERE md5(seed || '|' || CAST(key AS VARCHAR)) < '<threshold>'``.
    """
    return df.filter(_rank_col(key_col, seed) < F.lit(_threshold(rate)))


def hash_sample_sql(key_expr: str, rate: float, seed: str = "ohs") -> str:
    """DuckDB WHERE-clause twin of hash_sample."""
    return f"{_key_sql(key_expr, seed)} < '{_threshold(rate)}'"


def stratified_quota(df: DataFrame, strata_col: str, key_col: str,
                     quota: int, seed: str = "ohs") -> DataFrame:
    """At most ``quota`` rows per stratum, chosen by hash order (the
    lowest md5(seed|key) ranks first — a deterministic uniform draw).
    The per-language quota is how training-data mixes rebalance a
    crawl corpus; hash order makes the draw stable as the corpus
    grows: a row only leaves the sample when enough new rows hash
    below it."""
    if quota < 0:
        raise ValueError(f"quota must be >= 0, got {quota}")
    w = Window.partitionBy(strata_col).orderBy(
        _rank_col(key_col, seed), F.col(key_col))
    # collision-proof temp name: withColumn would silently overwrite
    # (then drop) a pre-existing user column of the same name
    hr = "_hr"
    while hr in df.columns:
        hr += "_"
    return (df.withColumn(hr, F.row_number().over(w))
              .filter(F.col(hr) <= quota).drop(hr))


def stratified_quota_sql(table: str, strata_col: str, key_col: str,
                         quota: int, seed: str = "ohs") -> str:
    """DuckDB twin of stratified_quota (same window, same tie-break)."""
    return (
        f"SELECT * EXCLUDE (_hr) FROM ("
        f"SELECT *, row_number() OVER (PARTITION BY {strata_col} "
        f"ORDER BY {_key_sql(key_col, seed)}, "
        f"{key_col}) AS _hr FROM {table}) WHERE _hr <= {quota}")


def _budget_col(strata_col: str, budgets: dict[str, int]) -> Column:
    for v in budgets.values():
        if v < 0:
            raise ValueError(f"budgets must be >= 0, got {v}")
    out = F.lit(-1)     # unlisted stratum: cum >= 1 > -1 drops every row
    for k, v in budgets.items():
        out = F.when(F.col(strata_col) == k, F.lit(v)).otherwise(out)
    return out


def token_budget_mix(df: DataFrame, strata_col: str, key_col: str,
                     text_col: str, budgets: dict[str, int],
                     seed: str = "ohs") -> DataFrame:
    """Per-stratum TOKEN budgets — how training mixes are actually
    specced ("20B tokens of en, 5B of de"). Rows rank by hash order
    (the stratified_quota draw) and a row survives while the stratum's
    running token total, itself included, stays within the stratum's
    budget; strata missing from ``budgets`` are dropped. Deterministic
    on any partitioning; same window shuffle shape (one window keyed by
    the stratum) and the same growth stability as stratified_quota."""
    nt = F.size(F.split(F.col(text_col), TOKEN_SPLIT))
    w = Window.partitionBy(strata_col) \
        .orderBy(_rank_col(key_col, seed), F.col(key_col)) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ct = "_ct"
    while ct in df.columns:
        ct += "_"
    return (df.withColumn(ct, F.sum(nt).over(w))
              .filter(F.col(ct) <= _budget_col(strata_col, budgets))
              .drop(ct))


def token_budget_mix_sql(table: str, strata_col: str, key_col: str,
                         text_col: str, budgets: dict[str, int],
                         seed: str = "ohs") -> str:
    """DuckDB twin of token_budget_mix (same window, same tie-break,
    same inclusive-cumsum budget rule)."""
    case = " ".join(f"WHEN '{k}' THEN {v}" for k, v in budgets.items())
    return (
        f"SELECT * EXCLUDE (_ct) FROM ("
        f"SELECT *, sum(len(string_split_regex({text_col}, '\\s+'))) "
        f"OVER (PARTITION BY {strata_col} "
        f"ORDER BY {_key_sql(key_col, seed)}, {key_col} "
        f"ROWS UNBOUNDED PRECEDING) AS _ct FROM {table}) "
        f"WHERE _ct <= CASE {strata_col} {case} ELSE -1 END")
