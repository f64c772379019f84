"""Sequence packing: concatenate a document shard's token stream and
chop it into fixed-budget training sequences (the GPT-style
concat-and-split batch layout — every sequence is exactly ``budget``
tokens except a shard's last, and document boundaries fall wherever the
stream puts them).

Reference scope note: like the rest of ``pipeline/``, this is the
training-data layer around the codec engine; the reference
(HuwCampbell/orc-haskell) has no pipeline surface.

Semantics are DETERMINISTIC and closed-form, so the operator has an
exact DuckDB twin (tests/test_packing.py): within each shard, docs are
ordered by id; the shard's concatenated token stream is cut every
``budget`` tokens; each (doc x sequence) overlap becomes one plan row
carrying where the doc's tokens land.

100 TB shape:
- The cumulative offset is a window over (shard, id): ONE range+hash
  shuffle keyed by shard — skew-free when shards are balanced (use
  enough shards; a hash of url/doc_id is the natural shard key).
  No global sort: packing is per shard by construction, exactly like
  production pipelines that pack per data shard/file.
- The (doc x sequence) explode is narrow (a doc spanning k sequence
  boundaries emits k+1 rows, k ~ n_tokens/budget).
- ``pack_tokens`` materializes sequences with one further groupBy on
  (shard, seq_id) — token payloads shuffle once, map-side combined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .text import TOKEN_SPLIT


def pack_plan(df: DataFrame, id_col: str, text_col: str, budget: int,
              shard_col: str | None = None) -> DataFrame:
    """The packing layout, one row per (document x sequence) overlap:

    - ``shard``: the shard key ('' when ``shard_col`` is None)
    - ``seq_id``: 0-based sequence index within the shard
    - doc's ``tok_start``/``tok_len``: the slice of THIS doc's tokens
      (0-based) landing in this sequence
    - ``seq_tok_start``: where that slice begins inside the sequence

    Every sequence is exactly ``budget`` tokens except the shard's
    last. Zero-token docs emit no rows (nothing to place).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    shard = F.col(shard_col) if shard_col else F.lit("")
    toks = F.split(F.col(text_col), TOKEN_SPLIT)
    n = F.size(toks)
    w = Window.partitionBy("shard").orderBy(F.col(id_col)) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d = df.select(shard.alias("shard"), F.col(id_col),
                  n.alias("n_tokens")) \
        .withColumn("stream_end", F.sum("n_tokens").over(w)) \
        .withColumn("stream_start", F.col("stream_end") - F.col("n_tokens")) \
        .filter(F.col("n_tokens") > 0)
    # sequences this doc touches: floor(start/B) .. floor((end-1)/B)
    b = F.lit(budget)
    d = d.select(
        "shard", id_col, "n_tokens", "stream_start",
        F.explode(F.sequence(
            (F.col("stream_start") / b).cast("bigint"),
            ((F.col("stream_end") - 1) / b).cast("bigint"))).alias("seq_id"))
    seq_lo = F.col("seq_id") * b
    lo = F.greatest(F.col("stream_start"), seq_lo)
    hi = F.least(F.col("stream_start") + F.col("n_tokens"),
                 seq_lo + b)
    return d.select(
        "shard", F.col("seq_id"), F.col(id_col),
        (lo - F.col("stream_start")).alias("tok_start"),
        (hi - lo).alias("tok_len"),
        (lo - seq_lo).alias("seq_tok_start"))


def pack_tokens(df: DataFrame, id_col: str, text_col: str, budget: int,
                shard_col: str | None = None) -> DataFrame:
    """Materialized packed sequences: (shard, seq_id, n_tokens, tokens)
    with ``tokens`` the concatenated slice stream — exactly ``budget``
    tokens per row except each shard's last. One join back to the token
    arrays (broadcast-or-shuffle by id) and one groupBy (shard, seq_id);
    slice order inside a sequence is restored by sorting the collected
    (seq_tok_start, slice) structs — no assumption on agg order."""
    plan = pack_plan(df, id_col, text_col, budget, shard_col)
    toks = df.select(F.col(id_col),
                     F.split(F.col(text_col), TOKEN_SPLIT).alias("_toks"))
    j = plan.join(toks, id_col)
    piece = F.slice(F.col("_toks"), F.col("tok_start") + 1,
                    F.col("tok_len"))
    agg = j.groupBy("shard", "seq_id").agg(
        F.flatten(F.transform(
            F.array_sort(F.collect_list(
                F.struct(F.col("seq_tok_start"), piece.alias("p")))),
            lambda s: s.p)).alias("tokens"))
    return agg.select("shard", "seq_id",
                      F.size("tokens").alias("n_tokens"), "tokens")
