"""Training-mix builder: one spark-submit job chaining the corpus
pipeline — quality filter -> decontaminate -> near-dup dedup ->
per-language token budgets -> sequence packing.

    spark-submit --py-files dist/orc_haskell_spark.zip \
        scripts/corpus_job.py \
        --input <documents parquet/dir> --output <dir> \
        [--id-col doc_id] [--text-col text] [--lang-col lang] \
        [--quality-filter] [--decontam <bench parquet> [--decontam-n 13]] \
        [--dedup [--dedup-threshold 0.8]] \
        [--sample-tokens en=20000,de=5000] \
        [--pack <tokens> [--pack-shard-col source]]

Each stage is the oracle-checked library operator (pipeline/filters,
decontam, dedup, sampling, packing); the CLI only composes them, in the
order a real mix is built: drop low-quality docs first (cheapest),
remove eval contamination, collapse near-duplicate clusters to one
keeper, spend the per-language token budgets on what survives, then
pack the final mix into fixed-budget training sequences.

Outputs under --output:
  mix/          the surviving documents (all input columns)
  sequences/    (only with --pack) shard, seq_id, n_tokens, tokens
  stats.json    per-stage row/token accounting — the audit trail

Scale shape: every stage is Catalyst (no Python in the hot path); the
stages that shuffle do so once each on honest keys (doc id / stratum /
band), so the chain is a linear pipeline of the documented per-operator
plans — nothing here adds a join or shuffle the operators don't own.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_budgets(s: str) -> dict[str, int]:
    out: dict[str, int] = {}
    for term in s.split(","):
        k, sep, v = term.partition("=")
        if not sep or not k.strip() or not v.strip().isdigit():
            raise SystemExit(f"--sample-tokens {s!r}: use lang=N[,lang=N]")
        out[k.strip()] = int(v)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--lang-col", default="lang")
    ap.add_argument("--quality-filter", action="store_true",
                    help="drop docs failing the Gopher shape rules")
    ap.add_argument("--decontam", default=None, metavar="BENCH",
                    help="parquet of eval texts; drop docs sharing any "
                         "--decontam-n-gram with it")
    ap.add_argument("--decontam-n", type=int, default=13)
    ap.add_argument("--dedup", action="store_true",
                    help="MinHash-LSH near-dup clusters collapse to "
                         "their min-id keeper")
    ap.add_argument("--dedup-threshold", type=float, default=0.8)
    ap.add_argument("--sample-tokens", default=None,
                    help="per-language token budgets, e.g. en=20000,de=5000")
    ap.add_argument("--pack", type=int, default=None, metavar="TOKENS",
                    help="emit fixed-budget training sequences")
    ap.add_argument("--pack-shard-col", default=None)
    args = ap.parse_args()
    # validate BEFORE the expensive stages run: a malformed budget
    # string must fail at parse time, not after hours of dedup
    budgets = parse_budgets(args.sample_tokens) if args.sample_tokens \
        else None

    from pyspark.sql import SparkSession, functions as F

    from orc_haskell_spark.pipeline import (decontam, dedup, filters,
                                            packing, sampling)

    spark = (SparkSession.builder.appName("orc-haskell-spark-corpus")
             .config("spark.sql.session.timeZone", "UTC")
             .getOrCreate())
    ic, tc = args.id_col, args.text_col
    df = spark.read.parquet(args.input)
    stats = {"input_rows": df.count()}

    def _stage(name, out):
        # persist each stage boundary: the per-stage count AND the next
        # stage both read it, and without a cache every count replays
        # the whole upstream chain (stage N costs stages 1..N again)
        out = out.persist()
        stats[name] = out.count()
        df.unpersist()
        return out

    df = df.persist()
    if args.quality_filter:
        keep = filters.gopher_stats(df, ic, tc).filter("keep").select(ic)
        df = _stage("after_quality", df.join(keep, ic, "left_semi"))

    if args.decontam:
        bench = spark.read.parquet(args.decontam)
        df = _stage("after_decontam",
                    decontam.decontaminate(df, ic, tc, bench, tc,
                                           n=args.decontam_n))

    if args.dedup:
        pairs = dedup.minhash_lsh_pairs(df, ic, tc,
                                        threshold=args.dedup_threshold)
        clusters = dedup.dedup_clusters(df, pairs, ic)
        keepers = clusters.groupBy("cluster_id") \
            .agg(F.min(ic).alias(ic)).select(ic)
        df = _stage("after_dedup", df.join(keepers, ic, "left_semi"))

    if budgets is not None:
        df = _stage("after_sample", sampling.token_budget_mix(
            df, args.lang_col, ic, tc, budgets))

    mix_dir = os.path.join(args.output, "mix")
    df.write.mode("errorifexists").parquet(mix_dir)
    mix = spark.read.parquet(mix_dir)
    stats["mix_tokens"] = mix.agg(F.sum(F.size(F.split(
        F.col(tc), "\\s+")))).collect()[0][0] or 0

    if args.pack is not None:
        seqs = packing.pack_tokens(mix, ic, tc, args.pack,
                                   shard_col=args.pack_shard_col)
        seqs.write.mode("errorifexists").parquet(
            os.path.join(args.output, "sequences"))
        agg = spark.read.parquet(
            os.path.join(args.output, "sequences")) \
            .agg(F.count("*"), F.sum("n_tokens")).collect()[0]
        stats["sequences"] = agg[0]
        stats["sequence_tokens"] = agg[1] or 0

    blob = json.dumps(stats, indent=1)
    stats_path = os.path.join(args.output, "stats.json")
    if "://" in args.output:
        # object-store output: a local open() cannot create
        # s3://.../stats.json — write through Spark instead
        spark.createDataFrame([(blob,)], "v string").coalesce(1) \
            .write.mode("overwrite").text(stats_path)
    else:
        with open(stats_path, "w") as f:
            f.write(blob)
    print("stats:", json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
