"""Crawl ingestion job: WARC archives -> pages table (spark-submit).

    spark-submit --py-files dist/orc_haskell_spark.zip \
        scripts/ingest_warc.py \
        --input <dir of .warc/.warc.gz> --output <table dir> \
        [--partitions N] [--extract main|visible|none] [--lang-id] \
        [--keep-status 200-299 | all] [--lenient] [--commit-iceberg] \
        [--append] [--follow [--poll-interval S] [--max-files-per-batch N]]

Front end of the north-rule pipeline: Common-Crawl-style WARC files in,
the BASELINE.json input_hint pages table out —
(url, warc_ts, html, text, lang) — ready for scripts/encode_job.py:

    ingest_warc.py --input crawl/ --output pages/ --commit-iceberg
    encode_job.py  --input pages/ --output encoded/ --fused

Shape at scale: read_warc gives chunk-granular parallelism (whole
files, or CDX-indexed byte ranges for fat archives; LPT-packed by
compressed size; streaming member inflate); extraction and lang-id are
narrow maps (no shuffle anywhere in the job); the parquet write is
Spark's own committer. Row counts come from an Observation piggybacked
on the write job — no second pass over the data. --commit-iceberg
publishes the written parts as ONE append snapshot via
iceberg.commit_parquet_dir, which is idempotent per part: re-running
it commits only parts not yet in the table.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_status(s: str):
    if s == "all":
        return None
    lo, sep, hi = s.partition("-")
    try:
        return (int(lo), int(hi) if sep else int(lo))
    except ValueError:
        raise SystemExit(f"--keep-status {s!r}: use LO-HI, one code, "
                         f"or 'all'") from None


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="directory of .warc/.warc.gz files")
    ap.add_argument("--output", required=True,
                    help="pages table dir (parquet under <output>/data)")
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--extract", default="main",
                    choices=["main", "visible", "none"],
                    help="html->text extraction mode (none: NULL text)")
    ap.add_argument("--lang-id", action="store_true",
                    help="stopword-vote language id over the extracted "
                         "text (lang='und' without --extract)")
    ap.add_argument("--keep-status", default="200-299",
                    help="HTTP status filter: LO-HI, one code, or 'all'")
    ap.add_argument("--lenient", action="store_true",
                    help="skip corrupt gzip members/records instead of "
                         "failing the task")
    ap.add_argument("--commit-iceberg", action="store_true",
                    help="create/commit <output> as an Iceberg table "
                         "(one append snapshot over the written parts)")
    ap.add_argument("--append", action="store_true",
                    help="add this crawl's rows to an existing pages "
                         "table; without it a second run into the same "
                         "output fails loudly (a re-run of the same "
                         "crawl would silently duplicate every row)")
    ap.add_argument("--fused", action="store_true",
                    help="write the pages parquet INSIDE the scan "
                         "worker (rename-on-commit parts, zero payload "
                         "JVM crossing — the fused-sink shape); "
                         "incompatible with --lang-id (language id is "
                         "a Catalyst pass over the committed table)")
    ap.add_argument("--follow", action="store_true",
                    help="incremental mode: drain only archives that "
                         "landed since the last --follow run (streaming "
                         "source + checkpoint under <output>); "
                         "rerunnable forever — the cron-style tail of a "
                         "live crawl. Requires monotone relative paths "
                         "(timestamped names or per-batch subdirs)")
    ap.add_argument("--poll-interval", type=float, default=None,
                    metavar="SECONDS",
                    help="with --follow: keep running, draining newly "
                         "landed archives every SECONDS until killed "
                         "(default: one drain, then exit)")
    ap.add_argument("--max-files-per-batch", type=int, default=0,
                    help="with --follow: admission control — cap the "
                         "archives per micro-batch (0 = unlimited)")
    ap.add_argument("--dedup-index", default=None, metavar="DIR",
                    help="with --follow: near-dup-check each drained "
                         "batch against every page crawled so far "
                         "(persisted MinHash-LSH index at DIR, exact "
                         "Jaccard verification); distinct-url pairs "
                         "land under <output>/dup_pairs/batch=N. "
                         "Requires --extract")
    args = ap.parse_args()
    status = parse_status(args.keep_status)
    if args.follow:
        if args.fused:
            raise SystemExit("--follow is incompatible with --fused "
                             "(the stream sink is its own exactly-once "
                             "shape)")
        if args.append:
            raise SystemExit("--follow is always incremental; drop "
                             "--append")
        if args.dedup_index and args.extract == "none":
            raise SystemExit("--dedup-index needs extracted text "
                             "(--extract main|visible)")
        follow(args, status)
        return
    if args.poll_interval is not None or args.max_files_per_batch \
            or args.dedup_index:
        raise SystemExit("--poll-interval/--max-files-per-batch/"
                         "--dedup-index need --follow")

    from pyspark.sql import Observation, SparkSession
    from pyspark.sql import functions as F

    from orc_haskell_spark import warc

    spark = (SparkSession.builder.appName("orc-haskell-spark-ingest")
             .config("spark.sql.session.timeZone", "UTC")
             .getOrCreate())
    data_dir = os.path.join(args.output, "data")

    if args.fused:
        if args.lang_id:
            raise SystemExit("--fused is incompatible with --lang-id "
                             "(run language id as a Catalyst pass over "
                             "the committed table)")
        if os.path.isdir(data_dir) and os.listdir(data_dir) \
                and not args.append:
            raise SystemExit(f"{data_dir} already exists and is not "
                             f"empty (use --append for incremental "
                             f"crawls)")
        summary = warc.write_pages_parquet(
            spark, args.input, data_dir,
            num_partitions=args.partitions,
            strict=not args.lenient,
            extract=None if args.extract == "none" else args.extract,
            status_range=status).collect()
        print(f"ingested rows={sum(r.n_rows for r in summary)} "
              f"parquet_bytes={sum(r.nbytes for r in summary)}")
        _maybe_commit(args, data_dir)
        spark.stop()
        return

    # extraction runs INSIDE the scan worker (read_warc extract=):
    # a separate extract_df stage would ship every html payload
    # Python->JVM->Python between two mapInArrow stages (~2x slower)
    df = _to_pages(warc.read_warc(spark, args.input,
                                  num_partitions=args.partitions,
                                  strict=not args.lenient,
                                  extract=None if args.extract == "none"
                                  else args.extract), args, status)

    obs = Observation("ingest")
    df = df.observe(obs, F.count(F.lit(1)).alias("rows"),
                    F.sum(F.length("html")).alias("html_bytes"))
    df.write.mode("append" if args.append else "errorifexists") \
        .parquet(data_dir)
    print(f"ingested rows={obs.get['rows']} "
          f"html_bytes={obs.get['html_bytes']}")
    _maybe_commit(args, data_dir)
    spark.stop()


def _to_pages(df, args, status):
    """Scanned WARC rows -> the pages schema. ONE implementation shared
    by the batch path and every --follow micro-batch, so the two tables
    can never silently diverge."""
    from pyspark.sql import functions as F

    from orc_haskell_spark.pipeline import text

    if status is not None:
        df = df.filter(F.col("status").between(*status))
    if args.extract == "none":
        df = df.withColumn("text", F.lit(None).cast("string"))
    if args.lang_id and args.extract != "none":
        # Catalyst expression, no extra pass; 'und' when no votes
        df = df.withColumn("lang", text._langid_cols("text")[0])
    else:
        df = df.withColumn("lang", F.lit("und"))
    return df.select("url", "warc_ts", "html", "text", "lang")


def follow(args, status) -> None:
    """Incremental ingest: one availableNow drain of the warc_stream
    source per call (looped with --poll-interval). Exactly-once pages
    parts without relying on the sink's own atomicity:

    - each micro-batch stages to <output>/_staging/batch-<id>, then
      renames into <output>/data as batch<id>-p<i>.parquet. A replayed
      batch (crash before the checkpoint commit) first deletes its own
      stale parts, so duplicate part names are impossible and committed
      batches are never touched.
    - the Iceberg commit runs only AFTER a drain terminates — i.e.
      after every batch's checkpoint commit — so a replay can never
      rewrite a file some snapshot already references.
    """
    import glob
    import shutil
    import time

    import pyarrow.parquet as pq
    from pyspark.sql import SparkSession

    from orc_haskell_spark.pipeline import dedup
    from orc_haskell_spark.warc_stream import WarcStreamDataSource

    spark = (SparkSession.builder.appName("orc-haskell-spark-ingest")
             .config("spark.sql.session.timeZone", "UTC")
             .getOrCreate())
    spark.dataSource.register(WarcStreamDataSource)
    data_dir = os.path.join(args.output, "data")
    stage_root = os.path.join(args.output, "_staging")
    os.makedirs(data_dir, exist_ok=True)

    def sink(batch_df, batch_id: int) -> None:
        df = _to_pages(batch_df, args, status)

        stage = os.path.join(stage_root, f"batch-{batch_id}")
        shutil.rmtree(stage, ignore_errors=True)
        df.write.mode("overwrite").parquet(stage)
        # replayed batch: clear ITS stale parts (never another batch's)
        for old in glob.glob(
                os.path.join(data_dir, f"batch{batch_id:06d}-*.parquet")):
            os.remove(old)
        rows = 0
        kept = 0
        for part in sorted(glob.glob(os.path.join(stage, "part-*"))):
            n = pq.read_metadata(part).num_rows
            if n == 0:
                continue                 # no 0-row data files in the table
            os.replace(part, os.path.join(
                data_dir, f"batch{batch_id:06d}-p{kept:05d}.parquet"))
            rows += n
            kept += 1
        shutil.rmtree(stage, ignore_errors=True)
        dups = ""
        if args.dedup_index and rows:
            # distinct-url near-dups of THIS batch vs everything crawled
            # so far + itself; replaying the batch overwrites its own
            # index rows and pairs dir, so this stays exactly-once too
            batch_pages = spark.read.parquet(
                os.path.join(data_dir, f"batch{batch_id:06d}-*.parquet"))
            # extraction-failed/empty pages all share the degenerate
            # shingle set [""] — k such pages would verify as O(k^2)
            # jacc=1.0 pairs; they are not near-dup signal
            batch_pages = batch_pages.filter(
                "text is not null and length(text) > 0")
            pairs = dedup.dedup_incremental(
                spark, batch_pages, "url", "text", args.dedup_index,
                batch_id=str(batch_id))
            pairs.write.mode("overwrite").parquet(os.path.join(
                args.output, "dup_pairs", f"batch={batch_id}"))
            dups = f" dup_pairs={pairs.count()}"
        print(f"batch {batch_id}: rows={rows} parts={kept}{dups}")

    reader = (spark.readStream.format("warc_stream")
              .option("strict", "false" if args.lenient else "true"))
    if args.extract != "none":
        reader = reader.option("extract", args.extract)
    if args.max_files_per_batch:
        reader = reader.option("max_files_per_batch",
                               str(args.max_files_per_batch))
    ckpt = os.path.join(args.output, "_checkpoint")

    while True:
        (reader.load(args.input).writeStream.foreachBatch(sink)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start().awaitTermination())
        if os.listdir(data_dir):
            _maybe_commit(args, data_dir)
        if args.poll_interval is None:
            break
        time.sleep(args.poll_interval)
    spark.stop()


def _maybe_commit(args, data_dir: str) -> None:
    if not args.commit_iceberg:
        return
    import pyarrow as pa

    from orc_haskell_spark import iceberg

    hint = os.path.join(args.output, "metadata", "version-hint.text")
    if not os.path.exists(hint):
        schema = pa.schema([
            ("url", pa.string()),
            ("warc_ts", pa.timestamp("us", tz="UTC")),
            ("html", pa.binary()),
            ("text", pa.string()),
            ("lang", pa.string()),
        ])
        iceberg.create_table(args.output, schema)
    snap = iceberg.commit_parquet_dir(args.output, data_dir)
    if snap is None:
        print("iceberg commit: nothing new")
    else:
        print("iceberg commit: snapshot", snap["snapshot-id"])


if __name__ == "__main__":
    main()
