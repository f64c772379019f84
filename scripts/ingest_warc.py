"""Crawl ingestion job: WARC archives -> pages table (spark-submit).

    spark-submit --py-files dist/orc_haskell_spark.zip \
        scripts/ingest_warc.py \
        --input <dir of .warc/.warc.gz> --output <table dir> \
        [--partitions N] [--extract main|visible|none] [--lang-id] \
        [--keep-status 200-299 | all] [--lenient] [--commit-iceberg] \
        [--append]

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
    args = ap.parse_args()
    status = parse_status(args.keep_status)

    from pyspark.sql import Observation, SparkSession
    from pyspark.sql import functions as F

    from orc_haskell_spark import warc
    from orc_haskell_spark.pipeline import text

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
    df = warc.read_warc(spark, args.input,
                        num_partitions=args.partitions,
                        strict=not args.lenient,
                        extract=None if args.extract == "none"
                        else args.extract)
    if status is not None:
        df = df.filter(F.col("status").between(*status))
    if args.extract == "none":
        df = df.withColumn("text", F.lit(None).cast("string"))
    if args.lang_id and args.extract != "none":
        # Catalyst expression, no extra pass; 'und' when no votes
        df = df.withColumn("lang", text._langid_cols("text")[0])
    else:
        df = df.withColumn("lang", F.lit("und"))
    df = df.select("url", "warc_ts", "html", "text", "lang")

    obs = Observation("ingest")
    df = df.observe(obs, F.count(F.lit(1)).alias("rows"),
                    F.sum(F.length("html")).alias("html_bytes"))
    df.write.mode("append" if args.append else "errorifexists") \
        .parquet(data_dir)
    print(f"ingested rows={obs.get['rows']} "
          f"html_bytes={obs.get['html_bytes']}")
    _maybe_commit(args, data_dir)
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
