"""Checkpointed per-partition stripe manifests: lineage + metrics + resume.

The reference's Footer is a stripe directory (offsets, row counts) that
lets a reader resume mid-file (StripeInformation,
src/Orc/Schema/Types.hs:79-90; ColumnStatistics :115-128). At cluster
scale that becomes a manifest *table*: one row per (part_id, stripe),
carrying rows/bytes/codec-choice metrics and a lineage stamp (source,
config hash), checkpointed next to the encoded data so an interrupted
run re-encodes only missing partitions.

Layout under `path/`:
  stripes/part_id=N/...parquet   encoded stripe rows (engine.ENCODED_DDL)
  manifest/...parquet            stripe directory w/o blobs + lineage
"""

from __future__ import annotations

import hashlib
import json
import os

from . import engine


def _config_hash(config: dict | None, stripe_rows: int) -> str:
    blob = json.dumps({"config": config or {}, "stripe_rows": stripe_rows},
                      sort_keys=True)
    return hashlib.sha256(blob.encode()).hexdigest()[:16]


def _part_expr(partition_key, num_partitions: int):
    from pyspark.sql import functions as F

    cols = [partition_key] if isinstance(partition_key, str) else list(partition_key)
    return F.pmod(F.xxhash64(*cols), F.lit(num_partitions)).cast("int")


def completed_parts(spark, path: str) -> set[int]:
    mpath = os.path.join(path, "manifest")
    try:
        rows = spark.read.parquet(mpath).select("part_id").distinct().collect()
        return {r.part_id for r in rows}
    except Exception:
        return set()


def encode_to_dir(df, path: str, partition_key="url", num_partitions: int = 32,
                  stripe_rows: int = engine.DEFAULT_STRIPE_ROWS,
                  config: dict | None = None, source: str = "unknown") -> dict:
    """Encode df into path/, skipping partitions already in the manifest.

    Deterministic partition assignment: part_id = pmod(xxhash64(key), N),
    so a re-run maps every row to the same part regardless of input
    split order — that's what makes skip-completed sound.

    Returns a summary dict {parts_total, parts_done_before, parts_encoded}.
    """
    from pyspark.sql import functions as F

    spark = df.sparkSession
    done = completed_parts(spark, path)
    cfg_hash = _config_hash(config, stripe_rows)

    with_part = df.withColumn("_part", _part_expr(partition_key, num_partitions))
    todo = with_part.filter(~F.col("_part").isin(list(done))) if done else with_part

    # co-locate each logical part in one task, then strip the helper column
    repartitioned = todo.repartition(num_partitions, "_part")

    part_col = "_part"

    def encode_with_part(batches):
        import pyarrow as pa

        from orc_haskell_spark import stripe as stripe_mod
        from orc_haskell_spark.engine import clamp_worker_threads

        clamp_worker_threads()

        pending: dict[int, list] = {}

        def flush(pid, batch_list):
            tbl = pa.Table.from_batches(batch_list).combine_chunks()
            seq = 0
            cache: dict = {}  # per-part codec state (e.g. FSST tables)
            for start in range(0, tbl.num_rows, stripe_rows):
                b = tbl.slice(start, stripe_rows).combine_chunks().to_batches()[0]
                footer, payload = stripe_mod.encode_stripe(b, config, cache)
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array([pid], pa.int32()),
                        pa.array([(pid << 32) | seq], pa.int64()),
                        pa.array([b.num_rows], pa.int64()),
                        pa.array([b.num_columns], pa.int32()),
                        pa.array([b.nbytes], pa.int64()),
                        pa.array([len(payload)], pa.int64()),
                        pa.array([json.dumps(footer, separators=(",", ":"))]),
                        pa.array([payload], pa.binary()),
                    ],
                    schema=engine.ENCODED_ARROW_SCHEMA,
                )
                seq += 1

        for batch in batches:
            parts = batch.column(part_col).to_numpy()
            data = batch.drop_columns([part_col])
            if len(set(parts.tolist())) == 1:
                pending.setdefault(int(parts[0]), []).append(data)
            else:  # split by part (rare: only when input batches mix parts)
                import numpy as np

                for pid in np.unique(parts):
                    mask = parts == pid
                    pending.setdefault(int(pid), []).append(
                        data.filter(pa.array(mask)))
        for pid, blist in pending.items():
            yield from flush(pid, blist)

    enc = repartitioned.mapInArrow(encode_with_part, engine.ENCODED_DDL)
    spath = os.path.join(path, "stripes")
    # Crash-safety: stripes land before their manifest rows, so a driver
    # crash in that window leaves committed stripes with no manifest.
    # The re-run sees the part as not-done and encodes it again —
    # dynamic partition overwrite makes that REPLACE the orphan
    # part_id=N directory instead of appending duplicate stripes, so
    # the two-step commit is idempotent.
    # blobs are already block-compressed: parquet re-compression off
    enc.write.mode("overwrite") \
        .option("partitionOverwriteMode", "dynamic") \
        .option("compression", "uncompressed") \
        .partitionBy("part_id").parquet(spath)

    # manifest: directory + metrics + lineage, appended per run
    written = spark.read.parquet(spath)
    new_manifest = (
        written.drop("data")
        .filter(~F.col("part_id").isin(list(done)) if done else F.lit(True))
        .withColumn("source", F.lit(source))
        .withColumn("config_hash", F.lit(cfg_hash))
    )
    new_manifest.write.mode("append").parquet(os.path.join(path, "manifest"))

    after = completed_parts(spark, path)
    return {
        "parts_total": num_partitions,
        "parts_done_before": len(done),
        "parts_encoded": len(after) - len(done),
    }


def read_encoded(spark, path: str):
    return spark.read.parquet(os.path.join(path, "stripes"))


def read_manifest(spark, path: str):
    return spark.read.parquet(os.path.join(path, "manifest"))


def metrics(spark, path: str):
    """Aggregate manifest metrics: rows/bytes/ratio per partition."""
    from pyspark.sql import functions as F

    m = read_manifest(spark, path)
    return m.groupBy("part_id").agg(
        F.count("*").alias("n_stripes"),
        F.sum("n_rows").alias("rows"),
        F.sum("raw_bytes").alias("raw_bytes"),
        F.sum("enc_bytes").alias("enc_bytes"),
        (F.sum("raw_bytes") / F.sum("enc_bytes")).alias("ratio"),
    )
