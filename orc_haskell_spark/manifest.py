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


def _config_hash(config: dict | None, stripe_rows: int,
                 drop_positions=None, drop_values=None,
                 residual=None) -> str:
    extra = vextra = None
    if drop_positions:
        h = hashlib.sha256()
        for k in sorted(drop_positions):
            h.update(k.encode())
            h.update(drop_positions[k].tobytes())
        extra = h.hexdigest()
    if drop_values:
        h = hashlib.sha256()
        for k in sorted(drop_values):
            h.update(k.encode())
            for col, arr in drop_values[k]:
                h.update(str(col).encode())
                rows = (arr.to_pydict() if hasattr(arr, "to_pydict")
                        else arr.to_pylist())
                h.update(str(rows).encode())
        vextra = h.hexdigest()
    blob_dict = {"config": config or {}, "stripe_rows": stripe_rows,
                 "drops": extra, "vdrops": vextra}
    if residual:
        # sort unordered collections ('in' predicates): set iteration
        # order varies across interpreter runs and would make the
        # resume hash refuse its own job after a driver restart. The
        # key is OMITTED when no residual so pre-existing out_paths
        # keep their original hashes.
        blob_dict["residual"] = [
            [c, o, repr(sorted(v) if isinstance(v, (set, frozenset))
                        else v)] for c, o, v in residual]
    blob = json.dumps(blob_dict, sort_keys=True)
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


# ---- fused sink: Python-side scan -> encode -> Python-side parquet write

FUSED_MANIFEST_DDL = (
    "task_key string, file string, rg int, stripe_id bigint, "
    "n_rows bigint, raw_bytes bigint, enc_bytes bigint, footer string")


def _fused_sink_fn(out_path: str, stripe_rows: int, stripe_bytes: int,
                   config, batch_rows: int, drop_positions=None,
                   drop_values=None, residual=None):
    """mapInArrow fn over split rows: scan row groups with pyarrow,
    encode stripes, and WRITE the encoded-stripes parquet part directly
    from the worker (streaming ParquetWriter, one row group per stripe
    row — constant memory). Only tiny manifest rows return to the JVM:
    the complete encode job moves zero payload bytes across the
    JVM<->Python boundary in either direction.

    Commit protocol: the part file is written under a name derived from
    the task's split set (task_key) into stripes/, staged as a hidden
    .staging-* file and renamed at the end. Readers count ONLY files
    whose task_key appears in the manifest (written by the driver after
    the job succeeds), so half-written or orphaned parts — task retry,
    speculative attempt, stage re-run with different split assignment —
    are never observed. Same-name replace makes retried attempts
    last-wins idempotent.
    """

    def fn(batches):
        import hashlib

        import pyarrow as pa
        import pyarrow.parquet as pq

        from . import sources, stripe as stripe_mod
        from .engine import (ENCODED_ARROW_SCHEMA, _rechunk,
                             _spark_safe_batch, clamp_worker_threads)

        clamp_worker_threads()
        splits = []
        for b in batches:
            splits.extend(zip(b.column("file").to_pylist(),
                              b.column("rg").to_pylist()))
        if not splits:
            return
        key = hashlib.sha256(
            json.dumps(sorted(splits)).encode()).hexdigest()[:24]
        fs, staging, final = sources.task_output(out_path, "stripes", key)

        # stripe rows carry (task_key, file, rg) so readers can filter
        # at SPLIT granularity — the same unit resume uses. If a split's
        # manifest coverage is lost and it is re-encoded under a new
        # task_key, the old part's stripes for that split become
        # invisible instead of duplicating rows.
        out_schema = pa.schema(list(ENCODED_ARROW_SCHEMA)
                               + [pa.field("task_key", pa.string()),
                                  pa.field("file", pa.string()),
                                  pa.field("rg", pa.int32())])
        manifest_rows = []
        writer = None
        handles = sources.ParquetHandleCache()
        rg_offsets: dict = {}
        cache: dict = {}  # per-TASK codec state (FSST tables, selector
        # trials); stripes are self-describing so reuse across splits
        # is safe and skips re-training per 25k-row split
        try:
            writer = pq.ParquetWriter(staging, out_schema,
                                      compression="NONE", filesystem=fs)
            for f, rg in splits:
                pf = handles.get(f)

                def scan():
                    from .engine import scan_row_group

                    yield from scan_row_group(
                        pf, f, rg, batch_rows,
                        drop_positions=drop_positions,
                        rg_offsets=rg_offsets, drop_values=drop_values,
                        residual=residual)

                seq = 0
                for sb in _rechunk(scan(), stripe_rows, stripe_bytes):
                    if sb is None or sb.num_rows == 0:
                        continue
                    footer, payload = stripe_mod.encode_stripe(
                        sb, config, cache)
                    fjson = json.dumps(footer, separators=(",", ":"))
                    sid = (rg << 20) | seq
                    writer.write_batch(pa.RecordBatch.from_arrays(
                        [pa.array([0], pa.int32()),
                         pa.array([sid], pa.int64()),
                         pa.array([sb.num_rows], pa.int64()),
                         pa.array([sb.num_columns], pa.int32()),
                         pa.array([sb.nbytes], pa.int64()),
                         pa.array([len(payload)], pa.int64()),
                         pa.array([fjson]),
                         pa.array([payload], pa.binary()),
                         pa.array([key]),
                         pa.array([f]),
                         pa.array([rg], pa.int32())],
                        schema=out_schema))
                    manifest_rows.append(
                        (key, f, rg, sid, sb.num_rows, sb.nbytes,
                         len(payload), fjson))
                    seq += 1
            writer.close()
            writer = None
            sources.commit_part(fs, staging, final)
        finally:
            if writer is not None:
                writer.close()
            sources.discard_part(fs, staging)
        if manifest_rows:
            yield pa.RecordBatch.from_arrays(
                [pa.array([r[i] for r in manifest_rows], t)
                 for i, t in enumerate(
                     [pa.string(), pa.string(), pa.int32(), pa.int64(),
                      pa.int64(), pa.int64(), pa.int64(), pa.string()])],
                names=["task_key", "file", "rg", "stripe_id", "n_rows",
                       "raw_bytes", "enc_bytes", "footer"])

    return fn


def encode_parquet_to_dir(spark, in_path: str, out_path: str,
                          stripe_rows: int = engine.DEFAULT_STRIPE_ROWS,
                          stripe_bytes: int = engine.DEFAULT_STRIPE_BYTES,
                          config: dict | None = None,
                          num_partitions: int | None = None,
                          batch_rows: int = 16384,
                          source: str = "unknown",
                          files: list[str] | None = None,
                          drop_positions=None, drop_values=None,
                          residual=None, ranges=None) -> dict:
    """Fused resumable encode job: parquet table -> encoded-stripe files
    + manifest, with ZERO payload bytes crossing the JVM boundary.

    Resume unit is the SPLIT (file, row_group): a re-run anti-joins the
    split list against the manifest and encodes only what's missing —
    finer-grained and cheaper than encode_to_dir's hash-partition
    resume (no row shuffle at all), at the cost of keeping the input
    layout instead of re-partitioning by key. The manifest write is the
    commit point; see _fused_sink_fn for the orphan-safety argument.

    Returns {splits_total, splits_done_before, splits_encoded}.
    """
    from pyspark.sql import functions as F

    from . import sources

    all_splits = sources.parquet_splits_df(spark, in_path,
                                           num_partitions=num_partitions,
                                           files=files, ranges=ranges)
    all_splits.persist()
    splits = all_splits
    cfg_hash = _config_hash(config, stripe_rows, drop_positions,
                            drop_values, residual)
    try:
        m = read_fused_manifest(spark, out_path)
        # a resume must not silently mix layouts: stripes from an
        # earlier run with a DIFFERENT config/stripe_rows are already
        # ledgered, so re-encoding under the new config would leave
        # both visible to readers. Refuse loudly instead.
        other = m.filter(
            ~F.col("config_hash").eqNullSafe(cfg_hash)).count()
        if other:
            raise ValueError(
                f"{out_path!r} holds {other} manifest rows encoded "
                f"under a different config/stripe_rows; resume with "
                f"the original settings or use a fresh out_path")
        done_df = m.select("file", "rg").distinct()
        done_n = done_df.count()
    except ValueError:
        raise
    except Exception:
        done_df, done_n = None, 0
    total = splits.count()
    if done_df is not None:
        splits = splits.join(F.broadcast(done_df), ["file", "rg"],
                             "left_anti")
    mdf = splits.mapInArrow(
        _fused_sink_fn(out_path, stripe_rows, stripe_bytes, config,
                       batch_rows, drop_positions=drop_positions,
                       drop_values=drop_values, residual=residual),
        FUSED_MANIFEST_DDL)
    new_manifest = (mdf.withColumn("source", F.lit(source))
                    .withColumn("config_hash", F.lit(cfg_hash)))
    new_manifest.write.mode("append") \
        .parquet(os.path.join(out_path, "manifest"))
    after = read_fused_manifest(spark, out_path) \
        .select("file", "rg").distinct().count()
    all_splits.unpersist()
    return {"splits_total": total, "splits_done_before": done_n,
            "splits_encoded": after - done_n}


def read_fused_manifest(spark, path: str):
    return spark.read.parquet(os.path.join(path, "manifest"))


def read_fused_encoded(spark, path: str):
    """Committed encoded stripes: stripe rows whose (task_key, file, rg)
    appears in the manifest — the ledger filter, at the same SPLIT
    granularity resume uses, that makes orphaned / half-committed /
    superseded part files invisible."""
    from pyspark.sql import functions as F

    stripes = spark.read.parquet(os.path.join(path, "stripes"))
    keys = read_fused_manifest(spark, path) \
        .select("task_key", "file", "rg").distinct()
    return stripes.join(F.broadcast(keys), ["task_key", "file", "rg"],
                        "left_semi").drop("task_key", "file", "rg")


def fused_metrics(spark, path: str):
    """Per-input-file rollup of the fused manifest: stripes, rows,
    raw/encoded bytes and ratio — the lineage + metrics surface the
    north rule asks every checkpointed run to carry."""
    from pyspark.sql import functions as F

    m = read_fused_manifest(spark, path)
    return m.groupBy("file", "config_hash", "source").agg(
        F.countDistinct("rg").alias("n_splits"),
        F.count("*").alias("n_stripes"),
        F.sum("n_rows").alias("rows"),
        F.sum("raw_bytes").alias("raw_bytes"),
        F.sum("enc_bytes").alias("enc_bytes"),
        (F.sum("raw_bytes") / F.sum("enc_bytes")).alias("ratio"))


def vacuum_fused(spark, path: str) -> dict:
    """Delete stripe part files whose task_key never made it into the
    manifest — leftovers of killed runs, superseded re-encodes, or
    stage retries. Readers never see them (the ledger filter), so this
    is pure space reclamation; run it after jobs complete (a run still
    in flight would have its staged work removed). Works through the
    same filesystem abstraction the writers use, so URI-addressed
    datasets (s3://...) vacuum too. A dataset with no manifest at all
    (run died before the first commit) is ALL orphans and is swept
    clean. Returns {kept, removed}."""
    import pyarrow.fs as pafs

    from . import sources

    try:
        mkeys = {r.task_key for r in read_fused_manifest(spark, path)
                 .select("task_key").distinct().collect()}
    except Exception:
        mkeys = set()
    fs, local = sources._resolve_fs(path)
    stripes_dir = f"{local.rstrip('/')}/stripes"
    try:
        infos = fs.get_file_info(
            pafs.FileSelector(stripes_dir, recursive=False))
    except FileNotFoundError:
        return {"kept": 0, "removed": 0}
    kept = removed = 0
    for info in infos:
        if info.type != pafs.FileType.File:
            continue
        name = info.base_name
        if name.startswith(".staging-"):
            fs.delete_file(info.path)  # never visible: always sweep
            removed += 1
        elif name.startswith("part-") and name.endswith(".parquet"):
            key = name[len("part-"):-len(".parquet")]
            if key in mkeys:
                kept += 1
            else:
                fs.delete_file(info.path)
                removed += 1
    return {"kept": kept, "removed": removed}
