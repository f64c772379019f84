"""Input sources: Iceberg-style tables, parquet directories, streams.

The engine is source-agnostic — encode_table takes any DataFrame — but
the north rule names Iceberg tables of Common-Crawl-style pages as the
canonical input. This sandbox has no Iceberg runtime jar, so
``read_table`` resolves in order: catalog table name (Iceberg/hive when
the runtime is on the classpath) → parquet path. On a real cluster the
Iceberg path gives us partition pruning and snapshot isolation for free
through Catalyst's DataSourceV2; nothing in the engine changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.errors import AnalysisException


def read_table(spark: SparkSession, source: str) -> DataFrame:
    """Read an input table: catalog name (e.g. 'crawl.pages') or a
    parquet path. Iceberg tables resolve through the catalog when the
    iceberg-spark-runtime jar is present.

    Only TABLE_OR_VIEW_NOT_FOUND falls through to the parquet path: a
    genuine catalog error (permissions, bad snapshot, misconfigured
    Iceberg) must surface as itself, not as an unrelated 'parquet path
    not found'.
    """
    if "/" not in source and "\\" not in source:
        try:
            return spark.read.table(source)
        except AnalysisException as e:
            cond = (e.getCondition() or "") if hasattr(e, "getCondition") else ""
            if "TABLE_OR_VIEW_NOT_FOUND" not in cond and \
                    "cannot be found" not in str(e):
                raise
    return spark.read.parquet(source)


def read_stream(spark: SparkSession, source: str, schema) -> DataFrame:
    """Streaming source: file-drop directory (or rate: for tests)."""
    if source.startswith("rate"):
        return spark.readStream.format("rate").load()
    return spark.readStream.schema(schema).parquet(source)


SPLIT_DDL = "file string, rg int, nbytes bigint, nrows bigint"


def list_parquet_files(path: str) -> list[str]:
    """Recursive .parquet listing under ``path`` (a file, a directory,
    or a pyarrow-fs URI like s3://...). Listing is metadata-only and
    cheap even for very large tables; the expensive part — reading each
    file's footer — is distributed by ``parquet_splits_df``."""
    import pyarrow.fs as pafs

    fs, base = _resolve_fs(path)
    info = fs.get_file_info(base)
    if info.type == pafs.FileType.File:
        return [path]
    sel = pafs.FileSelector(base, recursive=True)
    prefix = path[: len(path) - len(base)]  # scheme, e.g. "s3://"
    return sorted(
        prefix + i.path for i in fs.get_file_info(sel)
        if i.type == pafs.FileType.File and i.path.endswith(".parquet"))


def _resolve_fs(path: str):
    """(pyarrow FileSystem, fs-local path) for a local path or URI."""
    import pyarrow.fs as pafs

    if "://" in path:
        return pafs.FileSystem.from_uri(path)
    return pafs.LocalFileSystem(), path


def open_parquet(path: str):
    """pyarrow ParquetFile for a local path or filesystem URI."""
    import pyarrow.parquet as pq

    fs, local = _resolve_fs(path)
    return pq.ParquetFile(local, filesystem=fs)


def _keep_rg(md_rg, name_to_idx: dict, ranges) -> bool:
    """Row-group stat pruning: False only when parquet column-chunk
    min/max PROVE no row matches every (col, lo, hi) in ``ranges``
    (None bound = unbounded). Missing columns/stats keep the group."""
    import math

    for col, lo, hi in ranges or ():
        i = name_to_idx.get(col)
        if i is None:
            continue
        st = md_rg.column(i).statistics
        if st is None or not st.has_min_max:
            continue
        mn, mx = st.min, st.max
        if isinstance(lo, float) and math.isnan(lo):
            continue  # NaN predicates never prune (Spark NaN order)
        if isinstance(hi, float) and math.isnan(hi):
            continue
        try:
            if lo is not None and mx < lo:
                return False
            if hi is not None and mn > hi:
                return False
        except TypeError:
            continue  # incomparable stat type: keep
    return True


def _file_splits(f: str, ranges) -> list[tuple]:
    """(file, rg, nbytes, nrows) split rows for one parquet file —
    footer-only IO, row groups pruned against ``ranges``."""
    md = open_parquet(f).metadata
    names = {md.schema.column(i).name: i for i in range(md.num_columns)}
    return [(f, rg, md.row_group(rg).total_byte_size,
             md.row_group(rg).num_rows)
            for rg in range(md.num_row_groups)
            if md.row_group(rg).num_rows
            and _keep_rg(md.row_group(rg), names, ranges)]


def _splits_fn(ranges):
    """mapInArrow fn: file-name rows -> one split row per row group."""
    import pyarrow as pa

    schema = pa.schema([("file", pa.string()), ("rg", pa.int32()),
                        ("nbytes", pa.int64()), ("nrows", pa.int64())])

    def fn(batches):
        for b in batches:
            for f in b.column("file").to_pylist():
                rows = _file_splits(f, ranges)
                if rows:
                    yield pa.RecordBatch.from_arrays(
                        [pa.array([r[i] for r in rows], t)
                         for i, t in enumerate([pa.string(), pa.int32(),
                                                pa.int64(), pa.int64()])],
                        schema=schema)

    return fn


DRIVER_SPLITS_MAX_FILES = 1024

# bump when split->task assignment changes (partition contents key the
# plan-guarded exports' part names): v1 = stride round-robin, v2 = LPT
PLANNER_VERSION = "lpt-v2"


def parquet_splits_df(spark: SparkSession, path: str,
                      ranges=None, num_partitions: int | None = None,
                      files: list[str] | None = None) -> DataFrame:
    """DataFrame of parquet row-group splits (file, rg, nbytes, nrows),
    balanced across ``num_partitions`` tasks.

    Two planning modes, picked by file count (Spark's own scan plans
    splits on the driver too — the point is keeping DATA off the
    driver, not metadata):

    - <= DRIVER_SPLITS_MAX_FILES files: footers read on the driver
      (threaded — footer reads are IO waits) and the split list
      parallelized pre-partitioned round-robin. ONE Spark stage for the
      whole downstream scan job: no metadata shuffle, no extra stage
      scheduling — the fixed overhead that dominates small jobs.
    - beyond that (the 100 TB shape: millions of files): only file
      NAMES touch the driver; footers are read in parallel tasks and
      split rows shuffled as pure metadata (bytes per row, not data).

    ``ranges`` prunes row groups on parquet column statistics before
    any data IO — the Python-scan analog of Catalyst filter pushdown.

    ``path`` may also be a CATALOG TABLE NAME (e.g. an Iceberg table):
    the file list then comes from the table's current snapshot via
    Spark's inputFiles(), so the fused scan composes with catalog
    tables without any engine change — the north rule's input shape.

    ``files`` bypasses listing entirely with an explicit file set — the
    hook `iceberg.py` uses after snapshot selection + partition/bounds
    pruning against the table's own metadata (no catalog jar needed).
    """
    if files is not None:
        files = sorted(files)
    elif "/" not in path and "\\" not in path:
        try:
            files = sorted(f for f in spark.read.table(path).inputFiles()
                           if f.endswith(".parquet"))
        except Exception:
            files = []
        if files:
            files = [f[len("file:"):] if f.startswith("file:") else f
                     for f in files]
        else:
            try:
                files = list_parquet_files(path)
            except FileNotFoundError:
                raise ValueError(
                    f"{path!r} is neither a catalog table with parquet "
                    f"files nor a parquet path") from None
    else:
        files = list_parquet_files(path)
    if not files:
        raise ValueError(f"no parquet files under {path!r}")
    n = num_partitions or spark.sparkContext.defaultParallelism * 2

    if len(files) <= DRIVER_SPLITS_MAX_FILES:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(min(16, len(files))) as pool:
            per_file = pool.map(lambda f: _file_splits(f, ranges), files)
        splits = [row for rows in per_file for row in rows]
        if not splits:
            return spark.createDataFrame([], SPLIT_DDL)
        n_slices = min(n, len(splits))
        # LPT bin-packing on row-group BYTES (longest-processing-time:
        # biggest split to the least-loaded task). Round-robin balances
        # counts, but web-corpus row groups vary wildly in size — one
        # task with the fat groups would straggle the whole job. One
        # bucket per RDD slice, flatMap keeps the placement (narrow).
        import heapq

        order = sorted(splits, key=lambda r: -r[2])
        heap = [(0, k) for k in range(n_slices)]
        buckets: list[list] = [[] for _ in range(n_slices)]
        for row in order:
            load, k = heapq.heappop(heap)
            buckets[k].append(row)
            heapq.heappush(heap, (load + max(row[2], 1), k))
        rdd = spark.sparkContext.parallelize(buckets, n_slices) \
            .flatMap(lambda b: b)
        return spark.createDataFrame(rdd, SPLIT_DDL)

    meta_tasks = min(len(files), n)
    fdf = spark.createDataFrame([(f,) for f in files], "file string") \
        .repartition(meta_tasks)
    splits = fdf.mapInArrow(_splits_fn(ranges), SPLIT_DDL)
    # round-robin rebalance: row groups of one big file must spread
    # across tasks, not stay on the footer-reader's partition
    return splits.repartition(n)


def task_output(out_path: str, subdir: str | None, key: str,
                ext: str = ".parquet"):
    """(fs, staging_path, final_path) for one task's rename-on-commit
    part file: write to the hidden staging name, then commit_part() it.
    Shared by the fused encode sink and the decode export so the commit
    protocol cannot diverge between them."""
    import uuid

    fs, out_local = _resolve_fs(out_path)
    d = out_local.rstrip("/") + (f"/{subdir}" if subdir else "")
    fs.create_dir(d, recursive=True)
    staging = f"{d}/.staging-{key}-{uuid.uuid4().hex[:8]}{ext}"
    final = f"{d}/part-{key}{ext}"
    return fs, staging, final


def commit_part(fs, staging: str, final: str) -> None:
    """Atomic-replace rename on local filesystems; object stores get
    delete-then-move (safe: deterministic task_key names make the last
    writer win, and readers only see ledgered keys)."""
    try:
        fs.move(staging, final)
    except OSError:
        fs.delete_file(final)
        fs.move(staging, final)


def discard_part(fs, staging: str) -> None:
    try:
        fs.delete_file(staging)
    except Exception:
        pass


def guard_export_plan(out_path: str, plan: dict) -> None:
    """Refuse re-running an export into ``out_path`` under a DIFFERENT
    plan: task part names derive from split sets, so a changed plan
    would add new parts beside the old ones and duplicate rows. First
    run writes the marker; identical plans pass; mismatches raise; an
    unreadable marker raises with a recovery hint (never an opaque
    parse error, never a silent pass)."""
    import hashlib
    import json

    import pyarrow.fs as pafs

    # the packing algorithm determines task split sets and therefore
    # part names: changing it must invalidate old markers too
    plan = {**plan, "planner": PLANNER_VERSION}
    plan_key = hashlib.sha256(
        json.dumps(plan, sort_keys=True).encode()).hexdigest()[:16]
    fs, out_local = _resolve_fs(out_path)
    marker = f"{out_local.rstrip('/')}/_export_plan.json"
    try:
        exists = fs.get_file_info(marker).type != pafs.FileType.NotFound
    except Exception:
        return  # exotic filesystem: marker is best-effort
    if exists:
        try:
            with fs.open_input_stream(marker) as f:
                prev = json.loads(f.read().decode())
        except Exception:
            raise ValueError(
                f"unreadable export-plan marker {marker!r} (interrupted "
                f"first run?); delete it to proceed, or use a fresh "
                f"out_path") from None
        if prev.get("plan_key") != plan_key:
            raise ValueError(
                f"{out_path!r} was exported with a different plan "
                f"({prev.get('plan')}); re-run with the same settings "
                f"or use a fresh out_path")
        return
    fs.create_dir(out_local, recursive=True)
    with fs.open_output_stream(marker) as f:
        f.write(json.dumps({"plan_key": plan_key, "plan": plan}).encode())


class ParquetHandleCache:
    """Small per-task cache of open ParquetFile handles: split lists
    interleave row groups of multiple files, and re-opening a file per
    row group re-reads its footer every time (MBs for wide schemas)."""

    def __init__(self, cap: int = 64):
        self._cap = cap
        self._handles: dict = {}

    def get(self, path: str):
        pf = self._handles.get(path)
        if pf is None:
            if len(self._handles) >= self._cap:
                # LRU: evict exactly one handle (dict preserves access
                # recency because hits re-insert below)
                self._handles.pop(next(iter(self._handles)))
            pf = open_parquet(path)
        else:
            del self._handles[path]  # re-insert -> most recently used
        self._handles[path] = pf
        return pf
