"""Streaming Iceberg source: a PySpark Python DataSource (Spark 4 API)
that consumes an Iceberg table's snapshots incrementally.

    spark.dataSource.register(IcebergStreamDataSource)
    df = (spark.readStream.format("iceberg_stream")
          .load("/path/to/table"))

Offsets are the table's own SEQUENCE NUMBERS — Iceberg's total commit
order — so the source is exactly-once at snapshot granularity with no
side ledger: a micro-batch covers the data files whose manifests
committed in (start_seq, end_seq], exactly `iceberg.incremental_files`
between those snapshots. Restart resumes from the checkpointed offset
like any file source.

Options:
- ``path``: the table directory (required)
- ``start_seq``: first sequence number to EXCLUDE (default 0 = consume
  history from the first snapshot; pass the current sequence number to
  tail only new commits)
- ``max_seqs_per_batch``: admission control — advance the offset by at
  most this many commits per micro-batch (default unlimited), so a
  backlogged table drains in bounded batches instead of one giant
  catch-up batch

Micro-batch planning touches metadata only (manifest Avro, a few KB per
commit); payload bytes are read by the executors per input partition —
one partition per data file, the same granularity as the batch planner.

Honest limits (same contract as the batch paths): position deletes in
the consumed range raise (a streaming read cannot retroactively delete
rows it already emitted — Iceberg's own streaming readers refuse
changelog scans over deletes the same way); schema must be stable over
the consumed range (current schema governs)."""

from __future__ import annotations

from pyspark.sql.datasource import (DataSource, DataSourceStreamReader,
                                    InputPartition)


class IcebergFilePartition(InputPartition):
    def __init__(self, file_path: str, fields: list[tuple[str, str]]):
        self.file_path = file_path
        self.fields = fields            # (name, iceberg_type) pairs


class IcebergStreamDataSource(DataSource):
    """format("iceberg_stream") — snapshot-incremental Iceberg reads."""

    @classmethod
    def name(cls) -> str:
        return "iceberg_stream"

    def _table(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError("iceberg_stream requires .load(table_dir)")
        return path

    _SPARK_T = {"boolean": "boolean", "int": "int", "long": "bigint",
                "float": "float", "double": "double", "string": "string",
                "binary": "binary", "date": "date",
                "timestamp": "timestamp", "timestamptz": "timestamp"}

    def _fields(self) -> list[tuple[str, str]]:
        """[(name, iceberg_type)] of the table's current schema."""
        from . import iceberg
        from .iceberg import _schema_of

        meta = iceberg.table_metadata(self._table())
        out = []
        for f in _schema_of(meta):
            if not isinstance(f["type"], str) or \
                    f["type"] not in self._SPARK_T:
                raise NotImplementedError(
                    f"streaming read of column type {f['type']!r}")
            out.append((f["name"], f["type"]))
        return out

    def schema(self):
        # concrete type objects, not DDL parsing: schema() may run in a
        # Python-datasource worker process with no SparkContext
        from pyspark.sql import types as T

        mk = {"boolean": T.BooleanType, "int": T.IntegerType,
              "long": T.LongType, "float": T.FloatType,
              "double": T.DoubleType, "string": T.StringType,
              "binary": T.BinaryType, "date": T.DateType,
              "timestamp": T.TimestampType,
              "timestamptz": T.TimestampType}
        return T.StructType([T.StructField(n, mk[t](), True)
                             for n, t in self._fields()])

    def streamReader(self, schema) -> "IcebergStreamReader":
        return IcebergStreamReader(
            self._table(), self._fields(),
            int(self.options.get("start_seq", 0)),
            int(self.options.get("max_seqs_per_batch", 0)))


_ARROW_T = {"boolean": "bool_", "int": "int32", "long": "int64",
            "float": "float32", "double": "float64", "string": "string",
            "binary": "binary", "date": "date32"}


def _arrow_type(ice_type: str):
    import pyarrow as pa

    if ice_type in ("timestamp", "timestamptz"):
        return pa.timestamp("us")
    return getattr(pa, _ARROW_T[ice_type])()


class IcebergStreamReader(DataSourceStreamReader):
    def __init__(self, table_path: str, fields: list[tuple[str, str]],
                 start_seq: int, max_seqs: int = 0):
        self.table_path = table_path
        self.fields = fields
        self.start_seq = start_seq
        self.max_seqs = max_seqs
        self._cursor = None              # last offset this reader saw

    def initialOffset(self) -> dict:
        # called ONLY for fresh queries (no checkpoint): start_seq is
        # then a true base for admission control. A restarted query
        # skips this, leaving the cursor unset until the engine reveals
        # the checkpointed offset via partitions().
        self._cursor = self.start_seq
        return {"seq": self.start_seq}

    def latestOffset(self) -> dict:
        from . import iceberg

        meta = iceberg.table_metadata(self.table_path)
        head = meta["last-sequence-number"]
        # admission control only applies once we KNOW the previous
        # offset (from a prior latestOffset or a partitions() call).
        # A freshly restarted reader has no cursor and must NOT cap
        # from start_seq: the checkpointed offset may be far beyond
        # it, and returning a smaller offset would REGRESS the
        # checkpoint and re-emit committed batches. First post-restart
        # batch is therefore uncapped; bounded pacing resumes after.
        if self.max_seqs > 0 and self._cursor is not None:
            head = min(head, self._cursor + self.max_seqs)
        if self._cursor is not None:
            head = max(head, self._cursor)     # never move backwards
        self._cursor = head
        return {"seq": head}

    def partitions(self, start: dict, end: dict):
        from . import iceberg

        lo, hi = start["seq"], end["seq"]
        # a restarted query replays from the checkpoint: re-anchor the
        # admission-control cursor at the batch being planned (lo too:
        # an old checkpoint's end may trail the committed start)
        anchor = max(lo, hi)
        if self._cursor is None or self._cursor < anchor:
            self._cursor = anchor
        if hi <= lo:
            return []
        meta = iceberg.table_metadata(self.table_path)
        snaps = [s for s in sorted(meta["snapshots"],
                                   key=lambda s: s["sequence-number"])
                 if s["sequence-number"] <= hi]
        if not snaps:
            return []
        for s in snaps:
            if lo < s["sequence-number"] <= hi and \
                    s.get("summary", {}).get("operation", "append") \
                    not in ("append", "delete"):
                raise NotImplementedError(
                    f"snapshot {s['snapshot-id']} is a "
                    f"{s['summary']['operation']} (files rewritten): "
                    f"already-emitted rows would be re-emitted — "
                    f"restart the stream with start_seq="
                    f"{s['sequence-number']} to re-baseline")
        files, dels = iceberg.plan_scan(
            self.table_path, snapshot_id=snaps[-1]["snapshot-id"])
        if dels:
            raise NotImplementedError(
                "position deletes in a streamed range: rows already "
                "emitted cannot be retracted — compact the table or "
                "consume it in batch mode")
        fresh = [f["file_path"] for f in files
                 if lo < (f.get("sequence_number") or 0) <= hi]
        return [IcebergFilePartition(p, self.fields) for p in fresh]

    def read(self, partition):
        import pyarrow as pa
        import pyarrow.parquet as pq

        t = pq.read_table(partition.file_path)
        names = set(t.schema.names)
        cols = {}
        for name, ice_t in partition.fields:
            want = _arrow_type(ice_t)
            if name in names:
                col = t.column(name)
                if col.type != want:
                    col = col.cast(want)
                cols[name] = col
            else:                       # schema evolution: null-fill
                cols[name] = pa.nulls(t.num_rows, want)
        yield from pa.table(cols).to_batches(max_chunksize=16384)

    def commit(self, end: dict) -> None:
        pass                            # offsets live in the checkpoint
