"""Sessionization: gap-based event sessions, batch and streaming.

Batch: all-Catalyst (lag + running sum inside whole-stage codegen) —
the Spark-idiomatic form, exactly reproducible in SQL for the oracle.

Streaming: the one operator shape Structured Streaming cannot express
with windowed aggregation — unbounded-gap sessions need CUSTOM STATE.
``sessionize_stream`` uses applyInPandasWithState (Arrow-batched per
key group) with event-time timeouts: a session closes when the
watermark passes its last event + gap. (The reference has no streaming
at all — SURVEY.md §2.3; this is part of the pipeline layer additions.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

SESSION_DDL = ("user_id bigint, session_start timestamp, "
               "session_end timestamp, n_events bigint")
_STATE_DDL = "first_ts long, last_ts long, n long"


def sessionize(df: DataFrame, user_col: str = "user_id",
               ts_col: str = "ts", gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessions over a static table: a new session starts
    when the time since the user's previous event exceeds the gap."""
    gap_s = gap_minutes * 60
    w = Window.partitionBy(user_col).orderBy(ts_col)
    prev = F.lag(ts_col).over(w)
    new_sess = F.when(
        prev.isNull()
        | (F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev)
           > gap_s), 1).otherwise(0)
    sess = (df.withColumn("_new", new_sess)
            .withColumn("_sid", F.sum("_new").over(
                w.rowsBetween(Window.unboundedPreceding, 0))))
    return (sess.groupBy(user_col, "_sid")
            .agg(F.min(ts_col).alias("session_start"),
                 F.max(ts_col).alias("session_end"),
                 F.count("*").alias("n_events"))
            .select(F.col(user_col).alias("user_id"), "session_start",
                    "session_end", "n_events"))


def sessionize_stream(stream_df: DataFrame, user_col: str = "user_id",
                      ts_col: str = "ts", gap_minutes: int = 30,
                      watermark: str = "10 minutes") -> DataFrame:
    """Streaming sessionization via applyInPandasWithState.

    Per-key state = (first_ts, last_ts, n). New events extend or roll
    the session; the event-time timeout (watermark > last_ts + gap)
    closes and emits it. Emitted rows are append-mode final — the
    exactly-once encode sink can consume them directly.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import (GroupState,
                                             GroupStateTimeout)

    gap_s = gap_minutes * 60

    def fn(key, pdf_iter, state: GroupState):
        if state.hasTimedOut:
            first_ts, last_ts, n = state.get
            state.remove()
            yield pd.DataFrame({
                "user_id": [key[0]],
                "session_start": [pd.Timestamp(first_ts, unit="s")],
                "session_end": [pd.Timestamp(last_ts, unit="s")],
                "n_events": [n]})
            return
        first_ts, last_ts, n = state.get if state.exists else (None, None, 0)
        out = []
        # gather ALL timestamps before sorting: a group may arrive as
        # several Arrow chunks with no global order
        all_ts: list = []
        for pdf in pdf_iter:
            all_ts.extend((pdf[ts_col].astype("int64") // 10**9).tolist())
        for t in sorted(all_ts):
            if last_ts is not None and t - last_ts > gap_s:
                out.append((first_ts, last_ts, n))
                first_ts, last_ts, n = t, t, 1
            else:
                # t may still precede state carried from a prior batch
                first_ts = t if first_ts is None else min(first_ts, t)
                last_ts = t if last_ts is None else max(last_ts, t)
                n += 1
        close_ms = (last_ts + gap_s) * 1000
        if close_ms <= state.getCurrentWatermarkMs():
            # the watermark already passed this session's close time
            # (late-batch catch-up): emit now, keep no state
            out.append((first_ts, last_ts, n))
            if state.exists:
                state.remove()
        else:
            state.update((first_ts, last_ts, n))
            state.setTimeoutTimestamp(close_ms)
        if out:
            yield pd.DataFrame({
                "user_id": [key[0]] * len(out),
                "session_start": [pd.Timestamp(a, unit="s") for a, _, _ in out],
                "session_end": [pd.Timestamp(b, unit="s") for _, b, _ in out],
                "n_events": [c for _, _, c in out]})

    return (stream_df
            .withWatermark(ts_col, watermark)
            .groupBy(user_col)
            .applyInPandasWithState(
                fn, SESSION_DDL, _STATE_DDL, "append",
                GroupStateTimeout.EventTimeTimeout))
