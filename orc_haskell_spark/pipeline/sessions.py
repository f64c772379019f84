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
# per-key state: ALL sessions not yet finalized by the watermark,
# as parallel arrays sorted by start (see sessionize_stream)
_STATE_DDL = "firsts array<long>, lasts array<long>, ns array<long>"


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

    Per-key state = EVERY session the watermark hasn't finalized yet
    (parallel first/last/count arrays), not just the live one: a session
    closed by a gap WITHIN a batch stays buffered until the watermark
    passes its close time, because an out-of-order event in a later
    micro-batch (still above the watermark) may fall inside its window
    and must merge instead of spawning a spurious split session — the
    exact batch-sessionize semantics. Spark drops input rows older than
    the watermark before a stateful operator, so a session whose
    last+gap <= watermark can never change again: emitted rows are
    append-mode FINAL and the exactly-once encode sink can consume them
    directly.

    Merge rule per batch: existing sessions + one singleton per event,
    sorted by start, swept left-to-right joining neighbours whose gap
    is <= gap_minutes (identical to the batch lag/cumsum formulation).
    """
    import pandas as pd

    from pyspark.sql.streaming.state import (GroupState,
                                             GroupStateTimeout)

    gap_s = gap_minutes * 60

    def fn(key, pdf_iter, state: GroupState):
        sessions: list[list[int]] = []
        if state.exists:
            firsts, lasts, ns = state.get
            sessions = [[a, b, c] for a, b, c in zip(firsts, lasts, ns)]
        if not state.hasTimedOut:
            # gather ALL timestamps before sorting: a group may arrive
            # as several Arrow chunks with no global order
            for pdf in pdf_iter:
                sessions.extend(
                    [int(t), int(t), 1]
                    for t in (pdf[ts_col].astype("int64") // 10**9))
        sessions.sort()
        merged: list[list[int]] = []
        for s in sessions:
            if merged and s[0] - merged[-1][1] <= gap_s:
                merged[-1][1] = max(merged[-1][1], s[1])
                merged[-1][2] += s[2]
            else:
                merged.append(s)
        wm_ms = state.getCurrentWatermarkMs()
        out = [s for s in merged if (s[1] + gap_s) * 1000 <= wm_ms]
        keep = [s for s in merged if (s[1] + gap_s) * 1000 > wm_ms]
        if keep:
            state.update(([s[0] for s in keep], [s[1] for s in keep],
                          [s[2] for s in keep]))
            # wake when the earliest buffered session becomes final;
            # must be strictly beyond the current watermark
            close_ms = min((s[1] + gap_s) * 1000 for s in keep)
            state.setTimeoutTimestamp(max(close_ms, wm_ms + 1))
        elif state.exists:
            state.remove()
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
