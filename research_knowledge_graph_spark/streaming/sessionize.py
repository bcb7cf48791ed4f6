"""Streaming gap-based sessionization — the unbounded twin of
``operators/sessions.py`` (same gap semantics, same outputs), built on
``applyInPandasWithState`` with EVENT-TIME timeouts:

- stream is grouped by user; each group's state holds the OPEN session
  (start, last event time, count, value sum);
- an arriving event either extends the open session or closes it (gap >
  ``gap_minutes``) — closed sessions are emitted immediately;
- a session with no successor event is closed by the event-time TIMEOUT:
  when the watermark passes ``last_ts + gap``, the state times out and the
  session is emitted. Watermark + timeout are what bound state: one open
  session per active user, nothing retained after expiry.

Batch/stream equivalence (pinned by test): the multiset of emitted
sessions equals ``operators.sessions.session_stats`` over the same events
once every session has been closed by a later event or by watermark
advance.

The gap walk is VECTORIZED within each Arrow batch (numpy boundary mask →
segment starts → ``add.reduceat`` aggregates); only the carried-in open
session is handled scalar. For a bot-like user delivering 10⁶ events in
one trigger the per-event cost is a few numpy passes, not a Python loop
(round-2 verdict finding #2).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.LongType()),  # epoch seconds
        T.StructField("n_events", T.LongType()),
        T.StructField("duration_sec", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("start", T.LongType()),
        T.StructField("last", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("val", T.DoubleType()),
    ]
)


def _make_session_fn(gap_minutes: int):
    gap = gap_minutes * 60

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        user = key[0]
        if state.hasTimedOut:
            start, last, n, val = state.get
            state.remove()
            yield pd.DataFrame(
                [(user, start, n, last - start, round(val, 2))],
                columns=["user_id", "session_start", "n_events", "duration_sec", "total_value"],
            )
            return

        rows = pd.concat(list(pdfs), ignore_index=True).sort_values(
            ["ts", "event_id"], kind="mergesort"
        )
        ts = rows["ts"].astype("int64").to_numpy() // 1_000_000_000
        vals = rows["value"].to_numpy(dtype="float64")
        if len(ts) == 0:
            if state.exists:  # keep the open session + its timeout armed
                last = state.get[1]
                wm = state.getCurrentWatermarkMs()
                state.setTimeoutTimestamp(max((last + gap) * 1000, wm + 1))
            return

        # Vectorized gap walk (round-2 verdict finding #2: the old per-row
        # Python loop was the bottleneck for bot-like users with 10^6 events
        # per trigger). Sorted within the batch, a session's running-max
        # last-seen time is just the previous element — only the carried-in
        # open session's ``last`` can exceed it, and once the first gap
        # boundary fires every later ts is > last0 + gap, so taking
        # max(prev_ts, last0) everywhere is exact, not an approximation.
        carry = list(state.get) if state.exists else None
        if carry is not None:
            prev = np.maximum(np.concatenate(([carry[1]], ts[:-1])), carry[1])
        else:
            prev = np.concatenate((ts[:1], ts[:-1]))  # no boundary at row 0
        boundary = (ts - prev) > gap
        starts = np.flatnonzero(np.concatenate(([True], boundary[1:])))
        ends = np.concatenate((starts[1:], [len(ts)]))
        seg_start = ts[starts].copy()
        seg_last = ts[ends - 1].copy()  # sorted ⇒ max of segment
        seg_n = (ends - starts).astype("int64")
        seg_val = np.add.reduceat(vals, starts)

        closed_carry = None
        if carry is not None:
            start0, last0, n0, val0 = carry
            if boundary[0]:
                closed_carry = (user, start0, n0, last0 - start0, round(val0, 2))
            else:  # batch segment 0 continues the open session
                seg_start[0] = start0
                seg_last[0] = max(last0, seg_last[0])
                seg_n[0] += n0
                seg_val[0] = val0 + seg_val[0]

        open_s = (int(seg_start[-1]), int(seg_last[-1]), int(seg_n[-1]), float(seg_val[-1]))
        state.update(open_s)
        # close by watermark: fire when event time passes last + gap
        timeout_ms = (open_s[1] + gap) * 1000
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(timeout_ms, wm + 1))

        k = len(starts)
        if closed_carry is not None or k > 1:
            out = pd.DataFrame(
                {
                    # plain list, not np.full(..., dtype=int64): the group
                    # key can be NULL (user is None) and must flow through
                    "user_id": [user] * (k - 1),
                    "session_start": seg_start[: k - 1],
                    "n_events": seg_n[: k - 1],
                    "duration_sec": (seg_last - seg_start)[: k - 1],
                    "total_value": np.round(seg_val[: k - 1], 2),
                }
            )
            if closed_carry is not None:
                out = pd.concat(
                    [pd.DataFrame([closed_carry], columns=list(out.columns)), out],
                    ignore_index=True,
                )
            yield out

    return fn


def sessionize_stream(
    stream: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "1 minute",
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str | None = "value",
) -> DataFrame:
    """events stream (user_id, ts, event_id[, value], …) → closed-session
    rows, emitted when a successor event or the watermark closes them.
    ``value_col=None`` works on event logs without a value column
    (total_value is then 0.0)."""
    s = stream.select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).cast("timestamp").alias("ts"),
        F.col(id_col).alias("event_id"),
        (F.lit(0.0) if value_col is None else F.col(value_col).cast("double")).alias("value"),
    ).withWatermark("ts", watermark)
    return s.groupBy("user_id").applyInPandasWithState(
        _make_session_fn(gap_minutes),
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def run_streaming_sessionize(
    spark, input_dir: str, output_dir: str, checkpoint_dir: str, schema,
    gap_minutes: int = 30,
) -> None:
    # no maxFilesPerTrigger: one micro-batch per drain, so a drain's rows
    # for a user reach the state function together (arrival order within a
    # drain is then irrelevant to the gap walk)
    stream = spark.readStream.schema(schema).parquet(input_dir)
    q = (
        sessionize_stream(stream, gap_minutes)
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
