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
"""

from __future__ import annotations

from collections.abc import Iterator

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
        open_s = list(state.get) if state.exists else None
        closed = []
        for ts, val in zip(
            (rows["ts"].astype("int64") // 1_000_000_000).tolist(),
            rows["value"].tolist(),
        ):
            if open_s is None:
                open_s = [ts, ts, 1, float(val)]
            elif ts - open_s[1] > gap:
                closed.append(
                    (user, open_s[0], open_s[2], open_s[1] - open_s[0], round(open_s[3], 2))
                )
                open_s = [ts, ts, 1, float(val)]
            else:
                open_s[1] = max(open_s[1], ts)
                open_s[2] += 1
                open_s[3] += float(val)
        state.update(tuple(open_s))
        # close by watermark: fire when event time passes last + gap
        timeout_ms = (open_s[1] + gap) * 1000
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(timeout_ms, wm + 1))
        if closed:
            yield pd.DataFrame(
                closed,
                columns=["user_id", "session_start", "n_events", "duration_sec", "total_value"],
            )

    return fn


def sessionize_stream(
    stream: DataFrame, gap_minutes: int = 30, watermark: str = "1 minute"
) -> DataFrame:
    """events stream (user_id, ts, event_id, value, …) → closed-session
    rows, emitted when a successor event or the watermark closes them."""
    s = stream.select(
        "user_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "event_id",
        "value",
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
