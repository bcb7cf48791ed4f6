"""Streaming sessionization equals the batch operator once every session
is closed (by a successor event or by watermark-driven timeout)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from research_knowledge_graph_spark.operators.sessions import sessionize
from research_knowledge_graph_spark.streaming.sessionize import (
    run_streaming_sessionize,
)


def _batch_sessions(ev):
    s = sessionize(ev, gap_minutes=30)
    ep = F.col("ts").cast("timestamp").cast("long")
    rows = (
        s.groupBy("user_id", "session_idx")
        .agg(
            F.min(ep).alias("session_start"),
            F.count(F.lit(1)).alias("n_events"),
            (F.max(ep) - F.min(ep)).alias("duration_sec"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .collect()
    )
    return sorted(
        (r.user_id, r.session_start, r.n_events, r.duration_sec, r.total_value)
        for r in rows
    )


def test_streaming_sessions_equal_batch(spark, tmp_path):
    ev = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .filter(F.col("user_id") < 20)
        .select("user_id", "ts", "event_id", "value")
    )
    expected = _batch_sessions(ev)
    assert len(expected) > 5

    inp, out, ckpt = (str(tmp_path / d) for d in ["in", "out", "ck"])
    ev.write.mode("append").parquet(inp)
    run_streaming_sessionize(spark, inp, out, ckpt, ev.schema)

    # two far-future sentinel drains push the watermark past every real
    # session's (last + gap) so the event-time timeouts fire
    max_ts = ev.agg(F.max("ts")).first()[0]
    for i, days in enumerate((10, 20)):
        sentinel = spark.createDataFrame(
            [(-1 - i, max_ts + datetime.timedelta(days=days), 10**9 + i, 0.0)],
            ev.schema,
        )
        sentinel.write.mode("append").parquet(inp)
        run_streaming_sessionize(spark, inp, out, ckpt, ev.schema)

    got = sorted(
        (r.user_id, r.session_start, r.n_events, r.duration_sec, r.total_value)
        for r in spark.read.parquet(out).collect()
        if r.user_id >= 0
    )
    assert got == expected


def test_streaming_sessions_null_user_group(spark, tmp_path):
    """A NULL group key forms its own group and must flow through session
    emission (regression: the vectorized path once built the user column
    with np.full(..., dtype=int64), which raises on None)."""
    base = datetime.datetime(2024, 1, 1)
    rows = [
        # two sessions for the null user, split by a > 30 min gap — the
        # second session's arrival CLOSES the first within a data batch
        (None, base, 1, 1.0),
        (None, base + datetime.timedelta(minutes=5), 2, 2.0),
        (None, base + datetime.timedelta(hours=2), 3, 4.0),
        (7, base, 4, 8.0),
    ]
    schema = "user_id long, ts timestamp, event_id long, value double"
    ev = spark.createDataFrame(rows, schema)

    inp, out, ckpt = (str(tmp_path / d) for d in ["in_n", "out_n", "ck_n"])
    ev.write.mode("append").parquet(inp)
    run_streaming_sessionize(spark, inp, out, ckpt, ev.schema)
    sentinel = spark.createDataFrame(
        [(99, base + datetime.timedelta(days=30), 100, 0.0)], schema
    )
    sentinel.write.mode("append").parquet(inp)
    run_streaming_sessionize(spark, inp, out, ckpt, ev.schema)

    got = {
        (r.user_id, r.n_events, r.total_value)
        for r in spark.read.parquet(out).collect()
        if r.user_id != 99
    }
    assert (None, 2, 3.0) in got  # null user's first (closed-in-batch) session
    assert (None, 1, 4.0) in got  # and the watermark-closed one
    assert (7, 1, 8.0) in got
