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


def test_interarrival_stats_hand_computed(spark):
    """Gaps in exact integer micros; single-event users excluded; mean is
    floor(sum/count); equal-ts ties give a 0 gap (event_id tie-break)."""
    from research_knowledge_graph_spark.operators.sessions import interarrival_stats

    ev = spark.createDataFrame(
        [
            # user 1: ts 0s, 1s, 4s → gaps 1_000_000, 3_000_000
            (1, 1, "1970-01-01 00:00:00"),
            (2, 1, "1970-01-01 00:00:01"),
            (3, 1, "1970-01-01 00:00:04"),
            # user 2: single event → excluded
            (4, 2, "1970-01-01 00:00:09"),
            # user 3: tie on ts (ids 5,6) then +1s → gaps 0, 1_000_000
            (5, 3, "1970-01-01 00:00:02"),
            (6, 3, "1970-01-01 00:00:02"),
            (7, 3, "1970-01-01 00:00:03"),
        ],
        "event_id long, user_id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    rows = {r.user_id: r for r in interarrival_stats(ev).collect()}
    assert set(rows) == {1, 3}
    assert (rows[1].n_gaps, rows[1].min_gap_us, rows[1].max_gap_us, rows[1].avg_gap_us) == (
        2, 1_000_000, 3_000_000, 2_000_000,
    )
    assert (rows[3].n_gaps, rows[3].min_gap_us, rows[3].max_gap_us, rows[3].avg_gap_us) == (
        2, 0, 1_000_000, 500_000,
    )


def test_burstiness_profile_planted(spark):
    """Planted extremes pin the dispersion surrogate: a constant-gap
    (periodic) type reads exactly -1.0, a one-big-gap-rest-zero bursty
    type reads exactly 1 - 2/n, an all-sub-second type is dropped (S=Q=0
    at second resolution), and sequences pool per (user, type) — the gap
    BETWEEN users never enters."""
    from research_knowledge_graph_spark.operators.sessions import (
        burstiness_profile,
    )

    rows = []
    eid = 0
    # type "beat": user 1, gaps exactly 10s x 4 (periodic -> -1.0)
    for i in range(5):
        rows.append((eid, 1, "beat", f"1970-01-01 00:00:{10*i:02d}")); eid += 1
    # type "burst": user 2, 8 gaps = seven 0s (same second, distinct ids,
    # microsecond 0) + one 80s jump -> burst = 1 - 2/8 = 0.75
    for i in range(8):
        rows.append((eid, 2, "burst", "1970-01-01 00:01:00")); eid += 1
    rows.append((eid, 2, "burst", "1970-01-01 00:02:20")); eid += 1
    # type "subsec": user 3, gaps 0.5s each -> floor to 0s -> dropped
    for frac in ("00.0", "00.5", "01.0"):
        rows.append((eid, 3, "subsec", f"1970-01-01 00:03:{frac}")); eid += 1
    # type "beat" also has user 4 with ONE event: no gap, not a sequence
    rows.append((eid, 4, "beat", "1970-01-01 09:00:00")); eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {r.event_type: r for r in burstiness_profile(ev).collect()}
    assert set(got) == {"beat", "burst"}  # subsec dropped by the S=Q=0 rule
    b = got["beat"]
    # 4 gaps of 10s: S=40, Q=400, burst = 1 - 2*1600/(4*400) = -1.0 exact
    assert (b.n_sequences, b.n_gaps, b.sum_gap_s, b.sum_gap2_s) == (1, 4, 40, 400)
    assert b.mean_gap_s == 10
    assert b.burstiness == -1.0
    u = got["burst"]
    # 8 gaps: seven 0s + one 80s: S=80, Q=6400 -> 1 - 2*6400/(8*6400) = 0.75
    assert (u.n_sequences, u.n_gaps, u.sum_gap_s, u.sum_gap2_s) == (1, 8, 80, 6400)
    assert u.mean_gap_s == 10
    assert u.burstiness == 0.75


def test_gap_histogram_planted(spark):
    """Bucket rule pinned at the boundaries: gap 0s -> bucket 0, 1s ->
    bucket 1, 2-3s -> bucket 2, 4-7s -> bucket 3; shares are per-type
    floor ppm; gaps never pool across (user, type) sequences."""
    from research_knowledge_graph_spark.operators.sessions import (
        gap_histogram,
    )

    rows, eid = [], 0
    # user 1, type "t": events at 0,1,3,7,7 -> gaps 1,2,4,0
    for sec, frac in ((0, 0), (1, 0), (3, 0), (7, 0), (7, 1)):
        rows.append((eid, 1, "t", f"1970-01-01 00:00:{sec:02d}.{frac}"))
        eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {r.bucket: r for r in gap_histogram(ev).collect()}
    # 4 gaps: 1s (bucket 1), 2s (bucket 2), 4s (bucket 3), 0.1s -> 0s (bucket 0)
    assert {b: (r.n_gaps, r.min_gap_s, r.max_gap_s) for b, r in got.items()} == {
        0: (1, 0, 0), 1: (1, 1, 1), 2: (1, 2, 2), 3: (1, 4, 4),
    }
    assert all(r.share_ppm == 250_000 for r in got.values())


def test_sessionize_non_default_column_names(spark):
    """The window/gap expressions must resolve AFTER the canonical-name
    select — building them from the caller's names crashed every
    documented rename with UNRESOLVED_COLUMN before the fix."""
    t0 = datetime.datetime(2024, 1, 1, 12, 0)
    ev = spark.createDataFrame(
        [
            ("u", t0, "e1", 1.0),
            ("u", t0 + datetime.timedelta(minutes=5), "e2", 2.0),
            ("u", t0 + datetime.timedelta(minutes=90), "e3", 3.0),
        ],
        "uid string, event_ts timestamp, eid string, amount double",
    )
    got = sessionize(
        ev,
        user_col="uid",
        ts_col="event_ts",
        id_col="eid",
        value_col="amount",
    )
    rows = {(r.event_id, r.session_idx) for r in got.collect()}
    assert rows == {("e1", 1), ("e2", 1), ("e3", 2)}
    assert set(got.columns) == {"user_id", "ts", "event_id", "value", "session_idx"}
    # split_by="day" path renames too
    got2 = sessionize(
        ev, user_col="uid", ts_col="event_ts", id_col="eid",
        value_col=None, split_by="day",
    )
    assert {(r.event_id, r.session_idx) for r in got2.collect()} == {
        ("e1", 1), ("e2", 1), ("e3", 2)
    }
