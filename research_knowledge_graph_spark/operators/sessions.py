"""Event sessionization — gap-based session assignment over an event log.

A training-data pipeline's clickstream/telemetry shaping primitive: events
of one user separated by more than ``gap`` belong to different sessions.
Expressed entirely with window functions (lag → boundary flag → running
sum), so it is one shuffle on the user key + a per-partition sort — no
UDF, no state store — and ANSI-SQL-expressible for the DuckDB oracle.

Determinism: events are ordered by (ts, event_id); equal-timestamp ties
cannot flip a session boundary (their gap is 0) and all session aggregates
are order-insensitive, but the explicit tie-break keeps row-level session
indexes reproducible across engines.

Skew: the shuffle key is user_id — a bot-like hot user serializes on one
reducer's sort. ``split_by="day"`` widens the partition key to
(user, utc-day of ts): the hot user's rows spread across one partition per
active day, bounding any reducer at its busiest single day. CAVEAT (the
explicit semantic tradeoff): a session spanning midnight is SPLIT at the
day boundary — session identity becomes (user_id, session_day,
session_idx) and the output carries the extra ``session_day`` column.
Acceptable for bot traffic shaping; use the default single-key mode when
cross-midnight sessions must stay whole.

For UNBOUNDED streams the same semantics run as
``applyInPandasWithState`` with a session timeout; this batch operator is
the backfill/oracle path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_minutes: int = 30,
    value_col: str | None = "value",
    split_by: str | None = None,
) -> DataFrame:
    """Per-event session index: (user, ts, event_id[, value], session_idx)
    where session_idx starts at 1 per user and increments when the gap from
    the previous event exceeds ``gap_minutes``.

    ``value_col=None`` works on event logs without a value column (the
    output then omits it). ``split_by="day"`` adds ``session_day`` to the
    partition key and output (see module docstring for the midnight-split
    caveat)."""
    if split_by not in (None, "day"):
        raise ValueError(f"split_by must be None or 'day', got {split_by!r}")
    # parquet timestamps read as TIMESTAMP_NTZ, which has no direct long
    # cast under ANSI — the session timezone is pinned UTC, so the
    # NTZ→timestamp→long path equals DuckDB's epoch()
    epoch = F.col(ts_col).cast("timestamp").cast("long")
    part = [user_col] if split_by is None else [user_col, "session_day"]
    # order by the SAME casted expression the gap is measured on — ordering
    # by the raw column would sort string timestamps lexicographically while
    # gaps compare epochs (ties still broken by id_col; for timestamp
    # columns the two orders coincide)
    w = Window.partitionBy(*part).orderBy(epoch.asc(), F.col(id_col).asc())
    prev_epoch = F.lag(epoch).over(w)
    is_new = F.when(
        prev_epoch.isNull() | (epoch - prev_epoch > gap_minutes * 60),
        F.lit(1),
    ).otherwise(F.lit(0))
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cols = [
        F.col(user_col).alias("user_id"),
        F.col(ts_col).alias("ts"),
        F.col(id_col).alias("event_id"),
    ]
    if value_col is not None:
        cols.append(F.col(value_col).alias("value"))
    out = events
    if split_by == "day":
        out = out.withColumn("session_day", F.to_date(F.col(ts_col).cast("timestamp")))
        cols.append(F.col("session_day"))
    return out.select(*cols).withColumn("session_idx", F.sum(is_new).over(run))


def session_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_minutes: int = 30,
    value_col: str | None = "value",
    split_by: str | None = None,
) -> DataFrame:
    """One row per (user, session): event count, duration, total value.
    Two window passes fuse into one sort (same partitioning/ordering);
    the aggregate is an ordinary hash-agg on (user, session_idx).
    ``value_col=None`` omits the total_value aggregate."""
    s = sessionize(events, user_col, ts_col, id_col, gap_minutes, value_col, split_by)
    ep = F.col("ts").cast("timestamp").cast("long")
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        (F.max(ep) - F.min(ep)).alias("duration_sec"),
    ]
    if value_col is not None:
        aggs.append(F.round(F.sum("value"), 2).alias("total_value"))
    keys = ["user_id", "session_idx"] if split_by is None else [
        "user_id", "session_day", "session_idx"
    ]
    return s.groupBy(*keys).agg(*aggs)


def interarrival_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-user inter-arrival gap statistics — the event-cadence profile a
    telemetry/abuse pipeline reads before rate-limiting or bot filtering
    (a burst of sub-second gaps is the classic automation signature; the
    reference's ingest scheduler reasons about paper-arrival cadence the
    same way, ``src/services/ingestion_service.py`` pacing).

    One window pass (lag over (user, ts, id) — the same single shuffle +
    sort shape as :func:`sessionize`) followed by an ordinary hash-agg.
    Users with a single event have no gap and are excluded (documented;
    the oracle filters identically).

    Exactness: gaps are integer MICROSECONDS (``unix_micros``), so min /
    max / count / sum are exact bigints and the mean is published as
    ``avg_gap_us = sum div count`` — floor integer division, the t23/g30
    fixed-point pattern, bit-reproducible across engines. Ties on ts are
    broken by ``id_col``; equal-timestamp neighbors yield gap 0, which is
    order-insensitive under the tie-break.

    Skew: the shuffle key is the user — a hot bot user serializes one
    reducer's sort, the same bound (and the same ``split_by``-style
    mitigation path) documented on :func:`sessionize`."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    # order by the measured expression itself (see sessionize: a raw string
    # ts column would sort lexicographically while gaps compare micros)
    w = Window.partitionBy(user_col).orderBy(us.asc(), F.col(id_col).asc())
    gap = (us - F.lag(us).over(w)).alias("gap_us")
    gaps = events.select(F.col(user_col).alias("user_id"), gap).filter(
        F.col("gap_us").isNotNull()
    )
    return gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.min("gap_us").cast("long").alias("min_gap_us"),
        F.max("gap_us").cast("long").alias("max_gap_us"),
        F.expr("sum(gap_us) div count(1)").cast("long").alias("avg_gap_us"),
    )
