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

Skew note: the shuffle key is user_id — a bot-like hot user serializes on
one reducer's sort. At web scale, pre-split hot users by day
(``partitionBy(user, days(ts))``) before sessionizing if per-day session
splits are acceptable, or cap events per user upstream.

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
) -> DataFrame:
    """Per-event session index: (user, ts, event_id, session_idx) where
    session_idx starts at 1 per user and increments when the gap from the
    previous event exceeds ``gap_minutes``."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    # parquet timestamps read as TIMESTAMP_NTZ, which has no direct long
    # cast under ANSI — the session timezone is pinned UTC, so the
    # NTZ→timestamp→long path equals DuckDB's epoch()
    epoch = F.col(ts_col).cast("timestamp").cast("long")
    prev_epoch = F.lag(epoch).over(w)
    is_new = F.when(
        prev_epoch.isNull() | (epoch - prev_epoch > gap_minutes * 60),
        F.lit(1),
    ).otherwise(F.lit(0))
    run = Window.partitionBy(user_col).orderBy(ts_col, id_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return events.select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).alias("ts"),
        F.col(id_col).alias("event_id"),
        F.col("value"),
    ).withColumn("session_idx", F.sum(is_new).over(run))


def session_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """One row per (user, session): event count, duration, total value.
    Two window passes fuse into one sort (same partitioning/ordering);
    the aggregate is an ordinary hash-agg on (user, session_idx)."""
    s = sessionize(events, user_col, ts_col, id_col, gap_minutes)
    ep = F.col("ts").cast("timestamp").cast("long")
    return s.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max(ep) - F.min(ep)).alias("duration_sec"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
