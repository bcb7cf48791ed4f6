"""Watermarked stream-stream interval join.

The correlation primitive a continuous pipeline needs (fetch↔extraction,
click↔conversion, request↔response): two unbounded streams joined on a key
where the right event must fall inside a time interval after the left
event. Structured Streaming keeps both sides' unmatched rows in state;
the WATERMARK plus the event-time RANGE condition are what let it evict —
without them state grows forever, so this operator makes both mandatory.

State bound: left rows live until watermark passes `left_ts +
within_minutes`; right rows until watermark passes `right_ts`. State is
keyed by the join key — uniform if the key is (or includes) a hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark: str = "10 minutes",
    within_minutes: int = 30,
    right_prefix: str = "r_",
) -> DataFrame:
    """Inner join: left ⨝ right on ``key`` with
    ``left_ts <= right_ts <= left_ts + within_minutes``. Right columns are
    prefixed to avoid collisions. Works identically on batch DataFrames
    (same expressions, no watermark state) — the oracle/backfill path."""
    l = left.withColumn("_lts", F.col(left_ts).cast("timestamp"))
    r = right.withColumn("_rts", F.col(right_ts).cast("timestamp"))
    if l.isStreaming:
        l = l.withWatermark("_lts", watermark)
    if r.isStreaming:
        r = r.withWatermark("_rts", watermark)
    r = r.select(
        F.col(key).alias(f"{right_prefix}{key}"),
        "_rts",
        *[
            F.col(c).alias(f"{right_prefix}{c}")
            for c in r.columns
            if c not in (key, "_rts")
        ],
    )
    cond = (
        (F.col(key) == F.col(f"{right_prefix}{key}"))
        & (F.col("_rts") >= F.col("_lts"))
        & (F.col("_rts") <= F.col("_lts") + F.expr(f"INTERVAL {within_minutes} MINUTES"))
    )
    return l.join(r, cond, "inner").drop(f"{right_prefix}{key}")
