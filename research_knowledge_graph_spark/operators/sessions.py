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
    # rename to the canonical output names FIRST, then build every window
    # expression against those names — building them against the caller's
    # names and attaching after the select left non-default user_col/
    # ts_col/id_col unresolvable (every documented rename crashed)
    cols = [
        F.col(user_col).alias("user_id"),
        F.col(ts_col).alias("ts"),
        F.col(id_col).alias("event_id"),
    ]
    if value_col is not None:
        cols.append(F.col(value_col).alias("value"))
    if split_by == "day":
        cols.append(F.to_date(F.col(ts_col).cast("timestamp")).alias("session_day"))
    out = events.select(*cols)
    # parquet timestamps read as TIMESTAMP_NTZ, which has no direct long
    # cast under ANSI — the session timezone is pinned UTC, so the
    # NTZ→timestamp→long path equals DuckDB's epoch()
    epoch = F.col("ts").cast("timestamp").cast("long")
    part = ["user_id"] if split_by is None else ["user_id", "session_day"]
    # order by the SAME casted expression the gap is measured on — ordering
    # by the raw column would sort string timestamps lexicographically while
    # gaps compare epochs (ties still broken by event_id; for timestamp
    # columns the two orders coincide)
    w = Window.partitionBy(*part).orderBy(epoch.asc(), F.col("event_id").asc())
    prev_epoch = F.lag(epoch).over(w)
    is_new = F.when(
        prev_epoch.isNull() | (epoch - prev_epoch > gap_minutes * 60),
        F.lit(1),
    ).otherwise(F.lit(0))
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return out.withColumn("session_idx", F.sum(is_new).over(run))


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


def _typed_gaps(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """The ONE copy of the per-(user, type) inter-event gap frame shared
    by :func:`burstiness_profile` and :func:`gap_histogram` (the oracle
    side shares the matching ``_GAPS_SQL`` literal): exact integer-µs
    gaps off a (user, type)-keyed lag window, floored to integer seconds
    (``gap_us div 10⁶``) so downstream squares stay in int64. Returns
    (event_type, user_id, gap_s); first events per sequence (NULL gap)
    are excluded."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(user_col, type_col).orderBy(
        us.asc(), F.col(id_col).asc()
    )
    return (
        events.select(
            F.col(type_col).alias("event_type"),
            F.col(user_col).alias("user_id"),
            (us - F.lag(us).over(w)).cast("long").alias("gap_us"),
        )
        .filter(F.col("gap_us").isNotNull())
        .select(
            "event_type",
            "user_id",
            F.expr("gap_us div 1000000L").cast("long").alias("gap_s"),
        )
    )


def burstiness_profile(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-event-type BURSTINESS of the inter-event gap process — the
    Goh–Barabási "is this cadence periodic, Poisson, or bursty" read that
    separates machine heartbeats (periodic, burstiness → −1) from human
    activity (bursty, → +1), pooled over every per-(user, type) gap
    sequence. Completes the cadence family: v12 gives per-user gap
    moments, v27 the daily periodicity; this is the dispersion SHAPE of
    the gap distribution itself.

    Instead of the classic B = (σ−μ)/(σ+μ) (a square root — not exact
    cross-engine), we publish the algebraically equivalent-in-sign
    dispersion surrogate B' = (CV²−1)/(CV²+1) = 1 − 2S²/(nQ) where
    S = Σgap, Q = Σgap², n = #gaps: a monotone transform of B with the
    same fixed points (periodic −1, Poisson 0, bursty → +1) and PURE
    integer inputs. Gaps are integer SECONDS (``gap_us div 1_000_000`` —
    exact floor) so Q stays in int64 (µs² would overflow at ~10¹³);
    n/S/Q are exact bigints, and the one double expression at the end is
    written in the identical IEEE shape on both engines (the t42 rule:
    cast to double BEFORE the products so neither engine's bigint
    multiply overflows — n·Q and 2S² may exceed int64 even though each
    factor fits). Overflow bound (ANSI fails loudly): Q ≤ 9.2·10¹⁸ binds
    at e.g. 10⁴ gaps of 10⁷ s — far past any realistic event stream; the
    t33/v24 documented-bound precedent.

    Types whose gaps all floor to 0 s (sub-second-only cadence) carry no
    dispersion information at second resolution and are dropped (the v12
    baseline-less rule; the oracle filters identically — and a sub-second
    bot stream should be read off v12's exact-µs min/avg instead).

    Returns (event_type, n_sequences, n_gaps, sum_gap_s, sum_gap2_s,
    mean_gap_s, burstiness). Scale: one lag window on the (user, type)
    composite key (finer than v12's user key — strictly better skew
    spread), then a map-side-combinable hash-agg onto #types keys; the
    countDistinct runs on the already-reduced gaps frame."""
    gaps = _typed_gaps(events, user_col, type_col, ts_col, id_col)
    agg = gaps.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("n_sequences"),
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.sum("gap_s").cast("long").alias("sum_gap_s"),
        F.sum(F.expr("gap_s * gap_s")).cast("long").alias("sum_gap2_s"),
    )
    return (
        agg.filter(F.col("sum_gap2_s") > 0)
        .withColumn(
            "mean_gap_s",
            F.expr("sum_gap_s div n_gaps").cast("long"),
        )
        .withColumn(
            "burstiness",
            # identical IEEE double shape as the DuckDB oracle: casts
            # BEFORE the products (t42's overflow rule), left-assoc (2·S)·S
            F.expr(
                "CAST(1 AS DOUBLE) - (2 * CAST(sum_gap_s AS DOUBLE)"
                " * CAST(sum_gap_s AS DOUBLE))"
                " / (CAST(n_gaps AS DOUBLE) * CAST(sum_gap2_s AS DOUBLE))"
            ),
        )
    )


def gap_histogram(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-event-type LOG₂-bucketed inter-event gap histogram — the full
    marginal the cadence family's scalars summarize (v12 moments, v28
    the dispersion scalar, this the distribution itself): a bot-mixed
    stream shows up as a sub-second spike PLUS a diurnal hump, which no
    single scalar can separate. Buckets are exact integers both engines:
    bucket 0 holds sub-second gaps (gap_s = 0), bucket b ≥ 1 holds
    gap_s ∈ [2^(b−1), 2^b) via ``length(bin(gap_s))`` — the binary
    bit-length, a pure string-length expression Spark and DuckDB compute
    identically (no float log2 ever touches data; the v26
    no-float-log10 rule). ≤ ~40 buckets per type by construction.

    Returns (event_type, bucket, n_gaps, min_gap_s, max_gap_s,
    share_ppm) — counts and extrema exact bigints, share_ppm the
    per-type floor share computed by a window over the reduced
    #types × #buckets frame (v23's reduced-frame rule). Empty buckets
    are absent on both sides (no downstream alignment needs the spine —
    unlike v26/v27 nothing pairs rows across buckets).

    Scale: the ONE shared :func:`_typed_gaps` lag window, then a
    map-side-combinable (type, bucket) hash-agg; everything after runs
    on the bounded histogram frame."""
    gaps = _typed_gaps(events, user_col, type_col, ts_col, id_col)
    h = gaps.select(
        "event_type",
        F.expr(
            "CASE WHEN gap_s = 0 THEN 0L"
            " ELSE CAST(length(bin(gap_s)) AS BIGINT) END"
        ).alias("bucket"),
        "gap_s",
    ).groupBy("event_type", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.min("gap_s").cast("long").alias("min_gap_s"),
        F.max("gap_s").cast("long").alias("max_gap_s"),
    )
    total = F.sum("n_gaps").over(Window.partitionBy("event_type"))
    return h.withColumn("total_gaps", total.cast("long")).select(
        "event_type",
        "bucket",
        "n_gaps",
        "min_gap_s",
        "max_gap_s",
        F.expr("(1000000 * n_gaps) div total_gaps")
        .cast("long")
        .alias("share_ppm"),
    )
