"""Temporal join operators Spark lacks as built-ins: AS-OF join and
banded RANGE join.

Both are staples of event/feature pipelines (attribution, point-in-time
feature lookup, nearby-event correlation) and both have naive forms that
do not survive scale — an inequality θ-join degenerates to a per-key cross
product. The implementations here are compositions of exchange + sort +
window / equi-join only (no UDFs, no per-row Python), so Catalyst and AQE
treat them like any other shuffle stage.

AS-OF join (``asof_join``): for each left row, the single latest right row
with ``right_ts <= left_ts`` on the same key. Implementation is the
classic union trick: tag both sides, sort each key's timeline once
(right rows ordered before left rows at equal timestamps, making the
match inclusive), and carry the most recent right payload forward with
``last(..., ignorenulls=True)`` over the running window. ONE shuffle on
the key, one sort, zero joins — at 10¹² rows this is the plan you want:
cost is the same as any windowed aggregation over (key, ts).

Banded RANGE join (``range_join_banded``): all (left, right) pairs on the
same key with ``right_ts`` within ``[left_ts + lower, left_ts + upper]``.
A raw key-equi-join + filter pays |L_k|×|R_k| per key — quadratic on hot
keys. Banding quantizes time into buckets of the window width: each right
row lands in exactly one (key, band); each left row probes only the
band(s) its window can overlap (≤2 when the band width equals the window
span). The join becomes a plain equi-join on (key, band) — per-key cost
falls from |L||R| to Σ_band |L_b|×|R_b|, and AQE's skew splitting applies
to the banded key like any other. Same idea as the stream-stream interval
join's state bound (``streaming/joins.py``), applied to batch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


from research_knowledge_graph_spark.functions.guards import (
    guard_columns as _guard_columns,
)


def _orderable(dt) -> bool:
    """True when the type participates in Spark's total ordering (maps do
    not; arrays/structs are orderable iff their elements are)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    if isinstance(dt, MapType):
        return False
    if isinstance(dt, ArrayType):
        return _orderable(dt.elementType)
    if isinstance(dt, StructType):
        return all(_orderable(f.dataType) for f in dt.fields)
    return True


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    prefix: str = "r_",
    split_by: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_ts <= left_ts`` (inclusive) on the same ``on`` key; left rows
    with no prior right row are dropped (inner as-of, matching DuckDB's
    ``ASOF JOIN``). ``direction="forward"`` flips the match: the EARLIEST
    right row with ``right_ts >= left_ts`` (next-event attribution — "the
    next purchase after this error"); the window simply walks time
    reversed, same single-shuffle plan. ``right_cols`` are the right-side
    columns to carry, emitted as ``{prefix}{col}``. NULL join keys never
    match (standard equi-join semantics — a window partition would
    otherwise group NULL keys together), so null-keyed rows are filtered
    from both sides. NULL timestamps are likewise filtered from both
    sides: a NULL ts can never satisfy the as-of inequality (DuckDB's
    ASOF comparison is never true on NULL), but inside the window walk a
    NULL-ts left row would sort past every right row and grab the
    boundary payload, and a NULL-ts right row would sort before-all-time
    and donate its payload to rows with no real match.

    Tie-break: when several right rows share (key, right_ts), the one with
    the LARGEST payload struct wins, deterministically across runs and
    partitionings (the payload rides in the window ordering). If a payload
    column is unorderable (a map), ties fall back to engine order — pass an
    id column in ``right_cols`` to restore determinism.

    Skew note: the window serializes each key's full merged timeline on one
    reducer — inherent to windowed as-of. A bot/celebrity key with millions
    of rows bounds that reducer; ``split_by="day"`` coarse time-splits the
    timeline into per-(key, calendar-day) windows (the sessionizer's
    identical defense): each day's window sees a synthetic carry-in row
    holding the last right payload of the nearest earlier day, computed on
    a tiny (key, day)-grained table, so matches are IDENTICAL to the
    unsplit form — an as-of match never looks past the most recent prior
    right row. Requires timestamp/date ``_ts`` columns — an epoch NUMBER
    is rejected fail-fast (cast-from-long reads seconds, so a micros
    column would silently collapse every row into one day); costs one
    extra aggregate + one tiny window over the (key, day) spine."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    fwd = direction == "forward"
    scratch = {"_ts", "_rp", "_isr", "_m"}
    if split_by is not None:
        if split_by != "day":
            raise ValueError(f"split_by must be None or 'day', got {split_by!r}")
        scratch |= {"_day", "_syn", "_lastrp", "_carry", "_rn"}
    _guard_columns(left, scratch, "asof_join left input")
    _guard_columns(right, scratch, "asof_join right input")
    _guard_columns(
        left,
        {f"{prefix}{c}" for c in right_cols},
        "asof_join left input (collides with prefixed right output columns)",
    )
    for k in on:
        left = left.filter(F.col(k).isNotNull())
        right = right.filter(F.col(k).isNotNull())
    # NULL ts never satisfies the as-of inequality on either side (see
    # docstring) — drop before the union so the window walk can't hand a
    # NULL-ts row (sorted at the walk's far end by the nulls placement)
    # a payload it never legitimately matched
    left = left.filter(F.col(left_ts).isNotNull())
    right = right.filter(F.col(right_ts).isNotNull())
    lcols = [c for c in left.columns if c not in on]
    payload = F.struct(*[F.col(c).alias(c) for c in right_cols])
    r = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        payload.alias("_rp"),
        F.lit(1).alias("_isr"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
    )
    l = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(None).cast(r.schema["_rp"].dataType).alias("_rp"),
        F.lit(0).alias("_isr"),
        *lcols,
    )
    u = l.unionByName(r)
    rp_orderable = _orderable(r.schema["_rp"].dataType)
    # time runs forward (backward match) or reversed (forward match); in
    # either orientation: right before left at equal _ts ⇒ an exact-tie
    # right row IS visible; tied right rows break by the payload struct
    # (largest wins) so the match is a pure function of the data, not of
    # partitioning — maps are unorderable, so such payloads keep engine
    # order (see docstring)
    _tdir = (lambda c: c.desc()) if fwd else (lambda c: c.asc())
    order_cols = [_tdir(F.col("_ts")), F.col("_isr").desc()]
    if split_by is None:
        part_cols = list(on)
    else:
        from pyspark.sql.types import DateType, TimestampNTZType, TimestampType

        ts_type = r.schema["_ts"].dataType
        if not isinstance(ts_type, (DateType, TimestampNTZType, TimestampType)):
            # an epoch-micros LONG cast to timestamp reads as SECONDS:
            # every row lands in one saturated _day and the split silently
            # no-ops (or throws under ANSI) — refuse instead
            raise ValueError(
                "asof_join(split_by='day') requires timestamp/date ts "
                f"columns, got {ts_type.simpleString()} — convert epoch "
                "numbers with to_timestamp/timestamp_micros first"
            )
        day = F.date_trunc("day", F.col("_ts").cast("timestamp"))
        u = u.withColumn("_day", day).withColumn("_syn", F.lit(1))
        # per-(key, day) boundary right payload (last of the day backward,
        # first of the day forward; ties to the largest payload — the same
        # pick the main window makes), forward-filled along the tiny
        # (key, day) spine: the carry-in each day's window needs
        rd_order = [F.col("_ts").asc() if fwd else F.col("_ts").desc()]
        if rp_orderable:
            rd_order.append(F.col("_rp").desc())
        wrd = Window.partitionBy(*on, "_day").orderBy(*rd_order)
        rd = (
            u.filter(F.col("_isr") == 1)
            .withColumn("_rn", F.row_number().over(wrd))
            .filter(F.col("_rn") == 1)
            .select(*on, "_day", F.col("_rp").alias("_lastrp"))
        )
        spine = u.select(*on, "_day").distinct()
        wd = (
            Window.partitionBy(*on)
            .orderBy(_tdir(F.col("_day")))
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carried = (
            spine.join(rd, [*on, "_day"], "left")
            .withColumn("_carry", F.last("_lastrp", ignorenulls=True).over(wd))
            .filter(F.col("_carry").isNotNull())
        )
        # the synthetic carry-in sorts before every real row of its day in
        # the walk orientation: at the day's start boundary (backward) or
        # the next day's start boundary (forward; a real row exactly there
        # belongs to the NEXT day partition, so no collision)
        syn_ts = (
            (F.col("_day") + F.expr("INTERVAL 1 DAY")) if fwd else F.col("_day")
        ).cast(ts_type)
        synth = carried.select(
            *on,
            syn_ts.alias("_ts"),
            F.col("_carry").alias("_rp"),
            F.lit(1).alias("_isr"),
            *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
            F.col("_day").alias("_day"),
            F.lit(0).alias("_syn"),
        )
        u = u.unionByName(synth)
        # a real right row exactly at the boundary outranks the carry-in
        # (it is the nearer observation at that instant)
        order_cols.append(F.col("_syn").asc())
        part_cols = [*on, "_day"]
    if rp_orderable:
        order_cols.append(F.col("_rp").asc_nulls_first())
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("_m", F.last("_rp", ignorenulls=True).over(w))
    out = u.filter((F.col("_isr") == 0) & F.col("_m").isNotNull())
    return out.select(
        *on,
        *lcols,
        *[F.col(f"_m.{c}").alias(f"{prefix}{c}") for c in right_cols],
    )


def range_join_banded(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    lower_sec: int,
    upper_sec: int,
) -> DataFrame:
    """All (left, right) pairs sharing ``on`` with
    ``left_ts + lower_sec <= right_ts <= left_ts + upper_sec``. Bands of
    width (upper-lower) turn the inequality into an equi-join on
    (key, band): the right row has one band, the left row probes the ≤2
    bands its window overlaps, and the exact range predicate filters
    within the banded candidates. Right columns are prefixed ``r_``.

    Timestamps compare at microsecond precision (engine-exact)."""
    if upper_sec <= lower_sec:
        raise ValueError("upper_sec must be > lower_sec")
    _guard_columns(left, {"_band", "_bands", "_lus", "_rus"}, "range_join_banded left input")
    _guard_columns(
        left,
        {f"r_{c}" for c in right.columns if c not in on},
        "range_join_banded left input (collides with prefixed right columns)",
    )
    width_us = (upper_sec - lower_sec) * 1_000_000
    l_us = F.unix_micros(F.col(left_ts).cast("timestamp"))
    r_us = F.unix_micros(F.col(right_ts).cast("timestamp"))

    r = right.select(
        *on,
        *[F.col(c).alias(f"r_{c}") for c in right.columns if c not in on],
        F.floor(r_us / width_us).alias("_band"),
        r_us.alias("_rus"),
    )
    lo = l_us + lower_sec * 1_000_000
    hi = l_us + upper_sec * 1_000_000
    l = left.withColumns(
        {
            "_bands": F.sequence(
                F.floor(lo / width_us), F.floor(hi / width_us)
            ),
            "_lus": l_us,
        }
    )
    l = l.withColumn("_band", F.explode("_bands")).drop("_bands")
    return (
        l.join(r, [*on, "_band"])
        .filter(
            (F.col("_rus") >= F.col("_lus") + lower_sec * 1_000_000)
            & (F.col("_rus") <= F.col("_lus") + upper_sec * 1_000_000)
        )
        .drop("_band", "_lus", "_rus")
    )


def cooccurrence_graph(
    events: DataFrame,
    actor_col: str = "user_id",
    context_cols: tuple[str, ...] = ("event_type",),
    ts_col: str = "ts",
    window: str = "hour",
    min_weight: int = 1,
    top_k: int | None = None,
    salt_above: int | None = 256,
) -> DataFrame:
    """Graph construction from an event log: actors become nodes, and two
    actors are linked when they act in the same context block (same
    ``context_cols`` within the same truncated ``window``), with edge
    weight = number of distinct shared blocks. The temporal analog of the
    pipeline's cross-document entity linking — co-occurrence IS the
    relationship signal when no explicit edge exists (session graphs,
    co-editing graphs, co-purchase graphs).

    Returns (user_a, user_b, weight), user_a < user_b; ``top_k`` applies
    a deterministic (weight DESC, ids) TakeOrdered cut.

    Scale: a hot block with d actors yields d²/2 pairs — exactly the
    shared-target blowup of :func:`graph_queries.shared_entity_pairs`, so
    the pair enumeration is delegated to it: blocks become posting
    targets and get the same degree-aware salting above ``salt_above``
    actors per block. The block id is computed map-side (one date_trunc +
    concat, no UDF) and the DISTINCT inside shared_entity_pairs collapses
    an actor's repeat events in a block before any join."""
    from research_knowledge_graph_spark.operators.graph_queries import (
        shared_entity_pairs,
    )

    # fail fast on a bad truncation unit: date_trunc returns NULL (not an
    # error, even under ANSI) for anything it doesn't recognize — e.g. the
    # F.window-style '15 minutes' or a typo — and a NULL unit poisons
    # EVERY block id, so the operator would silently return an empty
    # graph, indistinguishable from "no co-occurrences"
    _TRUNC_UNITS = {
        "year", "yyyy", "yy", "quarter", "month", "mm", "mon", "week",
        "day", "dd", "hour", "minute", "second", "millisecond", "microsecond",
    }
    if window.lower() not in _TRUNC_UNITS:
        raise ValueError(
            f"window must be a date_trunc unit ({sorted(_TRUNC_UNITS)}), "
            f"got {window!r}"
        )

    # F.concat, NOT concat_ws: a NULL context value must poison the block
    # id (NULL never equi-joins, so the row drops out of pairing) exactly
    # like the oracle's `||` rendering — concat_ws would silently SKIP the
    # NULL segment and alias it with an empty-string context.
    # Each segment is '\'-escaped before the '|' delimiter goes in, so a
    # free-text context value CONTAINING '|' (URL, title, user agent)
    # cannot alias two distinct context tuples into one block — without
    # the escape, ('x|y','z') and ('x','y|z') render the same block id
    # and fabricate co-occurrence edges. The oracle mirrors the identical
    # replace pair (literal replace on both engines).
    def _esc(c: str) -> Column:
        return F.replace(
            F.replace(F.col(c).cast("string"), F.lit("\\"), F.lit("\\\\")),
            F.lit("|"),
            F.lit("\\|"),
        )

    blk_parts: list[Column] = []
    for c in context_cols:
        blk_parts += [_esc(c), F.lit("|")]
    blk = F.concat(
        *blk_parts,
        F.date_format(F.date_trunc(window, F.col(ts_col)), "yyyy-MM-dd HH:mm:ss"),
    )
    postings = events.select(
        F.col(actor_col).cast("string").alias("from_node_id"),
        blk.alias("to_node_id"),
    )
    pairs = shared_entity_pairs(postings, None, salt_above).filter(
        F.col("shared_count") >= min_weight
    )
    out = pairs.select(
        F.col("node_a").alias("user_a"),
        F.col("node_b").alias("user_b"),
        F.col("shared_count").alias("weight"),
    )
    if top_k is not None:
        out = out.orderBy(F.desc("weight"), "user_a", "user_b").limit(top_k)
    return out
