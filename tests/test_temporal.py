"""AS-OF and banded range join unit pins (sf-scale oracle twins: v04/v05
in tests/test_entry_oracle.py — DuckDB ASOF JOIN and BETWEEN join)."""

import datetime

from pyspark.sql import functions as F

from research_knowledge_graph_spark.operators.temporal import (
    asof_join,
    range_join_banded,
)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, 100, "a"), (1, 205, "b"), (2, 50, "c"), (3, 10, "d")],
        "k long, lts long, lval string",
    )
    right = spark.createDataFrame(
        [(1, 90, "r90"), (1, 100, "r100"), (1, 200, "r200"), (2, 60, "r60")],
        "k long, rts long, rval string",
    )
    got = {
        (r.k, r.lts, r.r_rval)
        for r in asof_join(left, right, ["k"], "lts", "rts", ["rval"]).collect()
    }
    assert got == {
        (1, 100, "r100"),  # exact tie is INCLUSIVE (matches DuckDB ASOF >=)
        (1, 205, "r200"),  # latest at-or-before, not just any earlier
        # k=2 lts=50: right is at 60 (after) → dropped (inner as-of)
        # k=3: no right rows at all → dropped
    }


def test_asof_join_carries_left_columns(spark):
    left = spark.createDataFrame([(1, 10, 3.5)], "k long, lts long, score double")
    right = spark.createDataFrame([(1, 5, 7)], "k long, rts long, payload long")
    row = asof_join(left, right, ["k"], "lts", "rts", ["payload", "rts"]).first()
    assert (row.k, row.lts, row.score, row.r_payload, row.r_rts) == (1, 10, 3.5, 7, 5)


def _ts(minute, second=0):
    return datetime.datetime(2024, 1, 1, 12, minute, second)


def test_range_join_banded_matches_naive(spark):
    left = spark.createDataFrame(
        [(1, 1, _ts(10)), (1, 2, _ts(40)), (2, 3, _ts(10))],
        "k long, lid long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, 10, _ts(5)),   # -5 min from lid=1 → in [-10,+10]
            (1, 11, _ts(20, 1)),  # +10m01s from lid=1 → OUT (boundary exclusive side)
            (1, 12, _ts(50)),  # +10 min from lid=2 → in (inclusive upper)
            (2, 13, _ts(21)),  # +11 min from lid=3 → out
            (3, 14, _ts(10)),  # wrong key
        ],
        "k long, rid long, rts timestamp",
    )
    got = {
        (r.lid, r.r_rid)
        for r in range_join_banded(left, right, ["k"], "ts", "rts", -600, 600).collect()
    }
    assert got == {(1, 10), (2, 12)}

    # cross-check vs the naive θ-join on denser data
    import random

    rnd = random.Random(5)
    l2 = spark.createDataFrame(
        [(rnd.randrange(3), i, _ts(rnd.randrange(60), rnd.randrange(60)))
         for i in range(120)],
        "k long, lid long, ts timestamp",
    )
    r2 = spark.createDataFrame(
        [(rnd.randrange(3), i, _ts(rnd.randrange(60), rnd.randrange(60)))
         for i in range(120)],
        "k long, rid long, rts timestamp",
    )
    banded = {
        (r.lid, r.r_rid)
        for r in range_join_banded(l2, r2, ["k"], "ts", "rts", -180, 240).collect()
    }
    lus, rus = F.unix_micros("ts"), F.unix_micros("rts")
    naive = {
        (r.lid, r.rid)
        for r in l2.join(r2, "k")
        .filter((rus >= lus - 180 * 1_000_000) & (rus <= lus + 240 * 1_000_000))
        .collect()
    }
    assert banded == naive and len(naive) > 50


def test_asof_join_matches_naive_on_random_data(spark):
    import random

    rnd = random.Random(17)
    lrows = [(rnd.randrange(5), i, rnd.randrange(1000)) for i in range(200)]
    # (k, rts) unique by construction: with duplicate right timestamps the
    # engine's pick among tied rows is legitimately arbitrary
    seen = set()
    rrows = []
    for i in range(200):
        k, rts = rnd.randrange(5), rnd.randrange(1000)
        while (k, rts) in seen:
            rts = rnd.randrange(1000)
        seen.add((k, rts))
        rrows.append((k, 1000 + i, rts))
    left = spark.createDataFrame(lrows, "k long, lid long, lts long")
    right = spark.createDataFrame(rrows, "k long, rid long, rts long")

    got = {
        (r.lid, r.r_rid)
        for r in asof_join(left, right, ["k"], "lts", "rts", ["rid"]).collect()
    }
    # python twin: per left row, the right row with max rts <= lts
    by_key = {}
    for k, rid, rts in rrows:
        by_key.setdefault(k, []).append((rts, rid))
    expected = set()
    for k, lid, lts in lrows:
        cands = [(rts, rid) for rts, rid in by_key.get(k, []) if rts <= lts]
        if cands:
            expected.add((lid, max(cands)[1]))
    assert got == expected and len(expected) > 100


def test_asof_null_keys_and_reserved_names(spark):
    import pytest

    left = spark.createDataFrame(
        [(None, 10, "x"), (1, 10, "y")], "k long, lts long, v string"
    )
    right = spark.createDataFrame(
        [(None, 5, "rn"), (1, 5, "r1")], "k long, rts long, w string"
    )
    # NULL keys never match (equi-join semantics, matching the SQL oracle)
    got = {(r.k, r.r_w) for r in asof_join(left, right, ["k"], "lts", "rts", ["w"]).collect()}
    assert got == {(1, "r1")}
    # reserved scratch names fail fast with a real message
    bad = left.withColumnRenamed("v", "_ts2").withColumn("_rp", F.lit(1))
    with pytest.raises(ValueError, match="reserved"):
        asof_join(bad, right, ["k"], "lts", "rts", ["w"])
    badl = spark.createDataFrame([(1, _ts(0), 9)], "k long, ts timestamp, r_rts long")
    rt = spark.createDataFrame([(1, _ts(1))], "k long, rts timestamp")
    with pytest.raises(ValueError, match="reserved"):
        range_join_banded(badl, rt, ["k"], "ts", "rts", -60, 60)


def test_temporal_plan_contracts(spark):
    """Scale-shape pins: asof_join compiles to window-over-union (NO join
    operator at all); range_join_banded compiles to an equi-join (sort-merge
    or hash), never a broadcast nested loop / cartesian."""
    left = spark.createDataFrame([(1, 10, "x")], "k long, lts long, v string")
    right = spark.createDataFrame([(1, 5, "y")], "k long, rts long, w string")
    asof_plan = (
        asof_join(left, right, ["k"], "lts", "rts", ["w"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in asof_plan, asof_plan[:1500]
    assert "Window" in asof_plan

    lt = spark.createDataFrame([(1, _ts(0))], "k long, ts timestamp")
    rt = spark.createDataFrame([(1, _ts(1))], "k long, rts timestamp")
    range_plan = (
        range_join_banded(lt, rt, ["k"], "ts", "rts", -600, 600)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "NestedLoop" not in range_plan and "Cartesian" not in range_plan, (
        range_plan[:1500]
    )
    assert ("SortMergeJoin" in range_plan) or ("HashJoin" in range_plan), (
        range_plan[:1500]
    )


def test_asof_tied_right_rows_deterministic(spark):
    """ADVICE round-3: several right rows tying on (key, right_ts) must
    yield the SAME match regardless of partitioning — the payload struct
    rides in the window ordering, so the largest payload wins."""
    left = spark.createDataFrame([(1, 100, "x")], "k long, lts long, v string")
    rrows = [(1, 50, f"r{i:02d}") for i in range(8)]
    for parts in (1, 3, 13):
        right = spark.createDataFrame(
            rrows, "k long, rts long, w string"
        ).repartition(parts)
        got = [
            r.r_w for r in asof_join(left, right, ["k"], "lts", "rts", ["w"]).collect()
        ]
        assert got == ["r07"], (parts, got)


def test_asof_prefixed_collision_guard(spark):
    import pytest

    left = spark.createDataFrame([(1, 10, "x")], "k long, lts long, r_w string")
    right = spark.createDataFrame([(1, 5, "y")], "k long, rts long, w string")
    with pytest.raises(ValueError, match="prefixed"):
        asof_join(left, right, ["k"], "lts", "rts", ["w"])
    # right-side reserved scratch names also fail fast
    badr = right.withColumnRenamed("w", "_rp")
    with pytest.raises(ValueError, match="reserved"):
        asof_join(left.drop("r_w"), badr, ["k"], "lts", "rts", ["_rp"])


def test_asof_split_by_day_parity_and_plan(spark):
    """VERDICT round-3 #6: the hot-key escape hatch. split_by='day' must
    return the IDENTICAL match set (the carry-in row preserves cross-day
    matches), while the window partitions by (key, day) so a bot key's
    timeline is bounded at its busiest day, not its full history."""
    import random

    rnd = random.Random(23)
    base = 1_700_000_000  # epoch seconds; spans ~6 days
    lrows = [
        ("bot" if i % 4 else f"u{i % 7}", i, base + rnd.randrange(6 * 86400))
        for i in range(400)
    ]
    rrows = [
        ("bot" if i % 3 else f"u{i % 7}", 1000 + i, base + rnd.randrange(6 * 86400))
        for i in range(300)
    ]
    left = spark.createDataFrame(lrows, "k string, lid long, lts long").withColumn(
        "lts", F.timestamp_seconds("lts")
    )
    right = spark.createDataFrame(rrows, "k string, rid long, rts long").withColumn(
        "rts", F.timestamp_seconds("rts")
    )

    plain = {
        (r.lid, r.r_rid)
        for r in asof_join(left, right, ["k"], "lts", "rts", ["rid"]).collect()
    }
    split_df = asof_join(
        left, right, ["k"], "lts", "rts", ["rid"], split_by="day"
    )
    split = {(r.lid, r.r_rid) for r in split_df.collect()}
    assert split == plain and len(plain) > 300

    # plan contract: the big window partitions by (k, _day)
    plan = split_df._jdf.queryExecution().executedPlan().toString()
    assert "_day" in plan, plan[:2000]


def test_asof_forward_matches_naive(spark):
    """direction='forward': for each left row the EARLIEST right row at or
    after it — python-twin pinned on random data."""
    import random

    rnd = random.Random(29)
    lrows = [(rnd.randrange(5), i, rnd.randrange(1000)) for i in range(200)]
    seen, rrows = set(), []
    for i in range(200):
        k, rts = rnd.randrange(5), rnd.randrange(1000)
        while (k, rts) in seen:
            rts = rnd.randrange(1000)
        seen.add((k, rts))
        rrows.append((k, 1000 + i, rts))
    left = spark.createDataFrame(lrows, "k long, lid long, lts long")
    right = spark.createDataFrame(rrows, "k long, rid long, rts long")
    got = {
        (r.lid, r.r_rid)
        for r in asof_join(
            left, right, ["k"], "lts", "rts", ["rid"], direction="forward"
        ).collect()
    }
    by_key = {}
    for k, rid, rts in rrows:
        by_key.setdefault(k, []).append((rts, rid))
    expected = set()
    for k, lid, lts in lrows:
        cands = [(rts, rid) for rts, rid in by_key.get(k, []) if rts >= lts]
        if cands:
            expected.add((lid, min(cands)[1]))
    assert got == expected and len(expected) > 100


def test_asof_forward_split_parity(spark):
    """forward + split_by='day' returns the identical match set (carry-in
    from the nearest LATER day)."""
    import random

    rnd = random.Random(37)
    base = 1_700_000_000
    lrows = [("u%d" % (i % 5), i, base + rnd.randrange(6 * 86400)) for i in range(300)]
    rrows = [("u%d" % (i % 5), 1000 + i, base + rnd.randrange(6 * 86400)) for i in range(200)]
    left = spark.createDataFrame(lrows, "k string, lid long, lts long").withColumn(
        "lts", F.timestamp_seconds("lts")
    )
    right = spark.createDataFrame(rrows, "k string, rid long, rts long").withColumn(
        "rts", F.timestamp_seconds("rts")
    )
    plain = {
        (r.lid, r.r_rid)
        for r in asof_join(left, right, ["k"], "lts", "rts", ["rid"], direction="forward").collect()
    }
    split = {
        (r.lid, r.r_rid)
        for r in asof_join(
            left, right, ["k"], "lts", "rts", ["rid"],
            direction="forward", split_by="day",
        ).collect()
    }
    assert split == plain and len(plain) > 200

    import pytest

    with pytest.raises(ValueError, match="direction"):
        asof_join(left, right, ["k"], "lts", "rts", ["rid"], direction="sideways")


def test_cooccurrence_graph(spark):
    from research_knowledge_graph_spark.operators.temporal import (
        cooccurrence_graph,
    )

    t0 = datetime.datetime(2026, 1, 1, 10, 5)
    t0b = datetime.datetime(2026, 1, 1, 10, 40)  # same hour block as t0
    t1 = datetime.datetime(2026, 1, 1, 11, 5)    # next hour
    rows = [
        # block (click, 10h): users 1,2,3 — user 1 twice (collapsed)
        (1, "click", t0), (1, "click", t0b), (2, "click", t0), (3, "click", t0b),
        # block (click, 11h): users 1,2 → second shared block for (1,2)
        (1, "click", t1), (2, "click", t1),
        # block (view, 10h): user 3 alone → no pairs
        (3, "view", t0),
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    got = {
        (r.user_a, r.user_b): r.weight
        for r in cooccurrence_graph(ev, min_weight=1).collect()
    }
    assert got == {("1", "2"): 2, ("1", "3"): 1, ("2", "3"): 1}
    # min_weight prunes, top_k cuts on the (weight DESC, ids) order
    top = cooccurrence_graph(ev, min_weight=2, top_k=5).collect()
    assert [(r.user_a, r.user_b, r.weight) for r in top] == [("1", "2", 2)]


def test_asof_join_null_ts_rows_dropped(spark):
    """A NULL timestamp can never satisfy the as-of inequality (DuckDB
    ASOF semantics) — before the fix, desc ordering sorted a NULL-ts left
    row past every right row in forward mode and F.last handed it the
    EARLIEST right payload; symmetrically a NULL-ts backward right row
    donated its payload to left rows with no real prior match."""
    left = spark.createDataFrame(
        [(1, 100, "L1"), (1, None, "Lnull")], "k long, lts long, lid string"
    )
    right = spark.createDataFrame(
        [(1, 90, "Rearly"), (1, 110, "Rlate")], "k long, rts long, rv string"
    )
    fwd = asof_join(
        left, right, ["k"], "lts", "rts", ["rv"], direction="forward"
    )
    assert {(r.lid, r.r_rv) for r in fwd.collect()} == {("L1", "Rlate")}

    right_null = spark.createDataFrame(
        [(1, None, "Rnull"), (1, 110, "Rlate")], "k long, rts long, rv string"
    )
    back = asof_join(left, right_null, ["k"], "lts", "rts", ["rv"])
    # lts=100 has no real right row at-or-before it; Rnull must not match
    assert back.count() == 0


def test_cooccurrence_block_delimiter_escaped(spark):
    """Context values containing the '|' delimiter must not alias two
    distinct context tuples into one block: ('x|y','z') and ('x','y|z')
    rendered identical block ids before the escape and fabricated a
    co-occurrence edge between unrelated actors."""
    import datetime

    from research_knowledge_graph_spark.operators.temporal import (
        cooccurrence_graph,
    )

    t = datetime.datetime(2024, 1, 1, 10, 30)
    ev = spark.createDataFrame(
        [
            ("u1", "x|y", "z", t),
            ("u2", "x", "y|z", t),
            ("u3", "x|y", "z", t),  # genuinely shares u1's context tuple
        ],
        "user_id string, a string, b string, ts timestamp",
    )
    got = {
        (r.user_a, r.user_b)
        for r in cooccurrence_graph(
            ev,
            actor_col="user_id",
            ts_col="ts",
            context_cols=("a", "b"),
            min_weight=1,
        ).collect()
    }
    assert got == {("u1", "u3")}


def test_cooccurrence_graph_rejects_bad_window_unit(spark):
    """An unsupported date_trunc unit must raise, not NULL-poison every
    block id and silently return an empty graph."""
    import datetime

    import pytest

    from research_knowledge_graph_spark.operators.temporal import cooccurrence_graph

    ev = spark.createDataFrame(
        [("u1", "click", datetime.datetime(2026, 1, 1, 10))],
        "user_id string, event_type string, ts timestamp",
    )
    for bad in ("15 minutes", "hourly", ""):
        with pytest.raises(ValueError, match="date_trunc unit"):
            cooccurrence_graph(ev, window=bad)
    # the sibling spellings date_trunc does accept still work
    assert cooccurrence_graph(ev, window="HOUR").count() == 0
