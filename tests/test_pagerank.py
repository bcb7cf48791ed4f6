"""PageRank: distributed power iteration equals a driver-side numpy
reference on the same graph, and basic rank sanity holds."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from research_knowledge_graph_spark.operators.pagerank import pagerank
from research_knowledge_graph_spark.plans.tpch_graph import derive_edges

DAMPING, ITERS = 0.85, 10


def _numpy_pagerank(edge_list, damping=DAMPING, iters=ITERS):
    nodes = sorted({u for u, _ in edge_list} | {v for _, v in edge_list})
    idx = {u: i for i, u in enumerate(nodes)}
    n = len(nodes)
    out_deg = np.zeros(n)
    for u, _ in edge_list:
        out_deg[idx[u]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        for u, v in edge_list:
            contrib[idx[v]] += r[idx[u]] / out_deg[idx[u]]
        dangling = r[out_deg == 0].sum()
        r = (1 - damping) / n + damping * dangling / n + damping * contrib
    return {u: r[idx[u]] for u in nodes}


def test_pagerank_matches_numpy(spark):
    edges = derive_edges(spark, "/root/testdata/sf0.001").filter(
        F.col("edge_type").isin("FOLLOWS", "PLACED")
    )
    edge_list = [(r.from_node_id, r.to_node_id) for r in edges.collect()]
    expected = _numpy_pagerank(edge_list)

    got = {r.node_id: r.rank for r in pagerank(edges, DAMPING, ITERS).collect()}
    assert set(got) == set(expected)
    max_err = max(abs(got[u] - expected[u]) for u in got)
    assert max_err < 1e-9, max_err
    assert abs(sum(got.values()) - 1.0) < 1e-6


def test_pagerank_one_heavy_job_per_iteration(spark):
    """Plan contract (round-2 verdict #1): each marginal iteration runs
    exactly ONE data-proportional job (the fused contribution+dangling
    aggregate checkpoint — it embeds the rank⨝degree join and the edge
    fan-out ONCE) plus exactly one trivial job (the 1-row dangling-mass
    broadcast: a filter+sum over the already-checkpointed aggregate, no
    join recompute — ≤ shuffle_partitions+1 tasks). The old shape ran TWO
    join-recomputing jobs per iteration (a standalone dangling ``.first()``
    pass plus the rank checkpoint, each rebuilding rank⨝degree).

    AQE is disabled for the measurement so actions map to jobs 1:1 (AQE
    materializes each query stage as its own job, blurring the count)."""
    import time

    sc = spark.sparkContext
    sp = int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "a"), ("x", "a")],
        "from_node_id string, to_node_id string",
    )

    def job_profile(iters, tag):
        sc.setJobGroup(tag, tag)
        pagerank(e, iters=iters).collect()
        sc.setLocalProperty("spark.jobGroup.id", None)
        time.sleep(0.5)
        st = sc.statusTracker()
        heavy = light = 0
        for jid in st.getJobIdsForGroup(tag):
            ji = st.getJobInfo(jid)
            if ji is None:
                continue
            tasks = sum(
                st.getStageInfo(sid).numTasks
                for sid in ji.stageIds
                if st.getStageInfo(sid) is not None
            )
            if tasks > sp + 4:
                heavy += 1
            else:
                light += 1
        return heavy, light

    aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        h2, l2 = job_profile(2, "pr_prof_2")
        h6, l6 = job_profile(6, "pr_prof_6")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
    assert (h6 - h2) / 4 == 1.0, ("heavy jobs/iter", h2, h6)
    assert (l6 - l2) / 4 == 1.0, ("light jobs/iter", l2, l6)


def test_pagerank_hub_ranks_highest(spark):
    # star graph: every spoke points at the hub
    e = spark.createDataFrame(
        [(f"s{i}", "hub") for i in range(10)], "from_node_id string, to_node_id string"
    )
    ranks = {r.node_id: r.rank for r in pagerank(e, iters=5).collect()}
    assert ranks["hub"] == max(ranks.values())
    assert ranks["hub"] > 10 * ranks["s0"]


# ---------------------------------------------------------------------------
# Sessionization property twin (random event streams vs a pure-Python walk)
# ---------------------------------------------------------------------------


def test_sessionize_matches_python_twin(spark):
    """Random gap patterns: the window-function sessionizer equals a plain
    per-user sorted gap walk."""
    import itertools
    import random

    rng = random.Random(42)
    rows = []
    eid = itertools.count()
    base = 1_700_000_000
    for user in range(8):
        t = base + rng.randint(0, 3600)
        for _ in range(rng.randint(1, 40)):
            t += rng.choice([5, 60, 1799, 1800, 1801, 7200])  # straddle the gap
            rows.append((user, t, next(eid), round(rng.random(), 2)))

    # python twin: sorted walk per user, 30-min gap
    twin = {}
    for user, t, e, v in sorted(rows, key=lambda r: (r[0], r[1], r[2])):
        sessions = twin.setdefault(user, [])
        if not sessions or t - sessions[-1]["last"] > 1800:
            sessions.append({"start": t, "last": t, "n": 0, "val": 0.0})
        s = sessions[-1]
        s["last"] = max(s["last"], t)
        s["n"] += 1
        s["val"] += v
    expected = sorted(
        (u, i + 1, s["n"], s["last"] - s["start"], round(s["val"], 2))
        for u, ss in twin.items()
        for i, s in enumerate(ss)
    )

    from pyspark.sql import functions as F

    from research_knowledge_graph_spark.operators.sessions import session_stats

    ev = spark.createDataFrame(
        [(u, t, e, v) for u, t, e, v in rows],
        "user_id long, epoch long, event_id long, value double",
    ).select(
        "user_id", F.col("epoch").cast("timestamp").alias("ts"), "event_id", "value"
    )
    got = sorted(
        (r.user_id, r.session_idx, r.n_events, r.duration_sec, r.total_value)
        for r in session_stats(ev, gap_minutes=30).collect()
    )
    assert got == expected


def test_sessionize_split_by_day_bounds_hot_user(spark):
    """Verdict round-2 #8: a bot-like user (10⁵ events over 20 days) with
    ``split_by='day'`` spreads across one partition per active day — the
    max per-shuffle-partition row count is bounded by its busiest day, not
    its lifetime total — while session contents within any single day match
    the default mode exactly (only midnight-spanning sessions split)."""
    from pyspark.sql import functions as F

    from research_knowledge_graph_spark.operators.sessions import (
        session_stats,
        sessionize,
    )

    n, days = 100_000, 20
    base = 1_700_000_000 - (1_700_000_000 % 86_400)  # midnight-aligned
    # one event every ~17 s → ~5k events/day, sessions never split by gap
    ev = spark.range(n).select(
        F.lit(7).alias("user_id"),
        (F.lit(base) + F.col("id") * (days * 86_400 // n)).cast("timestamp").alias("ts"),
        F.col("id").alias("event_id"),
        F.lit(1.0).alias("value"),
    )

    s = sessionize(ev, split_by="day")
    # the skew bound: repartitioning by the widened key caps any partition
    # at a few single days' worth of rows (hash collisions can co-locate a
    # couple of the 20 day-keys), never the user's n-row lifetime
    per_part = (
        s.repartition(32, "user_id", "session_day")
        .groupBy(F.spark_partition_id())
        .count()
    )
    mx = per_part.agg(F.max("count")).first()[0]
    busiest_day = (
        s.groupBy("session_day").count().agg(F.max("count")).first()[0]
    )
    assert mx <= 3 * busiest_day, (mx, busiest_day)
    assert mx <= n // 5, mx  # vs n on a single-key repartition

    # semantics: event count conserved; one session per day (gap never
    # fires), i.e. the only splits are the documented midnight ones
    stats = session_stats(ev, split_by="day")
    assert stats.agg(F.sum("n_events")).first()[0] == n
    assert stats.count() == days
    # default mode on the same input: one unbroken session
    default_stats = session_stats(ev)
    assert default_stats.count() == 1


def _numpy_ppr(edge_list, seeds, damping=DAMPING, iters=ITERS):
    nodes = sorted({u for u, _ in edge_list} | {v for _, v in edge_list})
    idx = {u: i for i, u in enumerate(nodes)}
    n = len(nodes)
    out_deg = np.zeros(n)
    for u, _ in edge_list:
        out_deg[idx[u]] += 1
    p = np.zeros(n)
    for s in seeds:
        p[idx[s]] = 1.0 / len(seeds)
    r = p.copy()
    for _ in range(iters):
        contrib = np.zeros(n)
        for u, v in edge_list:
            contrib[idx[v]] += r[idx[u]] / out_deg[idx[u]]
        dangling = r[out_deg == 0].sum()
        r = (1 - damping) * p + damping * dangling * p + damping * contrib
    return {u: r[idx[u]] for u in nodes}


def test_personalized_pagerank_matches_numpy(spark):
    from research_knowledge_graph_spark.operators.pagerank import (
        personalized_pagerank,
    )

    edges = derive_edges(spark, "/root/testdata/sf0.001").filter(
        F.col("edge_type").isin("FOLLOWS", "PLACED")
    )
    edge_list = [(r.from_node_id, r.to_node_id) for r in edges.collect()]
    seeds = ["c1", "c2"]
    expected = _numpy_ppr(edge_list, seeds)

    got = {
        r.node_id: r.rank
        for r in personalized_pagerank(edges, seeds, DAMPING, ITERS).collect()
    }
    assert set(got) == set(expected)
    max_err = max(abs(got[u] - expected[u]) for u in got)
    assert max_err < 1e-9, max_err
    assert abs(sum(got.values()) - 1.0) < 1e-6


def test_personalized_pagerank_mass_concentrates_near_seeds(spark):
    from research_knowledge_graph_spark.operators.pagerank import (
        personalized_pagerank,
    )

    # a -> b -> c chain plus an isolated pair d -> e: restarting at 'a'
    # must leave the disconnected component with zero rank
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("d", "e")],
        "from_node_id string, to_node_id string",
    )
    got = {
        r.node_id: r.rank
        for r in personalized_pagerank(edges, ["a"], iters=20).collect()
    }
    assert got["a"] > got["b"] > got["c"] > 0
    assert got["d"] == 0.0 and got["e"] == 0.0


def test_hits_hand_computed_exact(spark):
    """Unnormalized 2-iteration HITS against hand-computed integer values
    (h-then-a order, a0=1): on a->b, a->c, b->c, c->a, c->d the cascade is
    h1 = out-degree {a:2,b:1,c:2}; a1 {a:2,b:2,c:3,d:2};
    h2 {a:5,b:3,c:4,d:0}; a2 {a:4,b:5,c:8,d:4}."""
    from research_knowledge_graph_spark.operators.pagerank import hits

    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("c", "d")],
        "from_node_id string, to_node_id string",
    )
    got = {r.node_id: (r.hub_score, r.auth_score) for r in hits(edges, iters=2).collect()}
    assert got == {"a": (5, 4), "b": (3, 5), "c": (4, 8), "d": (0, 4)}


def test_hits_multigraph_multiplicity(spark):
    """Parallel edges count with multiplicity (documented contract): a->b
    twice doubles a's hub mass and b's authority at every round."""
    from research_knowledge_graph_spark.operators.pagerank import hits

    edges = spark.createDataFrame(
        [("a", "b"), ("a", "b")], "from_node_id string, to_node_id string"
    )
    got = {r.node_id: (r.hub_score, r.auth_score) for r in hits(edges, iters=2).collect()}
    # h1(a)=2, a1(b)=2+2=4 (two edge rows each carrying h1(a)=2)... iter2:
    # h2(a)=a1(b)*2=8, a2(b)=h2(a)*2=16
    assert got == {"a": (8, 0), "b": (0, 16)}


def test_katz_hand_computed_exact(spark):
    """Truncated Katz (iters=3, beta_inv=4 => katz_scaled = 16*p1 + 4*p2
    + p3) against the hand-unrolled walk counts on a->b, a->c, b->c,
    c->a, c->d: p1 {a:1,b:1,c:2,d:1}; p2 {a:2,b:1,c:2,d:2};
    p3 {a:2,b:2,c:3,d:2} => {a:26, b:22, c:43, d:26}."""
    from research_knowledge_graph_spark.operators.pagerank import katz_centrality

    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("c", "d")],
        "from_node_id string, to_node_id string",
    )
    got = {
        r.node_id: r.katz_scaled
        for r in katz_centrality(edges, iters=3, beta_inv=4).collect()
    }
    assert got == {"a": 26, "b": 22, "c": 43, "d": 26}
    # iters=1 degenerates to in-degree (beta_inv^0 = 1)
    got1 = {
        r.node_id: r.katz_scaled
        for r in katz_centrality(edges, iters=1, beta_inv=4).collect()
    }
    assert got1 == {"a": 1, "b": 1, "c": 2, "d": 1}


def test_katz_multigraph_and_validation(spark):
    """Parallel edges multiply walk counts (documented contract); iters<1
    fails fast. On a->b twice with iters=3: p1(b)=2, p2/p3 empty (a has
    no in-walks), so katz_scaled(b)=16*2=32 and a scores 0."""
    import pytest as _pytest

    from research_knowledge_graph_spark.operators.pagerank import katz_centrality

    edges = spark.createDataFrame(
        [("a", "b"), ("a", "b")], "from_node_id string, to_node_id string"
    )
    got = {
        r.node_id: r.katz_scaled
        for r in katz_centrality(edges, iters=3, beta_inv=4).collect()
    }
    assert got == {"a": 0, "b": 32}
    with _pytest.raises(ValueError):
        katz_centrality(edges, iters=0)


def test_pagerank_fixed_point_hand_computed(spark):
    """a->b, a->c, b->c (c dangling): exact python-int twin of the
    floor-div arithmetic, plus the iteration-1 values by hand:
    p1(a)=0.15e9, p1(b)=0.15e9+850*(1e9//2)//1000, p1(c) adds b's full
    mass. Parallel edge a->b collapses (distinct edge set)."""
    from research_knowledge_graph_spark.operators.pagerank import (
        pagerank_fixed_point,
    )

    e = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("a", "c"), ("b", "c")],
        "from_node_id string, to_node_id string",
    )
    got1 = {r.node_id: r.rank_nano for r in pagerank_fixed_point(e, iters=1).collect()}
    assert got1 == {"a": 150_000_000, "b": 575_000_000, "c": 1_425_000_000}

    # python-int twin for 3 rounds
    g = {("a", "b"), ("a", "c"), ("b", "c")}
    nodes = {"a", "b", "c"}
    deg = {"a": 2, "b": 1}
    p = {v: 10**9 for v in nodes}
    for _ in range(3):
        s = {v: 0 for v in nodes}
        for u, v in g:
            s[v] += p[u] // deg[u]
        p = {v: 150_000_000 + (850 * s[v]) // 1000 for v in nodes}
    got3 = {r.node_id: r.rank_nano for r in pagerank_fixed_point(e, iters=3).collect()}
    assert got3 == p

    import pytest as _pytest

    with _pytest.raises(ValueError):
        pagerank_fixed_point(e, iters=0)


def test_ppr_fixed_point_hand_computed(spark):
    """Seeded variant on a->b, a->c, b->c with seeds={a}: only a carries
    p0/restart mass, so iteration 1 gives p1(a)=0.15e9 (restart only) and
    p1(b)=p1(c)=850*(1e9//2)//1000 (a's split share; b's p0 is 0 under
    seeding so c gets nothing through b yet). Exact python-int twin for 3
    rounds; duplicate seeds collapse; empty seed list fails fast."""
    from research_knowledge_graph_spark.operators.pagerank import (
        pagerank_fixed_point,
    )

    e = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c")],
        "from_node_id string, to_node_id string",
    )
    got1 = {
        r.node_id: r.rank_nano
        for r in pagerank_fixed_point(e, iters=1, seeds=["a"]).collect()
    }
    share = (850 * (10**9 // 2)) // 1000
    assert got1 == {"a": 150_000_000, "b": share, "c": share}

    g = {("a", "b"), ("a", "c"), ("b", "c")}
    nodes = {"a", "b", "c"}
    deg = {"a": 2, "b": 1}
    p = {v: (10**9 if v == "a" else 0) for v in nodes}
    for _ in range(3):
        s = {v: 0 for v in nodes}
        for u, v in g:
            s[v] += p[u] // deg[u]
        p = {
            v: (150_000_000 if v == "a" else 0) + (850 * s[v]) // 1000
            for v in nodes
        }
    got3 = {
        r.node_id: r.rank_nano
        for r in pagerank_fixed_point(e, iters=3, seeds=["a", "a"]).collect()
    }
    assert got3 == p

    import pytest as _pytest

    with _pytest.raises(ValueError):
        pagerank_fixed_point(e, iters=1, seeds=[])


def test_markov_stationary_fixed_point_twin(spark):
    """v22's operator vs a python-int twin on a hand-built chain with a
    SINK state: identical pi_nano per state at every checked depth, mass
    non-increasing (floor rounding + sink leakage), iters validated."""
    import pytest

    from research_knowledge_graph_spark.operators.pagerank import (
        markov_stationary_fixed_point,
    )

    # a->a heavy self-loop, a<->b exchange, c is a pure sink (no out-row)
    rows = [("a", "a", 6), ("a", "b", 2), ("b", "a", 3), ("a", "c", 2), ("b", "c", 1)]
    trans = spark.createDataFrame(
        rows, "from_type string, to_type string, n_transitions long"
    )

    def twin(iters):
        out_tot = {"a": 10, "b": 4}
        p = {s: 10**9 for s in ("a", "b", "c")}
        for _ in range(iters):
            nxt = {s: 0 for s in p}
            for s, t, n in rows:
                nxt[t] += p[s] * n // out_tot[s]
            p = nxt
        return p

    for iters in (1, 4):
        got = {
            r.state: r.pi_nano
            for r in markov_stationary_fixed_point(trans, iters=iters).collect()
        }
        assert got == twin(iters), f"iters={iters}"
    assert sum(twin(4).values()) < sum(twin(1).values()) <= 3 * 10**9
    with pytest.raises(ValueError):
        markov_stationary_fixed_point(trans, iters=0)


def test_pagerank_null_endpoint_edges_dropped(spark):
    """dst IS NULL is the dangling-mass sentinel — a real edge row with a
    NULL endpoint must be filtered on ingest, not conflated with dangling
    mass (before the fix: the source fanned out 1.5x its rank, the NULL
    row's rank joined the dangling pool, and NULL entered the node set as
    a phantom node)."""
    from research_knowledge_graph_spark.operators.pagerank import pagerank

    dirty = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("a", None), (None, "b")],
        "from_node_id string, to_node_id string",
    )
    got = {r.node_id: r.rank for r in pagerank(dirty, iters=5).collect()}
    assert set(got) == {"a", "b"}
    # the symmetric 2-cycle fixed point is exactly 0.5 / 0.5
    assert abs(got["a"] - 0.5) < 1e-12 and abs(got["b"] - 0.5) < 1e-12
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_fixed_point_twins_drop_null_endpoints(spark):
    """The module-wide NULL-endpoint contract covers the fixed-point twins
    too (review finding): a NULL edge row must not become a phantom state
    in pagerank_fixed_point / markov_stationary_fixed_point."""
    from research_knowledge_graph_spark.operators.pagerank import (
        markov_stationary_fixed_point,
        pagerank_fixed_point,
    )

    dirty = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("a", None), (None, "b")],
        "from_node_id string, to_node_id string",
    )
    got = {r.node_id for r in pagerank_fixed_point(dirty, iters=2).collect()}
    assert got == {"a", "b"}

    tr = spark.createDataFrame(
        [("a", "b", 3), ("b", "a", 3), ("a", None, 5), (None, "b", 5)],
        "from_type string, to_type string, n_transitions long",
    )
    states = {r.state for r in markov_stationary_fixed_point(tr, iters=2).collect()}
    assert states == {"a", "b"}


def test_pagerank_all_dirty_edges_fail_fast(spark):
    """All-NULL-endpoint (but non-empty) edge input: a clear ValueError,
    not a driver ZeroDivisionError from the teleport term."""
    import pytest

    from research_knowledge_graph_spark.operators.pagerank import pagerank

    dirty = spark.createDataFrame(
        [("a", None), (None, "b")], "from_node_id string, to_node_id string"
    )
    with pytest.raises(ValueError, match="no valid"):
        pagerank(dirty, iters=2)
