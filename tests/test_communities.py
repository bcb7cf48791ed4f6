"""Deterministic synchronous LPA pinned against a pure-Python twin."""

import random

from research_knowledge_graph_spark.operators.communities import (
    label_propagation,
)


def _python_lpa(edges, max_iter):
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    labels = {n: n for n in adj}
    for _ in range(max_iter):
        new = {}
        for n, nbrs in adj.items():
            counts = {}
            for m in nbrs:
                counts[labels[m]] = counts.get(labels[m], 0) + 1
            # most frequent, ties to smallest label; synchronous update
            new[n] = min(counts, key=lambda lbl: (-counts[lbl], lbl))
        labels = new
    return labels


def test_lpa_two_cliques_with_bridge(spark):
    # two K4 cliques joined by one bridge edge: LPA converges to one
    # community per clique (the bridge can't outvote 3 clique neighbors)
    cliq1 = [("a1", "a2"), ("a1", "a3"), ("a1", "a4"),
             ("a2", "a3"), ("a2", "a4"), ("a3", "a4")]
    cliq2 = [("b1", "b2"), ("b1", "b3"), ("b1", "b4"),
             ("b2", "b3"), ("b2", "b4"), ("b3", "b4")]
    edges = cliq1 + cliq2 + [("a4", "b1")]
    df = spark.createDataFrame(edges, "node_a string, node_b string")
    got = {r.node_id: r.community for r in label_propagation(df, 5).collect()}
    a_comms = {got[n] for n in ["a1", "a2", "a3", "a4"]}
    b_comms = {got[n] for n in ["b1", "b2", "b3", "b4"]}
    assert len(a_comms) == 1 and len(b_comms) == 1
    assert a_comms != b_comms


def test_lpa_matches_python_twin_random(spark):
    rnd = random.Random(23)
    nodes = [f"n{i}" for i in range(40)]
    edges = list(
        {
            tuple(sorted((rnd.choice(nodes), rnd.choice(nodes))))
            for _ in range(120)
        }
    )
    edges = [(a, b) for a, b in edges if a != b]
    for iters in (1, 3, 5):
        df = spark.createDataFrame(edges, "node_a string, node_b string")
        got = {
            r.node_id: r.community
            for r in label_propagation(df, iters).collect()
        }
        assert got == _python_lpa(edges, iters), f"iters={iters}"


def _python_lpa_weighted(edges, max_iter):
    """edges: (a, b, w) undirected; vote = sum of edge weights; duplicate
    (a, b) rows collapse to their max weight (the operator's contract)."""
    adj = {}
    for a, b, w in edges:
        if a == b:
            continue
        adj.setdefault(a, {})[b] = max(adj.get(a, {}).get(b, w), w)
        adj.setdefault(b, {})[a] = max(adj.get(b, {}).get(a, w), w)
    labels = {n: n for n in adj}
    for _ in range(max_iter):
        new = {}
        for n, nbrs in adj.items():
            votes = {}
            for m, w in nbrs.items():
                votes[labels[m]] = votes.get(labels[m], 0) + w
            new[n] = min(votes, key=lambda lbl: (-votes[lbl], lbl))
        labels = new
    return labels


def test_weighted_lpa_matches_python_twin(spark):
    rnd = random.Random(31)
    nodes = [f"n{i}" for i in range(40)]
    seen = {}
    for _ in range(150):
        a, b = sorted((rnd.choice(nodes), rnd.choice(nodes)))
        if a != b:
            seen[(a, b)] = rnd.randrange(1, 9)
    edges = [(a, b, w) for (a, b), w in seen.items()]
    for iters in (1, 3, 5):
        df = spark.createDataFrame(edges, "node_a string, node_b string, shared_count long")
        got = {
            r.node_id: r.community
            for r in label_propagation(df, iters, weight_col="shared_count").collect()
        }
        assert got == _python_lpa_weighted(edges, iters), f"iters={iters}"


def test_weighted_lpa_diverges_from_unweighted(spark):
    # weights must actually steer the vote: after the b-side converges to a
    # shared label, x sees 2 light b-votes vs 1 heavy a-vote — weighted
    # keeps x with a1, unweighted hands it to the b majority
    edges = [
        ("a1", "x", 5),
        ("b1", "x", 1), ("b2", "x", 1),
        ("b1", "b0", 3), ("b2", "b0", 3),  # b1/b2 adopt b0's label fast
    ]
    df = spark.createDataFrame(edges, "node_a string, node_b string, shared_count long")
    got = {
        r.node_id: r.community
        for r in label_propagation(df, 2, weight_col="shared_count").collect()
    }
    plain = {
        r.node_id: r.community
        for r in label_propagation(df.select("node_a", "node_b"), 2).collect()
    }
    # twins verified above; here pin that they disagree on x
    assert got["x"] != plain["x"], (got, plain)
    assert got == _python_lpa_weighted(edges, 2)
    assert plain == _python_lpa([(a, b) for a, b, _ in edges], 2)


def test_weighted_lpa_multi_edge_collapses_to_max(spark):
    """Duplicate (a, b) rows with different weights are ONE edge at the max
    weight — consistent with the unweighted path's distinct(), and matching
    the python twin's contract (review round-4 finding)."""
    edges = [("a", "x", 5), ("a", "x", 2), ("b", "x", 4), ("b", "x", 4)]
    df = spark.createDataFrame(edges, "node_a string, node_b string, shared_count long")
    got = {
        r.node_id: r.community
        for r in label_propagation(df, 1, weight_col="shared_count").collect()
    }
    # x's votes: a->5 (not 7), b->4 — a wins; with sum-of-dups b would get 8
    assert got["x"] == "a"
    assert got == _python_lpa_weighted(edges, 1)


# ---------------------------------------------------------------------------
# k-core (g25)
# ---------------------------------------------------------------------------

def _kcore_py(edges, k):
    """Pure-Python peeling twin: (node -> core degree) of the k-core."""
    from collections import defaultdict

    adj = defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    changed = True
    while changed:
        changed = False
        for n in [n for n, nb in adj.items() if len(nb) < k]:
            for m in adj.pop(n):
                adj[m].discard(n)
            changed = True
    return {n: len(nb) for n, nb in adj.items() if len(nb) >= k}


def test_kcore_clique_plus_pendant(spark):
    from research_knowledge_graph_spark.operators.communities import k_core

    edges = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
             ("c", "d"), ("d", "e"), ("e", "f")]
    p = spark.createDataFrame(edges, "node_a string, node_b string")
    got = {(r.node_id, r.core_degree) for r in k_core(p, k=3).collect()}
    assert got == {("a", 3), ("b", 3), ("c", 3), ("d", 3)}
    # k=1 keeps everything with an edge; k above max degree empties
    assert {r.node_id for r in k_core(p, k=1).collect()} == set("abcdef")
    assert k_core(p, k=4).count() == 0


def test_kcore_matches_python_twin_random(spark):
    """Random graph vs the sequential-peel twin: the synchronous Spark peel
    and sequential peeling reach the same fixpoint (k-core is unique, so
    peel ORDER cannot matter — this pins that the capped synchronous
    rounds actually got there)."""
    import random

    from research_knowledge_graph_spark.operators.communities import k_core

    rng = random.Random(25)
    nodes = [f"n{i}" for i in range(120)]
    edges = list({tuple(sorted(rng.sample(nodes, 2))) for _ in range(420)})
    expect = _kcore_py(edges, 3)
    p = spark.createDataFrame(edges, "node_a string, node_b string")
    got = {r.node_id: r.core_degree for r in k_core(p, k=3).collect()}
    assert got == expect


def test_kcore_duplicate_and_reversed_edges_collapse(spark):
    from research_knowledge_graph_spark.operators.communities import k_core

    base = [("a", "b"), ("b", "c"), ("c", "a")]
    noisy = base + [(b, a) for a, b in base] + base + [("a", "a")]
    p = spark.createDataFrame(noisy, "node_a string, node_b string")
    got = {(r.node_id, r.core_degree) for r in k_core(p, k=2).collect()}
    assert got == {("a", 2), ("b", 2), ("c", 2)}


def test_k_truss(spark):
    from research_knowledge_graph_spark.operators.communities import k_truss

    # K4 on {a,b,c,d} (every edge in 2 triangles), a separate triangle
    # {x,y,z} (every edge in 1), a pendant edge d-e (0 triangles)
    edges = [
        ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d"),
        ("x", "y"), ("y", "z"), ("x", "z"),
        ("d", "e"),
    ]
    pairs = spark.createDataFrame(edges, "node_a string, node_b string")
    t3 = {
        (r.node_a, r.node_b): r.support for r in k_truss(pairs, k=3).collect()
    }
    k4 = {("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")}
    tri = {("x", "y"), ("x", "z"), ("y", "z")}
    assert set(t3) == k4 | tri
    assert all(t3[e] == 2 for e in k4) and all(t3[e] == 1 for e in tri)
    # k=4: only K4 survives (support >= 2)
    t4 = {
        (r.node_a, r.node_b): r.support for r in k_truss(pairs, k=4).collect()
    }
    assert set(t4) == k4 and all(v == 2 for v in t4.values())
    # k=5 empties it: dropping to support>=3 kills K4 edges in cascade
    assert k_truss(pairs, k=5).count() == 0
    import pytest as _pytest

    with _pytest.raises(ValueError):
        k_truss(pairs, k=2)


def test_conductance_hand_computed(spark):
    """Two triangles bridged by 3-4, labels = the two triangles: m=7,
    each side vol=7, internal=3, cut=1, denom=min(7,7)=7 ->
    phi_ppm = 1e6 // 7 = 142857. Whole-graph-in-one-label rows drop
    (denom 0)."""
    from research_knowledge_graph_spark.operators.communities import conductance

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)],
        "node_a long, node_b long",
    )
    labels = spark.createDataFrame(
        [(i, "A" if i <= 3 else "B") for i in range(1, 7)],
        "node_id long, community string",
    )
    rows = {r.community: r for r in conductance(pairs, labels).collect()}
    assert set(rows) == {"A", "B"}
    for c in "AB":
        r = rows[c]
        assert (
            r.n_nodes, r.internal_edges, r.degree_sum, r.cut_edges,
            r.conductance_ppm,
        ) == (3, 3, 7, 1, 142857)

    one = spark.createDataFrame(
        [(i, "X") for i in range(1, 7)], "node_id long, community string"
    )
    assert conductance(pairs, one).count() == 0


def test_k_core_rejects_zero_max_iter(spark):
    import pytest

    from research_knowledge_graph_spark.operators.communities import k_core

    df = spark.createDataFrame([("a", "b")], "node_a string, node_b string")
    with pytest.raises(ValueError, match="max_iter"):
        k_core(df, k=2, max_iter=0)
