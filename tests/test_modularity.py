"""Community modularity scoring (operators/communities.py::modularity)
pinned against the textbook formula computed in pure Python."""

from __future__ import annotations

import random

import pytest

from research_knowledge_graph_spark.operators.communities import (
    label_propagation,
    modularity,
)


def _python_modularity(edges, assign):
    """Q = Σ_c [ e_c/m − (d_c/(2m))² ] over the undirected simple graph."""
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    m = len(und)
    deg: dict[str, int] = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    e_c: dict[str, int] = {}
    d_c: dict[str, int] = {}
    for a, b in und:
        if assign[a] == assign[b]:
            e_c[assign[a]] = e_c.get(assign[a], 0) + 1
    for n, d in deg.items():
        d_c[assign[n]] = d_c.get(assign[n], 0) + d
    return sum(
        e_c.get(c, 0) / m - (d_c[c] / (2 * m)) ** 2 for c in d_c
    )


def test_modularity_matches_python_twin(spark):
    rnd = random.Random(53)
    nodes = [f"n{i}" for i in range(30)]
    edges = list(
        {tuple(sorted((rnd.choice(nodes), rnd.choice(nodes)))) for _ in range(90)}
    )
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "node_a string, node_b string")
    labels = label_propagation(df, 3)
    assign = {r.node_id: r.community for r in labels.collect()}

    per_c = modularity(df, labels)
    got_q = round(sum(r.modularity_term for r in per_c.collect()), 6)
    assert got_q == pytest.approx(round(_python_modularity(edges, assign), 6), abs=2e-6)


def test_modularity_two_cliques(spark):
    # two disconnected K4s, perfect communities: Q = 2·(6/12 − (12/24)²) = 0.5
    cliq = lambda p: [
        (f"{p}1", f"{p}2"), (f"{p}1", f"{p}3"), (f"{p}1", f"{p}4"),
        (f"{p}2", f"{p}3"), (f"{p}2", f"{p}4"), (f"{p}3", f"{p}4"),
    ]
    df = spark.createDataFrame(cliq("a") + cliq("b"), "node_a string, node_b string")
    labels = label_propagation(df, 5)
    rows = modularity(df, labels).collect()
    assert len(rows) == 2
    q = sum(r.modularity_term for r in rows)
    assert q == pytest.approx(0.5, abs=1e-9)
    for r in rows:
        assert r.n_nodes == 4 and r.internal_edges == 6 and r.degree_sum == 12


def _python_louvain_move(edges, assign):
    """One synchronous local-move round with the INTEGER gain decision
    gain2 = 2m(k_uc − k_ua) − k_u(Σ_c − Σ_a + k_u); move iff gain2 > 0,
    ties to the smallest candidate community id."""
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    m = len(und)
    nb: dict[str, list] = {}
    for a, b in und:
        nb.setdefault(a, []).append(b)
        nb.setdefault(b, []).append(a)
    deg = {u: len(vs) for u, vs in nb.items()}
    sigma: dict[str, int] = {}
    for u, d in deg.items():
        sigma[assign[u]] = sigma.get(assign[u], 0) + d
    new = {}
    for u, vs in nb.items():
        a = assign[u]
        k_uc: dict[str, int] = {}
        for v in vs:
            k_uc[assign[v]] = k_uc.get(assign[v], 0) + 1
        k_ua = k_uc.get(a, 0)
        best = None  # (gain2, cand); max gain2, tie -> smallest cand
        for c, k in k_uc.items():
            if c == a:
                continue
            gain2 = 2 * m * (k - k_ua) - deg[u] * (sigma[c] - sigma[a] + deg[u])
            if gain2 > 0 and (
                best is None
                or gain2 > best[0]
                or (gain2 == best[0] and c < best[1])
            ):
                best = (gain2, c)
        new[u] = best[1] if best else a
    return new


def test_louvain_move_round_matches_python_twin(spark):
    from research_knowledge_graph_spark.operators.communities import (
        louvain_move_round,
    )

    rnd = random.Random(17)
    nodes = [f"n{i}" for i in range(40)]
    edges = list(
        {tuple(sorted((rnd.choice(nodes), rnd.choice(nodes)))) for _ in range(120)}
    )
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "node_a string, node_b string")
    labels = label_propagation(df, 2)  # deliberately under-converged
    assign = {r.node_id: r.community for r in labels.collect()}
    expected = _python_louvain_move(edges, assign)

    got = {
        r.node_id: r.community
        for r in louvain_move_round(df, labels).collect()
    }
    assert got == expected


def test_louvain_move_improves_modularity_from_singletons(spark):
    """From the all-singletons assignment every applied move is positive
    against the snapshot; on two disconnected cliques one round must
    strictly raise Q (and land each clique on a shared label)."""
    from research_knowledge_graph_spark.operators.communities import (
        louvain_move_round,
    )

    cliq = lambda p: [
        (f"{p}1", f"{p}2"), (f"{p}1", f"{p}3"), (f"{p}1", f"{p}4"),
        (f"{p}2", f"{p}3"), (f"{p}2", f"{p}4"), (f"{p}3", f"{p}4"),
    ]
    df = spark.createDataFrame(cliq("a") + cliq("b"), "node_a string, node_b string")
    singles = df.selectExpr("node_a AS node_id").union(
        df.selectExpr("node_b AS node_id")
    ).distinct().withColumn("community", __import__("pyspark").sql.functions.col("node_id"))

    q_before = sum(r.modularity_term for r in modularity(df, singles).collect())
    moved = louvain_move_round(df, singles)
    q_after = sum(r.modularity_term for r in modularity(df, moved).collect())
    assert q_after > q_before


def test_louvain_refines_lpa_on_couse_shape(spark):
    """The g23 composition: LPA labels then one move round — Q must not
    drop on a clustered-with-noise graph (the co-usage shape)."""
    from research_knowledge_graph_spark.operators.communities import (
        louvain_move_round,
    )

    rnd = random.Random(7)
    edges = []
    # 4 dense blocks of 8 + sparse noise between blocks
    for blk in range(4):
        ns = [f"b{blk}_{i}" for i in range(8)]
        for i in range(8):
            for j in range(i + 1, 8):
                if rnd.random() < 0.7:
                    edges.append((ns[i], ns[j]))
    for _ in range(20):
        b1, b2 = rnd.sample(range(4), 2)
        edges.append((f"b{b1}_{rnd.randrange(8)}", f"b{b2}_{rnd.randrange(8)}"))
    df = spark.createDataFrame(sorted(set(edges)), "node_a string, node_b string")
    labels = label_propagation(df, 2)
    q_before = sum(r.modularity_term for r in modularity(df, labels).collect())
    refined = louvain_move_round(df, labels)
    q_after = sum(r.modularity_term for r in modularity(df, refined).collect())
    assert q_after >= q_before


def test_louvain_move_round_keeps_edgeless_labeled_nodes(spark):
    """'Unchanged rows keep their label' must include labeled nodes with
    NO edge in pairs (isolated node / labels from a larger graph) — the
    old base=lab⨝deg inner join silently dropped them, so iterating the
    round over its own output progressively lost nodes."""
    from research_knowledge_graph_spark.operators.communities import (
        louvain_move_round,
    )

    pairs = spark.createDataFrame(
        [("a", "b")], "node_a string, node_b string"
    )
    labels = spark.createDataFrame(
        [("a", "c1"), ("b", "c1"), ("iso", "c9")],
        "node_id string, community string",
    )
    got = {
        (r.node_id, r.community)
        for r in louvain_move_round(pairs, labels).collect()
    }
    assert ("iso", "c9") in got
    assert {r[0] for r in got} == {"a", "b", "iso"}
