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
