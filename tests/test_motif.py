"""Motif finding: pattern parse → join plan → exact match sets."""

from __future__ import annotations

import pytest

from research_knowledge_graph_spark.operators.motif import find_motif


@pytest.fixture(scope="module")
def graph(spark):
    nodes = spark.createDataFrame(
        [
            ("a", "paper", "A"),
            ("b", "paper", "B"),
            ("c", "paper", "C"),
            ("x", "dataset", "X"),
        ],
        "id string, node_type string, label string",
    )
    edges = spark.createDataFrame(
        [
            ("a", "b", "CITES", 1.0),
            ("b", "c", "CITES", 0.9),
            ("a", "x", "USES", 1.0),
            ("b", "x", "USES", 1.0),
            ("c", "x", "OTHER", 1.0),
        ],
        "from_node_id string, to_node_id string, edge_type string, confidence double",
    )
    return nodes, edges


def test_two_hop_chain(graph):
    nodes, edges = graph
    m = find_motif(nodes, edges, "(u)-[:CITES]->(v); (v)-[:CITES]->(w)")
    rows = {(r.u_id, r.v_id, r.w_id) for r in m.collect()}
    assert rows == {("a", "b", "c")}
    row = m.first()
    assert row.u_label == "A" and row.w_type == "paper"


def test_triangle_shared_target(graph):
    nodes, edges = graph
    m = find_motif(
        nodes, edges, "(u)-[e:CITES]->(v); (u)-[:USES]->(d); (v)-[:USES]->(d)"
    )
    rows = {(r.u_id, r.v_id, r.d_id, r.e_confidence) for r in m.collect()}
    assert rows == {("a", "b", "x", 1.0)}  # b->c fails: c USES-edge is OTHER


def test_untyped_edge_and_errors(graph):
    nodes, edges = graph
    m = find_motif(nodes, edges, "(u)-[]->(v)")
    assert m.count() == 5  # every edge, any type
    with pytest.raises(ValueError, match="unparseable"):
        find_motif(nodes, edges, "(u)->[v]")


def test_self_loop_term(spark):
    """ADVICE round-2 (low): '(a)-[]->(a)' is an equality filter, not a
    duplicate-alias join — matches exactly the self-loop edges."""
    nodes = spark.createDataFrame(
        [("a", "paper", "A"), ("b", "paper", "B")],
        "id string, node_type string, label string",
    )
    edges = spark.createDataFrame(
        [
            ("a", "a", "SELF", 1.0),
            ("a", "b", "CITES", 1.0),
            ("b", "b", "SELF", 0.5),
        ],
        "from_node_id string, to_node_id string, edge_type string, confidence double",
    )
    m = find_motif(nodes, edges, "(v)-[e:SELF]->(v)")
    rows = {(r.v_id, r.e_confidence) for r in m.collect()}
    assert rows == {("a", 1.0), ("b", 0.5)}
    # self-loop composed with an outgoing edge
    m2 = find_motif(nodes, edges, "(v)-[:SELF]->(v); (v)-[:CITES]->(w)")
    assert {(r.v_id, r.w_id) for r in m2.collect()} == {("a", "b")}


def test_duplicate_edge_variable_rejected(graph):
    nodes, edges = graph
    with pytest.raises(ValueError, match="duplicate edge variable"):
        find_motif(nodes, edges, "(u)-[e:CITES]->(v); (v)-[e:USES]->(w)")
