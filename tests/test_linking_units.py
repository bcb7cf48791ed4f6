"""Unit tests for linking-stage helpers: the F10 direction rule and the E4
both-direction SIMILAR_TO union."""

from __future__ import annotations

from pyspark.sql import functions as F

from research_knowledge_graph_spark.operators.graph_queries import similar_union
from research_knowledge_graph_spark.operators.linking import orient_cross_edges

SCORED = (
    "from_node_id string, to_node_id string, edge_type string, confidence double, "
    "properties map<string,string>"
)


def test_orient_cross_edges_direction_rule(spark):
    """F10 (relationship_linking_agent.py:144-147): IMPROVES_ON / EXTENDS /
    REFINES_CONCEPT point doc2→doc1; everything else keeps doc1→doc2."""
    rows = [
        ("p1", "p2", "IMPROVES_ON", 0.9, {}),
        ("p1", "p2", "EXTENDS", 0.8, {}),
        ("p1", "p2", "REFINES_CONCEPT", 0.7, {}),
        ("p1", "p2", "SIMILAR_TO", 0.75, {}),
        ("p1", "p2", "COMPARES_TO", 0.6, {}),
    ]
    out = {
        r.edge_type: (r.from_node_id, r.to_node_id)
        for r in orient_cross_edges(spark.createDataFrame(rows, SCORED)).collect()
    }
    assert out["IMPROVES_ON"] == ("p2", "p1")
    assert out["EXTENDS"] == ("p2", "p1")
    assert out["REFINES_CONCEPT"] == ("p2", "p1")
    assert out["SIMILAR_TO"] == ("p1", "p2")
    assert out["COMPARES_TO"] == ("p1", "p2")


def test_similar_union_both_directions(spark):
    """E4 (graph_service.py:403-458): SIMILAR_TO edges in either direction
    surface the neighbor, deduped."""
    nodes = spark.createDataFrame(
        [("a", "paper", "A"), ("b", "paper", "B"), ("c", "paper", "C")],
        "id string, node_type string, label string",
    )
    edges = spark.createDataFrame(
        [
            ("x", "a", "b", "SIMILAR_TO", 0.7),
            ("y", "c", "a", "SIMILAR_TO", 0.9),
            ("z", "a", "b", "SIMILAR_TO", 0.8),   # duplicate pair → dedup, max conf
            ("w", "b", "c", "OTHER", 1.0),         # other type ignored
        ],
        "id string, from_node_id string, to_node_id string, edge_type string, confidence double",
    )
    out = {r.other_id: r.confidence for r in similar_union(nodes, edges, "a").collect()}
    assert out == {"b": 0.8, "c": 0.9}
