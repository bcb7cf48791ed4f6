"""Validation-stage tests: the reference's dedup/merge/validate semantics
(``validation_agent.py:56-142``) at DataFrame level."""

from __future__ import annotations

from pyspark.sql import functions as F

from research_knowledge_graph_spark.operators.validation import (
    validate_mentions,
    validate_triples,
)

MENTION_SCHEMA = (
    "url string, seq int, entity_type string, label string, description string, "
    "properties map<string,string>"
)


def test_dedup_first_wins(spark):
    """Reference test_validation_agent_deduplication: case-insensitive merge,
    first label wins, 2 entities remain."""
    rows = [
        ("u1", 0, "concept", "3D Gaussian Splatting", "Method 1", {}),
        ("u1", 1, "concept", "3d gaussian splatting", "Method 2", {}),
        ("u1", 2, "concept", "Neural Radiance Fields", "Method 3", {}),
    ]
    out = validate_mentions(spark.createDataFrame(rows, MENTION_SCHEMA)).collect()
    by_label = {r.label: r for r in out}
    assert len(out) == 2
    # "3D" isupper → preserved on first arrival
    assert "3D Gaussian Splatting" in by_label
    assert by_label["3D Gaussian Splatting"].description == "Method 1"
    assert "Neural Radiance Fields" in by_label


def test_dedup_desc_and_props_merge(spark):
    """description: first non-null; properties: later duplicate keys win."""
    rows = [
        ("u1", 0, "method", "Foo Bar", None, {"a": "1", "b": "1"}),
        ("u1", 1, "method", "foo bar", "later desc", {"b": "2", "c": "3"}),
    ]
    out = validate_mentions(spark.createDataFrame(rows, MENTION_SCHEMA)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.description == "later desc"  # first NON-NULL
    assert dict(r.properties) == {"a": "1", "b": "2", "c": "3"}


def test_blank_labels_dropped(spark):
    rows = [
        ("u1", 0, "concept", "  ", None, {}),
        ("u1", 1, "concept", "", None, {}),
        ("u1", 2, "concept", "Ok", None, {}),
        ("u1", 3, "concept", None, None, {}),
    ]
    out = validate_mentions(spark.createDataFrame(rows, MENTION_SCHEMA)).collect()
    assert [r.label for r in out] == ["Ok"]


def test_validate_triples(spark):
    rows = [
        ("u1", "A", "INTRODUCES", "B", 0.9, None, None),
        ("u1", "", "INTRODUCES", "B", 0.9, None, None),      # empty subj → drop
        ("u1", "A", None, "B", 0.9, None, None),              # no pred → drop
        ("u1", "A", "USES_CONCEPT", "C", None, None, None),   # conf → 0.5
        ("u1", "A", "USES_CONCEPT", "D", 7.0, None, None),    # clamp → 1.0
    ]
    schema = (
        "url string, subj string, pred string, obj string, confidence double, "
        "rationale string, evidence_span string"
    )
    out = validate_triples(spark.createDataFrame(rows, schema)).orderBy("obj").collect()
    assert [(r.obj, r.confidence) for r in out] == [("B", 0.9), ("C", 0.5), ("D", 1.0)]


def test_empty_description_does_not_beat_later_real_one(spark):
    """Reference guard is FALSY ('if entity.description and not
    existing.description') — an empty-string description stored first
    must not win over a later real one."""
    rows = [
        ("u", 0, "method", "Foo", "", None),
        ("u", 1, "method", "Foo", "the real description", None),
        ("u", 2, "method", "Bar", "", None),  # only-empty group -> NULL
    ]
    df = spark.createDataFrame(
        rows,
        "url string, seq int, entity_type string, label string, "
        "description string, properties map<string,string>",
    )
    out = {r.label: r.description for r in validate_mentions(df).collect()}
    assert out["Foo"] == "the real description"
    assert out["Bar"] is None


def test_tab_newline_only_labels_dropped(spark):
    """python str.strip() drops \\t/\\n-only labels (reference 'not
    label.strip()'); F.trim would have let them through as phantom
    empty-label entities."""
    rows = [
        ("u", 0, "method", "\t", None, None),
        ("u", 1, "method", "\n\n", None, None),
        ("u", 2, "method", " \t\r ", None, None),
        ("u", 3, "method", "Real", None, None),
    ]
    df = spark.createDataFrame(
        rows,
        "url string, seq int, entity_type string, label string, "
        "description string, properties map<string,string>",
    )
    out = validate_mentions(df).collect()
    assert [r.label for r in out] == ["Real"]


def test_null_properties_row_does_not_poison_merge(spark):
    """One duplicate with properties=NULL must not NULL the whole merged
    map (map_concat(acc, NULL) = NULL poisoned the fold)."""
    rows = [
        ("u", 0, "method", "Foo", None, {"a": "1"}),
        ("u", 1, "method", "Foo", None, None),
        ("u", 2, "method", "Foo", None, {"b": "2"}),
    ]
    df = spark.createDataFrame(
        rows,
        "url string, seq int, entity_type string, label string, "
        "description string, properties map<string,string>",
    )
    out = validate_mentions(df).collect()
    assert len(out) == 1
    assert dict(out[0].properties) == {"a": "1", "b": "2"}
