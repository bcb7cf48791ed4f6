"""Incremental (batched continuous) ingestion: per-batch delta appends must
converge to the one-shot graph, idempotently."""

from __future__ import annotations

from pyspark.sql import functions as F

from research_knowledge_graph_spark.plans.pipeline import (
    run_pipeline,
    run_pipeline_incremental,
)
from research_knowledge_graph_spark.sources.pages import synthesize_pages


def _node_set(df):
    return sorted((r.id, r.node_type, r.label) for r in df.collect())


def _edge_struct(df):
    # structural comparison: id encodes (from, to, type); confidence for
    # constant-confidence types. Descriptive properties follow arrival
    # order in incremental mode (reference semantics) — excluded.
    return sorted(
        (r.id, r.from_node_id, r.to_node_id, r.edge_type) for r in df.collect()
    )


def test_incremental_converges_to_oneshot(spark, tmp_path):
    pages = synthesize_pages(spark, 90)
    batch_a = pages.filter(F.pmod(F.xxhash64("url"), F.lit(3)) == 0)
    batch_b = pages.filter(F.pmod(F.xxhash64("url"), F.lit(3)) == 1)
    batch_c = pages.filter(F.pmod(F.xxhash64("url"), F.lit(3)) == 2)

    oneshot = run_pipeline(spark, pages, str(tmp_path / "full"), mode="heuristic")

    inc_dir = str(tmp_path / "inc")
    run_pipeline_incremental(spark, batch_a, inc_dir, "b1")
    run_pipeline_incremental(spark, batch_b, inc_dir, "b2")
    r3 = run_pipeline_incremental(spark, batch_c, inc_dir, "b3")

    assert _node_set(r3.nodes) == _node_set(oneshot.nodes)
    assert _edge_struct(r3.edges) == _edge_struct(oneshot.edges)


def test_incremental_rerun_and_duplicate_batch(spark, tmp_path):
    pages = synthesize_pages(spark, 40)
    inc_dir = str(tmp_path / "inc2")
    r1 = run_pipeline_incremental(spark, pages, inc_dir, "b1")
    n_edges = r1.edges.count()

    # re-running the SAME batch id is a committed no-op
    r2 = run_pipeline_incremental(spark, pages, inc_dir, "b1")
    assert r2.edges.count() == n_edges

    # a NEW batch of already-seen pages appends an empty delta
    r3 = run_pipeline_incremental(spark, pages, inc_dir, "b2")
    assert r3.edges.count() == n_edges
    assert _node_set(r3.nodes) == _node_set(r1.nodes)


def test_compact_preserves_content(spark, tmp_path):
    """Compaction rewrites N delta snapshots into one; contents unchanged."""
    import json

    from research_knowledge_graph_spark.sources.table_io import TableIO

    pages = synthesize_pages(spark, 60)
    inc_dir = str(tmp_path / "inc3")
    for i, pred in enumerate([0, 1, 2]):
        b = pages.filter(F.pmod(F.xxhash64("url"), F.lit(3)) == pred)
        run_pipeline_incremental(spark, b, inc_dir, f"b{i}")

    io = TableIO(spark, inc_dir)
    before = _edge_struct(io.read("edges"))
    with open(inc_dir + "/_manifest.json") as f:
        assert len(json.load(f)["tables"]["edges"]["paths"]) == 3

    io.compact("edges", "maintenance-1")
    with open(inc_dir + "/_manifest.json") as f:
        assert len(json.load(f)["tables"]["edges"]["paths"]) == 1
    assert _edge_struct(io.read("edges")) == before
