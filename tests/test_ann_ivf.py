"""IVF ANN: probing all cells must equal brute force exactly; partial probe
keeps high recall."""

from __future__ import annotations

from pyspark.sql import functions as F

from research_knowledge_graph_spark.operators.ann_ivf import knn_ivf
from research_knowledge_graph_spark.operators.similarity import knn_bruteforce


def _queries(e):
    return e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


def test_ivf_full_probe_equals_bruteforce(spark):
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = _queries(e)
    bf = {(r.query_id, r.rank, r.vec_id) for r in knn_bruteforce(e, q, k=10).collect()}
    ivf = {
        (r.query_id, r.rank, r.vec_id)
        for r in knn_ivf(spark, e, q, k_cells=8, nprobe=8, k=10).collect()
    }
    assert ivf == bf  # probing every cell == exact search


def test_ivf_large_query_table(spark):
    """Routing is pure Catalyst (no driver collect) — a query TABLE works:
    every embedding queries the index at once, self-match excluded."""
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = e.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec"))
    n_q = q.count()
    out = knn_ivf(spark, e, q, k_cells=8, nprobe=2, k=3, broadcast_queries=False)
    got = out.groupBy("query_id").count()
    assert got.count() == n_q  # every query produced results
    assert got.agg(F.max("count")).first()[0] <= 3
    # no self matches
    assert out.filter(F.col("query_id") == F.col("vec_id")).count() == 0


def test_ivf_partial_probe_recall(spark):
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = _queries(e)
    bf = {(r.query_id, r.vec_id) for r in knn_bruteforce(e, q, k=10).collect()}
    ivf = {
        (r.query_id, r.vec_id)
        for r in knn_ivf(spark, e, q, k_cells=8, nprobe=4, k=10).collect()
    }
    recall = len(ivf & bf) / len(bf)
    assert recall >= 0.5, recall  # half the cells probed → decent recall


def test_ivf_persisted_index_matches_inline(spark, tmp_path):
    """Persisted cell-partitioned index returns exactly the inline knn_ivf
    result, and the scan plan prunes to the probed cell directories
    (dynamic partition pruning from the broadcast routed-query side)."""
    from research_knowledge_graph_spark.operators.ann_ivf import (
        build_ivf_index,
        knn_ivf_indexed,
    )

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = _queries(e)
    path = str(tmp_path / "ivf")
    cents = build_ivf_index(e, path, k_cells=8)

    idx = {
        (r.query_id, r.rank, r.vec_id)
        for r in knn_ivf_indexed(spark, path, q, nprobe=3, k=10).collect()
    }
    inline = {
        (r.query_id, r.rank, r.vec_id)
        for r in knn_ivf(spark, e, q, k_cells=8, nprobe=3, k=10, centroids=cents).collect()
    }
    assert idx == inline

    plan = knn_ivf_indexed(spark, path, q, nprobe=3, k=10)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    # the probed cells reach the scan as a PARTITION filter (directory
    # pruning), not a post-scan row filter
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and any("cell" in ln for ln in pf), plan[:2000]


def test_e06_entry_matches_bruteforce(spark):
    """The e06 query-surface entry (full-probe indexed IVF) equals the e01
    brute-force entry row-for-row — the same contract its DuckDB oracle
    checks at sf0.01."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    bf = {tuple(r) for r in entry.e01_knn_bruteforce(spark, sf).collect()}
    ivf = {tuple(r) for r in entry.e06_knn_ivf_indexed(spark, sf).collect()}
    assert ivf == bf


def test_route_queries_rejects_nonpositive_nprobe(spark):
    import pytest

    from research_knowledge_graph_spark.operators.ann_ivf import route_queries

    q = spark.createDataFrame([(0, [0.1, 0.2])], "query_id long, query_vec array<float>")
    for bad in (0, -3):
        with pytest.raises(ValueError, match="nprobe"):
            route_queries(q, [[0.0, 0.0], [1.0, 1.0]], bad)
