"""Plan contracts — the physical-plan properties the 100 TB design relies
on, pinned so a refactor can't silently regress them:

- predicate pushdown + column pruning reach the parquet scan;
- dimension-side joins broadcast;
- the nodes table's hive partitioning turns type filters into partition
  pruning;
- hot-path queries contain no Python evaluation.
"""

from __future__ import annotations

import importlib.util
import os

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _entry():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(os.path.dirname(__file__), "..", "__spark_entry__.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q01_pushdown_and_pruning(spark):
    m = _entry()
    plan = _plan(m.queries()["q01_pricing_summary"](spark, SF))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: the scan's output column list (FileScan [...]) must
    # include only the 6 referenced columns, none of the wide ones
    assert "l_shipdate#" in plan
    for wide in ("l_comment", "l_shipinstruct", "l_orderkey"):
        assert f"{wide}#" not in plan, f"scan reads unpruned column {wide}"


def test_g04_broadcasts_dimension(spark):
    m = _entry()
    plan = _plan(m.queries()["g04_influence_topk"](spark, SF))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_nodes_type_filter_partition_prunes(spark, tmp_path):
    """The pipeline writes nodes hive-partitioned by node_type; a type
    filter must become a PartitionFilter (directory pruning), not a row
    filter."""
    from research_knowledge_graph_spark.plans.pipeline import run_pipeline
    from research_knowledge_graph_spark.sources.pages import synthesize_pages

    run_pipeline(spark, synthesize_pages(spark, 30), str(tmp_path / "kg"))
    import json

    with open(tmp_path / "kg" / "_manifest.json") as f:
        nodes_path = json.load(f)["tables"]["nodes"]["path"]
    df = spark.read.parquet(nodes_path).filter(F.col("node_type") == "method")
    plan = _plan(df)
    assert "PartitionFilters: [isnotnull(node_type" in plan, plan[:1500]


@pytest.mark.parametrize("qname", ["t02_quality", "t06_simhash", "g06_shared_entity_pairs", "v03_sessionize"])
def test_hot_paths_have_no_python(spark, qname):
    m = _entry()
    plan = _plan(m.queries()[qname](spark, SF))
    assert "Python" not in plan, f"{qname} plan contains Python evaluation"
