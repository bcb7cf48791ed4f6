"""CLI surface, visualization sink, fuzzy pipeline mode, watermarked
streaming rollup."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from research_knowledge_graph_spark.cli import main as cli_main
from research_knowledge_graph_spark.plans.pipeline import run_pipeline
from research_knowledge_graph_spark.sources.pages import PAGES_SCHEMA, synthesize_pages
from research_knowledge_graph_spark.streaming.aggregates import run_windowed_rollup


def test_cli_ingest_and_query(spark, tmp_path, capsys):
    wd = str(tmp_path / "kg")
    rc = cli_main(["ingest", "--synthetic", "40", "--workdir", wd])
    assert rc == 0
    out = capsys.readouterr().out
    assert "nodes=" in out and "edges=" in out
    rc = cli_main(["query", "--workdir", wd, "--type", "counts"])
    assert rc == 0
    assert "INTRODUCES" in capsys.readouterr().out


def test_visualize_html(spark, tmp_path):
    wd = str(tmp_path / "kg2")
    pages = synthesize_pages(spark, 30)
    res = run_pipeline(spark, pages, wd, mode="heuristic")
    root = res.nodes.filter(F.col("node_type") == "paper").first().id
    out = str(tmp_path / "g.html")
    from research_knowledge_graph_spark.operators.visualize import render_subgraph_html

    render_subgraph_html(res.nodes, res.edges, root, out, max_depth=2)
    html = open(out).read()
    assert "vis.Network" in html and root in html


def test_pipeline_fuzzy_mode_merges_variants(spark, tmp_path):
    """Fuzzy canonicalization inside the pipeline merges near-identical
    labels into one node while exact mode keeps them apart."""
    rows = [
        ("https://a/1", "T1\n\nThis work introduces Method Alpha One.", "en"),
        ("https://a/2", "T2\n\nThis work introduces Method Alpha Onee.", "en"),  # typo variant
    ]
    pages = spark.createDataFrame(rows, "url string, text string, lang string")
    pages = (
        pages.withColumn("warc_ts", F.to_timestamp(F.lit("2024-01-01")))
        .withColumn(
            "html",
            F.encode(
                F.concat(
                    F.lit("<html><body><article><p>"),
                    F.regexp_replace("text", "\n\n", "</p><p>"),
                    F.lit("</p></article></body></html>"),
                ),
                "utf-8",
            ),
        )
    )

    exact = run_pipeline(spark, pages, str(tmp_path / "ex"), mode="heuristic",
                         cross_link=False, canonicalize="exact")
    fuzzy = run_pipeline(spark, pages, str(tmp_path / "fz"), mode="heuristic",
                         cross_link=False, canonicalize="fuzzy")
    n_exact = exact.nodes.filter(F.col("node_type") == "method").count()
    n_fuzzy = fuzzy.nodes.filter(F.col("node_type") == "method").count()
    assert n_exact == 2   # exact-label linking keeps the typo variant separate
    assert n_fuzzy == 1   # LSH→CC clusters it; broadcast dict rewrites identity
    # triple endpoints still resolve via surface labels in fuzzy mode
    assert fuzzy.edges.filter(F.col("edge_type") == "INTRODUCES").count() == 2


def test_streaming_windowed_rollup(spark, tmp_path):
    inp, out, ckpt = (str(tmp_path / d) for d in ["in", "out", "ck"])
    synthesize_pages(spark, 50).write.mode("append").parquet(inp)
    run_windowed_rollup(spark, inp, out, ckpt, PAGES_SCHEMA)
    res = spark.read.parquet(out)
    assert res.count() > 0
    assert set(res.columns) == {"window_start", "window_end", "lang", "n"}
    # total counted events ≤ input (late windows held back by watermark)
    assert res.agg(F.sum("n")).first()[0] <= 50


def test_visualize_escaping_and_bounded_consistency(spark, tmp_path):
    """Review fixes: (1) a '</script>' payload in a label must not survive
    raw into the <script> block (markup injection); (2) title HTML-escaped;
    (3) confidence 0.0 renders at width 1.0, not the 0.5-default 2.0;
    (4) with max_nodes < |BFS|, every rendered edge endpoint is in the
    rendered node set (ordered, single-evaluation truncation)."""
    import json as _json
    import re

    from research_knowledge_graph_spark.operators.visualize import (
        render_subgraph_html,
        subgraph_tables,
    )

    evil = 'x</script><script>alert(1)</script>'
    nodes = spark.createDataFrame(
        [("r", "paper", evil)] + [(f"n{i}", "concept", f"c{i}") for i in range(6)],
        "id string, node_type string, label string",
    )
    edges = spark.createDataFrame(
        [("r", f"n{i}", "INTRODUCES", 0.0 if i == 0 else 0.9) for i in range(6)],
        "from_node_id string, to_node_id string, edge_type string, confidence double",
    )
    out = render_subgraph_html(
        nodes, edges, "r", str(tmp_path / "g.html"), title="<T&>"
    )
    html = open(out).read()
    body = html.split("<script>", 1)[1]  # past the CDN tag, our data block
    assert "</script><script>alert" not in body
    assert "&lt;T&amp;&gt;" in html
    widths = [float(w) for w in re.findall(r'"width": ([0-9.]+)', html)]
    assert 1.0 in widths  # confidence 0.0 edge, NOT 2.0

    sub_n, sub_e = subgraph_tables(nodes, edges, "r", max_depth=2, max_nodes=3)
    ids = {r.id for r in sub_n.collect()}
    assert len(ids) == 3 and "r" in ids  # depth-ordered: root first
    for r in sub_e.collect():
        assert r.from_node_id in ids and r.to_node_id in ids
