"""Graph visualization sink (S10, reference ``graph_visualizer.py:91-236``).

The reference renders a pyvis HTML network (pyvis isn't available here, and
rendering is inherently a driver-side act on a BOUNDED subgraph). This
module keeps the same contract: distributed BFS bounds the subgraph, a
single ``collect()`` of the bounded result feeds a dependency-free HTML
renderer (vis-network via CDN, same library family pyvis wraps).

The distributed part — the traversal — is `graph_queries.bfs_subgraph`;
only the ≤ ``max_nodes`` rows ever reach the driver.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from research_knowledge_graph_spark.operators.graph_queries import bfs_subgraph

# reference color scheme (graph_visualizer.py:18-27)
NODE_COLORS = {
    "paper": "#4A90D9",
    "concept": "#7ED321",
    "method": "#F5A623",
    "dataset": "#BD10E0",
    "metric": "#D0021B",
    "author": "#9013FE",
    "task": "#50E3C2",
}

_HTML_TEMPLATE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>{title}</title>
<script src="https://unpkg.com/vis-network/standalone/umd/vis-network.min.js"></script>
<style>#net {{ width: 100%; height: 95vh; border: 1px solid #ddd; }}</style>
</head><body><div id="net"></div><script>
var nodes = new vis.DataSet({nodes_json});
var edges = new vis.DataSet({edges_json});
new vis.Network(document.getElementById("net"), {{nodes: nodes, edges: edges}},
                {{physics: {{stabilization: true}}}});
</script></body></html>"""


def _truncate_label(label: str, n: int = 30) -> str:
    """Display truncation (F13, ``graph_visualizer.py:181``)."""
    return label if len(label) <= n else label[:n] + "..."


def subgraph_tables(
    nodes: DataFrame, edges: DataFrame, root_id: str, max_depth: int = 2,
    max_nodes: int = 500,
) -> tuple[DataFrame, DataFrame]:
    """Bounded subgraph around ``root_id``: BFS node set (distributed) then
    the induced edges (semi-joins). Only bounded results leave the cluster.

    The ``max_nodes`` cut is ordered (depth, then node_id) — an unordered
    ``limit`` is re-evaluated independently by the sub_nodes and sub_edges
    plans and can pick DIFFERENT survivors per evaluation (GlobalLimit
    after a shuffle is order-nondeterministic), leaving edges whose
    endpoint is missing from the node set; ordering also makes "which 500
    nodes" the nearest-first choice instead of an arbitrary one."""
    visited = (
        bfs_subgraph(nodes, edges, root_id, max_depth)
        .orderBy(F.asc("depth"), F.asc("node_id"))
        .limit(max_nodes)
    )
    sub_nodes = nodes.join(visited, nodes.id == visited.node_id).select(
        "id", "node_type", "label", "depth"
    )
    ids = visited.select(F.col("node_id"))
    sub_edges = (
        edges.join(ids.withColumnRenamed("node_id", "f"), edges.from_node_id == F.col("f"))
        .drop("f")
        .join(ids.withColumnRenamed("node_id", "t"), edges.to_node_id == F.col("t"))
        .drop("t")
        .select("from_node_id", "to_node_id", "edge_type", "confidence")
    )
    return sub_nodes, sub_edges


def render_subgraph_html(
    nodes: DataFrame, edges: DataFrame, root_id: str, out_path: str,
    max_depth: int = 2, max_nodes: int = 500, title: str = "Knowledge Graph",
) -> str:
    sub_nodes, sub_edges = subgraph_tables(nodes, edges, root_id, max_depth, max_nodes)
    vis_nodes = [
        {
            "id": r.id,
            "label": _truncate_label(r.label or ""),
            "title": r.label,
            "color": NODE_COLORS.get(r.node_type, "#999999"),
        }
        for r in sub_nodes.collect()
    ]
    vis_edges = [
        {
            "from": r.from_node_id,
            "to": r.to_node_id,
            "label": r.edge_type,
            "arrows": "to",
            # explicit None check: confidence 0.0 is a legitimate value and
            # must not be rewritten to the 0.5 missing-value default
            "width": 1 + 2 * (0.5 if r.confidence is None else float(r.confidence)),
        }
        for r in sub_edges.collect()
    ]
    import html as _html

    # '</' must not survive inside the <script> block: a crawled label
    # containing '</script><script>…' would otherwise close the element
    # early and inject markup (json.dumps does not escape '/')
    def _script_safe(payload) -> str:
        return json.dumps(payload).replace("</", "<\\/")

    html = _HTML_TEMPLATE.format(
        title=_html.escape(title),
        nodes_json=_script_safe(vis_nodes),
        edges_json=_script_safe(vis_edges),
    )
    with open(out_path, "w") as f:
        f.write(html)
    return out_path
