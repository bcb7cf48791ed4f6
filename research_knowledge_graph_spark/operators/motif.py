"""Motif finding over the nodes/edges tables — the GraphFrames ``find()``
surface expressed as pure Catalyst join plans (no library dependency).

Pattern mini-language (a subset of GraphFrames' DSL):

    "(a)-[e1:PLACED]->(b); (b)-[e2:USES_PART]->(c)"

- vertices are named variables; the same name means the same node (join
  equality), so cycles/triangles are expressed naturally:
  ``(o1)-[:FOLLOWS]->(o2); (o1)-[:USES_PART]->(p); (o2)-[:USES_PART]->(p)``
- ``[name:TYPE]`` / ``[:TYPE]`` / ``[name]`` / ``[]`` — edge variable and
  optional edge-type filter.

Output: one row per match with ``<v>_id``/``<v>_label``/``<v>_type`` per
vertex variable and ``<e>_confidence`` per NAMED edge variable.

Plan shape (the part that matters at 10¹² edges): each pattern edge is one
equi-join against the (type-filtered, column-pruned) edge table; vertex
attributes join once per distinct variable at the END, after the edge
joins have cut cardinality. Catalyst reorders/AQE-sizes the joins; an edge
type filter prunes before any shuffle.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_EDGE_RE = re.compile(
    r"^\(\s*(?P<src>\w+)\s*\)\s*-\s*\[\s*(?P<ename>\w+)?\s*(?::\s*(?P<etype>\w+))?\s*\]\s*->\s*\(\s*(?P<dst>\w+)\s*\)$"
)


def _parse(pattern: str) -> list[dict]:
    terms = []
    enames: set[str] = set()
    for raw in pattern.split(";"):
        raw = raw.strip()
        if not raw:
            continue
        m = _EDGE_RE.match(raw)
        if not m:
            raise ValueError(f"unparseable motif term: {raw!r}")
        t = m.groupdict()
        # a repeated edge variable would emit duplicate <e>_confidence
        # columns and silently ambiguous joins — GraphFrames likewise
        # requires distinct edge names
        if t["ename"]:
            if t["ename"] in enames:
                raise ValueError(
                    f"duplicate edge variable {t['ename']!r} in motif pattern"
                )
            enames.add(t["ename"])
        terms.append(t)
    if not terms:
        raise ValueError("empty motif pattern")
    return terms


def find_motif(nodes: DataFrame, edges: DataFrame, pattern: str) -> DataFrame:
    """All matches of ``pattern`` (see module docstring). ``nodes`` needs
    (id, node_type, label); ``edges`` needs (from_node_id, to_node_id,
    edge_type, confidence).

    Vertex attributes attach via INNER joins: a match touching an edge
    endpoint with no ``nodes`` row (dangling reference — partial node
    load, ingest race) is excluded from the output, matching the oracle's
    plain-JOIN semantics (g14). When the node/edge tables may be out of
    sync, anti-join edges against nodes first (the referential audit) —
    this operator will not surface the break itself."""
    terms = _parse(pattern)

    plan: DataFrame | None = None
    bound: set[str] = set()
    for i, t in enumerate(terms):
        e = edges
        if t["etype"]:
            e = e.filter(F.col("edge_type") == t["etype"])
        if t["src"] == t["dst"]:
            # self-loop term '(a)-[]->(a)': an equality FILTER, not two
            # aliases of the same name (which would duplicate the column
            # and poison later joins)
            e = e.filter(F.col("from_node_id") == F.col("to_node_id"))
            cols = [F.col("from_node_id").alias(f"__{t['src']}")]
        else:
            cols = [
                F.col("from_node_id").alias(f"__{t['src']}"),
                F.col("to_node_id").alias(f"__{t['dst']}"),
            ]
        if t["ename"]:
            cols.append(F.col("confidence").alias(f"{t['ename']}_confidence"))
        e = e.select(*cols)
        if plan is None:
            plan = e
        else:
            shared = [v for v in (t["src"], t["dst"]) if v in bound]
            if shared:
                plan = plan.join(e, on=[f"__{v}" for v in shared])
            else:
                # disconnected pattern component — explicit cross join
                plan = plan.crossJoin(e)
        bound.update((t["src"], t["dst"]))

    out = plan
    n = nodes.select("id", "node_type", "label")
    for v in sorted(bound):
        nv = n.select(
            F.col("id").alias(f"__{v}"),
            F.col("node_type").alias(f"{v}_type"),
            F.col("label").alias(f"{v}_label"),
        )
        out = out.join(nv, f"__{v}")
    renames = [F.col(f"__{v}").alias(f"{v}_id") for v in sorted(bound)]
    attrs = [c for c in out.columns if not c.startswith("__")]
    return out.select(*renames, *attrs)
