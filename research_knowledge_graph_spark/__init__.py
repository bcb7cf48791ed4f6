"""PySpark-native knowledge-graph construction engine.

A from-scratch, Spark-first reimplementation of the query and data-processing
capabilities of the reference pipeline (``cheersanimesh/research_knowledge_graph``):
triple extraction, entity validation/normalization, entity linking and
canonicalization, graph materialization, and the full analytical query surface —
re-expressed as partition-parallel DataFrame operators with vectorized
pandas/Arrow UDFs (no per-row Python in any hot path).

Design notes
------------
- DataFrame/SQL first: every operator is a declarative plan Catalyst can
  optimize (predicate pushdown, column pruning, broadcast joins, AQE).
- Deterministic everywhere: ids are sha2 hashes of content keys (the reference
  uses uuid4 — ``src/graph/models.py:11,32``), so re-runs are idempotent and
  MERGE/dedup semantics are stable.
- Scale posture: built for a 1000-executor cluster over ~100 TB. Blocking
  joins carry explicit salt columns; skewed aggregations use two-phase
  (partial) aggregation; small dimensions are broadcast.
"""

__version__ = "0.1.0"

from research_knowledge_graph_spark.session import get_spark  # noqa: F401
