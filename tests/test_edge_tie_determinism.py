"""First-insertion-wins must be DETERMINISTIC when two heuristic templates
assert the same (from, to, type) edge with different payloads: the triple
arrival ordinal (template idx, match idx) — not aggregation encounter
order — picks the winner, preserving the bit-identical re-run invariant."""

from __future__ import annotations

from research_knowledge_graph_spark.operators.extraction import (
    extract_mentions_heuristic,
    extract_metadata,
    extract_triples_heuristic,
)
from research_knowledge_graph_spark.operators.linking import build_edges
from research_knowledge_graph_spark.operators.validation import (
    validate_mentions,
    validate_triples,
)

# both sentences emit (title, EVALUATES_WITH, PSNR) — template 4 at
# confidence 0.9, template 10 at confidence 0.8
_TEXT = (
    "Deep Render Nets\n"
    "Results are reported using PSNR.\n"
    "Accuracy is measured by PSNR.\n"
)


def test_same_edge_from_two_templates_keeps_extraction_order_winner(spark):
    docs = spark.createDataFrame(
        [("http://x/1", 1700000000000000, _TEXT, "en")],
        "url string, warc_ts long, text string, lang string",
    )
    triples = extract_triples_heuristic(docs)
    rows = sorted(
        (r.pred, r.obj, r.confidence, r.seq)
        for r in triples.filter("pred = 'EVALUATES_WITH'").collect()
    )
    assert len(rows) == 2 and rows[0][2] != rows[1][2], rows
    assert rows[0][3] != rows[1][3], "the two templates must carry distinct seq"

    meta = extract_metadata(docs)
    mv = validate_mentions(extract_mentions_heuristic(docs))
    tv = validate_triples(triples)
    for _ in range(3):  # stable across re-plans
        edges = build_edges(meta, mv, tv, resolve_titles=True)
        ew = edges.filter("edge_type = 'EVALUATES_WITH'").collect()
        assert len(ew) == 1
        # template 4 ("Results are reported using ...", conf 0.9) extracts
        # FIRST — its ordinal is smaller, so first-insertion-wins must keep
        # its payload regardless of aggregation encounter order
        assert ew[0].confidence == 0.9, ew
