"""The BASELINE criterion, computed explicitly: (subj, pred, obj) set
precision/recall ≥ 0.95 vs the reference's deterministic extraction fixtures
(``entity_extraction_agent.py:184-314``) and vs planted ground truth."""

from __future__ import annotations

from research_knowledge_graph_spark.operators.extraction import (
    extract_triples_fixture,
    extract_triples_heuristic,
)
from research_knowledge_graph_spark.sources.pages import (
    planted_triples_py,
    synthesize_pages,
)

# the reference DEBUG fixture emits, per document with title T:
#   (T, INTRODUCES, 3D Gaussian Splatting)
#   (Gaussian Splatting Algorithm, EVALUATES_ON, Mip-NeRF 360)
#   (Gaussian Splatting Algorithm, EVALUATES_WITH, PSNR)
REFERENCE_FIXTURE = [
    (None, "INTRODUCES", "3D Gaussian Splatting"),
    ("Gaussian Splatting Algorithm", "EVALUATES_ON", "Mip-NeRF 360"),
    ("Gaussian Splatting Algorithm", "EVALUATES_WITH", "PSNR"),
]


def _pr(got: set, want: set) -> tuple[float, float]:
    tp = len(got & want)
    precision = tp / len(got) if got else 0.0
    recall = tp / len(want) if want else 0.0
    return precision, recall


def test_fixture_pr_at_least_095(spark):
    titles = [f"Paper {i} On Splatting" for i in range(10)]
    docs = spark.createDataFrame(
        [(f"doc://{i}", t) for i, t in enumerate(titles)], "url string, title string"
    )
    got = {
        (r.url, r.subj, r.pred, r.obj)
        for r in extract_triples_fixture(docs).collect()
    }
    want = {
        (f"doc://{i}", t if s is None else s, p, o)
        for i, t in enumerate(titles)
        for s, p, o in REFERENCE_FIXTURE
    }
    precision, recall = _pr(got, want)
    assert precision >= 0.95 and recall >= 0.95, (precision, recall)
    assert precision == 1.0 and recall == 1.0


def test_heuristic_pr_at_least_095(spark):
    n = 200
    pages = synthesize_pages(spark, n)
    got = {
        (r.url, r.subj, r.pred, r.obj)
        for r in extract_triples_heuristic(pages).collect()
    }
    want = {t for d in range(n) for t in planted_triples_py(d)}
    precision, recall = _pr(got, want)
    assert precision >= 0.95 and recall >= 0.95, (precision, recall)
