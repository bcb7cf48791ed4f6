"""Extraction-stage tests: fixture parity (the P/R≥0.95 surface), heuristic
P/R vs planted ground truth, and the byte-identical html→text invariant."""

from __future__ import annotations

from pyspark.sql import functions as F

from research_knowledge_graph_spark.operators.extraction import (
    extract_mentions_fixture,
    extract_mentions_heuristic,
    extract_triples_fixture,
    extract_triples_heuristic,
)
from research_knowledge_graph_spark.operators.html_text import (
    extract_text,
    extract_text_from_html_py,
)
from research_knowledge_graph_spark.sources.pages import (
    planted_triples_py,
    synthesize_pages,
)

SAMPLE_TITLES = [
    "3D Gaussian Splatting for Real-Time Radiance Field Rendering",
    "Adaptive 3D Gaussian Splatting for Dynamic Scene Reconstruction",
    "Compressed Gaussian Splatting for Efficient Storage and Transmission",
    "Gaussian Splatting with Neural Radiance Fields: A Hybrid Approach",
]


def _sample_docs(spark):
    rows = [(f"doc://{i}", t) for i, t in enumerate(SAMPLE_TITLES)]
    return spark.createDataFrame(rows, "url string, title string")


def test_fixture_triples_match_reference(spark):
    """Reference DEBUG fixture emits exactly 3 relationships per doc
    (entity_extraction_agent.py:288-313); P/R vs that set must be 1.0."""
    docs = _sample_docs(spark)
    got = {
        (r.url, r.subj, r.pred, r.obj)
        for r in extract_triples_fixture(docs).collect()
    }
    want = set()
    for i, t in enumerate(SAMPLE_TITLES):
        u = f"doc://{i}"
        want |= {
            (u, t, "INTRODUCES", "3D Gaussian Splatting"),
            (u, "Gaussian Splatting Algorithm", "EVALUATES_ON", "Mip-NeRF 360"),
            (u, "Gaussian Splatting Algorithm", "EVALUATES_WITH", "PSNR"),
        }
    assert got == want  # precision = recall = 1.0


def test_fixture_mentions_shape(spark):
    docs = _sample_docs(spark)
    m = extract_mentions_fixture(docs)
    per_doc = m.groupBy("url", "entity_type").count().collect()
    counts = {(r.url, r.entity_type): r["count"] for r in per_doc}
    for i in range(len(SAMPLE_TITLES)):
        u = f"doc://{i}"
        assert counts[(u, "concept")] == 2
        assert counts[(u, "method")] == 1
        assert counts[(u, "dataset")] == 1
        assert counts[(u, "metric")] == 2
    # properties carried: method node has JSON-encoded training_details
    props = (
        m.filter(F.col("label") == "Gaussian Splatting Algorithm")
        .select(F.map_keys("properties"))
        .first()[0]
    )
    assert "training_details" in props and "parameters" in props


def test_heuristic_triples_pr_vs_planted(spark):
    """Heuristic extractor P/R vs template ground truth must be 1.0."""
    n = 50
    pages = synthesize_pages(spark, n)
    got = {
        (r.url, r.subj, r.pred, r.obj)
        for r in extract_triples_heuristic(pages).collect()
    }
    want = {t for d in range(n) for t in planted_triples_py(d)}
    missing = want - got
    extra = got - want
    assert not missing, f"recall loss: {sorted(missing)[:5]}"
    assert not extra, f"precision loss: {sorted(extra)[:5]}"


def test_heuristic_mentions_typed(spark):
    pages = synthesize_pages(spark, 20)
    m = extract_mentions_heuristic(pages)
    types = {r.entity_type for r in m.select("entity_type").distinct().collect()}
    assert types == {"concept", "method", "dataset", "metric"}
    assert m.filter(F.col("label").startswith("Benchmark Set")).count() > 0


def test_heuristic_generic_patterns(spark):
    """Free-form patterns beyond the synthetic templates."""
    text = (
        "Deep Retrieval Nets\n\n"
        "Our system is trained on the Common Web Corpus dataset. "
        "Quality is measured by BLEU. We use the beam search algorithm. "
        "Deep Retrieval Nets is based on Dense Indexing."
    )
    docs = spark.createDataFrame([("u://x", text)], "url string, text string")
    got = {(r.subj, r.pred, r.obj) for r in extract_triples_heuristic(docs).collect()}
    assert ("Deep Retrieval Nets", "USES_DATASET", "Common Web Corpus") in got
    assert ("Deep Retrieval Nets", "EVALUATES_WITH", "BLEU") in got
    assert ("Deep Retrieval Nets", "USES_CONCEPT", "beam search") in got
    assert ("Deep Retrieval Nets", "USES_CONCEPT", "Dense Indexing") in got


def test_html_text_byte_identical(spark):
    """Stage-1 invariant: extracted text == the text column, per url."""
    pages = synthesize_pages(spark, 30)
    diff = (
        extract_text(pages)
        .filter(F.col("extracted_text") != F.col("text"))
        .count()
    )
    assert diff == 0


def test_html_text_fallback_generic():
    html = (
        b"<html><head><title>T</title></head><body><nav>menu</nav>"
        b"<div>Hello <b>world</b></div><footer>foot</footer></body></html>"
    )
    out = extract_text_from_html_py(html)
    assert "Hello" in out and "world" in out
    assert "menu" not in out and "foot" not in out
