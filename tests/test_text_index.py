"""Persisted inverted-index BM25 serving path (operators/text_search.py::
build_text_index / bm25_indexed): results must equal the corpus-scan form
exactly, and term lookups must prune to the query's hash buckets."""

from __future__ import annotations

import pytest

from research_knowledge_graph_spark.operators.text_search import (
    bm25_indexed,
    bm25_scores,
    build_text_index,
)


@pytest.fixture(scope="module")
def corpus(spark):
    import random

    rnd = random.Random(47)
    vocab = ["spark", "hash", "vector", "scan", "join", "agg", "row", "sort",
             "window", "merge", "batch", "query"]
    rows = [
        (i, " ".join(rnd.choice(vocab) for _ in range(rnd.randrange(8, 60))))
        for i in range(300)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_indexed_equals_scan(spark, corpus, tmp_path):
    idx = str(tmp_path / "tidx")
    build_text_index(corpus, idx)
    terms = ["spark", "vector", "window"]
    scan = [(r.doc_id, r.score) for r in bm25_scores(corpus, terms, limit=40).collect()]
    served = [
        (r.doc_id, r.score)
        for r in bm25_indexed(spark, idx, terms, limit=40).collect()
    ]
    assert served == scan and len(scan) == 40


def test_indexed_prunes_to_query_buckets(spark, corpus, tmp_path):
    idx = str(tmp_path / "tidx2")
    build_text_index(corpus, idx)
    df = bm25_indexed(spark, idx, ["spark"], limit=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the postings scan must carry the bucket predicate ON the
    # PartitionFilters line itself (an empty 'PartitionFilters: []' plus a
    # post-scan row filter would make a substring check pass vacuously)
    pf_lines = [ln for ln in plan.splitlines() if "PartitionFilters:" in ln]
    assert any("bucket" in ln for ln in pf_lines), (pf_lines, plan[:3000])
    rows = df.collect()
    assert len(rows) == 5


def test_indexed_unknown_term_is_empty_not_error(spark, corpus, tmp_path):
    idx = str(tmp_path / "tidx3")
    build_text_index(corpus, idx)
    # a term absent from the corpus contributes nothing; an all-absent
    # query returns an empty frame with the right schema
    rows = bm25_indexed(spark, idx, ["zzzznotaword"], limit=5).collect()
    assert rows == []
