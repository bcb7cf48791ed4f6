"""Vocabulary coverage curve (operators/curation.py::vocab_coverage)."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from research_knowledge_graph_spark.operators.curation import vocab_coverage

SF_DIR = "/root/testdata/sf0.001"
# the sf0.001 synthetic corpus has a ~31-token vocabulary; keep the curve
# fully inside it so the length assertion is exact
TOP_N = 20


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_curve_shape(spark, docs):
    rows = vocab_coverage(docs, top_n=TOP_N).orderBy("rank").collect()
    assert len(rows) == TOP_N
    assert [r["rank"] for r in rows] == list(range(1, TOP_N + 1))
    # freq non-increasing along rank; ties broken by token ascending
    for a, b in zip(rows, rows[1:]):
        assert a["freq"] >= b["freq"]
        if a["freq"] == b["freq"]:
            assert a["token"] < b["token"]
    # cumulative share strictly increasing, never past 1e6
    for a, b in zip(rows, rows[1:]):
        assert a["cum_ppm"] < b["cum_ppm"]
    assert rows[-1]["cum_ppm"] <= 1_000_000


def test_python_twin(spark, docs):
    """Bit-exact vs a python Counter over the same lowercased-whitespace
    token stream."""
    texts = [r["text"] for r in docs.select("text").collect()]
    counter: Counter = Counter()
    total = 0
    for t in texts:
        toks = t.lower().split()
        counter.update(toks)
        total += len(toks)
    top = sorted(counter.items(), key=lambda kv: (-kv[1], kv[0]))[:TOP_N]
    want, cum = [], 0
    for i, (tok, freq) in enumerate(top, 1):
        cum += freq
        want.append((i, tok, freq, 1_000_000 * cum // total))
    got = [
        (r["rank"], r["token"], r["freq"], r["cum_ppm"])
        for r in vocab_coverage(docs, top_n=TOP_N).orderBy("rank").collect()
    ]
    assert got == want


def test_validation(docs):
    with pytest.raises(ValueError):
        vocab_coverage(docs, top_n=0)
