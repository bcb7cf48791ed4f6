"""BM25 ranking (operators/text_search.py) pinned against a pure-Python
twin and a plan contract; the sf-scale DuckDB oracle is t16 in
tests/test_entry_oracle.py."""

from __future__ import annotations

import math
import random

import pytest

from research_knowledge_graph_spark.operators.text_search import bm25_scores


def _python_bm25(corpus, terms, k1=1.2, b=0.75):
    """corpus: {doc_id: text}; returns {doc_id: round(score, 6)} for docs
    matching ≥1 term."""
    toks = {d: [w for w in t.lower().split() if w] for d, t in corpus.items()}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {
        t: sum(1 for v in toks.values() if t in v)
        for t in terms
    }
    out = {}
    for d, v in toks.items():
        s = 0.0
        for t in terms:
            tf = v.count(t)
            if tf == 0 or df[t] == 0:
                continue
            idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            s += idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * len(v) / avgdl))
        if s > 0:
            out[d] = round(s, 6)
    return out


def test_bm25_matches_python_twin(spark):
    rnd = random.Random(41)
    vocab = ["spark", "hash", "vector", "scan", "join", "agg", "row", "sort"]
    corpus = {
        i: " ".join(rnd.choice(vocab) for _ in range(rnd.randrange(5, 40)))
        for i in range(120)
    }
    df = spark.createDataFrame(list(corpus.items()), "doc_id long, text string")
    terms = ["spark", "vector"]
    got = {
        r.doc_id: r.score
        for r in bm25_scores(df, terms, limit=1000).collect()
    }
    expected = _python_bm25(corpus, terms)
    assert got == pytest.approx(expected, abs=2e-6)
    assert len(got) > 50


def test_bm25_ordering_and_case(spark):
    df = spark.createDataFrame(
        [
            (1, "Spark spark SPARK filler filler"),  # tf=3, short
            (2, "spark filler filler filler filler filler filler filler"),
            (3, "filler only no match here"),
        ],
        "doc_id long, text string",
    )
    rows = bm25_scores(df, ["SPARK"], limit=10).collect()
    assert [r.doc_id for r in rows] == [1, 2]  # 3 has no hit; 1 outranks 2
    assert rows[0].score > rows[1].score > 0


def test_bm25_plan_contract(spark):
    """Scale pin: the stats and df dims reach the scoring join broadcast;
    no cartesian beyond the 1-row stats crossJoin (which compiles to a
    broadcast nested loop over ONE row)."""
    df = spark.createDataFrame([(1, "spark a b")], "doc_id long, text string")
    plan = (
        bm25_scores(df, ["spark"])._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan[:2000]
    with pytest.raises(ValueError):
        bm25_scores(df, [])


def test_bm25_sql_escapes_quotes():
    from research_knowledge_graph_spark.operators.text_search import bm25_sql

    s = bm25_sql(["o'brien", "plain"])
    assert "'o''brien'" in s and "'plain'" in s


def test_build_text_index_rejects_bad_bucket_count(spark, tmp_path):
    """n_buckets < 1 must fail at build time: a negative count makes the
    Spark-side pmod buckets disagree with the serving twin's python `%`
    (every query silently empty); 0 only died later with DIVIDE_BY_ZERO."""
    import pytest

    from research_knowledge_graph_spark.operators.text_search import build_text_index

    docs = spark.createDataFrame([("d1", "hello world")], "doc_id string, text string")
    for bad in (-64, 0):
        with pytest.raises(ValueError, match="n_buckets"):
            build_text_index(docs, str(tmp_path / "idx"), n_buckets=bad)
