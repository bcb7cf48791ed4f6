"""RRF fusion (operators/hybrid.py) unit pins; the sf-scale DuckDB oracle
is e07 in tests/test_entry_oracle.py."""

import pytest

from research_knowledge_graph_spark.operators.hybrid import rrf_fuse


def test_rrf_fuse_hand_computed(spark):
    lex = spark.createDataFrame([(10, 1), (20, 2), (30, 3)], "doc_id long, rank long")
    sem = spark.createDataFrame([(20, 1), (40, 2)], "doc_id long, rank long")
    rows = rrf_fuse([lex, sem], k=60, limit=10).collect()
    got = {r.doc_id: (r.rrf_score, r.n_lists) for r in rows}
    assert got == {
        10: (round(1 / 61, 9), 1),
        20: (round(1 / 62 + 1 / 61, 9), 2),
        30: (round(1 / 63, 9), 1),
        40: (round(1 / 62, 9), 1),
    }
    # doc 20 (in both lists) outranks everything
    assert rows[0].doc_id == 20
    with pytest.raises(ValueError):
        rrf_fuse([])
