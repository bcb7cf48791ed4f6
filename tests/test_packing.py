"""Sequence packing (operators/packing.py) — invariants + plan pin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from research_knowledge_graph_spark.functions.textops import token_count_col
from research_knowledge_graph_spark.operators.packing import pack_sequences

SF_DIR = "/root/testdata/sf0.001"
CAPACITY = 512
N_SHARDS = 4


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_mass_conservation(spark, docs):
    """Every document lands in exactly one pack; token mass is conserved."""
    packs = pack_sequences(docs, capacity=CAPACITY, n_shards=N_SHARDS)
    got = packs.agg(
        F.sum("n_docs").alias("docs"), F.sum("pack_tokens").alias("toks")
    ).first()
    want = docs.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum(token_count_col("text").cast("bigint")).alias("toks"),
    ).first()
    assert got["docs"] == want["docs"]
    assert got["toks"] == want["toks"]


def test_shard_and_pack_shape(spark, docs):
    """Shards come from the portable hash mod N; each non-empty shard's
    layout starts at pack 0, and only a doc longer than the capacity can
    leave a pack-id gap (concat-and-chunk spill)."""
    packs = pack_sequences(docs, capacity=CAPACITY, n_shards=N_SHARDS).collect()
    shards = {r["shard"] for r in packs}
    assert shards <= set(range(N_SHARDS))
    by_shard: dict[int, list] = {}
    for r in packs:
        by_shard.setdefault(r["shard"], []).append(r)
    for rows in by_shard.values():
        rows.sort(key=lambda r: r["pack_id"])
        assert rows[0]["pack_id"] == 0
        for prev, cur in zip(rows, rows[1:]):
            gap = cur["pack_id"] - prev["pack_id"]
            # a gap of g packs implies the previous group's token mass
            # spilled across at least g*CAPACITY tokens
            assert gap >= 1
            if gap > 1:
                assert prev["pack_tokens"] > (gap - 1) * CAPACITY


def test_python_twin(spark, docs):
    """Bit-exact vs a sequential python packer over the same shard/order."""
    from research_knowledge_graph_spark.functions.hashing import (
        portable_hash64_py,
    )

    rows = docs.select(
        "doc_id", token_count_col("text").cast("bigint").alias("tok")
    ).collect()
    per_shard: dict[int, list] = {}
    for r in rows:
        # portable_hash64 casts its input to string before hashing
        per_shard.setdefault(
            portable_hash64_py(str(r["doc_id"])) % N_SHARDS, []
        ).append((r["doc_id"], r["tok"]))
    want = {}
    for shard, items in per_shard.items():
        cum = 0
        for doc_id, tok in sorted(items):
            pid = cum // CAPACITY
            k = (shard, pid)
            st = want.setdefault(k, [0, 0, doc_id, doc_id])
            st[0] += 1
            st[1] += tok
            st[2] = min(st[2], doc_id)
            st[3] = max(st[3], doc_id)
            cum += tok
    got = {
        (r["shard"], r["pack_id"]): [
            r["n_docs"], r["pack_tokens"], r["first_doc"], r["last_doc"]
        ]
        for r in pack_sequences(
            docs, capacity=CAPACITY, n_shards=N_SHARDS
        ).collect()
    }
    assert got == {k: list(v) for k, v in want.items()}


def test_single_shuffle(spark, docs):
    """The rollup reuses the window's hash(shard) partitioning: exactly one
    Exchange in the whole plan (the scale contract of the docstring)."""
    packs = pack_sequences(docs, capacity=CAPACITY, n_shards=N_SHARDS)
    plan = packs._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange ")
    assert n_exchanges == 1, plan


def test_validation():
    with pytest.raises(ValueError):
        pack_sequences(None, capacity=0)
    with pytest.raises(ValueError):
        pack_sequences(None, n_shards=0)


def test_pack_sequences_null_rows_dropped(spark):
    """NULL-text and NULL-id docs must not emit phantom (shard, NULL)
    packs with NULL token totals — they carry nothing trainable and are
    dropped (the dedup family's rule)."""
    from pyspark.sql import functions as F

    from research_knowledge_graph_spark.operators.packing import pack_sequences

    docs = spark.createDataFrame(
        [("d1", "one two three"), ("d2", None), (None, "four five"), ("d3", "six")],
        "doc_id string, text string",
    )
    out = pack_sequences(docs, capacity=4, n_shards=1).collect()
    assert all(r.pack_id is not None and r.pack_tokens is not None for r in out)
    assert sum(r.n_docs for r in out) == 2  # d1, d3 only
    assert {d for r in out for d in (r.first_doc, r.last_doc)} <= {"d1", "d3"}


def test_pack_sequences_duplicate_ids_deterministic(spark):
    """Duplicate doc_ids with different token counts: the (doc_id, tok)
    window ordering makes the layout independent of engine row order —
    both input permutations must produce the identical pack table."""
    from research_knowledge_graph_spark.operators.packing import pack_sequences

    rows = [("d7", "a b c d e f g"), ("d7", "h i"), ("d1", "x y z")]
    a = pack_sequences(spark.createDataFrame(rows, "doc_id string, text string"),
                       capacity=5, n_shards=1)
    b = pack_sequences(spark.createDataFrame(rows[::-1], "doc_id string, text string"),
                       capacity=5, n_shards=1)
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb
    # and the tie-break is the documented tok-ascending one: d7's 2-token
    # row lays out before its 7-token row
    assert sum(r[3] for r in ra) == 12  # total token mass conserved
