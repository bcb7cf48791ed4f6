"""t52 SimHash-Hamming near-dup pairs (Manku WWW'07 banded design) +
g48 type mixing matrix + v31 hour-of-day profile planted pins.

SimHash pins: the pigeonhole band join has EXACT recall at the Hamming
threshold (a brute-force twin over random fingerprints matches the
blocked operator bit-for-bit), the verify step rejects candidates that
share a chunk but exceed the threshold, the max_bucket stop-fingerprint
guard drops degenerate buckets, and the parameter preconditions raise.
"""

from __future__ import annotations

import importlib.util
import os
import random

import pytest

from research_knowledge_graph_spark.operators.dedup import (
    hamming_pairs_from_fingerprints,
    simhash_agg,
    simhash_hamming_pairs,
)


def _load_entry():
    entry_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "__spark_entry__.py",
    )
    spec = importlib.util.spec_from_file_location(
        "__spark_entry___simhash", entry_path
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def _fp_df(spark, fps):
    return spark.createDataFrame(
        [(i, fp) for i, fp in fps.items()], "doc_id long, simhash long"
    )


def test_planted_fingerprints(spark):
    # A=0, B=1: hamming 1, share chunks 1..3 -> candidate -> kept.
    # C=0xF0F0 vs A: shares chunks 0 and 2 (both 0) -> candidate, but
    #   hamming 8 > 3 -> verify REJECTS (pins the verify step).
    # D=0x1111 vs A: every 4-bit chunk differs (each is 1 vs 0) -> never
    #   a candidate; hamming 4 > 3 so exactness is preserved anyway.
    # D=0x1111 vs B=0x0001: chunk0 agrees (both 1), hamming 3 -> kept.
    fps = {1: 0, 2: 1, 3: 0xF0F0, 4: 0x1111}
    out = hamming_pairs_from_fingerprints(_fp_df(spark, fps))
    rows = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in out.collect()}
    assert rows == {(1, 2): 1, (2, 4): 3}


def test_bruteforce_twin_random(spark):
    """Pigeonhole recall theorem, checked: blocked pairs == the O(n²)
    scan's pairs at hamming <= 3, exactly, on random 16-bit fps."""
    rng = random.Random(52)
    fps = {i: rng.getrandbits(16) for i in range(80)}
    # plant a few near-misses and near-hits around random bases
    for i, (base, flips) in enumerate(
        [(0xABCD, 1), (0xABCD, 3), (0x1234, 4), (0x0F0F, 2)], start=100
    ):
        v = base
        for b in range(flips):
            v ^= 1 << (b * 5 % 16)
        fps[i] = base
        fps[i + 50] = v
    out = hamming_pairs_from_fingerprints(_fp_df(spark, fps))
    got = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in out.collect()}
    ids = sorted(fps)
    exp = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            h = bin(fps[a] ^ fps[b]).count("1")
            if h <= 3:
                exp[(a, b)] = h
    assert got == exp
    assert exp, "twin corpus must actually contain qualifying pairs"


def test_max_bucket_guard(spark):
    fps = {i: 0x00AA for i in range(5)}
    df = _fp_df(spark, fps)
    # every bucket holds all 5 docs: cap 4 drops everything
    assert hamming_pairs_from_fingerprints(df, max_bucket=4).count() == 0
    out = hamming_pairs_from_fingerprints(df, max_bucket=5).collect()
    assert len(out) == 10 and all(r["hamming"] == 0 for r in out)


def test_param_preconditions(spark):
    df = _fp_df(spark, {1: 0})
    with pytest.raises(ValueError, match="pigeonhole"):
        hamming_pairs_from_fingerprints(df, bands=4, max_hamming=4)
    with pytest.raises(ValueError, match="divisible"):
        hamming_pairs_from_fingerprints(df, bits=16, bands=5, max_hamming=2)


def test_end_to_end_text(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "completely different words entirely unrelated content here"),
        ],
        "doc_id long, text string",
    )
    out = simhash_hamming_pairs(docs)
    rows = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in out.collect()}
    # identical texts -> identical fingerprints -> hamming 0 pair found
    assert rows[(1, 2)] == 0
    # fingerprints come from the SAME agg as t06: xor parity cross-check
    fp = {r["doc_id"]: r["simhash"] for r in simhash_agg(docs).collect()}
    for (a, b), h in rows.items():
        assert bin(fp[a] ^ fp[b]).count("1") == h


def test_g48_mixing_matrix_planted(spark, tmp_path):
    import datetime as dt

    d = str(tmp_path / "sf")
    os.makedirs(d, exist_ok=True)

    def w(name, df):
        df.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(d, f"{name}.parquet")
        )

    w("customer", spark.createDataFrame([(1, "Alice")], "c_custkey long, c_name string"))
    w(
        "orders",
        spark.createDataFrame(
            [
                (10, 1, dt.date(2024, 1, 1)),
                (11, 1, dt.date(2024, 2, 1)),
            ],
            "o_orderkey long, o_custkey long, o_orderdate date",
        ),
    )
    w("part", spark.createDataFrame([(5, "widget")], "p_partkey long, p_name string"))
    w("supplier", spark.createDataFrame([(7, "Acme")], "s_suppkey long, s_name string"))
    w(
        "lineitem",
        spark.createDataFrame(
            [(10, 5, 7, 0.1)],
            "l_orderkey long, l_partkey long, l_suppkey long, l_discount double",
        ),
    )
    m = _load_entry()
    out = m.queries()["g48_type_mixing_matrix"](spark, d)
    got = {
        (r["edge_type"], r["from_type"], r["to_type"]): (r["n_edges"], r["share_ppm"])
        for r in out.collect()
    }
    # 5 edges total: PLACED x2, USES_PART/SUPPLIES/FOLLOWS x1 each; every
    # relation lands on exactly one typed endpoint pair by construction
    assert got == {
        ("PLACED", "customer", "order"): (2, 400000),
        ("USES_PART", "order", "part"): (1, 200000),
        ("SUPPLIES", "supplier", "part"): (1, 200000),
        ("FOLLOWS", "order", "order"): (1, 200000),
    }


def test_v31_hour_profile_planted(spark, tmp_path):
    import datetime as dt

    rows = []
    eid = 0
    # typea: 3 events at hour 1 UTC, 1 at hour 23 -> 24-row spine with
    # 22 real zeros; typeb: all 4 at hour 0 -> share exactly 10^6
    for h, n in [(1, 3), (23, 1)]:
        for _ in range(n):
            rows.append((eid, dt.datetime(2024, 1, 5, h, 30, 0), 1, "typea", 1.0, "{}"))
            eid += 1
    for _ in range(4):
        rows.append((eid, dt.datetime(2024, 3, 2, 0, 15, 0), 2, "typeb", 1.0, "{}"))
        eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    d = str(tmp_path / "sf")
    os.makedirs(d, exist_ok=True)
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    m = _load_entry()
    out = m.queries()["v31_hour_of_day_profile"](spark, d)
    got = {(r["event_type"], r["hour"]): (r["n"], r["share_ppm"]) for r in out.collect()}
    assert len(got) == 48  # complete 24-spine per type
    assert got[("typea", 1)] == (3, 750000)
    assert got[("typea", 23)] == (1, 250000)
    assert got[("typea", 0)] == (0, 0)  # real zero, not a missing row
    assert got[("typeb", 0)] == (4, 1000000)
    assert sum(v[0] for k, v in got.items() if k[0] == "typea") == 4
