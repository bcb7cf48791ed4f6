"""Local replica of the driver's correctness gate: run every ``queries()``
entry in Spark AND its ``oracle_sql()`` in DuckDB at sf0.01, compare
row-count + column names + order-insensitive values."""

from __future__ import annotations

import importlib.util
import math
import os

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _load_entry():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


ENTRY = _load_entry()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _rows_spark(df):
    cols = sorted(df.columns)
    return sorted(
        tuple(_norm(r[c]) for c in cols) for r in df.collect()
    ), cols


def _rows_duck(con, sql):
    rel = con.sql(sql)
    cols = sorted(rel.columns)
    idx = [rel.columns.index(c) for c in cols]
    return sorted(
        tuple(_norm(row[i]) for i in idx) for row in rel.fetchall()
    ), cols


# UDF-backed operators whose semantics are not ANSI-SQL-expressible:
# the driver records a weaker rows-only check for these (documented in
# each query's docstring); locally we verify they run and return rows.
ROWS_ONLY = {
    "m01_media_features",
    "e04_embed_documents",
    # float hash after 10 iterated sums is rounding-flaky cross-engine;
    # correctness is pinned vs numpy in tests/test_pagerank.py
    "g16_pagerank",
    "g24_personalized_pagerank",
    # iterative argmax + greedy list fold: not reasonably SQL-expressible;
    # bit-exact python-twin pins in tests/test_bpe.py
    "t44_bpe_merges",
    "t46_bpe_fertility",
}


@pytest.mark.parametrize("name", sorted(ROWS_ONLY))
def test_rows_only_queries_run(spark, name):
    df = ENTRY.queries()[name](spark, SF_DIR)
    assert df.count() > 0


@pytest.mark.parametrize("name", sorted(set(ENTRY.queries()) - ROWS_ONLY))
def test_query_matches_oracle(spark, ddb, name):
    oracles = ENTRY.oracle_sql()
    assert name in oracles, f"{name} has no oracle (add it or document why)"
    sdf = ENTRY.queries()[name](spark, SF_DIR)
    srows, scols = _rows_spark(sdf)
    drows, dcols = _rows_duck(ddb, oracles[name])
    assert scols == dcols, f"{name}: columns {scols} != {dcols}"
    assert len(srows) == len(drows), f"{name}: rows {len(srows)} != {len(drows)}"
    assert len(srows) > 0, f"{name}: empty result — weak check, make it non-empty"
    mism = [
        (i, a, b) for i, (a, b) in enumerate(zip(srows, drows)) if a != b
    ][:5]
    assert not mism, f"{name}: first mismatches {mism}"


def test_entry_smoke(spark):
    df = ENTRY.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert set(df.columns) >= {"label", "usage_count"}
