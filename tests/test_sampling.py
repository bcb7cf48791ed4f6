"""Deterministic sampling operators (training-data curation surface).

Contract pins:
- reproducibility: same input + seed → identical sample (it's a pure
  function of the key, so this also covers task-retry safety);
- monotonicity: raising a stratum's rate GROWS the sample (supersets) —
  the property that makes incremental top-ups shuffle-free;
- quota exactness and hash-order uniformity for quota_sample;
- plan shape: stratified_sample is broadcast-join + filter, no exchange.
"""

import pytest
from pyspark.sql import functions as F

from research_knowledge_graph_spark.operators.sampling import (
    quota_sample,
    stratified_sample,
    token_budget_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), (F.col("id") % 4).cast("string")).alias("source"),
    )


def test_stratified_deterministic_and_rate(spark, docs):
    rates = {"src0": 0.5, "src1": 0.1, "src2": 0.0, "src3": 1.0}
    s1 = {r.doc_id for r in stratified_sample(docs, rates, seed=3).collect()}
    s2 = {r.doc_id for r in stratified_sample(docs, rates, seed=3).collect()}
    assert s1 == s2  # pure function of the key
    by_src = dict(
        stratified_sample(docs, rates, seed=3)
        .groupBy("source").count().rdd.map(lambda r: (r.source, r["count"])).collect()
    )
    assert "src2" not in by_src  # rate 0 drops everything
    assert by_src["src3"] == 500  # rate 1 keeps everything
    assert 150 <= by_src["src0"] <= 350  # ~250 ± binomial noise
    assert 20 <= by_src["src1"] <= 90  # ~50


def test_stratified_monotone_topup(spark, docs):
    lo = {r.doc_id for r in stratified_sample(docs, {"src0": 0.1}, seed=3).collect()}
    hi = {r.doc_id for r in stratified_sample(docs, {"src0": 0.4}, seed=3).collect()}
    assert lo < hi  # raising the rate only ADDS rows


def test_stratified_default_rate_and_seed(spark, docs):
    # unknown strata: dropped by default, kept with default_rate=1
    assert stratified_sample(docs, {"src0": 1.0}).count() == 500
    assert (
        stratified_sample(docs, {"src0": 1.0}, default_rate=1.0).count() == 2000
    )
    # different seeds decorrelate the draw
    a = {r.doc_id for r in stratified_sample(docs, {"src0": 0.3}, seed=1).collect()}
    b = {r.doc_id for r in stratified_sample(docs, {"src0": 0.3}, seed=2).collect()}
    assert a != b and len(a & b) < len(a)


def test_stratified_plan_no_exchange(spark, docs):
    plan = (
        stratified_sample(docs, {"src0": 0.5})
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan, plan[:1500]
    assert "Exchange hashpartitioning" not in plan, plan[:1500]


def test_quota_exact_and_deterministic(spark, docs):
    q = quota_sample(docs, 25, seed=9)
    counts = {r.source: r["count"] for r in q.groupBy("source").count().collect()}
    assert counts == {f"src{i}": 25 for i in range(4)}
    assert q.filter(F.col("pick") > 25).count() == 0
    # small stratum: returns the whole stratum, picks stay 1..n
    tiny = docs.filter(F.col("doc_id") < 3)
    qt = quota_sample(tiny, 25, seed=9)
    assert qt.count() == 3
    assert {r.pick for r in qt.select("pick").collect()} <= {1, 2, 3}
    # deterministic across runs
    a = sorted((r.doc_id, r.pick) for r in quota_sample(docs, 5, seed=9).collect())
    b = sorted((r.doc_id, r.pick) for r in quota_sample(docs, 5, seed=9).collect())
    assert a == b


def test_token_budget_sample(spark, docs):
    # weight 1 + doc_id % 7 tokens per row; budget binds per stratum
    weighted = docs.withColumn("n_tok", (F.col("doc_id") % 7 + 1).cast("bigint"))
    s = token_budget_sample(weighted, 100, F.col("n_tok"), seed=5)
    per_src = s.groupBy("source").agg(
        F.max("cum_tokens").alias("mx"), F.count(F.lit(1)).alias("n")
    )
    rows = {r.source: (r.mx, r.n) for r in per_src.collect()}
    assert set(rows) == {f"src{i}" for i in range(4)}
    for mx, n in rows.values():
        assert mx <= 100  # budget respected (inclusive running total)
        assert n < 500  # and it actually binds (500 rows/stratum available)
    # monotone: a bigger budget yields a superset
    lo = {r.doc_id for r in s.collect()}
    hi = {r.doc_id for r in token_budget_sample(weighted, 200, F.col("n_tok"), seed=5).collect()}
    assert lo < hi


def test_stratified_non_string_strata_dtype(spark):
    """ADVICE round-3: the rate dim takes the input strata column's dtype —
    an int source id joins without implicit casts (ANSI-safe)."""
    df = spark.createDataFrame(
        [(i, i % 3) for i in range(300)], "doc_id long, src int"
    )
    out = stratified_sample(df, {0: 1.0, 1: 0.0}, "src", "doc_id", seed=3)
    srcs = {r.src for r in out.select("src").distinct().collect()}
    assert srcs == {0}  # rate 1.0 keeps all of src=0, others dropped


def test_sampling_reserved_output_columns_fail_fast(spark):
    """ADVICE round-3: pre-existing 'pick'/'cum_tokens'/'_rate_ppm' columns
    raise instead of being silently overwritten."""
    df = spark.createDataFrame([(1, "a", 2)], "doc_id long, source string, pick int")
    with pytest.raises(ValueError, match="reserved"):
        quota_sample(df, 1, "source", "doc_id")
    df2 = spark.createDataFrame(
        [(1, "a", 2)], "doc_id long, source string, cum_tokens int"
    )
    with pytest.raises(ValueError, match="reserved"):
        token_budget_sample(df2, 10, F.lit(1), "source", "doc_id")
    df3 = spark.createDataFrame(
        [(1, "a", 2)], "doc_id long, source string, _rate_ppm int"
    )
    with pytest.raises(ValueError, match="reserved"):
        stratified_sample(df3, {"a": 0.5}, "source", "doc_id")


def test_samplers_agree_on_null_ids(spark):
    """NULL doc_id rows (NULL hash bucket, NULLS FIRST) used to win every
    quota pick and ride the token budget free — all three samplers now
    drop rows without identity, like stratified_sample always did."""
    from pyspark.sql import functions as F

    from research_knowledge_graph_spark.operators.sampling import (
        quota_sample,
        token_budget_sample,
    )

    df = spark.createDataFrame(
        [(None, "s", 5), ("d1", "s", 5), ("d2", "s", 5), (None, "s", 5)],
        "doc_id string, source string, n_tok int",
    )
    q = quota_sample(df, 2)
    assert {r.doc_id for r in q.collect()} == {"d1", "d2"}
    t = token_budget_sample(df, 10, F.col("n_tok"))
    assert {r.doc_id for r in t.collect()} == {"d1", "d2"}
    # NULL weight: unknown token mass cannot be budgeted -> dropped
    df2 = spark.createDataFrame(
        [("d1", "s", 5), ("d2", "s", None), ("d3", "s", 5)],
        "doc_id string, source string, n_tok int",
    )
    t2 = token_budget_sample(df2, 10, F.col("n_tok"))
    assert {r.doc_id for r in t2.collect()} == {"d1", "d3"}


def test_mixture_rates_all_null_source_exact(spark):
    """A source of only NULL texts publishes exact zeros, never NULLs —
    and its keep-everything rate costs zero expected tokens."""
    from research_knowledge_graph_spark.operators.sampling import mixture_rates

    df = spark.createDataFrame(
        [("a", "three words here"), ("a", "two words"), ("z", None), ("z", None)],
        "source string, text string",
    )
    rows = {r.source: r for r in mixture_rates(df).collect()}
    z = rows["z"]
    assert (z.n_tokens, z.share_ppm, z.expected_tokens) == (0, 0, 0)
    assert z.rate_ppm == 1_000_000
    assert all(v is not None for r in rows.values() for v in r)
