"""Salted repartitioning balances a head-domain-skewed input."""

from __future__ import annotations

from pyspark.sql import functions as F

from research_knowledge_graph_spark.functions.salt import (
    replicate_for_salted_join,
    salted_repartition,
)


def test_salted_repartition_balances_skew(spark):
    # 90% of rows on one hot domain — the head-domain shape
    hot = spark.range(0, 9000).select(
        F.lit("hot.example.org").alias("domain"),
        F.concat(F.lit("https://hot.example.org/"), F.col("id").cast("string")).alias("url"),
    )
    tail = spark.range(0, 1000).select(
        F.concat(F.lit("site"), (F.col("id") % 50).cast("string"), F.lit(".org")).alias("domain"),
        F.concat(F.lit("https://t/"), F.col("id").cast("string")).alias("url"),
    )
    df = hot.unionByName(tail)

    # domain-keyed partitioning: one partition owns ≥90% of rows
    by_domain = df.repartition(16, "domain")
    sizes_domain = [
        r["count"]
        for r in by_domain.groupBy(F.spark_partition_id()).count().collect()
    ]
    assert max(sizes_domain) >= 9000

    # url-hash salting: near-uniform
    salted = salted_repartition(df, "url", 16)
    sizes = [
        r["count"] for r in salted.groupBy(F.spark_partition_id()).count().collect()
    ]
    assert len(sizes) == 16
    assert max(sizes) < 2 * (10000 / 16)  # no partition above 2x ideal

    # determinism: same input → identical partition assignment
    again = [
        r["count"]
        for r in salted_repartition(df, "url", 16)
        .groupBy(F.spark_partition_id())
        .count()
        .collect()
    ]
    assert sorted(sizes) == sorted(again)


def test_replicate_for_salted_join(spark):
    dim = spark.createDataFrame([("k1", "v1"), ("k2", "v2")], "key string, val string")
    rep = replicate_for_salted_join(dim, 8)
    assert rep.count() == 16
    assert rep.select("_salt").distinct().count() == 8
