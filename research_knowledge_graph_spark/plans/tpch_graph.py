"""Derive a property graph (nodes/edges) from the driver's TPC-H-ish tables.

The reference's graph operators run over ``nodes``/``edges`` tables
(``sql/schema.sql``). The grading harness provides relational testdata, so we
derive an equivalent graph relationally — customers/orders/parts/suppliers as
typed nodes; PLACED / USES_PART / SUPPLIES / FOLLOWS as typed, weighted
edges — and run the §2.3/2.11 graph operators on it. ``GRAPH_CTE`` is the
byte-equivalent DuckDB derivation used by ``oracle_sql()``.

FOLLOWS chains each customer's orders by date (order N+1 → order N), giving
the recursive-chain operator (reference q9, ``sql/example_queries.sql:129-160``)
a real DAG to walk.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def derive_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    part = load(spark, sf_dir, "part")
    supplier = load(spark, sf_dir, "supplier")
    return (
        customer.select(
            F.concat(F.lit("c"), F.col("c_custkey").cast("string")).alias("id"),
            F.lit("customer").alias("node_type"),
            F.col("c_name").alias("label"),
        )
        .unionByName(
            orders.select(
                F.concat(F.lit("o"), F.col("o_orderkey").cast("string")).alias("id"),
                F.lit("order").alias("node_type"),
                F.concat(F.lit("Order "), F.col("o_orderkey").cast("string")).alias("label"),
            )
        )
        .unionByName(
            part.select(
                F.concat(F.lit("p"), F.col("p_partkey").cast("string")).alias("id"),
                F.lit("part").alias("node_type"),
                F.col("p_name").alias("label"),
            )
        )
        .unionByName(
            supplier.select(
                F.concat(F.lit("s"), F.col("s_suppkey").cast("string")).alias("id"),
                F.lit("supplier").alias("node_type"),
                F.col("s_name").alias("label"),
            )
        )
    )


def derive_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")

    placed = orders.select(
        F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("from_node_id"),
        F.concat(F.lit("o"), F.col("o_orderkey").cast("string")).alias("to_node_id"),
        F.lit("PLACED").alias("edge_type"),
        F.lit(1.0).alias("confidence"),
    )
    uses_part = (
        lineitem.groupBy("l_orderkey", "l_partkey")
        .agg(F.round(F.max(F.lit(1.0) - F.col("l_discount")), 2).alias("confidence"))
        .select(
            F.concat(F.lit("o"), F.col("l_orderkey").cast("string")).alias("from_node_id"),
            F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("to_node_id"),
            F.lit("USES_PART").alias("edge_type"),
            "confidence",
        )
    )
    supplies = (
        lineitem.select("l_suppkey", "l_partkey")
        .distinct()
        .select(
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("from_node_id"),
            F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("to_node_id"),
            F.lit("SUPPLIES").alias("edge_type"),
            F.lit(1.0).alias("confidence"),
        )
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    follows = (
        orders.withColumn("prev", F.lag("o_orderkey").over(w))
        .filter(F.col("prev").isNotNull())
        .select(
            F.concat(F.lit("o"), F.col("o_orderkey").cast("string")).alias("from_node_id"),
            F.concat(F.lit("o"), F.col("prev").cast("string")).alias("to_node_id"),
            F.lit("FOLLOWS").alias("edge_type"),
            F.lit(1.0).alias("confidence"),
        )
    )
    return placed.unionByName(uses_part).unionByName(supplies).unionByName(follows)


def first_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each customer's earliest order — the recursive-chain start set."""
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(F.concat(F.lit("o"), F.col("o_orderkey").cast("string")).alias("node_id"))
    )


# The DuckDB rendering of the exact same derivation (oracle side).
GRAPH_CTE = """
nodes AS (
    SELECT 'c' || CAST(c_custkey AS VARCHAR) AS id, 'customer' AS node_type, c_name AS label FROM customer
    UNION ALL
    SELECT 'o' || CAST(o_orderkey AS VARCHAR), 'order', 'Order ' || CAST(o_orderkey AS VARCHAR) FROM orders
    UNION ALL
    SELECT 'p' || CAST(p_partkey AS VARCHAR), 'part', p_name FROM part
    UNION ALL
    SELECT 's' || CAST(s_suppkey AS VARCHAR), 'supplier', s_name FROM supplier
),
edges AS (
    SELECT 'c' || CAST(o_custkey AS VARCHAR) AS from_node_id,
           'o' || CAST(o_orderkey AS VARCHAR) AS to_node_id,
           'PLACED' AS edge_type, CAST(1.0 AS DOUBLE) AS confidence
    FROM orders
    UNION ALL
    SELECT 'o' || CAST(l_orderkey AS VARCHAR),
           'p' || CAST(l_partkey AS VARCHAR),
           'USES_PART', round(max(CAST(1.0 AS DOUBLE) - l_discount), 2)
    FROM lineitem GROUP BY l_orderkey, l_partkey
    UNION ALL
    SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR),
           'p' || CAST(l_partkey AS VARCHAR),
           'SUPPLIES', CAST(1.0 AS DOUBLE)
    FROM lineitem
    UNION ALL
    SELECT 'o' || CAST(o_orderkey AS VARCHAR),
           'o' || CAST(prev AS VARCHAR),
           'FOLLOWS', CAST(1.0 AS DOUBLE)
    FROM (
        SELECT o_orderkey,
               lag(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev
        FROM orders
    ) WHERE prev IS NOT NULL
),
first_orders AS (
    SELECT 'o' || CAST(o_orderkey AS VARCHAR) AS node_id
    FROM (
        SELECT o_orderkey,
               row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
        FROM orders
    ) WHERE rn = 1
)
""".strip()
