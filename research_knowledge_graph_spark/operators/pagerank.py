"""PageRank over the edges table — fixed-iteration power method as pure
DataFrame ops.

Per iteration: one shuffle (contributions aggregated by target) + one
broadcast-eligible join back to the node set; dangling mass redistributed
uniformly. ``localCheckpoint`` after each iteration cuts the
exponentially-growing join lineage — without it iteration 10's plan embeds
all nine prior plans.

Fixed ``iters`` (not convergence-tested) keeps the operator deterministic
and lets an unrolled-CTE oracle reproduce it exactly; at 10 iterations on
a web-ish graph ranks are within ~1e-3 of converged, which is what rank
ORDERING needs.

Skew: a celebrity target node concentrates its contribution SUM on one
reducer — but contributions partial-aggregate map-side (plain ``sum``), so
the reducer receives one partial per map partition, not one row per edge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iters: int = 10,
    src_col: str = "from_node_id",
    dst_col: str = "to_node_id",
) -> DataFrame:
    """(node_id, rank) over the directed graph; ranks sum to 1."""
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node_id"))
        .unionByName(e.select(F.col("dst").alias("node_id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))

    ranks = nodes.select("node_id", F.lit(1.0 / n).alias("rank"))
    for _ in range(iters):
        with_deg = ranks.join(
            out_deg, ranks.node_id == out_deg.src, "left"
        ).select("node_id", "rank", "deg")
        contribs = (
            with_deg.filter(F.col("deg").isNotNull())
            .join(e, F.col("node_id") == e.src)
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("contrib"))
        )
        dangling = (
            with_deg.filter(F.col("deg").isNull()).agg(F.sum("rank")).first()[0] or 0.0
        )
        base = (1.0 - damping) / n + damping * dangling / n
        ranks = (
            nodes.join(contribs, nodes.node_id == contribs.dst, "left")
            .select(
                "node_id",
                (F.lit(base) + F.lit(damping) * F.coalesce(F.col("contrib"), F.lit(0.0))).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks
