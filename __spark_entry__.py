"""Driver contract for the PySpark KG engine.

``queries()`` exposes the engine's operator surface (SURVEY.md §2) over the
driver-provided testdata; ``oracle_sql()`` gives the DuckDB-equivalent ANSI
SQL for each. Graph operators run over a property graph derived relationally
from the TPC-H-ish tables (see
``research_knowledge_graph_spark/plans/tpch_graph.py``); text/dedup/
similarity operators run over ``documents``/``embeddings``; windowed event
aggregation runs over ``events``.

Engine-parity conventions (why the SQL looks the way it does):
- double aggregates are ``round(sum(x), 2)`` on BOTH sides — float summation
  order differs between engines;
- rankings order by ``round(score, 9)`` with an id tie-break;
- DuckDB ``SUM(BIGINT)`` returns HUGEINT and ``len()`` returns BIGINT —
  casts keep schemas aligned;
- timestamps are stringified with explicit formats.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from research_knowledge_graph_spark.functions.normalize import (
    NORMALIZE_LABEL_SQL_TEMPLATE,
    normalize_label_col,
)
from research_knowledge_graph_spark.functions.hashing import (
    portable_hash64_py,
    portable_hash64_sql,
)
from research_knowledge_graph_spark.functions.textops import (
    _LANG_MARKERS,
    TOKEN_PATTERN,
    fingerprint_col,
    lang_id_col,
    quality_features_cols,
    winnow_fingerprints_sql,
)
from research_knowledge_graph_spark.operators import dedup as D
from research_knowledge_graph_spark.operators.text_search import bm25_sql
from research_knowledge_graph_spark.operators import graph_queries as G
from research_knowledge_graph_spark.operators import similarity as S
from research_knowledge_graph_spark.plans import tpch_graph as TG
from research_knowledge_graph_spark.plans.tpch_graph import GRAPH_CTE


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _wide(spark: SparkSession, sf_dir: str, name: str, key: str) -> DataFrame:
    """Scan fanned out to the session's parallelism BEFORE compute-heavy
    per-row expression work. The testdata tables are single-file,
    SINGLE-ROW-GROUP parquet, so the scan cannot be split: every
    expression Catalyst fuses into the scan stage (tokenize / hash /
    shingle / vector math, Arrow-UDF batches) otherwise runs as ONE task
    on one core — observed: t19's winnowing pass pinned a single core for
    >15 min at sf0.1 while 31 cores idled (guide §2.5 "input skew: one
    huge unsplittable file — repartition immediately after the read").
    Deterministic hash repartition by the row key (unique ⇒ uniform; no
    round-robin pre-sort), sized from ``defaultParallelism`` so it adapts
    to the cluster rather than a local constant. On a real corpus laid
    out in many splittable files this is a no-op-sized extra exchange;
    layout only — results unchanged (oracle-pinned)."""
    return _t(spark, sf_dir, name).repartition(
        spark.sparkContext.defaultParallelism, F.col(key)
    )


def _docs_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _wide(spark, sf_dir, "documents", "doc_id")


def _utc(spark: SparkSession) -> None:
    """Timestamp-sensitive queries pin the session timezone: DuckDB reads
    parquet timestamps as naive UTC wall-clock, so Spark must render/compare
    in UTC too regardless of the host session's default."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")


# ===========================================================================
# entry: flagship query (driver smoke check at sf0.001)
# ===========================================================================

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: influence top-k over the derived property graph — the
    reference's q8 'most influential concepts' (sql/example_queries.sql:114-126)
    as one declarative plan (left join + countDistinct + top-k)."""
    sf_dir = "/root/testdata/sf0.001"
    nodes = TG.derive_nodes(spark, sf_dir)
    edges = TG.derive_edges(spark, sf_dir)
    return G.influence_topk(nodes, edges, "part", ["USES_PART"], k=20)


# ===========================================================================
# Spark-side queries
# ===========================================================================

def q01_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: scan-filter-aggregate with pushdown (SURVEY §2.4)."""
    _utc(spark)
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.to_timestamp(F.lit("1995-09-02")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q03_top_revenue(spark, sf_dir):
    """Join-heavy top-k: revenue per order for one segment (J1/O-family)."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


def q05_window_top3(spark, sf_dir):
    """Window top-k per group (SURVEY §2.5): top-3 orders per customer."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


def g01_node_type_counts(spark, sf_dir):
    """P3 type filter / A6 counts over the derived graph."""
    return TG.derive_nodes(spark, sf_dir).groupBy("node_type").agg(
        F.count(F.lit(1)).alias("n")
    )


def g02_neighbors_out(spark, sf_dir):
    """G4/J2 neighbor expansion: orders placed by customer c1."""
    nodes, edges = TG.derive_nodes(spark, sf_dir), TG.derive_edges(spark, sf_dir)
    return G.neighbors_out(nodes, edges, from_node_id="c1", edge_type="PLACED").select(
        "neighbor_id", "neighbor_label", "confidence"
    )


def g03_two_hop(spark, sf_dir):
    """J10 chained joins: (customer)-PLACED->(order)-USES_PART->(part).

    Runs the SAME two_hop operator over a numeric derivation of the graph
    (guide §2.3 "narrower types"): every join key and the final DISTINCT
    exchange carry 8-byte longs instead of 'cN'/'oN'/'pN' strings (~2.5×
    narrower rows, long hash/compare in the agg hot loop), and the string
    ids are rebuilt AFTER the distinct, for output rows only. 'c'/'o'/'p'
    prefixing is injective on the key spaces, so distinct-then-concat ≡
    concat-then-distinct — rows bit-identical (oracle g03 unchanged)."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    placed = o.select(
        F.col("o_custkey").alias("from_node_id"),
        F.col("o_orderkey").alias("to_node_id"),
        F.lit("PLACED").alias("edge_type"),
    )
    uses = (
        li.select(
            F.col("l_orderkey").alias("from_node_id"),
            F.col("l_partkey").alias("to_node_id"),
        )
        .distinct()  # = derive_edges' USES_PART groupBy (confidence pruned)
        .withColumn("edge_type", F.lit("USES_PART"))
    )
    part_nodes = p.select(
        F.col("p_partkey").alias("id"),
        F.lit("part").alias("node_type"),
        F.col("p_name").alias("label"),
    )
    out = G.two_hop(
        part_nodes, placed.unionByName(uses), "PLACED", "USES_PART",
        end_node_type="part",
    )
    return out.select(
        F.concat(F.lit("c"), F.col("start_id").cast("string")).alias("start_id"),
        F.concat(F.lit("p"), F.col("end_id").cast("string")).alias("end_id"),
        "end_label",
    )


def g04_influence_topk(spark, sf_dir):
    """A3/q8 influence ranking: top-20 parts by distinct using orders.

    Same influence_topk operator over a numeric graph derivation (the g03
    rule, guide §2.3): the countDistinct's two-phase exchanges and the
    count dim's join key are 8-byte longs, not 'oN'/'pN' strings. The
    output columns (label, usage_count) carry no ids, so no hex-back is
    needed — rows bit-identical (oracle g04 unchanged)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    uses = li.select(
        F.col("l_orderkey").alias("from_node_id"),
        F.col("l_partkey").alias("to_node_id"),
    ).withColumn("edge_type", F.lit("USES_PART"))
    part_nodes = p.select(
        F.col("p_partkey").alias("id"),
        F.lit("part").alias("node_type"),
        F.col("p_name").alias("label"),
    )
    return G.influence_topk(part_nodes, uses, "part", ["USES_PART"], k=20).select(
        "label", "usage_count"
    )


def g05_supplier_stats(spark, sf_dir):
    """A2/q4 usage counts: distinct parts per supplier node, via the
    two-phase salted countDistinct (functions/salt.py) — a hot supplier's
    value set never lands on one reducer; result identical to a plain
    countDistinct (oracle-pinned)."""
    from research_knowledge_graph_spark.functions.salt import (
        two_phase_count_distinct,
    )

    nodes, edges = TG.derive_nodes(spark, sf_dir), TG.derive_edges(spark, sf_dir)
    sup = nodes.filter(F.col("node_type") == "supplier")
    e = edges.filter(F.col("edge_type") == "SUPPLIES")
    joined = sup.join(e, sup.id == e.from_node_id).select("label", "to_node_id")
    return two_phase_count_distinct(joined, ["label"], "to_node_id").select(
        "label", F.col("n_distinct").alias("n_parts")
    )


_COUSE_CACHE: dict[tuple, DataFrame] = {}


def _couse_pairs(spark, sf_dir) -> DataFrame:
    """The order co-usage pair graph (orders sharing ≥2 parts) — the ONE
    intermediate g06 and the graph-analytics entries g18/g19/g20/g21 all
    consume. Computed once per (session, input content) through the salted
    blocking join and persisted LAZILY (MEMORY_AND_DISK): the first
    consumer's job populates the cache as a side effect — no separate
    eager materialization pass — and later consumers read it back, so a
    user running the full analytics suite pays the pair self-join once,
    not five times. Content-keyed like the e06 IVF cache (path + mtime +
    size of the deriving tables), so regenerated testdata misses the
    cache instead of serving stale pairs; evicted blocks just recompute."""
    key = [spark.sparkContext.applicationId, os.path.abspath(sf_dir)]
    for t in ("orders", "lineitem"):
        st = os.stat(os.path.join(sf_dir, f"{t}.parquet"))
        key.append(f"{st.st_mtime_ns}:{st.st_size}")
    k = tuple(key)
    if k not in _COUSE_CACHE:
        from pyspark.storagelevel import StorageLevel

        # evict superseded entries for the same (session, sf_dir): a
        # regenerated input must not leave the old content-key's persisted
        # frame pinned in the block manager for the session's lifetime
        for stale in [x for x in _COUSE_CACHE if x[:2] == k[:2] and x[:len(k)] != k]:
            _COUSE_CACHE.pop(stale).unpersist()
        # Plan-shape optimization over the generic shared_entity_pairs call,
        # same rows bit-for-bit (oracle g06 unchanged; numeric==generic
        # parity pinned in tests/test_salt.py):
        # - the USES_PART postings are exactly DISTINCT (l_orderkey,
        #   l_partkey) — derive them straight from lineitem as LONGS instead
        #   of first building 'oN'/'pN' strings and re-distincting the
        #   already-unique groupBy output (the generic path scanned lineitem
        #   4× with a redundant string-keyed exchange per wedge side);
        # - the wedge self-join, degree attach and pair aggregate all run on
        #   8-byte longs (≈2.5× narrower shuffle rows than two ~8-char
        #   strings, and long hash/compare beats string compare in the
        #   sort/agg hot loops — guide §2.3 "narrower types");
        # - postings are persisted so the hot-degree dim and both wedge
        #   sides read ONE computed copy (guide §2.4: the self-join
        #   otherwise recomputes the scan+distinct per side). The persist
        #   lives in _COUSE_CACHE under an aux key: bench.py clears the
        #   whole dict between repeats, so every sample still pays the full
        #   compute;
        # - pair counting is order-invariant, so numeric a<b enumerates each
        #   unordered pair exactly once and the string ids are rebuilt AFTER
        #   the ≥2 filter, with least/greatest restoring the oracle's
        #   string-order (node_a, node_b) assignment ('o10' < 'o9' even
        #   though 10 > 9).
        li = _t(spark, sf_dir, "lineitem")
        pe = (
            li.select(
                F.col("l_orderkey").cast("long").alias("src"),
                F.col("l_partkey").cast("long").alias("tgt"),
            )
            .distinct()
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        _COUSE_CACHE[k + ("pe",)] = pe
        pairs_num = G._wedge_pair_agg(
            pe, [F.count(F.lit(1)).alias("shared_count")], salt_above=256,
            max_salts=16,
        ).filter(F.col("shared_count") >= 2)
        sa = F.concat(F.lit("o"), F.col("node_a").cast("string"))
        sb = F.concat(F.lit("o"), F.col("node_b").cast("string"))
        pairs = pairs_num.select(
            F.least(sa, sb).alias("node_a"),
            F.greatest(sa, sb).alias("node_b"),
            "shared_count",
        )
        _COUSE_CACHE[k] = pairs.persist(StorageLevel.MEMORY_AND_DISK)
    return _COUSE_CACHE[k]


def g06_shared_entity_pairs(spark, sf_dir):
    """J8/J9 blocking self-join: order pairs sharing ≥2 parts — through the
    degree-aware SALTED self-join (operators/graph_queries.py::
    shared_entity_pairs; salted==unsalted parity pinned in
    tests/test_salt.py) and shared with g18/g19/g20/g21 via _couse_pairs."""
    return _couse_pairs(spark, sf_dir)


def g07_reverse_reach(spark, sf_dir):
    """J3 reverse reachability + DISTINCT: customers whose orders use part p1."""
    edges = TG.derive_edges(spark, sf_dir)
    up = edges.filter((F.col("edge_type") == "USES_PART") & (F.col("to_node_id") == "p1"))
    placed = edges.filter(F.col("edge_type") == "PLACED").select(
        F.col("from_node_id").alias("cust"), F.col("to_node_id").alias("ord")
    )
    return (
        up.join(placed, up.from_node_id == placed.ord)
        .select(F.col("cust").alias("customer_id"))
        .distinct()
    )


def g08_recursive_chain(spark, sf_dir):
    """G2/q9 recursive chain: walk FOLLOWS edges from each first order.

    Same recursive_chain operator over a numeric FOLLOWS derivation
    (guide §2.3): every per-level join, the path-array cycle guard and the
    per-level localCheckpoint serialize 8-byte longs instead of 'oN'
    strings, and ONE window pass (lag + row_number over the same
    partition/order) derives both the FOLLOWS edges and the start set —
    derive_edges + first_orders each paid their own window sort. String
    ids are rebuilt on the final output only; 'o'-prefixing is injective,
    so the operator's closing distinct is unchanged (oracle g08 intact)."""
    _utc(spark)
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    lagged = o.select(
        F.col("o_orderkey").alias("ok"),
        F.lag("o_orderkey").over(w).alias("prev"),
        F.row_number().over(w).alias("rn"),
    )
    follows = lagged.filter(F.col("prev").isNotNull()).select(
        F.col("ok").alias("from_node_id"),
        F.col("prev").alias("to_node_id"),
        F.lit("FOLLOWS").alias("edge_type"),
    )
    starts = lagged.filter(F.col("rn") == 1).select(F.col("ok").alias("node_id"))
    out = G.recursive_chain(follows, starts, edge_type="FOLLOWS", max_depth=5)
    return out.select(
        F.concat(F.lit("o"), F.col("start_id").cast("string")).alias("start_id"),
        F.concat(F.lit("o"), F.col("node_id").cast("string")).alias("node_id"),
        "depth",
    )


def g09_bfs(spark, sf_dir):
    """G1 bidirectional BFS to depth 2 from customer c1."""
    nodes, edges = TG.derive_nodes(spark, sf_dir), TG.derive_edges(spark, sf_dir)
    return G.bfs_subgraph(nodes, edges, "c1", max_depth=2)


def g10_recent_orders(spark, sf_dir):
    """J1/O1 ordered join: latest 50 orders with customer names."""
    _utc(spark)
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .orderBy(F.desc_nulls_last("o_orderdate"), F.asc("o_orderkey"))
        .limit(50)
        .select(
            "o_orderkey",
            "c_name",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_totalprice",
        )
    )


def g12_citation_network(spark, sf_dir):
    """Reference q7 (sql/example_queries.sql:99-112): the citation-network
    shape — a typed edge with the side-table metadata joined on BOTH
    endpoints, ordered by the citing side's date. FOLLOWS plays CITES;
    orders plays papers."""
    _utc(spark)
    o = _t(spark, sf_dir, "orders")
    e = TG.derive_edges(spark, sf_dir).filter(F.col("edge_type") == "FOLLOWS")
    o1 = o.select(
        F.concat(F.lit("o"), F.col("o_orderkey").cast("string")).alias("nid1"),
        F.col("o_orderkey").alias("citing_order"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("citing_date"),
    )
    o2 = o.select(
        F.concat(F.lit("o"), F.col("o_orderkey").cast("string")).alias("nid2"),
        F.col("o_orderkey").alias("cited_order"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("cited_date"),
    )
    return (
        e.join(o1, e.from_node_id == o1.nid1)
        .join(o2, e.to_node_id == o2.nid2)
        .orderBy(F.desc("citing_date"), F.asc("citing_order"), F.asc("cited_order"))
        .limit(100)
        .select("citing_order", "citing_date", "cited_order", "cited_date", "confidence")
    )


def g13_papers_by_dataset(spark, sf_dir):
    """Reference q10 (sql/example_queries.sql:163-175): entities of one type
    reached from the side table through typed edges, projecting an edge
    property, ordered by date. Parts play datasets; USES_PART plays
    USES_DATASET/EVALUATES_ON; confidence plays the evidence property."""
    _utc(spark)
    o = _t(spark, sf_dir, "orders")
    nodes = TG.derive_nodes(spark, sf_dir).filter(F.col("node_type") == "part")
    e = TG.derive_edges(spark, sf_dir).filter(F.col("edge_type") == "USES_PART")
    onode = o.select(
        F.concat(F.lit("o"), F.col("o_orderkey").cast("string")).alias("nid"),
        F.col("o_orderkey").alias("order_key"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
    )
    return (
        onode.join(e, onode.nid == e.from_node_id)
        .join(nodes, e.to_node_id == nodes.id)
        .orderBy(
            F.desc("order_date"), F.asc("order_key"), F.asc("label"), F.asc("to_node_id")
        )
        .limit(100)
        .select("order_key", "order_date", F.col("label").alias("part_name"), "confidence")
    )


def g14_motif_triangle(spark, sf_dir):
    """Motif finding (GraphFrames-find surface, operators/motif.py):
    consecutive orders sharing a part — a 3-edge triangle
    (o1)-FOLLOWS->(o2) with both using the same part p. Pure equi-join
    plan; the same-variable constraint IS the join condition."""
    from research_knowledge_graph_spark.operators.motif import find_motif

    nodes, edges = TG.derive_nodes(spark, sf_dir), TG.derive_edges(spark, sf_dir)
    m = find_motif(
        nodes,
        edges,
        "(o1)-[:FOLLOWS]->(o2); (o1)-[:USES_PART]->(p); (o2)-[:USES_PART]->(p)",
    )
    return m.select("o1_id", "o2_id", "p_id", "p_label")


def g15_connected_components(spark, sf_dir):
    """Connected components over the undirected FOLLOWS graph (min-label
    propagation + pointer jumping, operators/canonicalize.py::
    connected_components — the same CC that drives fuzzy canonicalization).
    Component id = min node id; oracle = recursive undirected reachability
    + min."""
    from research_knowledge_graph_spark.operators.canonicalize import (
        connected_components,
    )

    edges = TG.derive_edges(spark, sf_dir).filter(F.col("edge_type") == "FOLLOWS")
    pairs = edges.select(
        F.col("from_node_id").alias("key_a"), F.col("to_node_id").alias("key_b")
    )
    return connected_components(pairs).select(
        F.col("key").alias("node_id"), "component"
    )


def g18_triangle_count(spark, sf_dir):
    """Per-node triangle counts (GraphFrames triangleCount surface,
    operators/graph_queries.py::triangle_count) over the order co-usage
    graph (g06's pairs sharing ≥2 parts). Degree-oriented wedge
    enumeration — each triangle found once, hot-node wedge blowup capped;
    the oracle counts the same (orientation-invariant) triangle set with
    a plain id-ordered triple join. Pair graph shared via _couse_pairs."""
    pairs = _couse_pairs(spark, sf_dir)
    return G.triangle_count(pairs.select("node_a", "node_b"))


def g19_clustering_coefficient(spark, sf_dir):
    """Local clustering coefficient 2T/(d·(d-1)) per node of the co-usage
    graph — triangle counts joined with degrees
    (operators/graph_queries.py::clustering_coefficient). Pair graph
    shared via _couse_pairs."""
    pairs = _couse_pairs(spark, sf_dir)
    return G.clustering_coefficient(pairs.select("node_a", "node_b"))


def g20_label_propagation(spark, sf_dir):
    """Community detection by synchronous label propagation over the order
    co-usage graph (operators/communities.py). Deterministic tie-breaks
    make the result a pure function of the graph (pure-Python twin in
    tests/test_communities.py) — and unlike PageRank's float accumulation,
    the votes are integer counts with an exact arg-max, so the 5 rounds
    unroll as a CTE cascade in DuckDB: fully oracle-checked."""
    from research_knowledge_graph_spark.operators.communities import (
        label_propagation,
    )

    pairs = _couse_pairs(spark, sf_dir)
    return label_propagation(pairs.select("node_a", "node_b"), max_iter=5)


def g21_weighted_label_propagation(spark, sf_dir):
    """Weighted LPA refinement (VERDICT round-3 #9): each neighbor votes
    with the co-usage edge weight (shared_count) instead of 1 — tightly
    coupled orders pull harder, a Louvain-flavored sharpening of g20's
    communities at identical cost (the weight rides the same aggregate).
    Same unrolled-CTE oracle, vote = sum(w)."""
    from research_knowledge_graph_spark.operators.communities import (
        label_propagation,
    )

    pairs = _couse_pairs(spark, sf_dir)
    return label_propagation(pairs, max_iter=5, weight_col="shared_count")


def g17_shortest_paths(spark, sf_dir):
    """Multi-landmark directed shortest paths (GraphFrames shortestPaths
    surface, operators/graph_queries.py::shortest_paths): hop distance to
    parts p1/p2 over FOLLOWS∪USES_PART — an order using the part directly
    is at dist 1, its successor orders (FOLLOWS points newer→older) at
    2, 3, … Oracle: recursive CTE with min(dist)."""
    edges = TG.derive_edges(spark, sf_dir)
    return G.shortest_paths(
        edges, ["p1", "p2"], max_depth=6, edge_types=["FOLLOWS", "USES_PART"]
    )


def g16_pagerank(spark, sf_dir):
    """Fixed-iteration PageRank over FOLLOWS∪PLACED (operators/pagerank.py).
    Verified against a numpy power-iteration reference to 1e-9 in
    tests/test_pagerank.py; a cross-engine float hash after 10 iterated
    sums would be rounding-flaky, so the driver check is rows-only."""
    edges = TG.derive_edges(spark, sf_dir).filter(
        F.col("edge_type").isin("FOLLOWS", "PLACED")
    )
    from research_knowledge_graph_spark.operators.pagerank import pagerank

    return pagerank(edges, damping=0.85, iters=10).select(
        "node_id", F.round("rank", 6).alias("rank6")
    )


def g29_hits(spark, sf_dir):
    """Fixed-iteration unnormalized HITS over FOLLOWS∪PLACED
    (operators/pagerank.py::hits): hub/authority after 2 h-then-a rounds
    from a₀≡1 are exact integer sums (rankings identical to normalized
    HITS — the per-iteration norm is a positive scalar), so the DuckDB
    oracle unrolls both rounds as a CTE cascade and checks values
    bit-exactly — the g20 integer-vote trick applied to centrality.
    Simple-graph semantics: the (src, dst) set is de-duplicated before
    iterating."""
    from research_knowledge_graph_spark.operators.pagerank import hits

    edges = (
        TG.derive_edges(spark, sf_dir)
        .filter(F.col("edge_type").isin("FOLLOWS", "PLACED"))
        .select("from_node_id", "to_node_id")
        .distinct()
    )
    return hits(edges, iters=2)


def t24_frequent_kgrams(spark, sf_dir):
    """Duplicated-passage mining (operators/curation.py::frequent_kgrams):
    word 8-grams shared by ≥2 distinct documents of the same source —
    the contamination/boilerplate/memorization audit over the corpus
    (t19/t20 find near-dup pairs; this surfaces the shared passages
    themselves). Map-only Catalyst tokenize+window, two-phase salted
    countDistinct (a true boilerplate gram is by definition a hot key),
    top-200 on the (n_docs DESC, source, gram) total order — fully
    hash-checked."""
    from research_knowledge_graph_spark.operators.curation import frequent_kgrams

    return frequent_kgrams(
        _docs_wide(spark, sf_dir), k=8, min_docs=2, top_n=200
    )


def g31_katz_centrality(spark, sf_dir):
    """Truncated Katz centrality (operators/pagerank.py::katz_centrality)
    over FOLLOWS∪PLACED: attenuated directed-walk counts, iters=3,
    β=1/4. Scores come back scaled by 4³ so every value is an exact
    integer sum of walk counts — the DuckDB oracle unrolls the three hop
    aggregates as CTEs and checks bit-exactly (g29's integer-cascade
    trick on a third centrality family). Simple-graph semantics: the
    (src, dst) set is de-duplicated before counting."""
    from research_knowledge_graph_spark.operators.pagerank import katz_centrality

    edges = (
        TG.derive_edges(spark, sf_dir)
        .filter(F.col("edge_type").isin("FOLLOWS", "PLACED"))
        .select("from_node_id", "to_node_id")
        .distinct()
    )
    return katz_centrality(edges, iters=3, beta_inv=4)


def t01_normalize_labels(spark, sf_dir):
    """F3 label normalization at scale (the pinned expression)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", normalize_label_col(F.substring("text", 1, 50)).alias("norm_label")
    )


def t02_quality(spark, sf_dir):
    """Quality scoring: length/punct/stopword features per document."""
    d = _docs_wide(spark, sf_dir)
    q = quality_features_cols("text")
    return d.select(
        "doc_id",
        q["n_chars"].alias("n_chars"),
        q["n_tokens"].alias("n_tokens"),
        F.round(q["alpha_ratio"], 6).alias("alpha_ratio"),
        F.round(q["stopword_ratio"], 6).alias("stopword_ratio"),
        F.round(q["mean_token_len"], 6).alias("mean_token_len"),
    )


def t03_langid(spark, sf_dir):
    """Language-ID heuristic, aggregated."""
    d = _docs_wide(spark, sf_dir)
    return d.select(lang_id_col("text").alias("lang_guess")).groupBy("lang_guess").agg(
        F.count(F.lit(1)).alias("n")
    )


def t04_exact_dedup(spark, sf_dir):
    """Exact dedup stats per source: fingerprint-distinct counts.
    No _wide fan-out: ONE md5 per document is cheap enough that the
    repartition exchange costs more than the single-task scan saves
    (A/B measured 0.37 s plain vs 0.86 s fanned at sf0.1)."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select("source", fingerprint_col("text").alias("fp"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.countDistinct("fp").alias("n_unique"))
    )


def t05_jaccard_pairs(spark, sf_dir):
    """n-gram Jaccard near-dup pairs, blocked by source."""
    d = _docs_wide(spark, sf_dir)
    return D.ngram_jaccard_pairs_blocked(
        d, block_col="source", threshold=0.5, shingle_k=4
    )


def t06_simhash(spark, sf_dir):
    """16-bit SimHash per document (portable hash → oracle-identical).
    Uses the explode+aggregate variant: one hash per token, not per bit."""
    d = _docs_wide(spark, sf_dir)
    return D.simhash_agg(d, id_col="doc_id", text_col="text", bits=16)


def t09_quality_quantiles(spark, sf_dir):
    """Per-source quality-score distribution (exact interpolated
    percentiles) — the curation primitive behind 'drop the bottom decile
    per source'. Spark ``percentile`` and DuckDB ``quantile_cont`` share
    the linear-interpolation definition."""
    d = _docs_wide(spark, sf_dir)
    q = quality_features_cols("text")
    scored = d.select("source", q["alpha_ratio"].alias("score"))
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.percentile("score", F.lit(0.1)), 6).alias("p10"),
        F.round(F.percentile("score", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("score", F.lit(0.9)), 6).alias("p90"),
    )


def e01_knn_bruteforce(spark, sf_dir):
    """J4/J5 vector top-k: exact cosine kNN for 5 query vectors. The base
    side is fanned out (_wide): the per-row dot products against all 5
    query vectors otherwise run inside the unsplittable single-row-group
    scan's ONE task."""
    e = _wide(spark, sf_dir, "embeddings", "vec_id")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return S.knn_bruteforce(e, q, k=10).withColumn("rank", F.col("rank").cast("int"))


def e02_embedding_near_dups(spark, sf_dir):
    """Embedding-cosine near-dup pairs, blocked by label."""
    e = _t(spark, sf_dir, "embeddings")
    return D.embedding_near_dups(e, block_col="label", threshold=0.25)


def g11_undirected_degree(spark, sf_dir):
    """E4 both-direction union shape: undirected FOLLOWS degree per order,
    via the two-phase salted count (functions/salt.py) — partial count by
    (key, partition-salt), sum by key; same result, skew-immune shuffle."""
    from research_knowledge_graph_spark.functions.salt import two_phase_count

    edges = TG.derive_edges(spark, sf_dir).filter(F.col("edge_type") == "FOLLOWS")
    und = edges.select(F.col("from_node_id").alias("node_id")).unionByName(
        edges.select(F.col("to_node_id").alias("node_id"))
    )
    return two_phase_count(und, ["node_id"]).select(
        "node_id", F.col("n").alias("degree")
    )


def t07_minhash_lsh_pairs(spark, sf_dir):
    """MinHash-signature LSH banding candidate pairs over documents."""
    d = _docs_wide(spark, sf_dir)
    sigs = D.minhash_signatures(d, "doc_id", "text", k=8, shingle_k=4)
    return D.lsh_candidate_pairs(sigs, bands=4, rows_per_band=2)


def t10_dedup_cluster_survivors(spark, sf_dir):
    """Near-dup CLUSTER collapse — the step after pair finding in a real
    dedup pipeline: MinHash-LSH pairs (t07) → connected components →
    per-cluster survivor (min doc_id). One row per clustered doc:
    (doc_id, survivor_id, n_docs); the drop list is rows where
    doc_id != survivor_id. Oracle: recursive undirected reachability over
    the identical pair set. Cluster sizes via groupBy + broadcast join, not
    a per-component window (operators/dedup.py::cluster_survivors — the
    all-dups degenerate case is pinned in tests/test_canonicalize.py)."""
    d = _docs_wide(spark, sf_dir)
    sigs = D.minhash_signatures(d, "doc_id", "text", k=8, shingle_k=4)
    pairs = D.lsh_candidate_pairs(sigs, bands=4, rows_per_band=2)
    return D.cluster_survivors(pairs)


def t11_stratified_sample(spark, sf_dir):
    """Deterministic hash-based stratified sampling (training-data mixing):
    even-numbered sources kept at 20%, odd at 5%. Map-only plan — rate dim
    broadcast, survival decided per-row by the portable hash; re-runs and
    rate top-ups are reproducible by construction."""
    from research_knowledge_graph_spark.operators.sampling import (
        stratified_sample,
    )

    d = _t(spark, sf_dir, "documents")
    rates = {f"src{i}": (0.20 if i % 2 == 0 else 0.05) for i in range(20)}
    return stratified_sample(d, rates, "source", "doc_id", seed=7).select(
        "doc_id", "source", "lang"
    )


def t12_quota_sample(spark, sf_dir):
    """Exact per-source quota (10 docs/source) drawn by hash order — a
    deterministic uniform draw without replacement; ``pick`` is the
    1-based rank within the stratum."""
    from research_knowledge_graph_spark.operators.sampling import quota_sample

    d = _t(spark, sf_dir, "documents")
    return quota_sample(d, 10, "source", "doc_id", seed=7).select(
        "doc_id", "source", F.col("pick").cast("int").alias("pick")
    )


def t13_token_budget_sample(spark, sf_dir):
    """Token-budget sampling (training mixtures are specified in tokens,
    not rows): walk each source in hash order, keep documents while the
    running token total stays ≤ 700. Deterministic and monotone in the
    budget."""
    from research_knowledge_graph_spark.functions.textops import tokens_col
    from research_knowledge_graph_spark.operators.sampling import (
        token_budget_sample,
    )

    d = _t(spark, sf_dir, "documents")
    return token_budget_sample(
        d, 700, F.size(tokens_col("text")).cast("bigint"), "source", "doc_id",
        seed=7,
    ).select("doc_id", "source", "cum_tokens")


def e03_knn_lsh(spark, sf_dir):
    """SRP-LSH bucketed ANN: same-bucket rerank for 5 query vectors."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return S.knn_lsh(e, q, dim=64, k=10, planes=6).withColumn(
        "rank", F.col("rank").cast("int")
    )


def e05_knn_lsh_multiprobe(spark, sf_dir):
    """Multi-probe SRP-LSH ANN: the query additionally probes every bucket
    one bit-flip away (Hamming-1 ball) — the standard recall lever when a
    neighbor straddles one hyperplane. Spark explodes the probe set into an
    equi-join; the oracle expresses the same set as a Hamming θ-join."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return S.knn_lsh(e, q, dim=64, k=10, planes=6, probe_bits=1).withColumn(
        "rank", F.col("rank").cast("int")
    )


def t14_quality_floor(spark, sf_dir):
    """Per-source quality-floor filter (operators/curation.py): drop every
    document strictly BELOW its source's 10th-percentile alpha-ratio
    score (threshold ties kept — a strict drop wipes constant-score
    strata to zero). Exact interpolated threshold per source, broadcast
    back; comparisons in rounded 6-decimal space for a reproducible
    boundary."""
    from research_knowledge_graph_spark.operators.curation import (
        quality_floor_filter,
    )

    d = _docs_wide(spark, sf_dir)
    q = quality_features_cols("text")
    return quality_floor_filter(
        d.select("doc_id", "source", "text"), q["alpha_ratio"], 0.1, "source"
    ).select("doc_id", "source", "score6")


def t15_pii_redaction(spark, sf_dir):
    """PII scrubbing audit (operators/curation.py): emails, phones, IPv4s
    replaced by typed tokens, with per-class counts. The synthetic corpus
    has no PII, so each doc gets a deterministic constructed contact line
    (same construction in the oracle) — the regex chain does real work and
    the redacted text round-trips through the value hash."""
    from research_knowledge_graph_spark.operators.curation import (
        redact_pii_col,
        redaction_counts_col,
    )

    d = _docs_wide(spark, sf_dir)
    pii_text = F.concat(
        F.col("text"),
        F.lit(" contact user"), F.col("doc_id").cast("string"),
        F.lit("@example.com ph 555-867-"),
        F.lpad(F.pmod(F.col("doc_id"), F.lit(10000)).cast("string"), 4, "0"),
        F.lit(" ip 10.0."), F.pmod(F.col("doc_id"), F.lit(256)).cast("string"),
        F.lit(".1"),
    )
    counts = redaction_counts_col(pii_text)
    return d.select(
        "doc_id",
        counts["n_email"].cast("bigint").alias("n_email"),
        counts["n_phone"].cast("bigint").alias("n_phone"),
        counts["n_ip"].cast("bigint").alias("n_ip"),
        redact_pii_col(pii_text).alias("redacted"),
    )


def t16_bm25_search(spark, sf_dir):
    """BM25 lexical retrieval (operators/text_search.py): top-20 docs for a
    3-term query — the retrieval baseline before embeddings, and the
    lexical half of hybrid search. Pure Catalyst: tokenize+explode+term
    filter fuse into the scan; corpus stats and df are tiny broadcast
    dims; the corpus itself is never shuffled whole. Deterministic top-k
    (round-6 scores, doc-id tie-break) → full DuckDB oracle."""
    from research_knowledge_graph_spark.operators.text_search import bm25_scores

    d = _docs_wide(spark, sf_dir)
    return bm25_scores(d, ["spark", "hash", "vector"], limit=20)


def _cached_index(src: str, prefix: str, params: str, build_fn) -> str:
    """Content+format-keyed persisted index slot under tempdir, shared by
    the index-serving entries (e06 IVF, t17 BM25 postings). A persisted
    index is a pure function of the input table AND the build recipe: the
    key fingerprints input content (path + mtime + size — regenerated
    testdata must miss the cache) plus a ``params`` version string (a
    tokenization/format change must also miss it, or an index left in
    /tmp by older code would be served stale). Builds land in a scratch
    dir and atomic-rename into the slot so concurrent callers never see a
    half-built index; the rename loser adopts the winner's copy."""
    import hashlib
    import shutil
    import tempfile
    import uuid as _uuid

    st = os.stat(src)
    key = hashlib.sha256(
        f"{os.path.abspath(src)}:{st.st_mtime_ns}:{st.st_size}:{params}".encode()
    ).hexdigest()[:12]
    tmp = tempfile.gettempdir()
    path = os.path.join(tmp, f"{prefix}_{key}")
    if not os.path.isdir(path):
        scratch = f"{path}.build.{_uuid.uuid4().hex[:8]}"
        build_fn(scratch)
        # marker attributing the slot to (source table, build recipe) plus
        # the source mtime it was built from, so a SUPERSEDED slot for this
        # (src, params) can be pruned without touching slots built from
        # other sf_dirs (which share the prefix and stay warm) or from
        # other index versions
        with open(os.path.join(scratch, "_SRC"), "w") as fh:
            fh.write(f"{os.path.abspath(src)}\n{params}\n{st.st_mtime_ns}")
        try:
            os.rename(scratch, path)
        except OSError:  # another caller won the race; use theirs
            shutil.rmtree(scratch, ignore_errors=True)
        # Prune superseded slots — same prefix AND same (src, params) AND
        # recorded source mtime strictly OLDER than ours: the mtime order
        # makes the prune one-directional, so a racing builder working from
        # a stale stat can never delete a newer slot. In-flight ".build."
        # scratch dirs are never touched (deleting one would break the
        # concurrent builder's rename). Caveat (accepted, mirrors
        # _COUSE_CACHE eviction): a lazy DataFrame still scanning a pruned
        # slot fails at action time — regenerate inputs between query
        # calls, not across live frames.
        for d in os.listdir(tmp):
            if (
                d.startswith(f"{prefix}_")
                and ".build." not in d
                and d != f"{prefix}_{key}"
            ):
                marker = os.path.join(tmp, d, "_SRC")
                try:
                    with open(marker) as fh:
                        s_src, s_params, s_mtime = fh.read().split("\n")
                except (OSError, ValueError):
                    continue  # pre-marker slot or foreign dir: leave it
                if (
                    s_src == os.path.abspath(src)
                    and s_params == params
                    and int(s_mtime) < st.st_mtime_ns
                ):
                    shutil.rmtree(os.path.join(tmp, d), ignore_errors=True)
    return path


def t17_bm25_indexed(spark, sf_dir):
    """BM25 served from the PERSISTED inverted index
    (operators/text_search.py::build_text_index / bm25_indexed) — the
    A4-postings serving path, mirroring e06's persisted-IVF story: the
    postings scan prunes to the query terms' hash buckets
    (PartitionFilters plan pin in tests/test_text_index.py); results are
    EXACTLY the scan-form t16 output, so the oracle is the same bm25 SQL.
    Index cached via the shared content+format-keyed slot (_cached_index,
    same as e06)."""
    from research_knowledge_graph_spark.operators.text_search import (
        bm25_indexed,
        build_text_index,
    )

    d = _docs_wide(spark, sf_dir)
    path = _cached_index(
        os.path.join(sf_dir, "documents.parquet"),
        "tidx_t17",
        "bm25idx:v1:n_buckets=64:tok=ws-lower",
        lambda scratch: build_text_index(d, scratch),
    )
    return bm25_indexed(spark, path, ["spark", "hash", "vector"], limit=20)


def g22_community_modularity(spark, sf_dir):
    """Newman modularity decomposition of g20's LPA communities over the
    co-usage graph (operators/communities.py::modularity): per community
    Q_c = e_c/m − (d_c/(2m))², Σ Q_c = the assignment's quality score.
    All-integer aggregates until the final division, so the oracle
    composes the modularity CTEs onto the same unrolled LPA cascade that
    checks g20/g21 — fully hash-checked."""
    from research_knowledge_graph_spark.operators.communities import (
        label_propagation,
        modularity,
    )

    pairs = _couse_pairs(spark, sf_dir)
    labels = label_propagation(pairs.select("node_a", "node_b"), max_iter=5)
    return modularity(pairs.select("node_a", "node_b"), labels)


def g42_community_conductance(spark, sf_dir):
    """Per-community conductance of g20's LPA communities over the
    co-usage graph (operators/communities.py::conductance) — the
    cut-quality score read next to g22's modularity: phi(c) = cut(c) /
    min(vol(c), 2m−vol(c)), all exact bigints from the SAME
    _community_stats pass g22 uses, one fixed-point ppm floor division.
    The oracle composes the conductance select onto the identical
    LPA-cascade + stats CTE blocks — fully hash-checked."""
    from research_knowledge_graph_spark.operators.communities import (
        conductance,
        label_propagation,
    )

    pairs = _couse_pairs(spark, sf_dir)
    labels = label_propagation(pairs.select("node_a", "node_b"), max_iter=5)
    return conductance(pairs.select("node_a", "node_b"), labels)


def g23_louvain_refine(spark, sf_dir):
    """Louvain-style local-move refinement of g20's LPA communities with
    g22's modularity as the objective (operators/communities.py::
    louvain_move_round): every node evaluates moving into each neighbor
    community; the gain decision is pure INTEGER arithmetic (dQ scaled by
    2m² — see the operator docstring), so unlike float-accumulating
    PageRank the round is bit-reproducible cross-engine and unrolls as SQL
    on top of the same LPA CTE cascade that checks g20/g21/g22 — fully
    hash-checked. Modularity non-regression is pinned in
    tests/test_modularity.py."""
    from research_knowledge_graph_spark.operators.communities import (
        label_propagation,
        louvain_move_round,
    )

    pairs = _couse_pairs(spark, sf_dir).select("node_a", "node_b")
    labels = label_propagation(pairs, max_iter=5)
    return louvain_move_round(pairs, labels)


def g24_personalized_pagerank(spark, sf_dir):
    """Personalized PageRank (random walk with restart) from customer
    seeds c1/c2 over FOLLOWS∪PLACED (operators/pagerank.py::
    personalized_pagerank) — the "entities related to X" ranking the
    reference's SIMILAR_TO surface approximates. Verified against a numpy
    twin to 1e-9 in tests/test_pagerank.py; float accumulation makes a
    cross-engine hash flaky, so no oracle_sql entry (same rationale as
    g16). NOTE: sits past the driver's 50-entry correctness window this
    round (rows-only rows are the weakest driver check, so excluding them
    loses least); its verification is the local numpy twin + the local
    rows-only gate in tests/test_entry_oracle.py."""
    from research_knowledge_graph_spark.operators.pagerank import (
        personalized_pagerank,
    )

    edges = TG.derive_edges(spark, sf_dir).filter(
        F.col("edge_type").isin("FOLLOWS", "PLACED")
    )
    return personalized_pagerank(edges, ["c1", "c2"], damping=0.85, iters=10).select(
        "node_id", F.round("rank", 6).alias("rank6")
    )


def e06_knn_ivf_indexed(spark, sf_dir):
    """Persisted IVF index end-to-end (the 10⁹-vector serving shape): build
    the cell-partitioned inverted file, then answer the e01 query set
    THROUGH it. ``nprobe == k_cells`` (full probe) makes the result EXACTLY
    brute force — the oracle is e01's SQL — while the read path exercises
    the real index: routed cells hit the parquet scan as a partition filter
    on ``cell`` (dynamic partition pruning, plan pinned in
    tests/test_ann_ivf.py). Partial-probe recall is measured separately
    (BASELINE.md §ANN)."""
    from research_knowledge_graph_spark.operators.ann_ivf import (
        build_ivf_index,
        knn_ivf_indexed,
    )

    e = _t(spark, sf_dir, "embeddings")
    path = _cached_index(
        os.path.join(sf_dir, "embeddings.parquet"),
        "ivf_e06",
        "ivf:v1:k_cells=8",
        lambda scratch: build_ivf_index(e, scratch, k_cells=8),
    )
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return knn_ivf_indexed(spark, path, q, nprobe=8, k=10).withColumn(
        "rank", F.col("rank").cast("int")
    )


def e07_hybrid_search_rrf(spark, sf_dir):
    """Hybrid search (operators/hybrid.py): BM25 lexical top-50 (t16's
    query) fused with the exact cosine top-50 for query vector 0 by
    reciprocal-rank fusion, score = Σ 1/(60+rank). Rank arithmetic only —
    no cross-retriever score calibration; the fusion itself is a union +
    hash-agg over ≤100 rows no matter the corpus size."""
    from research_knowledge_graph_spark.operators.hybrid import rrf_fuse
    from research_knowledge_graph_spark.operators.text_search import bm25_scores

    d = _docs_wide(spark, sf_dir)
    e = _t(spark, sf_dir, "embeddings")
    lex = bm25_scores(d, ["spark", "hash", "vector"], limit=50).withColumn(
        "rank", F.row_number().over(Window.orderBy(F.desc("score"), F.asc("doc_id")))
    )
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    sem = S.knn_bruteforce(e, q, k=50).select(F.col("vec_id").alias("doc_id"), "rank")
    return rrf_fuse([lex.select("doc_id", "rank"), sem], limit=20)


def v07_cooccurrence_graph(spark, sf_dir):
    """Graph construction from the event log (operators/temporal.py::
    cooccurrence_graph): users acting in the same (event_type, hour)
    block become weighted edges — the temporal analog of the pipeline's
    cross-document entity linking, built through the same degree-aware
    salted pair join as g06. Top-100 by (weight DESC, ids)."""
    _utc(spark)
    from research_knowledge_graph_spark.operators.temporal import (
        cooccurrence_graph,
    )

    return cooccurrence_graph(
        _t(spark, sf_dir, "events"), min_weight=2, top_k=100
    )


def e08_mmr_rerank(spark, sf_dir):
    """MMR-diversified top-5 retrieval for 3 query vectors
    (operators/similarity.py::mmr_rerank): distributed top-20 relevance
    pool (broadcast-query scan + per-query window), then the inherently
    sequential greedy λ-tradeoff rerank runs per-query-group inside ONE
    Arrow-batched applyInPandas — thousands of queries rerank in
    parallel at scale. All comparisons happen on 9-decimal-rounded
    cosines (the knn discipline), ties by vec_id, so the greedy pick
    sequence is bit-reproducible and the oracle (a k-step unrolled
    argmax CTE cascade) is exact."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return S.mmr_rerank(e, q, k=5, pool=20, lam=0.7)


def v06_asof_forward(spark, sf_dir):
    """FORWARD as-of join (operators/temporal.py, direction='forward'):
    for each error event, the same user's NEXT purchase at or after it —
    next-event attribution, the mirror of v04. Same one-shuffle
    union-and-carry plan walking time reversed; oracle is DuckDB's native
    ASOF JOIN with the inequality flipped."""
    _utc(spark)
    from research_knowledge_graph_spark.operators.temporal import asof_join

    ev = _t(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", F.col("event_id").alias("error_id"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("error_us"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("purchase_us"),
    )
    return asof_join(
        errors, purchases, ["user_id"], "error_us", "purchase_us",
        ["purchase_id", "purchase_us"], prefix="", direction="forward",
    ).select("user_id", "error_id", "error_us", "purchase_id", "purchase_us")


def g25_k_core(spark, sf_dir):
    """k-core decomposition (k=2) of the order co-usage graph
    (operators/communities.py::k_core): iterative peel to the maximal
    subgraph where every order keeps ≥2 co-usage partners, returning each
    survivor with its in-core degree — the standard graph-cohesion
    primitive (dense-cluster extraction / peripheral-node curation; the
    reference's "highly connected entity" notion in
    src/services/graph_service.py). Survivor sets are an integer-exact
    deterministic function of the graph and post-fixpoint rounds are the
    identity, so the Spark peel (16 rounds, early exit) and the oracle's
    unrolled 16-round CTE cascade agree unconditionally — fully
    hash-checked."""
    from research_knowledge_graph_spark.operators.communities import k_core

    pairs = _couse_pairs(spark, sf_dir)
    return k_core(pairs.select("node_a", "node_b"), k=2, max_iter=16)


def g26_node_similarity(spark, sf_dir):
    """Structural 'related entities' (operators/graph_queries.py::
    node_similarity_jaccard): neighbor-set Jaccard over the co-usage
    graph — the graph-native analog of the reference's SIMILAR_TO edges
    (graph_service.py:403-458, there embedding-cosine; here shared graph
    context). Top-100 pairs sharing ≥1 neighbor by (jaccard DESC, ids) —
    a total order, so the cut is deterministic and fully hash-checked.
    The common-neighbor wedge goes through the same degree-aware salted
    self-join as g06."""
    pairs = _couse_pairs(spark, sf_dir)
    return G.node_similarity_jaccard(
        pairs.select("node_a", "node_b"), min_shared=1, top_k=100
    )


def g30_resource_allocation(spark, sf_dir):
    """Resource-allocation link prediction (operators/graph_queries.py::
    resource_allocation_topk): common neighbors weighted 1/deg(z) over the
    order co-usage graph — the degree-weighted sibling of g26, predicting
    which UNLINKED orders are most likely related (already-adjacent pairs
    are anti-joined out — prediction proper; the reference's SIMILAR_TO
    derivation, graph_service.py:403-458, recast structurally). Weights
    are exact integer nanos (10^9 div deg — floor integer division, no
    floats anywhere), so the top-100 cut on (ra_nano DESC, ids) is a
    total order and the whole result is bit-reproducible: fully
    hash-checked against a plain-SQL wedge oracle. Same degree-aware
    salted self-join as g06/g26 (shared via _wedge_pair_agg)."""
    pairs = _couse_pairs(spark, sf_dir)
    return G.resource_allocation_topk(
        pairs.select("node_a", "node_b"), min_shared=1, top_k=100
    )


def g27_k_truss(spark, sf_dir):
    """k-truss (k=3) of the order co-usage graph (operators/
    communities.py::k_truss): the maximal subgraph where every edge sits
    in >=1 triangle, with per-edge triangle support — the edge-level
    sibling of g25's k-core and the standard community-nucleus
    extractor. Fixed 8-round peel mirrored by an unrolled triple-join
    CTE cascade; integer-exact, fully hash-checked."""
    from research_knowledge_graph_spark.operators.communities import k_truss

    pairs = _couse_pairs(spark, sf_dir)
    return k_truss(pairs.select("node_a", "node_b"), k=3, max_iter=8)


def t21_source_curation(spark, sf_dir):
    """Per-source corpus health report (operators/curation.py::
    source_curation_report): volume, exact-dup rate, mean alpha quality,
    token volume, English share — the per-domain dashboard row of a
    web-scale ingest. One scan → one hash aggregate; all per-doc features
    are pure Catalyst column math."""
    from research_knowledge_graph_spark.operators.curation import (
        source_curation_report,
    )

    return source_curation_report(_docs_wide(spark, sf_dir))


def t18_token_stats(spark, sf_dir):
    """Token accounting per document — the numbers every LLM-training
    mixture is budgeted in: whitespace token count, BPE-ish pre-tokenizer
    count (word / number / single-symbol pieces, functions/textops.py::
    tokens_col), and chars-per-BPE-token compression ratio. Pure Catalyst
    regexp + array expressions, map-only (no shuffle at any scale)."""
    from research_knowledge_graph_spark.functions.textops import (
        token_count_col,
        tokens_col,
    )

    d = _t(spark, sf_dir, "documents")
    n_bpe = F.size(tokens_col("text")).cast("bigint")
    return d.select(
        "doc_id",
        token_count_col("text").cast("bigint").alias("n_ws_tokens"),
        n_bpe.alias("n_bpe_tokens"),
        F.round(
            F.col("n_chars").cast("double") / F.greatest(n_bpe, F.lit(1)), 6
        ).alias("chars_per_bpe_token"),
    )


def t19_winnow_fingerprints(spark, sf_dir):
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken MOSS
    selection, functions/textops.py::winnow_fingerprints_col): token
    3-grams hashed with the portable 60-bit hash, min per 4-window,
    distinct — a locality-sensitive signature set guaranteeing any shared
    6-token run between documents shares a fingerprint. Exploded to
    (doc_id, fingerprint) rows so the oracle compares the full multiset.
    Map-only scan (sequence/transform/slice, whole-stage codegen); the
    downstream near-dup join groups on the fingerprint exactly like
    MinHash bands (t07)."""
    from research_knowledge_graph_spark.functions.textops import (
        winnow_fingerprint_rows,
    )

    d = _docs_wide(spark, sf_dir)
    # staged-projection form — identical fingerprints, 25× (see
    # winnow_fingerprint_rows: HOF lambdas re-evaluate embedded outer
    # expressions per element, so the single-expression form was
    # quadratic in tokens)
    return winnow_fingerprint_rows(d, "doc_id", "text", fp_name="fingerprint")


def t20_winnow_near_dups(spark, sf_dir):
    """Winnow-blocked near-dup pairs (operators/dedup.py::winnow_near_dups):
    docs sharing ≥2 winnowing fingerprints — i.e. ≥2 distinct shared
    6-token runs — with stop-fingerprint removal (fingerprints in >1000
    docs are boilerplate, dropped before pairing). The MOSS copy-detection
    complement to t07's MinHash banding: same bucket-join scale shape
    (never all-pairs), but n_shared counts shared text RUNS rather than
    estimating whole-doc Jaccard. Integer counts — fully hash-checked."""
    from research_knowledge_graph_spark.operators.dedup import winnow_near_dups

    d = _docs_wide(spark, sf_dir)
    return winnow_near_dups(d, min_shared=2, max_bucket=1000)


def t51_detector_agreement(spark, sf_dir):
    """Near-dup DETECTOR-ENSEMBLE agreement audit: the exact overlap of
    the MinHash-LSH candidate set (t07 — whole-doc Jaccard estimator)
    and the winnowing candidate set (t20 — shared-text-run detector) as
    one summary row: n_lsh / n_winnow / n_both / each-only plus the
    pair-set Jaccard in floor ppm. The two families fail differently
    (LSH misses a short plagiarized block inside an otherwise-different
    doc; winnowing misses the 80%-similar rewrite with no verbatim
    k+w−1 run), so a production dedup pass runs both — this entry is
    the standing answer to "what does each detector see that the other
    doesn't", on exactly the t07/t20 frames (same k/bands/min_shared/
    max_bucket knobs, both sides). Counts are exact bigints off one
    (doc_a, doc_b)-keyed full-outer join of two bucket-bounded pair
    frames; empty corpora read zeros with a NULL ppm (0/0 has no
    value). Scale: both inputs are already blocked (never all-pairs);
    the outer join keys on the pair id — no new skew surface."""
    from research_knowledge_graph_spark.operators.dedup import winnow_near_dups

    d = _docs_wide(spark, sf_dir)
    sigs = D.minhash_signatures(d, "doc_id", "text", k=8, shingle_k=4)
    lsh = D.lsh_candidate_pairs(sigs, bands=4, rows_per_band=2).select(
        "doc_a", "doc_b", F.lit(True).alias("in_l")
    )
    win = winnow_near_dups(d, min_shared=2, max_bucket=1000).select(
        "doc_a", "doc_b", F.lit(True).alias("in_w")
    )
    j = lsh.join(win, ["doc_a", "doc_b"], "full").select(
        F.coalesce("in_l", F.lit(False)).alias("in_l"),
        F.coalesce("in_w", F.lit(False)).alias("in_w"),
    )
    agg = j.agg(
        F.coalesce(F.sum(F.col("in_l").cast("long")), F.lit(0))
        .cast("long")
        .alias("n_lsh"),
        F.coalesce(F.sum(F.col("in_w").cast("long")), F.lit(0))
        .cast("long")
        .alias("n_winnow"),
        F.coalesce(F.sum((F.col("in_l") & F.col("in_w")).cast("long")), F.lit(0))
        .cast("long")
        .alias("n_both"),
    )
    return agg.select(
        "n_lsh",
        "n_winnow",
        "n_both",
        (F.col("n_lsh") - F.col("n_both")).cast("long").alias("n_lsh_only"),
        (F.col("n_winnow") - F.col("n_both")).cast("long").alias("n_winnow_only"),
        F.expr(
            "CASE WHEN n_lsh + n_winnow - n_both = 0 THEN NULL"
            " ELSE (1000000 * n_both) div (n_lsh + n_winnow - n_both) END"
        )
        .cast("long")
        .alias("agreement_ppm"),
    )


def t52_simhash_near_dups(spark, sf_dir):
    """SimHash-Hamming near-dup pairs (operators/dedup.py::
    simhash_hamming_pairs) — the Manku et al. WWW'07 banded-fingerprint
    design that completes the near-dup detector family: MinHash-LSH
    estimates whole-doc Jaccard (t07), winnowing finds shared verbatim
    runs (t20), SimHash-Hamming catches the small-perturbation rewrite
    (changing a few tokens flips few fingerprint bits) at ONE 64-bit
    word of state per doc. Banding is pigeonhole-EXACT, not
    probabilistic: with 4 bands and max_hamming=3, every qualifying
    pair agrees on at least one chunk, so the blocked output is
    bit-identical to the O(n²) scan — blocked recall is a theorem here,
    unlike t07's tunable banding probability. Output (doc_a, doc_b,
    hamming), all exact integers.

    Scale: fingerprints are t06's one-md5-per-token map-side agg; pairs
    form only within a (band, chunk) bucket with the max_bucket
    stop-fingerprint guard (empty-doc fingerprint 0 and template
    boilerplate would otherwise own corpus-sized buckets), bounding pair
    volume at O(corpus × max_bucket); the verify step is one JVM-side
    bit_count(xor) per candidate. Production shape is bits=64 / four
    16-bit bands; 16 bits here matches the t06 oracle-portable
    fingerprint. Oracle: the t06 simhash CTE + the same band/guard/
    verify cascade in DuckDB (bit_count/xor are engine built-ins on
    both sides)."""
    d = _docs_wide(spark, sf_dir)
    return D.simhash_hamming_pairs(
        d, bits=16, bands=4, max_hamming=3, max_bucket=100_000
    )


def t08_chunk_stats(spark, sf_dir):
    """F5 chunking (2000/200 with the 70% boundary rule) as an Arrow UDF.
    The per-document walk is iterative, but its STATE is one integer (the
    window start), so chunk COUNTS unroll as a DuckDB recursive CTE —
    promoted from rows-only to a full oracle in round 5
    (_chunk_stats_sql; the chunk TEXTS would need the same walk plus
    strip(), also expressible, but counts already pin every boundary
    decision: the 70% rule fires iff the count differs from
    ceil((len-200)/1800))."""
    from research_knowledge_graph_spark.functions.textops import chunk_text_udf

    d = _docs_wide(spark, sf_dir)
    return d.select(
        "doc_id",
        F.size(chunk_text_udf(F.col("text"))).cast("int").alias("n_chunks"),
    )


def m01_media_features(spark, sf_dir):
    """Multimodal plumbing: treat document bytes as opaque media payloads,
    run the feature-extraction mapInPandas path (decode stubbed — see
    operators/multimodal.py). Numpy histogram features are not
    SQL-expressible: rows-only check."""
    from research_knowledge_graph_spark.operators.multimodal import (
        extract_media_features,
    )

    d = _t(spark, sf_dir, "documents").limit(100)
    media = d.select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.lit("image").alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
        F.create_map().cast("map<string,string>").alias("meta"),
    )
    return extract_media_features(media).select(
        "media_id", "n_bytes", F.round("byte_mean", 4).alias("byte_mean")
    )


def e04_embed_documents(spark, sf_dir):
    """L4 embedding generation (hashing-trick pandas UDF) over documents —
    float-vector output, rows-only check."""
    from research_knowledge_graph_spark.operators.qa import embed_docs

    # plain scan, NOT _docs_wide: limit(200) after a repartition takes 200
    # rows from whichever shuffle partitions finish first (nondeterministic
    # subset, full-corpus exchange for a 200-row query); the deterministic
    # first-200 of the single-file scan is the cheaper and stable input
    d = _t(spark, sf_dir, "documents").limit(200)
    out = embed_docs(d, dim=32)
    return out.select(
        "doc_id",
        F.size("embedding").cast("int").alias("dim"),
        F.round(F.aggregate(F.col("embedding"), F.lit(0.0), lambda a, x: a + x * x), 4).alias("sq_norm"),
    )


def v01_hourly_rollup(spark, sf_dir):
    """Event-time windowed aggregation (tumbling 1h) over events."""
    _utc(spark)
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00:00").alias("hour"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
    )


def v08_daily_retention(spark, sf_dir):
    """Daily active users + next-day retention cohort over the event log:
    for each day, how many distinct users were active and what share of
    the PREVIOUS day's actives returned. Distinct-(user, day) scan →
    self-equi-join on (user, day+1) → two hash-aggs; the standard
    engagement rollup every analytics stack ships. Retention ratio is an
    exact integer division rounded at 6 — cross-engine stable."""
    _utc(spark)
    ev = _t(spark, sf_dir, "events")
    act = ev.select(
        "user_id", F.to_date(F.col("ts")).alias("day")
    ).distinct()
    # act is distinct on exactly (user_id, day) and the retention join
    # keeps that key unique, so plain counts equal countDistinct without
    # the second distinct-aggregate phase
    daily = act.groupBy("day").agg(F.count(F.lit(1)).alias("n_active"))
    ret = (
        act.alias("a")
        .join(
            act.select(
                "user_id", F.date_add(F.col("day"), 1).alias("day")
            ).alias("b"),
            ["user_id", "day"],
        )
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n_retained"))
    )
    prev = daily.select(
        F.date_add(F.col("day"), 1).alias("day"),
        F.col("n_active").alias("n_prev_active"),
    )
    return (
        daily.join(ret, "day", "left")
        .join(prev, "day", "left")
        .filter(F.col("n_prev_active").isNotNull())
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_active",
            F.coalesce("n_retained", F.lit(0)).alias("n_retained"),
            F.round(
                F.coalesce("n_retained", F.lit(0)) / F.col("n_prev_active"), 6
            ).alias("retention_rate"),
        )
    )


def v09_rolling_active_users(spark, sf_dir):
    """Rolling 7-day distinct-active-users series over the event log. The
    scale pattern here is the point: instead of a range self-join (event ×
    window, an O(n·w) shuffle join whose key-range matching AQE can't
    prune), each distinct (user, day) row EXPLODES into the ≤7 window
    days it contributes to — a map-side sequence+explode, then one
    hash-agg on day. At 100 TB that is a single shuffle keyed by ~365×
    few-thousand window days, never a range join."""
    _utc(spark)
    ev = _t(spark, sf_dir, "events")
    act = ev.select("user_id", F.to_date(F.col("ts")).alias("day")).distinct()
    # 1-row aggregate: broadcast is bounded by construction
    mx = act.agg(F.max("day").alias("max_day"))
    win = act.select(
        "user_id",
        F.explode(F.sequence(F.col("day"), F.date_add(F.col("day"), 6))).alias(
            "win_day"
        ),
    )
    return (
        win.groupBy("win_day")
        .agg(F.countDistinct("user_id").alias("n_active_7d"))
        .crossJoin(F.broadcast(mx))
        .filter(F.col("win_day") <= F.col("max_day"))
        .select(
            F.date_format("win_day", "yyyy-MM-dd").alias("day"), "n_active_7d"
        )
    )


def v10_funnel_conversion(spark, sf_dir):
    """Ordered funnel (view → click ≤6h later → purchase ≤6h after that)
    conversion counts: users whose first click lands within 6 hours of
    their first view, and whose first purchase lands within 6 hours of
    that click. Three filtered min-ts hash-aggs chained by user_id
    equi-joins — each stage's frame only shrinks, every join is keyed on
    user_id so AQE can broadcast the later (smaller) stages; no window
    functions, no per-event state."""
    _utc(spark)
    ev = _t(spark, sf_dir, "events")
    bound = F.expr("INTERVAL 6 HOURS")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(
            (F.col("ts") > F.col("t_view"))
            & (F.col("ts") <= F.col("t_view") + bound)
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(
            (F.col("ts") > F.col("t_click"))
            & (F.col("ts") <= F.col("t_click") + bound)
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_viewed"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_clicked_after_view")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchased_after_click")))
    )


def _tok3(d: DataFrame, cols: tuple = ("doc_id",)) -> DataFrame:
    """The shared t22/t23/t42 corpus tokenizer: lower + split on runs of
    non-letters, keep terms of ≥3 chars. ONE definition on each side
    (this for Spark, _TOK3_CTE for the DuckDB oracles) so the two
    entries cannot drift from their oracles independently. `cols` lets a
    caller carry extra key columns (t42 carries `source`) through the
    SAME tokenize expression instead of re-joining them on afterwards."""
    return d.select(
        *cols,
        F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("term"),
    ).filter(F.length("term") >= 3)


# DuckDB twin of _tok3 — interpolated into both t22/t23 oracle CTEs
_TOK3_CTE = """toks AS (
                SELECT doc_id,
                       unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS term
                FROM documents
            ),
            toks3 AS (SELECT doc_id, term FROM toks WHERE length(term) >= 3)"""

# source-carrying variant for t42 — derived MECHANICALLY from the one
# _TOK3_CTE literal (not a second hand-written copy) so the tokenizer
# definition still cannot drift between the three entries.
_TOK3_SRC_CTE = _TOK3_CTE.replace(
    "SELECT doc_id,\n", "SELECT doc_id, source,\n"
).replace("SELECT doc_id, term FROM toks", "SELECT doc_id, source, term FROM toks")


def t22_tfidf_keywords(spark, sf_dir):
    """Top-3 TF-IDF keywords per document — the classic corpus keyword
    extractor every training-data curation stack ships (reference analog:
    concept surfacing in src/services/graph_service.py). Tokenize is a
    map-side lower+regexp split (pure Catalyst, no Python); tf and df are
    two hash-aggs over the exploded terms; the 1-row corpus count joins
    by broadcast (bounded by construction). Ranking rounds the score to 6
    before ordering so the cross-engine float tie-break is stable."""
    d = _docs_wide(spark, sf_dir)
    total = d.agg(F.count(F.lit(1)).alias("n_docs"))
    toks = _tok3(d)
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "tfidf_score",
            F.round(
                F.col("tf")
                * F.log(
                    (F.lit(1) + F.col("n_docs")) / (F.lit(1) + F.col("df"))
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf_score"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "term", "rank", "tfidf_score")
    )


def t23_unigram_nll_quality(spark, sf_dir):
    """Unigram language-model negative-log-likelihood per document — the
    CCNet-style perplexity proxy LLM curation stacks use to rank text
    quality against the corpus itself. p(term) is exact integer counts
    over the corpus; each document's score is the mean -ln p over its
    tokens. Per-token lnp is scaled to FIXED-POINT nano units and summed
    as bigint, so the aggregate is bit-identical regardless of partition
    merge order (a double sum would drift with reduction order and flake
    the cross-engine hash at round-6 boundaries); the single float
    division happens once per doc at the end. Tokenize is the shared
    _tok3 (same as t22)."""
    d = _docs_wide(spark, sf_dir)
    toks = _tok3(d)
    tc = toks.groupBy("term").agg(F.count(F.lit(1)).alias("n_term"))
    # 1-row aggregate: broadcast is bounded by construction
    total = tc.agg(F.sum("n_term").alias("n_total"))
    lnp_nano = F.round(
        F.log(F.col("n_term") / F.col("n_total")) * F.lit(1e9)
    ).cast("long")
    term_scores = tc.crossJoin(F.broadcast(total)).select(
        "term", lnp_nano.alias("lnp_nano")
    )
    return (
        toks.join(term_scores, "term")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("lnp_nano").alias("s_nano"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.round(
                -F.col("s_nano") / (F.col("n_tokens") * F.lit(1e9)), 6
            ).alias("nll"),
        )
    )


def t40_bigram_nll_quality(spark, sf_dir):
    """Bigram language-model negative-log-likelihood per document — t23's
    quality proxy upgraded one Markov order (the KenLM-style filter real
    curation stacks run after the unigram pass; word-salad text with
    plausible unigrams but implausible TRANSITIONS scores high here).
    p(w₂|w₁) = count(w₁w₂) / count(w₁·) is exact integer corpus counts
    over ordered adjacent token pairs (the same ≥3-letter tokens as
    t22/t23, paired AFTER filtering); per-bigram ln p is fixed-pointed to
    nano units and summed as bigint so the score is bit-identical across
    partition merge orders, with the single float division once per doc.
    Docs with <2 kept tokens have no bigrams and drop out (documented).
    Scale: two hash-aggregates on bigram/prefix string keys + one
    fact-to-dim join — the dims are vocabulary-sized, AQE decides the
    strategy (no forced broadcast: bigram vocabulary is unbounded)."""
    d = _docs_wide(spark, sf_dir)
    a = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z]+"), lambda w: F.length(w) >= 3
    )
    # token array STAGED as a column (the winnow_fingerprint_rows rule):
    # embedded in the transform lambda, the split+filter chain re-ran per
    # bigram per element_at reference — quadratic in document length
    da = d.select("doc_id", a.alias("_a"))
    na = F.size(F.col("_a"))
    bgs = (
        da.select(
            "doc_id",
            F.when(
                na >= 2,
                F.transform(
                    # sequence(1, n) is DESCENDING when n < 1 — the when()
                    # guard above keeps it strictly ascending here
                    F.sequence(F.lit(1), na - 1),
                    lambda i: F.concat(
                        F.element_at(F.col("_a"), i),
                        F.lit(" "),
                        F.element_at(F.col("_a"), i + 1),
                    ),
                ),
            )
            .otherwise(F.array().cast("array<string>"))
            .alias("bg_arr"),
        )
        .select("doc_id", F.explode("bg_arr").alias("bg"))
    )
    bc = bgs.groupBy("bg").agg(F.count(F.lit(1)).alias("n_bg"))
    # NOTE (measured): folding the prefix totals into a window over bc
    # (one exchange by w1) was SLOWER than this aggregate + join — the
    # window's per-partition sort over the multi-million-row bigram dim
    # costs more than the hash-agg + AQE-broadcast join it replaced.
    pc = (
        bc.groupBy(F.substring_index("bg", " ", 1).alias("w1"))
        .agg(F.sum("n_bg").alias("n_prefix"))
    )
    lnp_nano = F.round(
        F.log(F.col("n_bg") / F.col("n_prefix")) * F.lit(1e9)
    ).cast("long")
    ts = bc.join(
        pc, F.substring_index(bc["bg"], " ", 1) == pc["w1"]
    ).select("bg", lnp_nano.alias("lnp_nano"))
    return (
        bgs.join(ts, "bg")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("lnp_nano").alias("s_nano"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            F.round(
                -F.col("s_nano") / (F.col("n_bigrams") * F.lit(1e9)), 6
            ).alias("nll"),
        )
    )


def v11_event_transition_matrix(spark, sf_dir):
    """Per-user event-type transition counts (the empirical Markov
    matrix behind session-flow analytics): lag the type over each user's
    ts-ordered stream, count (prev_type, next_type) pairs. One window
    (partitioned by user — thousands of small partitions, no skew), one
    hash-agg; event_id breaks ts ties deterministically."""
    _utc(spark)
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy(
            F.col("prev_type").alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


def v29_transition_entropy(spark, sf_dir):
    """Per-state conditional next-event entropy H(next | cur) of the
    empirical Markov chain — the "how predictable is behavior from this
    state" read completing the v11 (transition counts) / v22 (stationary
    mass) family: a near-zero H state is scripted/bot-like, a high-H
    state is exploratory. Exactness is the t23/t45 nano-ln rule applied
    to the entropy decomposition H_i = Σ_j (c_ij/c_i)·ln(c_i/c_ij): each
    ln of an exact integer count is nano-rounded to a bigint BEFORE the
    c_ij multiply (so partial-agg merge order cannot move a bit), every
    term is ≥ 0 because round is monotone and c_i ≥ c_ij, the per-state
    sum is an exact bigint and ``h_nano = sum div c_i`` is one
    non-negative floor division. Transitions come from the SAME
    v11_event_transition_matrix frame (ONE Spark definition) and the
    oracle nests the SAME _TRANSITIONS_SQL literal (v22's pattern), so
    chain, stationary mass and entropy cannot drift apart. Scale: v11's
    one window + hash-agg, then everything on the #types² reduced frame.
    Overflow: c_ij·Δln_nano binds near c_ij ≈ 3·10⁸ per cell (the t42
    bound) — rescale to micro units beyond."""
    t = v11_event_transition_matrix(spark, sf_dir)
    tot = t.groupBy("from_type").agg(
        F.sum("n_transitions").cast("long").alias("n_out"),
        F.count(F.lit(1)).cast("long").alias("n_next_types"),
    )
    ln_nano = lambda c: F.round(  # noqa: E731 — the t42 nano-ln idiom
        F.log(c.cast("double")) * F.lit(1e9)
    ).cast("long")
    j = t.join(tot, "from_type")
    term = F.col("n_transitions").cast("long") * (
        ln_nano(F.col("n_out")) - ln_nano(F.col("n_transitions"))
    )
    agg = j.groupBy("from_type").agg(
        F.max("n_out").alias("n_out"),
        F.max("n_next_types").alias("n_next_types"),
        F.sum(term).cast("long").alias("sum_term_nano"),
    )
    return agg.select(
        "from_type",
        "n_out",
        "n_next_types",
        "sum_term_nano",
        F.expr("sum_term_nano div n_out").cast("long").alias("h_nano"),
    )


def v30_gap_histogram(spark, sf_dir):
    """Per-event-type log₂-bucketed inter-event gap histogram
    (operators/sessions.py::gap_histogram) — the full marginal behind
    the cadence scalars (v12 moments, v28 dispersion): bucket 0 =
    sub-second, bucket b = gaps in [2^(b−1), 2^b) seconds via the exact
    ``length(bin(gap_s))`` bit-length (no float log2 touches data — the
    v26 rule); counts/extrema exact bigints off the SAME _typed_gaps
    frame as v28 (ONE definition both sides, _GAPS_SQL in the oracle),
    per-type floor-ppm shares on the bounded histogram frame."""
    _utc(spark)
    from research_knowledge_graph_spark.operators.sessions import (
        gap_histogram,
    )

    ev = _t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    return gap_histogram(ev)


def v31_hour_of_day_profile(spark, sf_dir):
    """Per-event-type hour-of-day volume profile on the COMPLETE 24-hour
    spine — the raw diurnal SHAPE behind v27's lag-24 autocorrelation
    scalar (v27 says "does it repeat daily", this shows WHERE the mass
    sits: human traffic humps in local waking hours, bot/replay streams
    run flat, a cron job is one spike). Hour-of-day is exact integer
    arithmetic on epoch microseconds — ``(unix_micros div 3600·10⁶)
    mod 24`` / DuckDB ``(epoch_us // ...) % 24`` — valid because the
    testdata epoch is positive (both engines truncate toward zero, so
    the idiom is documented positive-epoch-only); missing hours are
    REAL ZEROS via the spine (the v26/v27 rule — a flatness read that
    silently skips empty hours overstates flatness), and the share
    denominator is each type's total, so share_ppm sums to ≤10⁶ per
    type by floor division.

    Scale: one map-side-combinable (type, hour) hash-agg over the
    stream; everything downstream — spine, totals, division — runs on
    the ≤ #types×24 frame, bounded by the schema, never event volume."""
    _utc(spark)
    ev = _t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    hourly = ev.groupBy(
        "event_type",
        F.expr("(unix_micros(cast(ts as timestamp)) div 3600000000) % 24")
        .cast("long")
        .alias("hour"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    spine = (
        hourly.select("event_type")
        .distinct()
        .select(
            "event_type",
            F.explode(F.sequence(F.lit(0), F.lit(23))).alias("hour"),
        )
        # generators must be top-level in a projection — cast in a second one
        .select("event_type", F.col("hour").cast("long").alias("hour"))
    )
    full = spine.join(hourly, ["event_type", "hour"], "left").select(
        "event_type", "hour", F.coalesce("n", F.lit(0)).cast("long").alias("n")
    )
    totals = full.groupBy("event_type").agg(
        F.sum("n").cast("long").alias("n_type")
    )
    return full.join(totals, "event_type").select(
        "event_type",
        "hour",
        "n",
        F.expr("(n * 1000000) div n_type").cast("long").alias("share_ppm"),
    )


def t25_ngram_novelty(spark, sf_dir):
    """Per-document cross-doc duplication exposure
    (operators/curation.py::ngram_novelty): distinct 8-grams per doc, how
    many appear in ≥2 distinct docs, shared fraction in exact ppm
    (integer floor division — no floats). The per-doc decontamination
    audit; t24 mines the shared passages, this scores each document's
    derivativeness. DF counting is the two-phase salted countDistinct;
    the gram-keyed DF attach is AQE-skew-join-defended (never
    broadcast — the dim is the gram vocabulary)."""
    from research_knowledge_graph_spark.operators.curation import ngram_novelty

    return ngram_novelty(_docs_wide(spark, sf_dir), k=8)


def t26_repetition_signals(spark, sf_dir):
    """Per-document internal-repetition quality signals
    (operators/curation.py::repetition_signals): Gopher-rules family —
    top-word ppm, duplicate-2-gram ppm, max 2-gram repeat — all exact
    integers via the floor-ppm fixed-point pattern. t25 measures
    CROSS-doc duplication; this measures WITHIN-doc repetition (the
    machine-generated/boilerplate axis). Both histograms are keyed by
    (doc_id, token) composites — per-doc keys, no hot key by
    construction."""
    from research_knowledge_graph_spark.operators.curation import (
        repetition_signals,
    )

    return repetition_signals(_docs_wide(spark, sf_dir))


def t27_decontaminate(spark, sf_dir):
    """Benchmark decontamination audit
    (operators/curation.py::decontaminate): corpus docs (doc_id % 10 != 0)
    flagged for sharing any word 8-gram with the held-out benchmark split
    (doc_id % 10 == 0) — the GPT-3-appendix-C n-gram-collision scrub as a
    gram-keyed LEFT join (no broadcast hint: AQE broadcasts the benchmark
    gram set when it is actually small; AQE skew-join splits stop-gram
    posting rows). Every corpus row present in the output (audit
    semantics), n_grams/n_hit_grams exact bigints."""
    from research_knowledge_graph_spark.operators.curation import decontaminate

    docs = _docs_wide(spark, sf_dir)
    out = decontaminate(
        docs.filter(F.col("doc_id") % 10 != 0),
        docs.filter(F.col("doc_id") % 10 == 0),
        k=8,
    )
    # driver hash-compares values: publish the flag as 0/1 bigint (bool
    # repr is the one engine-divergent scalar class in the gate)
    return out.withColumn("contaminated", F.col("contaminated").cast("long"))


def v24_activity_tail_index(spark, sf_dir):
    """Hill tail-index estimate of the per-user activity distribution,
    per event type — THE number that says whether a key distribution is
    heavy-tailed enough to need the degree-aware salting this repo
    applies (α ≤ 2: infinite-variance tail, hot keys dominate and salting
    is mandatory; α ≫ 3: light tail, plain hash partitioning is fine).
    The quantitative companion to v17's Gini read, feeding the same
    functions/salt.py thresholds. ``α̂ = 1 + n / Σ ln(x_i / x_min)`` over
    per-user event counts x_i ≥ x_min (the Hill/Clauset MLE for a
    discrete power-law tail, x_min = 2 by convention here: count-1 users
    carry no tail information). Each ln term is fixed-pointed to nano
    bigints (the t23 rule: exact under any merge order); the one float
    division per type happens at the end. Types where every tail count
    equals x_min (Σ = 0, α undefined) DROP out — the v12 baseline-less
    rule, matching the oracle's WHERE.

    Scale: one map-side-combinable (type, user) count, a map-only ln
    projection, one bounded-key (#types) hash-agg — no joins, no
    windows."""
    ev = _t(spark, sf_dir, "events")
    x_min = 2
    per = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    tail = per.filter(F.col("cnt") >= x_min)
    ln_nano = F.round(
        F.log(F.col("cnt").cast("double") / F.lit(float(x_min))) * F.lit(1e9)
    ).cast("long")
    agg = tail.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_tail"),
        F.sum(ln_nano).cast("long").alias("sum_ln_nano"),
    )
    return agg.filter(F.col("sum_ln_nano") > 0).select(
        "event_type",
        "n_tail",
        "sum_ln_nano",
        F.round(
            F.lit(1.0) + F.col("n_tail") * F.lit(1e9) / F.col("sum_ln_nano"), 6
        ).alias("alpha"),
    )


def v12_interarrival_stats(spark, sf_dir):
    """Per-user inter-event gap statistics
    (operators/sessions.py::interarrival_stats): exact integer
    microsecond gaps via one lag window (same single-shuffle shape as
    v03), min/max/count exact bigints, mean published as sum div count
    (floor) — the event-cadence profile behind bot/rate-limit
    curation."""
    _utc(spark)
    from research_knowledge_graph_spark.operators.sessions import (
        interarrival_stats,
    )

    return interarrival_stats(_t(spark, sf_dir, "events"))


def g28_degree_assortativity(spark, sf_dir):
    """Degree assortativity of the co-usage graph — delegates to
    operators/graph_queries.py::degree_assortativity (six exact bigint
    sums → bit-stable Pearson corr; NULL on zero-variance degrees,
    matching the oracle's double/0.0 = NULL). Graph shared via
    _couse_pairs."""
    from research_knowledge_graph_spark.operators.graph_queries import (
        degree_assortativity,
    )

    return degree_assortativity(
        _couse_pairs(spark, sf_dir).select("node_a", "node_b")
    )


def v02_user_value_topk(spark, sf_dir):
    """Top-10 users by total event value."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(F.round(F.sum("value"), 2).alias("total_value"), F.count(F.lit(1)).alias("n_events"))
        .orderBy(F.desc("total_value"), F.asc("user_id"))
        .limit(10)
    )


def v03_sessionize(spark, sf_dir):
    """Gap-based sessionization (30-min) over the event log: one row per
    (user, session) with count/duration/value — pure window + hash-agg
    (operators/sessions.py)."""
    _utc(spark)
    from research_knowledge_graph_spark.operators.sessions import session_stats

    ev = _t(spark, sf_dir, "events")
    return session_stats(ev, gap_minutes=30).withColumn(
        "session_idx", F.col("session_idx").cast("int")
    )


def v20_session_duration(spark, sf_dir):
    """Session-duration histogram — v03's gap-sessionization rolled up by
    duration minute: the engagement-length profile read next to v19's
    tenure histogram (tenure = lifetime between first/last event; this =
    length of each continuous visit). The bucket division is
    non-negative integer ``div`` (trunc == floor cross-engine); counts
    and sums exact bigints. Oracle wraps the v03 session CTE verbatim in
    one more rollup (the e12-on-e10 composition pattern), so the two
    entries cannot drift on what a "session" is."""
    _utc(spark)
    from research_knowledge_graph_spark.operators.sessions import session_stats

    # value_col=None: skip the per-session sum(value) aggregate the
    # histogram never reads (the session definition is unchanged).
    s = session_stats(_t(spark, sf_dir, "events"), gap_minutes=30, value_col=None)
    return s.groupBy(
        F.expr("CAST(duration_sec div 60 AS BIGINT)").alias("duration_min")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum("n_events").cast("long").alias("n_events"),
        F.max("duration_sec").cast("long").alias("max_duration_sec"),
    )


def v04_asof_attribution(spark, sf_dir):
    """AS-OF join (operators/temporal.py): for each purchase event, the
    same user's latest click at or before it — classic last-touch
    attribution. One shuffle + one sort, zero joins (union-and-carry
    plan); oracle is DuckDB's native ASOF JOIN. Timestamps compare and
    emit at microsecond precision (engine-exact, no float epoch)."""
    _utc(spark)
    from research_knowledge_graph_spark.operators.temporal import asof_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("purchase_us"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("click_us"),
    )
    return asof_join(
        purchases, clicks, ["user_id"], "purchase_us", "click_us",
        ["click_id", "click_us"], prefix="",
    ).select("user_id", "purchase_id", "purchase_us", "click_id", "click_us")


def v05_range_join_errors(spark, sf_dir):
    """Banded RANGE join (operators/temporal.py): error events within ±10
    minutes of each purchase by the same user. Time-band equi-join (the
    inequality never reaches a θ-join); oracle is the plain BETWEEN
    join."""
    _utc(spark)
    from research_knowledge_graph_spark.operators.temporal import (
        range_join_banded,
    )

    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("ts")
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", F.col("event_id").alias("error_id"), F.col("ts").alias("err_ts")
    )
    out = range_join_banded(
        purchases, errors, ["user_id"], "ts", "err_ts", -600, 600
    )
    return out.select(
        "user_id", "purchase_id",
        F.col("r_error_id").alias("error_id"),
        (F.unix_micros(F.col("r_err_ts").cast("timestamp"))
         - F.unix_micros(F.col("ts").cast("timestamp"))).alias("delta_us"),
    )


def e10_nearest_centroid(spark, sf_dir):
    """Exact-integer k-means E-step / cluster-purity audit
    (operators/similarity.py::nearest_centroid_assign): per-label micro
    centroids, squared-L2 assignment, ties toward the smaller label.
    Oracle: identical micro-scaled arithmetic via list_transform +
    list_sum + row_number."""
    from research_knowledge_graph_spark.operators.similarity import (
        nearest_centroid_assign,
    )

    return nearest_centroid_assign(_t(spark, sf_dir, "embeddings"))


def e11_kmeans_update(spark, sf_dir):
    """Full Lloyd iteration in exact integer arithmetic
    (operators/similarity.py::kmeans_update_step): e10's E-step
    assignment followed by the M-step centroid recompute + per-(label,
    dim) integer shift vs the seed centroid — the convergence signal a
    k-means driver loops on. Oracle: e10's CTE cascade extended with the
    membership join and the second fixed-point rollup."""
    from research_knowledge_graph_spark.operators.similarity import (
        kmeans_update_step,
    )

    return kmeans_update_step(_t(spark, sf_dir, "embeddings"))


def t32_composition_rollup(spark, sf_dir):
    """Corpus composition report at every granularity in ONE pass:
    ``GROUP BY ROLLUP(source, lang)`` — per (source, lang), per source
    subtotal, and the grand total, computed through Catalyst's Expand +
    partial aggregation in a single shuffle instead of three scans
    unioned (the multi-granularity dashboard every mixture-weighting
    review starts from). Expand triples the map-side row stream, but
    partial hash-aggs collapse it before the exchange — at 10^12 docs
    that is one wide scan, not three. Level disambiguation is the
    GROUPING() bit (0 = real value, 1 = rolled up) published explicitly
    — rolled-up name columns are coalesced to '<all>' so no NULL reaches
    the order-insensitive row compare. All measures exact bigints."""
    d = _t(spark, sf_dir, "documents")
    agg = d.rollup("source", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
        F.grouping("source").cast("int").alias("src_rolled"),
        F.grouping("lang").cast("int").alias("lang_rolled"),
    )
    return agg.select(
        F.coalesce(F.col("source"), F.lit("<all>")).alias("source"),
        F.coalesce(F.col("lang"), F.lit("<all>")).alias("lang"),
        "n_docs",
        "sum_chars",
        "src_rolled",
        "lang_rolled",
    )


def t29_snapshot_diff(spark, sf_dir):
    """Corpus snapshot diff (operators/curation.py::snapshot_diff): status
    of every doc between the documents table and a deterministically
    mutated v2 of it (doc_id%10==0 removed, %7==0 changed, %13==0 cloned
    as adds at doc_id+10^6) — the dataset-versioning audit. The mutation
    is expressed identically in the oracle; the diff itself is one
    full-outer join on (key, portable fingerprint)."""
    from research_knowledge_graph_spark.operators.curation import snapshot_diff

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    base = d.filter(F.col("doc_id") % 10 != 0).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" v2"))
        ).otherwise(F.col("text")).alias("text"),
    )
    added = d.filter(F.col("doc_id") % 13 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.lit("added "), F.col("text")).alias("text"),
    )
    return snapshot_diff(d, base.unionByName(added))


def t30_vocab_overlap(spark, sf_dir):
    """Cross-source vocabulary Jaccard
    (operators/curation.py::vocab_overlap): distinct (source, token)
    inventory → token-keyed self-join (per-key fanout ≤ #sources) → pair
    rollup, Jaccard in exact floor ppm (non-negative fixed-point div —
    trunc == floor cross-engine). The register/topic-redundancy
    diagnostic complementing t28's doc-level duplication matrix."""
    from research_knowledge_graph_spark.operators.curation import vocab_overlap

    return vocab_overlap(_t(spark, sf_dir, "documents"))


def t33_length_quality_corr(spark, sf_dir):
    """Per-source length↔quality Pearson correlation
    (operators/curation.py::length_quality_correlation): alpha-ratio
    floored to integer milli, six exact bigint sums per source (g28's
    assortativity pattern lifted to curation), ONE float formula per
    source row. The "does the quality score just proxy length?" audit
    run before stacking both filters on a training mixture.
    Zero-variance/singleton sources are dropped by an exact integer
    predicate (the v12 no-baseline rule — no NULL measures
    published)."""
    from research_knowledge_graph_spark.operators.curation import (
        length_quality_correlation,
    )

    return length_quality_correlation(_docs_wide(spark, sf_dir))


def e12_label_confusion(spark, sf_dir):
    """Label-purity confusion matrix over the k-means E-step
    (operators/similarity.py::nearest_centroid_assign): counts of
    (own_label, assigned_label) pairs plus each cell's share of its
    own-label row in exact floor ppm — WHICH labels bleed into which,
    the aggregate read of e10's per-vector audit. Scale: one
    map-side-combinable hash-agg over the E-step output to ≤ #labels²
    rows; the row-total window and the fixed-point division run on that
    TRUE-bounded frame. Oracle: e10's assignment cascade extended with
    the same GROUP BY + window."""
    from research_knowledge_graph_spark.operators.similarity import (
        nearest_centroid_assign,
    )

    assigned = nearest_centroid_assign(_t(spark, sf_dir, "embeddings"))
    conf = assigned.groupBy("own_label", "assigned_label").agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs")
    )
    w = Window.partitionBy("own_label")
    return (
        conf.withColumn("row_total", F.sum("n_vecs").over(w).cast("long"))
        .select(
            "own_label",
            "assigned_label",
            "n_vecs",
            "row_total",
            F.expr(
                "CAST(n_vecs * 1000000L div row_total AS BIGINT)"
            ).alias("share_ppm"),
        )
    )


def g33_reciprocity(spark, sf_dir):
    """Per-edge-type reciprocity over the full typed graph
    (operators/graph_queries.py::reciprocity): distinct non-loop directed
    edges vs how many have their reverse, in exact floor ppm. The audit
    for both-direction edge invariants (the reference writes SIMILAR_TO
    both ways — E4). Oracle: EXISTS twin over the same distinct edge
    set."""
    edges = TG.derive_edges(spark, sf_dir)
    return G.reciprocity(edges)


def t28_cross_source_dup_matrix(spark, sf_dir):
    """Cross-source duplication matrix — which crawl sources mirror each
    other: MinHash-LSH near-dup candidate pairs (t07's machinery verbatim)
    rolled up to unordered (source_a, source_b) counts. The
    mixture-design diagnostic a web-scale curation run reads before
    weighting domains (a high off-diagonal cell = two feeds syndicating
    the same content; the diagonal = within-source duplication t10
    collapses). Scale: the doc→source attach is two equi-joins against
    the docs projection (high-cardinality uniform key); the rollup keys
    on source pairs — map-side combinable, #sources² max. Oracle: the
    identical pair CTE + least/greatest canonicalization."""
    d = _docs_wide(spark, sf_dir)
    sigs = D.minhash_signatures(d, "doc_id", "text", k=8, shingle_k=4)
    pairs = D.lsh_candidate_pairs(sigs, bands=4, rows_per_band=2)
    src = d.select("doc_id", "source")
    j = (
        pairs.join(
            src.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("src_a")),
            "doc_a",
        ).join(
            src.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("src_b")),
            "doc_b",
        )
    )
    return (
        j.select(
            F.least("src_a", "src_b").alias("source_a"),
            F.greatest("src_a", "src_b").alias("source_b"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    )


def v14_user_type_entropy(spark, sf_dir):
    """Per-user Shannon entropy of the event-type distribution — the
    behavioral-diversity signal abuse/curation pipelines threshold (a bot
    hammering one endpoint scores ~0; an organic user scores near
    ln(#types)). t23's fixed-point pattern: the ONE float op per
    (user, type) is ln(c/n) rounded to integer nanos; Σ c·lnp_nano is an
    exact bigint (order-independent — a double sum would drift with merge
    order), and entropy = -s/(n·10⁹) divides once at the end. int64
    bound: n·|ln p_min|·10⁹ < 2^63 holds below ~4×10⁸ events per user
    (documented; beyond that drop to micro scaling). One (user, type)
    hash-agg + one user-keyed rollup — both map-side combinable, no
    skew term beyond the per-user key itself."""
    ev = _t(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("c"))
    tot = c.groupBy("user_id").agg(F.sum("c").alias("n"))
    lnp_nano = F.round(F.log(F.col("c") / F.col("n")) * F.lit(1e9)).cast("long")
    return (
        c.join(tot, "user_id")
        .select("user_id", "c", "n", (F.col("c") * lnp_nano).alias("t_nano"))
        .groupBy("user_id")
        .agg(
            F.max("n").cast("long").alias("n_events"),
            F.count(F.lit(1)).cast("long").alias("n_types"),
            F.round(
                -F.sum("t_nano") / (F.max("n") * F.lit(1e9)), 6
            ).alias("entropy"),
        )
    )


def v15_event_type_pmi(spark, sf_dir):
    """Pointwise mutual information between event types co-occurring in
    the same (user, day) block — the association-mining signal behind
    "users who do A also do B" analytics. Exactness: all counts are
    exact bigints; the ONE float op is ln(num/den) where num = c_ab·n
    and den = c_a·c_b are exact integer products (so the double argument
    is the same IEEE value in both engines — the t23/v14 discipline),
    scaled to nano fixed point. int64 bound on the products documented:
    safe while c_ab·n < 2^63 (~10⁹ blocks × 10⁹ pair count needs the
    micro downscale). Shape: one distinct on (user, day, type), a
    within-block self-join (≤ |types|² rows per block — bounded), and
    #types²-sized aggregates."""
    _utc(spark)
    ev = _t(spark, sf_dir, "events")
    b = ev.select(
        "user_id",
        F.to_date(F.col("ts").cast("timestamp")).alias("day"),
        "event_type",
    ).distinct()
    ct = b.groupBy("event_type").agg(F.count(F.lit(1)).cast("long").alias("c"))
    n1 = b.select("user_id", "day").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    x, y = b.alias("x"), b.alias("y")
    pairs = (
        x.join(y, ["user_id", "day"])
        .filter(F.col("x.event_type") < F.col("y.event_type"))
        .groupBy(
            F.col("x.event_type").alias("type_a"),
            F.col("y.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("c_ab"))
    )
    # ct (#types rows) and n1 (1 row) are bounded dims by construction
    j = (
        pairs.join(F.broadcast(ct.select(F.col("event_type").alias("type_a"), F.col("c").alias("c_a"))), "type_a")
        .join(F.broadcast(ct.select(F.col("event_type").alias("type_b"), F.col("c").alias("c_b"))), "type_b")
        .crossJoin(F.broadcast(n1))
    )
    pmi_nano = F.round(
        F.log((F.col("c_ab") * F.col("n")) / (F.col("c_a") * F.col("c_b")))
        * F.lit(1e9)
    ).cast("long")
    return j.select("type_a", "type_b", "c_ab", pmi_nano.alias("pmi_nano"))


def g34_degree_histogram(spark, sf_dir):
    """Degree-distribution histogram of the undirected typed graph — the
    one-glance skew profile (how heavy is the head?) a graph pipeline
    reads before choosing salting thresholds. Two exact hash-aggs:
    per-node degree over the deduped undirected edge set (g11's frame,
    via the ONE shared degree definition in
    operators/graph_queries.py::undirected_degree — same frame g35 and
    g28 consume), then nodes per degree value. Output is at most
    #distinct-degrees rows."""
    from research_knowledge_graph_spark.operators.graph_queries import (
        undirected_degree,
    )

    edges = TG.derive_edges(spark, sf_dir)
    deg = undirected_degree(
        edges.select(
            F.col("from_node_id").alias("node_a"),
            F.col("to_node_id").alias("node_b"),
        )
    )
    return deg.groupBy("degree").agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes")
    )


def v16_daily_type_trend(spark, sf_dir):
    """Day-over-day event-volume trend per event type — the burst /
    anomaly read taken before re-weighting a source mixture (a type
    whose volume jumps 10× overnight is a crawler change or an abuse
    wave, not organic signal). One map-side-combinable hash-agg reduces
    the raw log to ≤ #types × #days rows, THEN a lag window per type
    computes the exact integer day-over-day delta and the relative
    change in floor ppm. Exactness: change_ppm is computed as
    ``(n·10⁶) div prev − 10⁶`` — the dividend is NON-NEGATIVE, so Spark
    ``div`` (truncation) == DuckDB ``//`` (floor) even though the
    change itself can be negative (the g30/t23 fixed-point rule,
    extended to signed results by keeping the division unsigned). First
    day per type is dropped (no baseline ⇒ trend undefined — the v12
    lag-row rule, which also keeps every published column
    NULL-free). NULL-ts rows are dropped up front: a NULL day would
    otherwise sort NULLS FIRST in Spark's window but NULLS LAST in
    DuckDB's, pairing lag() against different rows — the one
    cross-engine ordering divergence this query would otherwise
    have (the generator never emits NULL ts; the filter defends the
    contract anyway). Scale: the window
    runs over the already-reduced per-(type, day) frame — bounded by
    calendar days × type cardinality, never by corpus size."""
    _utc(spark)
    ev = _t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    daily = ev.groupBy(
        F.col("event_type"), F.to_date(F.col("ts")).alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.withColumn("prev_n", F.lag("n_events").over(w)).filter(
        F.col("prev_n").isNotNull()
    )
    return lagged.select(
        "event_type",
        F.date_format(F.col("day"), "yyyy-MM-dd").alias("day"),
        "n_events",
        "prev_n",
    ).select(
        "event_type",
        "day",
        "n_events",
        (F.col("n_events") - F.col("prev_n")).cast("long").alias("delta"),
        F.expr(
            "CAST(n_events * 1000000L div prev_n - 1000000 AS BIGINT)"
        ).alias("change_ppm"),
    )


def v17_user_concentration(spark, sf_dir):
    """Event-volume concentration per event type — exact Gini terms plus
    the top-decile share: "what fraction of this type's volume comes
    from its heaviest users?" — the skew audit that directly feeds the
    repo's salting thresholds (a type whose top decile carries most of
    the volume is exactly the hot-key distribution degree-aware salting
    exists for; see functions/salt.py).

    Per type: users ranked ASC by exact count (user_id tie-break — a
    total order, so ranks are cross-engine identical), then
    ``gini = 2·Σi·cnt / (n·total) − (n+1)/n`` with Σi·cnt / n / total
    all exact bigints and the float formula run ONCE per type row
    (rounded 9 — identical doubles from identical integers). The top
    decile is the ``ceil(n/10) = (n+9) div 10`` highest ranks, its
    share in exact floor ppm (non-negative division — trunc == floor
    cross-engine). Σi·cnt is int64-safe while #users·max_cnt·#users
    stays below 2⁶³ (~10⁹ users × 10⁴ events each); beyond that, scale
    counts down before ranking.

    Scale: the per-(type, user) pre-agg is map-side combinable; the
    rank-within-type window is the one non-combinable step, bounded by
    #users per type on a single partition — at extreme per-type user
    cardinality replace it with a two-pass histogram rank
    (count-by-cnt-value prefix sums), same exact result."""
    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    w = Window.partitionBy("event_type").orderBy("cnt", "user_id")
    wn = Window.partitionBy("event_type")
    ranked = per_user.withColumn(
        "i", F.row_number().over(w).cast("long")
    ).withColumn("n", F.count(F.lit(1)).over(wn).cast("long"))
    top = F.col("i") > F.col("n") - F.expr("(n + 9L) div 10")
    agg = ranked.groupBy("event_type").agg(
        F.max("n").alias("n_users"),
        F.sum("cnt").cast("long").alias("total_events"),
        F.sum(F.col("i") * F.col("cnt")).cast("long").alias("sum_i_cnt"),
        F.sum(F.when(top, F.col("cnt")).otherwise(F.lit(0)))
        .cast("long")
        .alias("top_events"),
    )
    return agg.select(
        "event_type",
        "n_users",
        "total_events",
        "sum_i_cnt",
        F.expr(
            "CAST(top_events * 1000000L div total_events AS BIGINT)"
        ).alias("top_decile_share_ppm"),
        F.expr(
            "round(CAST(2 * sum_i_cnt AS DOUBLE)"
            " / (CAST(n_users AS DOUBLE) * CAST(total_events AS DOUBLE))"
            " - (CAST(n_users AS DOUBLE) + 1.0) / CAST(n_users AS DOUBLE), 9)"
        ).alias("gini"),
    )


def e14_norm_profile(spark, sf_dir):
    """Embedding-norm profile — squared L2 norms in exact micro² fixed
    point, histogrammed by fixed-width bucket (10¹¹ micro² ≈ 0.1 in
    norm² units): the degenerate-vector audit run before any cosine
    machinery (zero vectors make cosine undefined; runaway norms mean a
    broken encoder or double-scaling upstream — both land in telltale
    buckets). Exactness: e10's micro scaling, squares summed as bigints
    (int64-safe to ~2⁴¹ micro per component · 10³ dims), bucket by
    non-negative floor division. Scale: pure map-side column math into a
    bounded-bucket hash-agg — one pass, no shuffle beyond the tiny
    histogram key."""
    em = _t(spark, sf_dir, "embeddings")
    v = F.transform(
        F.col("embedding"),
        lambda x: F.round(x.cast("double") * F.lit(1e6)).cast("long"),
    )
    n2 = F.aggregate(v, F.lit(0).cast("long"), lambda acc, x: acc + x * x)
    return (
        em.select(n2.alias("norm2"))
        .select(
            F.expr("CAST(norm2 div 100000000000L AS BIGINT)").alias("bucket"),
            "norm2",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.min("norm2").cast("long").alias("min_norm2"),
            F.max("norm2").cast("long").alias("max_norm2"),
        )
    )


def e15_embed_fingerprint(spark, sf_dir):
    """Hashing-trick embedding arithmetic pinned by a FULL oracle: e04's
    pandas-UDF embedder with ``normalize=False`` keeps the raw signed
    token counts (exact small integers, float32-representable), and each
    doc projects three exact-bigint fingerprints — nnz (occupied
    buckets), Σv² (raw squared norm), Σv (signed mass). DuckDB recomputes
    all three from scratch with its own md5(): token → little-endian
    first-4-bytes mod 32 bucket, 5th-byte-low-bit sign — so the oracle
    pins the ENTIRE hashing trick (tokenization, digest slicing, bucket
    math, sign), the part of e04 that rows-only checking never touched.
    e04 itself stays rows-only: its L2 normalize adds one sqrt+divide
    whose float32 rounding is not hash-comparable cross-engine."""
    from research_knowledge_graph_spark.operators.qa import embed_docs

    d = _docs_wide(spark, sf_dir)
    out = embed_docs(d, dim=32, normalize=False)
    v = F.col("embedding")
    zero = F.lit(0).cast("long")
    return out.select(
        "doc_id",
        F.aggregate(
            v, zero, lambda a, x: a + F.when(x != 0, 1).otherwise(0).cast("long")
        ).alias("nnz"),
        # cast BEFORE multiplying: float32*float32 rounds past 2^24-ish
        # products (net bucket count > 4096), long*long stays exact
        F.aggregate(
            v, zero, lambda a, x: a + x.cast("long") * x.cast("long")
        ).alias("sq_norm_raw"),
        F.aggregate(v, zero, lambda a, x: a + x.cast("long")).alias("comp_sum"),
    )


def v19_user_tenure(spark, sf_dir):
    """User-tenure histogram — days between each user's first and last
    event, rolled up by tenure value: the lifecycle/churn profile read
    next to v08's retention curve (retention asks "did day-1 users come
    back?"; this asks "how long do users stay at all?"). Exact integer
    day arithmetic (both engines count whole days between DATEs); NULL
    ts dropped up front (the v16 rule). Scale: one map-side-combinable
    min/max reduce to #users rows, then a bounded-key histogram — no
    joins, no windows."""
    _utc(spark)
    ev = _t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    per = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("first_day"),
        F.max(F.to_date("ts")).alias("last_day"),
    )
    return (
        per.select(
            F.datediff("last_day", "first_day").cast("long").alias("tenure_days")
        )
        .groupBy("tenure_days")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )


def t35_minhash_fidelity(spark, sf_dir):
    """Sketch-fidelity audit: per MinHash-LSH candidate pair (t07's
    cascade verbatim), the signature-agreement Jaccard ESTIMATE next to
    the exact shingle Jaccard, both in exact floor ppm — the engine
    auditing its own approximation (is k=8 enough at this corpus's
    similarity profile, or are candidates surviving on hash luck?).
    sig_agree is an exact integer (bigint equality per position), so
    everything hash-compares; the exact side reuses the t05 shingle-set
    arithmetic. Scale: the signature attach is two equi-joins on the
    uniform doc key; the shingle sets ride along only for CANDIDATE
    pairs (LSH-selective), never all pairs."""
    d = _docs_wide(spark, sf_dir)
    sigs = D.minhash_signatures(d, "doc_id", "text", k=8, shingle_k=4)
    pairs = D.lsh_candidate_pairs(sigs, bands=4, rows_per_band=2)
    from research_knowledge_graph_spark.functions.textops import shingle_rows

    # staged shingles (char_shingles_lowered_col rationale): the inline
    # form re-lowercased the document once per shingle inside the lambda
    sh = shingle_rows(d, "doc_id", "text", 4, out="sh")
    j = (
        pairs.join(
            sigs.select(F.col("doc_id").alias("doc_a"), F.col("signature").alias("sig_a")),
            "doc_a",
        )
        .join(
            sigs.select(F.col("doc_id").alias("doc_b"), F.col("signature").alias("sig_b")),
            "doc_b",
        )
        .join(sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a")), "doc_a")
        .join(sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b")), "doc_b")
    )
    agree = F.aggregate(
        F.zip_with(
            "sig_a",
            "sig_b",
            lambda x, y: F.when(x == y, F.lit(1)).otherwise(F.lit(0)),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("long")
    union = (
        F.size("sh_a") + F.size("sh_b")
        - F.size(F.array_intersect("sh_a", "sh_b"))
    ).cast("long")
    return (
        j.select(
            "doc_a",
            "doc_b",
            agree.alias("sig_agree"),
            inter.alias("n_inter"),
            union.alias("n_union"),
        )
        .filter(F.col("n_union") > 0)
        .select(
            "doc_a",
            "doc_b",
            "sig_agree",
            F.expr("CAST(sig_agree * 1000000L div 8 AS BIGINT)").alias("est_ppm"),
            "n_inter",
            F.expr("CAST(n_inter * 1000000L div n_union AS BIGINT)").alias(
                "exact_ppm"
            ),
        )
    )


def t39_containment_audit(spark, sf_dir):
    """Subset-duplication audit: per MinHash-LSH candidate pair (t07's
    cascade verbatim — same k=8 / shingle_k=4 / 4-band blocks), the exact
    one-sided Jaccard |A∩B| / min(|A|,|B|) next to the symmetric Jaccard,
    both in exact floor ppm. ``subset_like`` flags containment-high /
    Jaccard-low pairs — a short document embedded inside a longer one
    (quote, boilerplate wrapper, syndicated excerpt) that symmetric-Jaccard
    dedup structurally misses because Jaccard ≈ |A|/|B| shrinks with the
    length ratio while containment stays ≈ 1. The standard corpus-curation
    companion to t05/t35. Scale: exact shingle-set work rides only on the
    LSH-selective candidate pairs; the two shingle attaches are equi-joins
    on the uniform doc key — never all pairs."""
    d = _docs_wide(spark, sf_dir)
    sigs = D.minhash_signatures(d, "doc_id", "text", k=8, shingle_k=4)
    pairs = D.lsh_candidate_pairs(sigs, bands=4, rows_per_band=2)
    return D.containment_verify(d.select("doc_id", "text"), pairs, shingle_k=4)


def e17_srp_fidelity(spark, sf_dir):
    """SRP sketch-fidelity audit — t35's twin on the embedding side: per
    label-blocked vector pair (e02's candidate frame verbatim), the 16-plane
    sign-random-projection signature agreement next to the exact cosine.
    agree_bits = planes − popcount(sig_a ⊕ sig_b) is an exact integer (the
    signatures are the SAME portable-hash hyperplane construction e03/e05
    serve from, just wider), est_ppm its floor-ppm agreement fraction; by
    the SRP identity E[agree/planes] = 1 − θ/π the pair of columns lets the
    engine audit whether 16 planes resolve this corpus's angular profile —
    is the LSH family separating near-dups from the bulk, or surviving on
    hash luck? Scale: signatures are map-side per-vector expressions (one
    64-term literal dot product per plane); the exact cosine rides only on
    label-blocked candidate pairs, never all pairs."""
    planes = 16
    from research_knowledge_graph_spark.functions.vectors import cosine_col

    e = _t(spark, sf_dir, "embeddings")
    sig = e.select(
        "vec_id",
        "label",
        F.col("embedding").alias("v"),
        S.srp_bucket_col(F.col("embedding"), dim=64, planes=planes).alias("b"),
    )
    a = sig.select(
        F.col("vec_id").alias("doc_a"), "label",
        F.col("v").alias("va"), F.col("b").alias("ba"),
    )
    b = sig.select(
        F.col("vec_id").alias("doc_b"), "label",
        F.col("v").alias("vb"), F.col("b").alias("bb"),
    )
    agree = (
        F.lit(planes).cast("long")
        - F.bit_count(F.col("ba").bitwiseXOR(F.col("bb"))).cast("long")
    )
    return (
        a.join(b, "label")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            agree.alias("agree_bits"),
            F.round(cosine_col(F.col("va"), F.col("vb")), 6).alias("cosine"),
        )
        .withColumn(
            "est_ppm", F.expr(f"CAST(agree_bits * 1000000L div {planes} AS BIGINT)")
        )
    )


def e18_ann_recall_audit(spark, sf_dir):
    """In-engine ANN recall@10: per query, how many of the EXACT cosine
    top-10 (e01's frame verbatim) each approximate path returns — the
    single-bucket SRP-LSH (e03's config) and the Hamming-1 multi-probe
    variant (e05's) side by side, recall as an exact floor-ppm integer.
    This promotes the recall sweep BASELINE.md documents offline to a
    first-class oracle-gated query: the serving engine measuring its own
    index's recall, and the multi-probe lift, with no external harness.
    Scale: the audit frame is bounded (n_queries × k rows per method);
    the expensive sides are the underlying kNN plans themselves, unchanged."""
    ex = e01_knn_bruteforce(spark, sf_dir).select("query_id", "vec_id")
    parts = []
    for method, fn in (("lsh", e03_knn_lsh), ("multiprobe", e05_knn_lsh_multiprobe)):
        ap = fn(spark, sf_dir).select(
            F.col("query_id").alias("q2"), F.col("vec_id").alias("hit_id")
        )
        parts.append(
            ex.join(
                ap,
                (F.col("query_id") == F.col("q2"))
                & (F.col("vec_id") == F.col("hit_id")),
                "left",
            )
            .groupBy("query_id")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_exact"),
                F.count("hit_id").cast("long").alias("n_hit"),
            )
            .select(F.lit(method).alias("method"), "query_id", "n_exact", "n_hit")
        )
    return (
        parts[0]
        .unionByName(parts[1])
        .withColumn(
            "recall_ppm", F.expr("CAST(n_hit * 1000000L div n_exact AS BIGINT)")
        )
    )


def e20_hubness_audit(spark, sf_dir):
    """Label-blocked hubness audit (operators/similarity.py::
    hubness_audit): per vector, inbound degree in other vectors' EXACT
    k=5 nearest lists within its label block — the Radovanović
    high-dimensional pathology read that decides whether cosine top-k
    serving degrades on this corpus (hubs dominate result lists,
    anti-hubs go unreachable; e18 measures the index's recall, this
    measures the SPACE's retrievability skew). Distances are exact
    bigint squared-L2 over micro fixed-point components (the e16/e19
    rule) so ranks, inbound counts and the inbound/k ppm are all
    engine-exact integers. Pair volume O(Σ block²) — the e02/e17/e19
    blocked-family scale shape."""
    from research_knowledge_graph_spark.operators.similarity import (
        hubness_audit,
    )

    return hubness_audit(_t(spark, sf_dir, "embeddings"), k=5)


def e21_intrinsic_dimension(spark, sf_dir):
    """Per-block TwoNN intrinsic-dimension estimate (operators/
    similarity.py::intrinsic_dimension_twonn — Facco et al. 2017):
    ``d = n / Σ ln(r2/r1)`` over each point's exact 1st/2nd nearest
    neighbors inside its label block. The CAUSE read behind e20's
    hubness symptom — retrieval pathology and quantization/LSH quality
    scale with the intrinsic dimension, not the ambient dim. Distances
    are exact bigint squared-L2 over micro fixed-point components (the
    e16/e19/e20 rule) so the rank-2 neighbor order is engine-exact;
    ``ln μ`` is carried as the nano-bigint difference
    ``round(ln d2₂·1e9) − round(ln d2₁·1e9)`` (the t23/v24 rule, the ½
    from r² folded into the final 2e9 factor), and the ONE double
    expression is the published estimate. Exact-integer drops:
    duplicate-NN points (d2₁ = 0), no-2nd-neighbor points, Σ = 0
    blocks (the v12 baseline-less rule). Pair volume O(Σ block²) —
    the blocked-family scale shape, block = LSH/IVF bucket at 100 TB."""
    from research_knowledge_graph_spark.operators.similarity import (
        intrinsic_dimension_twonn,
    )

    return intrinsic_dimension_twonn(_t(spark, sf_dir, "embeddings"))


def t53_charset_audit(spark, sf_dir):
    """Per-source character-class / encoding-health profile
    (operators/curation.py::charset_audit) — the mojibake read a
    Common-Crawl-scale corpus runs before any text op: non-zero U+FFFD
    or control-char shares mean broken transcoding upstream of every
    tokenizer and LSH shingle. Exact bigint counts via
    ``length − length(regexp_replace(class → ''))`` where every class is
    an explicit ASCII code-point range (the Java/RE2-identical regex
    subset; U+FFFD counted with literal non-regex replace), shares in
    floor ppm, zero-char sources dropped by the exact predicate. One
    map-side projection + one #sources-bounded hash-agg — no joins, no
    windows. Reference analog: the encoding hygiene implied by
    ``src/utils/pdf.py::load_text_from_file`` (the reference's PDF→text
    step), which the reference never audits."""
    from research_knowledge_graph_spark.operators.curation import (
        charset_audit,
    )

    return charset_audit(_docs_wide(spark, sf_dir))


def v23_rfm_segments(spark, sf_dir):
    """RFM (recency / frequency / monetary) user segmentation — the
    classic engagement-scoring grid every growth stack runs over an
    event log: per user, days since last event (vs the corpus's last
    active day, so the score is data-anchored and reproducible),
    lifetime event count, lifetime value in EXACT integer cents
    (per-event ``round(value·100)`` cast to bigint BEFORE the sum — a
    double sum would drift with partition merge order, the t23 rule),
    each mapped to its exact population quartile. Quartiles use the
    rank formula ``q = ((rank−1)·4) div n + 1`` over the TOTAL order
    (metric, user_id) — no ntile(), whose tie placement differs across
    engines; recency ranks r_days DESC so quartile 4 always reads "best"
    (most recent / most frequent / highest value) on all three axes.
    rfm_code packs the three digits (e.g. 444 = champion, 111 = churned
    one-timer). NULL ts dropped up front (the v16 rule).

    Scale: the per-user reduce is one map-side-combinable hash-agg; the
    three rank windows run on the REDUCED #users frame (the v17 rule) —
    at extreme user cardinality replace each with a two-pass histogram
    prefix-rank over the small-integer metric values (r_days and
    f_events are bounded; cents can bucket), same exact quartiles. The
    1-row anchor/count dims broadcast by construction."""
    _utc(spark)
    ev = _t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    per = ev.groupBy("user_id").agg(
        F.max(F.to_date("ts")).alias("last_day"),
        F.count(F.lit(1)).cast("long").alias("f_events"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("m_cents"),
    )
    anchor = per.agg(F.max("last_day").alias("corpus_last_day"))
    base = per.crossJoin(F.broadcast(anchor)).select(
        "user_id",
        F.datediff("corpus_last_day", "last_day").cast("long").alias("r_days"),
        "f_events",
        "m_cents",
    )
    nrow = base.agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    wr = Window.orderBy(F.desc("r_days"), F.asc("user_id"))
    wf = Window.orderBy(F.asc("f_events"), F.asc("user_id"))
    wm = Window.orderBy(F.asc("m_cents"), F.asc("user_id"))
    ranked = (
        base.withColumn("ri", F.row_number().over(wr).cast("long"))
        .withColumn("fi", F.row_number().over(wf).cast("long"))
        .withColumn("mi", F.row_number().over(wm).cast("long"))
        .crossJoin(F.broadcast(nrow))
    )
    return ranked.select(
        "user_id",
        "r_days",
        "f_events",
        "m_cents",
        F.expr("((ri - 1) * 4) div n_users + 1").cast("long").alias("r_q"),
        F.expr("((fi - 1) * 4) div n_users + 1").cast("long").alias("f_q"),
        F.expr("((mi - 1) * 4) div n_users + 1").cast("long").alias("m_q"),
        F.expr(
            "(((ri - 1) * 4) div n_users + 1) * 100"
            " + (((fi - 1) * 4) div n_users + 1) * 10"
            " + (((mi - 1) * 4) div n_users + 1)"
        )
        .cast("long")
        .alias("rfm_code"),
    )


def v22_markov_stationary(spark, sf_dir):
    """Stationary distribution of the per-user event-type Markov chain —
    where does the user process settle if it runs forever? Four exact
    bigint power-iteration rounds (operators/pagerank.py::
    markov_stationary_fixed_point) over v11's transition counts (the SAME
    frame, composed directly, so one definition of "transition"); every
    round is (π·n) div n_out floor arithmetic, so the result unrolls as a
    DuckDB CTE cascade and hash-compares exactly — the g38/g41 fixed-point
    playbook applied to a row-stochastic chain. Sink types drop mass
    (documented in the operator); the state space is schema-bounded, so
    the iteration is join work over ~|types|² rows — the corpus-sized scan
    happened once in v11's aggregation."""
    from research_knowledge_graph_spark.operators.pagerank import (
        markov_stationary_fixed_point,
    )

    return markov_stationary_fixed_point(
        v11_event_transition_matrix(spark, sf_dir), iters=4
    )


def g38_pagerank_exact(spark, sf_dir):
    """Exact fixed-point PageRank variant
    (operators/pagerank.py::pagerank_fixed_point) over FOLLOWS∪PLACED —
    g16's graph, but every round is non-negative bigint floor division,
    so 3 rounds unroll as a DuckDB CTE cascade and hash-compare exactly
    (the g29 HITS playbook applied to PageRank; g16's float power method
    keeps its numpy pin for the converged values)."""
    edges = TG.derive_edges(spark, sf_dir).filter(
        F.col("edge_type").isin("FOLLOWS", "PLACED")
    )
    from research_knowledge_graph_spark.operators.pagerank import (
        pagerank_fixed_point,
    )

    return pagerank_fixed_point(edges, iters=3)


def g41_ppr_exact(spark, sf_dir):
    """Exact fixed-point PERSONALIZED PageRank
    (operators/pagerank.py::pagerank_fixed_point with ``seeds``) from
    g24's customer seeds c1/c2 over FOLLOWS∪PLACED — the random-walk-
    with-restart "entities related to X" ranking, in the bigint floor-div
    arithmetic that unrolls as a DuckDB CTE cascade and hash-compares
    exactly. Gives the PPR family its first full oracle (g24's float
    power method keeps its numpy pin for the converged values, same
    split as g16/g38). Non-seed nodes with no inbound seed mass
    legitimately hold rank 0."""
    edges = TG.derive_edges(spark, sf_dir).filter(
        F.col("edge_type").isin("FOLLOWS", "PLACED")
    )
    from research_knowledge_graph_spark.operators.pagerank import (
        pagerank_fixed_point,
    )

    return pagerank_fixed_point(edges, iters=3, seeds=["c1", "c2"])


def g39_rich_club(spark, sf_dir):
    """Rich-club coefficient curve φ(k)
    (operators/graph_queries.py::rich_club) over g34's undirected typed
    graph — the "do the hubs wire to each other?" profile read next to
    the degree histogram (g34) and the k_nn(k) curve (g35) when sizing
    skew defenses: a rich club is exactly the regime where hot keys
    join OTHER hot keys, so hub–hub pairs survive degree-aware
    filtering. E_k/N_k are suffix sums of two bounded histograms (an
    edge counts toward every k < min of its endpoint degrees); the one
    division is non-negative fixed-point ppm (trunc == floor). The
    suffix-sum window runs on the ≤ #distinct-degrees union frame —
    bounded by max degree, never corpus size."""
    from research_knowledge_graph_spark.operators.graph_queries import rich_club

    edges = TG.derive_edges(spark, sf_dir)
    return rich_club(
        edges.select(
            F.col("from_node_id").alias("node_a"),
            F.col("to_node_id").alias("node_b"),
        )
    )


def g40_link_prediction(spark, sf_dir):
    """Multi-index link-prediction scoreboard (operators/graph_queries.py::
    link_prediction_scoreboard) over the order co-usage graph — common
    neighbors, Adamic–Adar (log-damped common neighbors: round(10⁹/ln deg)
    per shared neighbor, the v14 fixed-point-ln precedent, then exact
    bigint sums), and preferential attachment (deg_a·deg_b, the null
    model) side by side for each UNLINKED pair; g30's 1/deg weighting
    read against its log-damped and volume-baseline siblings. Adjacent
    pairs anti-joined out (prediction proper); top-100 on (aa_nano DESC,
    ids) is a total order. Same _wedge_pair_agg salted wedge as g06/g26/
    g30; endpoint degrees ride the postings as per-pair-constant mins so
    no post-agg join touches the pair frame."""
    pairs = _couse_pairs(spark, sf_dir)
    return G.link_prediction_scoreboard(
        pairs.select("node_a", "node_b"), min_shared=1, top_k=100
    )


def e19_silhouette(spark, sf_dir):
    """Per-label simplified silhouette
    (operators/similarity.py::silhouette_audit): the clustering-quality
    score — how much closer does each vector sit to its own label's
    prototype than to the nearest foreign one — in exact per-mille fixed
    point, with n_negative counting the misassignment candidates (the
    per-vector view of e12's confusion matrix, the per-label view of
    e13's centroid-separation read). Centroid-based simplified form, NOT
    the O(N²) all-pairs classic — the only silhouette that scales.
    Shares the e10 distance trunk on both sides (ONE definition of
    vector × centroid distance; the oracle composes the same
    _CENT_DIST_CTES literal)."""
    from research_knowledge_graph_spark.operators.similarity import (
        silhouette_audit,
    )

    return silhouette_audit(_t(spark, sf_dir, "embeddings"))


def e13_centroid_separation(spark, sf_dir):
    """Cluster-separation audit
    (operators/similarity.py::centroid_separation): each label's nearest
    FOREIGN centroid by exact micro² squared L2 — the "which prototypes
    sit on top of each other" read that explains e12's bleeding
    confusion cells. One corpus pass (the centroid hash-agg); the
    #labels² comparison runs on the TRUE-bounded centroid frame."""
    from research_knowledge_graph_spark.operators.similarity import (
        centroid_separation,
    )

    return centroid_separation(_t(spark, sf_dir, "embeddings"))


def v18_volume_anomalies(spark, sf_dir):
    """Daily event-volume anomaly days per type — the |z| ≥ 2 burst/outage
    detector over v16's per-(type, day) frame (v16 reads the derivative;
    this reads deviation from the type's own distribution). The anomaly
    decision is an EXACT INTEGER predicate: with nd days, sn = Σn and
    snn = Σn², the population z-score algebra cancels nd —
    ``z = (n·nd − sn) / sqrt(nd·snn − sn²)`` — so ``z² ≥ 4`` becomes
    ``(n·nd − sn)² ≥ 4·(nd·snn − sn²)``, pure bigint comparison, no
    float at the decision boundary (int64-safe while n·nd < ~3·10⁹ —
    daily volumes to ~10⁶ over years; pre-scale counts beyond). The
    published z is ONE double expression from the same exact integers,
    rounded 9. Zero-variance types are dropped by the same exact
    predicate (the v12 no-baseline rule). Scale: the per-type stats dim
    is #types rows (TRUE bounded, left to AQE); everything upstream is
    the map-side-combinable daily reduce."""
    _utc(spark)
    ev = _t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    daily = ev.groupBy(
        F.col("event_type"), F.to_date(F.col("ts")).alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("nd"),
        F.sum("n_events").cast("long").alias("sn"),
        F.sum(F.col("n_events") * F.col("n_events")).cast("long").alias("snn"),
    )
    j = daily.join(stats, "event_type")
    dev = F.col("n_events") * F.col("nd") - F.col("sn")
    var_num = F.col("nd") * F.col("snn") - F.col("sn") * F.col("sn")
    return (
        j.filter((var_num > 0) & (dev * dev >= 4 * var_num))
        .select(
            "event_type",
            F.date_format(F.col("day"), "yyyy-MM-dd").alias("day"),
            "n_events",
            F.round(
                dev.cast("double") / F.sqrt(var_num.cast("double")), 9
            ).alias("z"),
        )
    )


def g37_type_cooccurrence(spark, sf_dir):
    """Out-edge-type co-occurrence matrix — for each unordered pair of
    edge types, how many source nodes emit BOTH, with the overlap in
    exact floor-ppm Jaccard. The KG schema-health audit (which relation
    types co-fire on the same node?) a construction pipeline reads when
    validating extraction drift — t30's vocabulary-overlap pattern
    lifted from (source, token) to (node, edge_type). Scale: the
    distinct (node, type) inventory reduces map-side; the nid-keyed
    self-join fans out ≤ #types per key (TRUE bounded — no hot key in
    the corpus-size sense); the diag dims are #types rows, left to AQE;
    ReuseExchange shares the distinct's shuffle across both sides and
    the diagonal. The Jaccard division is non-negative with a positive
    divisor (the union count n_a + n_b − n_both ≥ n_both ≥ 1 whenever a
    pair row exists), so trunc == floor cross-engine."""
    edges = TG.derive_edges(spark, sf_dir)
    nt = edges.select(F.col("from_node_id").alias("nid"), "edge_type").distinct()
    diag = nt.groupBy("edge_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    pairs = (
        nt.alias("a")
        .join(nt.alias("b"), "nid")
        .filter(F.col("a.edge_type") < F.col("b.edge_type"))
        .groupBy(
            F.col("a.edge_type").alias("type_a"),
            F.col("b.edge_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
    )
    return (
        pairs.join(
            diag.select(F.col("edge_type").alias("type_a"), F.col("n").alias("n_a")),
            "type_a",
        )
        .join(
            diag.select(F.col("edge_type").alias("type_b"), F.col("n").alias("n_b")),
            "type_b",
        )
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            "n_both",
            F.expr(
                "CAST(n_both * 1000000L div (n_a + n_b - n_both) AS BIGINT)"
            ).alias("jaccard_ppm"),
        )
    )


def g36_two_hop_reach(spark, sf_dir):
    """Two-hop reach histogram (operators/graph_queries.py::
    two_hop_reach) over the order co-usage graph — the r=2 neighborhood
    function N(v,2) rolled up by reach value: the expansion profile that
    predicts how explosive a friend-of-friend join will be. Exact
    distinct counts (the HLL/ANF sketch swap is the documented 100×
    path). Oracle: the same wedge + distinct union over the shared
    pe/co/e cascade blocks."""
    pairs = _couse_pairs(spark, sf_dir)
    return G.two_hop_reach(pairs.select("node_a", "node_b"))


def g35_avg_neighbor_degree(spark, sf_dir):
    """Average-neighbor-degree curve k_nn(k)
    (operators/graph_queries.py::avg_neighbor_degree) over the deduped
    undirected typed graph (g34's frame) — the degree-correlation
    profile behind g28's single assortativity coefficient, published as
    the exact single-ratio form Σdeg(nb)·10³ div (k·N_k)."""
    from research_knowledge_graph_spark.operators.graph_queries import (
        avg_neighbor_degree,
    )

    edges = TG.derive_edges(spark, sf_dir)
    return avg_neighbor_degree(
        edges.select(
            F.col("from_node_id").alias("node_a"),
            F.col("to_node_id").alias("node_b"),
        )
    )


def v13_props_field_rollup(spark, sf_dir):
    """Semi-structured JSON property extraction + rollup — the events
    table's ``props`` column is a JSON string (the reference stores node
    properties as JSONB, ``src/db/models.py`` — F8's query-side analog):
    pull the numeric field ``$.k`` with ``get_json_object`` (pure Catalyst
    JSON path, map-only, no Python) and aggregate per event type. All
    outputs are exact bigints; ``avg_k = sum div count`` is floor integer
    division over NON-NEGATIVE values (== DuckDB ``//``, the t23/g30
    pattern). Events without the field parse to NULL and drop out of the
    k-aggregates (count(k) counts non-null — both engines agree)."""
    _utc(spark)
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        "user_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.count("k").cast("long").alias("n_k"),
        F.sum("k").cast("long").alias("sum_k"),
        F.min("k").cast("long").alias("min_k"),
        F.max("k").cast("long").alias("max_k"),
        F.expr("sum(k) div count(k)").cast("long").alias("avg_k"),
    )


def e09_label_centroids(spark, sf_dir):
    """Per-label embedding centroids in exact fixed-point
    (operators/similarity.py::label_centroids): each float component is
    scaled to integer nanos map-side, so the per-(label, dim) sums are
    exact bigints and the check is bit-exact under any partitioning.
    Oracle: UNNEST WITH ORDINALITY + the same round(val*1e9) scaling."""
    from research_knowledge_graph_spark.operators.similarity import (
        label_centroids,
    )

    return label_centroids(_t(spark, sf_dir, "embeddings"))


def g32_truncated_closeness(spark, sf_dir):
    """Truncated closeness centrality over FOLLOWS∪USES_PART
    (operators/graph_queries.py::truncated_closeness): nodes reachable
    within 3 directed hops + exact hop-distance sum per source, ranked by
    closeness_ppm (integer floor division). Oracle: bounded recursive CTE
    with min(dist) per (src, node), aggregated identically."""
    edges = TG.derive_edges(spark, sf_dir)
    return G.truncated_closeness(
        edges, max_depth=3, edge_types=["FOLLOWS", "USES_PART"]
    )


def g44_truncated_harmonic(spark, sf_dir):
    """Truncated harmonic centrality over FOLLOWS∪USES_PART
    (operators/graph_queries.py::truncated_harmonic): Σ 1/dist within 3
    directed hops — the Boldi–Vigna web-graph centrality (robust on
    disconnected graphs: unreachable nodes contribute 0 instead of
    poisoning closeness's mean) in EXACT lcm-denominator integers
    (h_units = 6n₁+3n₂+2n₃ sixths, zero rounding). Shares the bounded-BFS
    trunk with g32 on BOTH sides (_bounded_bfs_visited in Spark, the
    _BFS3_CTES literal in the oracle)."""
    edges = TG.derive_edges(spark, sf_dir)
    return G.truncated_harmonic(
        edges, max_depth=3, edge_types=["FOLLOWS", "USES_PART"]
    )


def g45_neighborhood_function(spark, sf_dir):
    """Distance distribution / neighbourhood function N(d) over
    FOLLOWS∪USES_PART within 3 directed hops
    (operators/graph_queries.py::neighborhood_function): exact
    reachable-pair counts per min-distance, cumulative, and floor-ppm of
    the horizon total — the HyperANF-style effective-diameter audit,
    exact because the horizon bounds the ball. Third member of the g32
    (closeness) / g44 (harmonic) family: ONE bounded-BFS trunk on BOTH
    sides (_bounded_bfs_visited in Spark, _BFS3_CTES in the oracle)."""
    edges = TG.derive_edges(spark, sf_dir)
    return G.neighborhood_function(
        edges, max_depth=3, edge_types=["FOLLOWS", "USES_PART"]
    )


def g46_bowtie_probe(spark, sf_dir):
    """Broder bowtie macro-structure probe over PLACED∪FOLLOWS∪USES_PART
    (operators/graph_queries.py::bowtie_probe): CORE/IN/OUT/
    OUTSIDE_HORIZON node counts around the max-out-degree pivot, both
    membership balls within 3 directed hops off the SAME
    _bounded_bfs_visited trunk as g32/g44/g45 (forward, and once over
    the reversed edge frame) — the WWW'00 crawl-graph shape read, exact
    because the horizon bounds each ball. Oracle: two bounded recursive
    CTEs (forward + reversed) from the identically-selected pivot."""
    edges = TG.derive_edges(spark, sf_dir)
    return G.bowtie_probe(
        edges, max_depth=3, edge_types=["PLACED", "FOLLOWS", "USES_PART"]
    )


def g47_component_size_histogram(spark, sf_dir):
    """Connected-component SIZE distribution over the undirected FOLLOWS
    graph — the giant-component read (Broder et al.'s other macro lens,
    next to g46's bowtie): one giant component + a power-law tail of
    small ones is the healthy web-graph shape; a flat histogram means
    the linker is under-connecting. Wraps the SAME connected_components
    operator as g15 (and the oracle wraps the SAME und/reach CTE blocks
    — ONE literal), then two bounded hash-aggs: component → size, size →
    count, plus the floor-ppm share of nodes per size row; the 1-row
    node total is a bounded broadcast. Nodes with no FOLLOWS edge are
    not in the pair frame and are absent on both sides (g15's
    contract)."""
    from research_knowledge_graph_spark.operators.canonicalize import (
        connected_components,
    )

    edges = TG.derive_edges(spark, sf_dir).filter(
        F.col("edge_type") == "FOLLOWS"
    )
    pairs = edges.select(
        F.col("from_node_id").alias("key_a"),
        F.col("to_node_id").alias("key_b"),
    )
    comp = connected_components(pairs)
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).cast("long").alias("component_size")
    )
    hist = sizes.groupBy("component_size").agg(
        F.count(F.lit(1)).cast("long").alias("n_components")
    )
    total = comp.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    return hist.crossJoin(F.broadcast(total)).select(
        "component_size",
        "n_components",
        F.expr("(component_size * n_components * 1000000) div n_nodes")
        .cast("long")
        .alias("node_share_ppm"),
    )


def g48_type_mixing_matrix(spark, sf_dir):
    """Node-type mixing matrix: edge counts per (edge_type, from_type,
    to_type) plus each cell's floor-ppm share of all edges — the KG
    SCHEMA-HEALTH read a construction pipeline runs after every linker
    change: in a healthy graph each relation connects exactly one typed
    endpoint pair (PLACED is customer→order and nothing else), so any
    off-diagonal cell is extraction/linking drift made visible — the
    endpoint-TYPE completion of g37's which-relations-co-fire audit and
    g33's direction audit. Exact integer counts; the one division is
    floor-ppm over the bounded result frame.

    Scale: two corpus-sized equi-joins attach endpoint types on the
    uniform node-id key (no hot key by construction — a node id appears
    once in the dim side); the rollup is map-side combinable down to a
    ≤ #edge_types × #node_types² frame, and the 1-row edge total rides
    a bounded broadcast (g47's pattern). Nothing in the plan scales
    with anything but the edge scan."""
    nodes = TG.derive_nodes(spark, sf_dir).select("id", "node_type")
    edges = TG.derive_edges(spark, sf_dir)
    typed = edges.join(
        nodes.select(
            F.col("id").alias("from_node_id"),
            F.col("node_type").alias("from_type"),
        ),
        "from_node_id",
    ).join(
        nodes.select(
            F.col("id").alias("to_node_id"),
            F.col("node_type").alias("to_type"),
        ),
        "to_node_id",
    )
    cells = typed.groupBy("edge_type", "from_type", "to_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_edges")
    )
    total = cells.agg(F.sum("n_edges").cast("long").alias("n_total"))
    return cells.crossJoin(F.broadcast(total)).select(
        "edge_type",
        "from_type",
        "to_type",
        "n_edges",
        F.expr("(n_edges * 1000000) div n_total").cast("long").alias("share_ppm"),
    )


def v25_cusum_changepoint(spark, sf_dir):
    """Per-event-type CUSUM changepoint over the daily volume series —
    the distribution-SHIFT detector next to v18's point-outlier z test
    (v18 asks "which single days are anomalous", this asks "where did
    the level move"). For each type with nd days, daily counts n_i,
    sn = Σn, snn = Σn²: the centered prefix statistic
    ``s_k = nd·Σ_{i≤k} n_i − k·sn`` is an EXACT bigint for every prefix
    k (the classic single-changepoint CUSUM estimator is the day
    maximizing |s_k|; ties break to the earliest day via an explicit
    (|s_k| desc, day asc) row_number). The normalized statistic
    ``cusum_z = |s_k| / sqrt(nd·(nd·snn − sn²))`` is ONE double
    expression from the same exact integers on both engines (the v18
    z-algebra pattern — sqrt and divide are correctly-rounded IEEE,
    round 9 published). Zero-variance types (denominator 0) DROP by the
    exact integer predicate — the v12 baseline-less rule.

    Scale: the per-(type, day) reduce is map-side combinable; both
    windows partition by event_type over per-day rows (bounded by the
    calendar, thousands at most — never by event volume); the stats dim
    is #types rows, joined plain for AQE to broadcast."""
    _utc(spark)
    ev = _t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    daily = ev.groupBy(
        F.col("event_type"), F.to_date(F.col("ts")).alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("nd"),
        F.sum("n").cast("long").alias("sn"),
        F.sum(F.col("n") * F.col("n")).cast("long").alias("snn"),
    )
    w = Window.partitionBy("event_type").orderBy("day")
    pre = (
        daily.join(stats, "event_type")
        .withColumn(
            "s_k",
            (
                F.col("nd") * F.sum("n").over(w)
                - F.row_number().over(w).cast("long") * F.col("sn")
            ).cast("long"),
        )
    )
    w_pick = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("s_k")).desc(), F.col("day").asc()
    )
    return (
        pre.withColumn("rn", F.row_number().over(w_pick))
        .filter(
            (F.col("rn") == 1)
            & (F.col("nd") * F.col("snn") - F.col("sn") * F.col("sn") > 0)
        )
        .select(
            "event_type",
            F.col("nd").alias("nd_days"),
            F.col("day").alias("change_day"),
            F.abs(F.col("s_k")).cast("long").alias("s_abs_max"),
            (
                F.col("nd") * (F.col("nd") * F.col("snn") - F.col("sn") * F.col("sn"))
            ).cast("long").alias("d_denom"),
            F.round(
                F.abs(F.col("s_k")).cast("double")
                / F.sqrt(
                    (
                        F.col("nd")
                        * (F.col("nd") * F.col("snn") - F.col("sn") * F.col("sn"))
                    ).cast("double")
                ),
                9,
            ).alias("cusum_z"),
        )
    )


def v26_benford_audit(spark, sf_dir):
    """Per-event-type Benford first-digit audit — the classic
    synthetic-vs-organic value-distribution read (fabricated or
    machine-generated numeric fields drift from Benford's law long before
    any point-outlier test fires; next to v18's z-days and v25's level
    shifts this asks "does the VALUE column look organically generated at
    all"). First significant digit comes from the exact integer CENTS
    (v23's ``round(value·100)`` idiom — proven engine-exact) via a string
    head, so no float log10 ever runs on data; the nine Benford expected
    shares are hardcoded integer ppm constants (they sum to exactly
    1,000,000 — universal constants, not computed, so there is no
    cross-engine ulp risk in the expectation either). Zero-count digits
    materialize on a full type×digit spine (a missing digit must still
    contribute its expected share to the deviation), obs_ppm is a floor
    division, and tvd_ppm = Σ|obs−exp|//2 per type — all-bigint, so the
    result hashes bit-exactly.

    Scale: one map-side-combinable (type, digit) hash-agg over the event
    stream; everything after runs on the ≤ 9·#types spine (the digit
    dimension is literal 9 rows — broadcast bounded by construction);
    windows partition by event_type over exactly 9 rows."""
    ev = _t(spark, sf_dir, "events")
    # standard Benford reads the first digit of |value| — refunds /
    # chargebacks count by magnitude; only true sub-cent zeros drop
    cents = F.abs(F.round(F.col("value") * 100).cast("long"))
    digits = (
        ev.select("event_type", cents.alias("cents"))
        .filter(F.col("cents") > 0)
        .select(
            "event_type",
            F.substring(F.col("cents").cast("string"), 1, 1)
            .cast("long")
            .alias("digit"),
        )
    )
    counts = digits.groupBy("event_type", "digit").agg(
        F.count(F.lit(1)).cast("long").alias("n_events")
    )
    benford = spark.createDataFrame(
        [
            (1, 301030), (2, 176091), (3, 124939), (4, 96910), (5, 79181),
            (6, 66947), (7, 57992), (8, 51153), (9, 45757),
        ],
        "digit long, benford_ppm long",
    )
    spine = counts.select("event_type").distinct().crossJoin(
        F.broadcast(benford)
    )
    full = spine.join(counts, ["event_type", "digit"], "left").select(
        "event_type",
        "digit",
        "benford_ppm",
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
    )
    w = Window.partitionBy("event_type")
    return (
        full.withColumn("n_type", F.sum("n_events").over(w))
        .withColumn(
            "obs_ppm", F.expr("n_events * 1000000L div n_type").cast("long")
        )
        .withColumn(
            "dev_ppm", (F.col("obs_ppm") - F.col("benford_ppm")).cast("long")
        )
        .withColumn(
            "tvd_ppm",
            F.expr("sum(abs(dev_ppm)) over (partition by event_type) div 2")
            .cast("long"),
        )
        .select(
            "event_type", "digit", "n_events", "obs_ppm", "benford_ppm",
            "dev_ppm", "tvd_ppm",
        )
    )


def v27_diurnal_autocorr(spark, sf_dir):
    """Per-event-type lag-24h autocorrelation of the hourly volume series
    — the PERIODICITY read next to v25's level shifts and v18's point
    outliers: human-driven streams repeat daily (acf24 → 1), bot/replay
    traffic does not. Hours are exact epoch integers
    (``unix_micros div 3600·10⁶`` / DuckDB ``epoch_us // ...``) on a
    COMPLETE per-type hour spine (missing hours are real zeros — skipping
    them would misalign every lag pair), and the lag pairing is
    ``lead(n, 24)`` over the contiguous spine. The Pearson numerator and
    both variance terms are EXACT bigints from the summed pair frame
    (n·Σxy − ΣxΣy etc., the v18/t33 z-algebra); zero-variance sides drop
    by the exact integer predicate (the v12 rule) and the published acf24
    is ONE double expression (vx·vy multiplied in double for the sqrt),
    rounded 9.

    Scale: hourly reduce is map-side combinable; the spine is bounded by
    the CALENDAR (hours, not events — the v25 argument), so the window
    and the per-type stats frame stay small at any corpus size. Int64
    bound: vx ≈ n_hours·Σn², binding around ~10⁶ events/hour over a
    decade — rescale counts beyond."""
    _utc(spark)
    ev = _t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    hourly = ev.groupBy(
        "event_type",
        F.expr("unix_micros(cast(ts as timestamp)) div 3600000000")
        .cast("long")
        .alias("h"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    span = hourly.groupBy("event_type").agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    spine = span.select(
        "event_type", F.explode(F.sequence("h0", "h1")).alias("h")
    )
    full = spine.join(hourly, ["event_type", "h"], "left").select(
        "event_type", "h", F.coalesce("n", F.lit(0)).cast("long").alias("x")
    )
    w = Window.partitionBy("event_type").orderBy("h")
    pairs = full.withColumn("y", F.lead("x", 24).over(w)).filter(
        F.col("y").isNotNull()
    )
    st = pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    num = F.col("n_pairs") * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = F.col("n_pairs") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n_pairs") * F.col("syy") - F.col("sy") * F.col("sy")
    return st.filter((vx > 0) & (vy > 0)).select(
        "event_type",
        "n_pairs",
        num.cast("long").alias("acf_num"),
        vx.cast("long").alias("var_x"),
        vy.cast("long").alias("var_y"),
        F.round(
            num.cast("double")
            / F.sqrt(vx.cast("double") * vy.cast("double")),
            9,
        ).alias("acf24"),
    )


def t48_lexical_complexity(spark, sf_dir):
    """Per-document lexical-complexity audit — the readability ingredient
    that survives a punctuation-less web corpus (FK/FOG sentence length is
    degenerate here; the vocabulary-complexity axis is not): per doc, the
    exact syllable-group count (maximal ``[aeiou]+`` runs per token — the
    deterministic syllable proxy every readability formula builds on) and
    the Gunning-FOG complex-word count (tokens with ≥ 3 vowel groups).
    Publishes syllables-per-token and complex-share in floor ppm — pure
    bigint, engine-exact. Completes the within-doc quality quartet: t02
    surface ratios, t26 repetition, t45 distributional shape, this the
    morphological weight. Tokenizer is the shared _tok3; vowel-group
    counting is one regexp_extract_all + size per token — map-side, the
    only shuffle is the per-doc hash-agg. Token-less docs are absent (the
    t45 rule)."""
    d = _docs_wide(spark, sf_dir)
    toks = _tok3(d)
    syl = F.size(F.regexp_extract_all("term", F.lit("[aeiou]+"), F.lit(0))).cast(
        "long"
    )
    per = toks.select("doc_id", syl.alias("s")).groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum("s").cast("long").alias("n_syllables"),
        F.sum(F.when(F.col("s") >= 3, F.lit(1)).otherwise(F.lit(0)))
        .cast("long")
        .alias("n_complex"),
    )
    return per.select(
        "doc_id",
        "n_tokens",
        "n_syllables",
        "n_complex",
        F.expr("n_syllables * 1000000L div n_tokens").cast("long").alias(
            "syll_per_token_ppm"
        ),
        F.expr("n_complex * 1000000L div n_tokens").cast("long").alias(
            "complex_ppm"
        ),
    )


def t49_vocab_growth(spark, sf_dir):
    """Per-source vocabulary-growth profile — Heaps'-law position plus the
    hapax mass: token volume N, type inventory V, hapax / dis legomena
    counts, type-token ratio and hapax share in floor ppm, and the Heaps
    exponent read β = ln V / ln N. A source still minting vocabulary
    (hapax-heavy, β near 1) behaves differently under dedup, BPE sizing
    (t44/t46) and mixture weighting (t38) than one that has saturated —
    this is the per-source "is the vocabulary still growing" dial next to
    t43's tail index and t37's corpus-level coverage curve. Both lns are
    nano-rounded bigints BEFORE the ratio (the t23 rule — the published β
    is ONE double division of two exact integers, round 9); every count
    and ppm is pure bigint. Sources with N < 2 drop (no growth curve from
    one token — the v12 baseline-less rule).

    Scale: one tokenize scan → (source, term) hash-agg with map-side
    combine → per-source reduce over the type inventory; nothing after
    the first agg touches corpus-sized data. Tokenizer is the shared
    _tok3 (source-carrying form, t42's idiom)."""
    d = _docs_wide(spark, sf_dir)
    per = _tok3(d, cols=("source",)).groupBy("source", "term").agg(
        F.count(F.lit(1)).alias("c")
    )
    ag = per.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("v_types"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast("long").alias(
            "hapax_count"
        ),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0)).cast("long").alias(
            "dis_count"
        ),
    )
    ln_n = F.round(F.log(F.col("n_tokens").cast("double")) * F.lit(1e9)).cast(
        "long"
    )
    ln_v = F.round(F.log(F.col("v_types").cast("double")) * F.lit(1e9)).cast(
        "long"
    )
    return ag.filter(F.col("n_tokens") >= 2).select(
        "source",
        "n_tokens",
        "v_types",
        "hapax_count",
        "dis_count",
        F.expr("v_types * 1000000L div n_tokens").cast("long").alias("ttr_ppm"),
        F.expr("hapax_count * 1000000L div v_types").cast("long").alias(
            "hapax_ppm"
        ),
        ln_v.alias("ln_v_nano"),
        ln_n.alias("ln_n_nano"),
        F.round(ln_v.cast("double") / ln_n.cast("double"), 9).alias(
            "heaps_beta"
        ),
    )


def v28_burstiness_profile(spark, sf_dir):
    """Per-event-type Goh–Barabási burstiness of the inter-event gap
    process (operators/sessions.py::burstiness_profile) — the dispersion
    surrogate B' = 1 − 2S²/(nQ) over integer-second gaps pooled across
    per-(user, type) sequences: periodic heartbeats read −1, Poisson 0,
    bursty human traffic → +1. Completes the cadence family next to
    v12's per-user gap moments and v27's daily periodicity. n/S/Q are
    exact bigints off one (user, type)-keyed lag window + one hash-agg;
    the published burstiness is ONE double expression in the identical
    IEEE shape both engines (casts before products — the t42 overflow
    rule); all-sub-second types drop by the exact S=Q=0 predicate (the
    v12 baseline-less rule)."""
    _utc(spark)
    from research_knowledge_graph_spark.operators.sessions import (
        burstiness_profile,
    )

    ev = _t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    return burstiness_profile(ev)


def t50_length_ks_drift(spark, sf_dir):
    """Per-source Kolmogorov–Smirnov drift of the doc-length distribution
    vs the rest of the corpus (operators/curation.py::length_ks_drift) —
    the nonparametric extraction-regression read next to t42's KL: exact
    integer ECDF cross-multiplication on a COMPLETE per-source pooled-
    value spine, max deviation + argmax length via an explicit
    (d desc, v asc) row_number, one floor-ppm division at the end;
    single-source corpora drop by the n_rest = 0 predicate."""
    from research_knowledge_graph_spark.operators.curation import (
        length_ks_drift,
    )

    d = _t(spark, sf_dir, "documents")
    return length_ks_drift(d)


def t43_term_zipf_tail(spark, sf_dir):
    """Hill tail-index of the per-source TERM-frequency distribution —
    v24's estimator pointed at the vocabulary: α̂ = 1 + n/Σ ln(x/x_min)
    over per-(source, term) counts x ≥ x_min = 2 (hapaxes carry no tail
    information). THE shuffle-planning number for every term-keyed stage
    this repo ships (t16 BM25's df agg, t22's idf, t42's drift join all
    shuffle on the term key): a Zipfian vocabulary (α ≈ 2) means the head
    terms dominate term-keyed partitions exactly the way hot users
    dominate user-keyed ones, quantifying when the functions/salt.py
    treatment must extend to term aggs. Same fixed-point discipline as
    v24: each ln term rounded to nano bigints (merge-order-exact sums),
    Σ = 0 sources drop by the exact predicate, ONE float division per
    source at the end. Tokenizer is the shared _tok3 (t22/t23/t42 —
    cannot drift from its oracle twin _TOK3_SRC_CTE).

    Scale: tokenize is a map-side explode; the (source, term) count is
    map-side combinable (the composite key de-hot-keys the head terms
    across sources); the final agg is #sources keys."""
    d = _docs_wide(spark, sf_dir)
    x_min = 2
    per = _tok3(d, cols=("source",)).groupBy("source", "term").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    tail = per.filter(F.col("cnt") >= x_min)
    ln_nano = F.round(
        F.log(F.col("cnt").cast("double") / F.lit(float(x_min))) * F.lit(1e9)
    ).cast("long")
    agg = tail.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_tail"),
        F.sum(ln_nano).cast("long").alias("sum_ln_nano"),
    )
    return agg.filter(F.col("sum_ln_nano") > 0).select(
        "source",
        "n_tail",
        "sum_ln_nano",
        F.round(
            F.lit(1.0) + F.col("n_tail") * F.lit(1e9) / F.col("sum_ln_nano"), 6
        ).alias("alpha"),
    )


def t46_bpe_fertility(spark, sf_dir):
    """Tokenizer fertility audit (operators/bpe.py::segmentation_fertility)
    — train t44's BPE merges on the corpus, segment the vocabulary with
    the SAME fold used in training, and report pieces-per-word-token per
    source in exact floor ppm (1.0 = every word one piece; the standard
    does-the-vocabulary-fit-the-corpus read, and the per-source split
    shows which mixture component the tokenizer underserves). Work is
    word-type-compressed end to end: segmentation runs on DISTINCT
    words, the corpus-sized pass is one groupBy. Rows-only like t44
    (same non-SQL-expressible merge chain); exactness pinned by the
    python-twin fertility test in tests/test_bpe.py."""
    from research_knowledge_graph_spark.operators.bpe import (
        learn_bpe,
        segmentation_fertility,
    )

    d = _docs_wide(spark, sf_dir)
    return segmentation_fertility(d, learn_bpe(d, num_merges=10))


def t45_token_entropy(spark, sf_dir):
    """Per-document unigram token entropy — the THIRD axis of the
    within-doc quality triad (t02 surface ratios, t26 repetition, this:
    distributional shape): gibberish reads near-uniform (entropy ≈ ln n),
    template/boilerplate reads low. H = ln n − (Σ c·ln c)/n in nats,
    carried EXACTLY: per-(doc, term) counts c are exact bigints, each
    ln c is fixed-pointed to nano bigints BEFORE the multiply (t23's
    rule — c · round(ln c · 1e9) is an exact int product, merge-order
    exact under any partial-agg order), ln n gets the same treatment,
    and ``entropy_nano = ln_n_nano − (Σ div n)`` is a pure bigint
    (non-negative floor div == Spark div == DuckDB //). The readable
    ``entropy_nats`` is that integer / 1e9 rounded 9 — no float ever
    crosses an aggregation boundary. Tokenizer is the shared _tok3
    (t22/t23/t42 twin CTE); docs with no ≥3-char token are absent on
    both sides.

    Scale: one (doc, term) hash-agg + one doc hash-agg, both map-side
    combinable, keys are per-doc composites (no hot key)."""
    d = _docs_wide(spark, sf_dir)
    pc = _tok3(d).groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    w = (
        F.col("c")
        * F.round(F.log(F.col("c").cast("double")) * F.lit(1e9)).cast("long")
    ).cast("long")
    ag = pc.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.sum(w).cast("long").alias("s_clnc_nano"),
    )
    ln_n_nano = F.round(
        F.log(F.col("n_tokens").cast("double")) * F.lit(1e9)
    ).cast("long")
    return ag.select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        (ln_n_nano - F.expr("s_clnc_nano div n_tokens"))
        .cast("long")
        .alias("entropy_nano"),
    ).withColumn(
        "entropy_nats", F.round(F.col("entropy_nano") / F.lit(1e9), 9)
    )


def t44_bpe_merges(spark, sf_dir):
    """Distributed BPE vocabulary induction (operators/bpe.py::learn_bpe)
    — the canonical LLM-tokenizer training pass over the corpus: merges
    learned from the word-TYPE frequency table (one corpus groupBy
    collapses the token stream to a vocabulary-sized frame; every merge
    round is one map-side-combinable pair agg + one pure-Catalyst fold,
    argmax is a single-row driver collect per round). Returns the merge
    table (rank, left, right, merged, pair_freq), a pure function of the
    corpus via the (freq desc, left asc, right asc) total order. NO SQL
    oracle — the iterative argmax + greedy list fold is not reasonably
    SQL-expressible; exactness is pinned by the bit-exact pure-python
    Sennrich-loop twin in tests/test_bpe.py (12 merges, self-pair
    greedy edge, early-stop, train/apply agreement)."""
    from research_knowledge_graph_spark.operators.bpe import learn_bpe

    return learn_bpe(_docs_wide(spark, sf_dir), num_merges=10)


def t47_dup_span_coverage(spark, sf_dir):
    """Exact duplicated-span coverage audit
    (operators/dedup.py::dup_span_coverage): per document, the fraction of
    tokens inside a 13-token gram that also appears in ≥ 1 OTHER document
    — the Lee et al. exact-substring dedup read at the famous k=13
    memorization span, measured exactly where winnowing (t19/t20) samples
    it. Cross-doc only (within-doc repetition is t26's read). Interval
    union by the sorted-starts sweep (equal-length intervals ⇒ one window,
    Σ min(k, next−start)); coverage_ppm is a floor division, so the whole
    row hashes bit-exactly cross-engine. Gram formation is map-side
    (transform over sequence on the per-doc token array — zero shuffles to
    FORM grams); only the duplicated-gram hash-aggs and the hits join
    shuffle."""
    from research_knowledge_graph_spark.operators.dedup import (
        dup_span_coverage,
    )

    return dup_span_coverage(_docs_wide(spark, sf_dir), k=13)


def _t54_messy_url():
    """Deterministic messy-url column over ``documents`` — shared by t54
    and t55 (ONE construction, mirrored verbatim in both oracle SQLs).
    Variant selector (doc_id//7)%4 and group key doc_id//149: BOTH vary
    whatever the sf dir's doc_id stride is (sf0.01 ids step by 20 — a
    plain doc_id%4 would pin every row to ONE spelling variant and make
    every //7 group a singleton, exercising neither the m=1..3 rules nor
    the collapse)."""
    m = (F.floor(F.col("doc_id") / 7) % 4).cast("int")
    return F.concat(
        F.when(m == 0, F.lit("HTTPS://")).otherwise(F.lit("https://")),
        F.when(m == 2, F.lit("www.")).otherwise(F.lit("")),
        F.when(m == 1, F.upper("source")).otherwise(F.col("source")),
        F.when(m == 3, F.lit(".Example.COM:443")).otherwise(F.lit(".example.com")),
        F.lit("/A/"),
        F.floor(F.col("doc_id") / 149).cast("string"),
        F.when(m == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(m == 0, F.lit("?utm_source=feed&b=2&a=1#top"))
        .when(m == 1, F.lit("?a=1&b=2"))
        .when(m == 2, F.lit("?b=2&a=1&utm_campaign=x"))
        .otherwise(F.lit("?a=1&b=2&gclid=abc#s")),
    )


def t54_url_canonical_dedup(spark, sf_dir):
    """URL canonicalization + url-level dedup
    (operators/web.py::canonical_url_col) — the Common-Crawl front door:
    the same logical page arrives under many spellings (scheme/host case,
    ``www.``, default ports, tracking params, param order, fragments,
    trailing slashes) and the ingest collapses them on the canonical
    form. ``documents`` has no url column, so both engines first build a
    deterministic messy url per doc from ((doc_id//7) % 4, source,
    doc_id//149) — four spelling variants that all canonicalize to ONE
    url per (source, doc_id//149) group — then canonicalize INDEPENDENTLY (Spark:
    pure-Catalyst regex+array algebra; DuckDB: its own regexp/list SQL)
    and dedup. Map-only canonicalization; the one shuffle is the
    hash-agg on canonical_url (map-side combined). Cross-engine check
    covers the whole rule set: host/scheme case-folding, www-strip,
    default-port strip, fragment drop, tracking-param drop, param sort,
    trailing-slash strip."""
    from research_knowledge_graph_spark.operators.web import canonical_url_col

    d = _t(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            "n_chars",
            canonical_url_col(_t54_messy_url()).alias("canonical_url"),
        )
        .groupBy("canonical_url")
        .agg(
            F.min("doc_id").alias("kept_doc_id"),
            F.count(F.lit(1)).alias("dup_count"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )


def t55_domain_skew(spark, sf_dir):
    """Head-domain skew audit (operators/web.py::domain_skew_report) over
    the SAME deterministic messy urls t54 builds from ``documents`` — the
    per-domain page share + corpus Herfindahl index (both exact integer
    ppm via DECIMAL ``div``, the repo's fixed-point ratio idiom) that
    decides whether url-hash salting is needed before per-domain stages.
    One domain per ``source`` value after canonicalization (case/www/port
    spellings collapse), so the report is #sources rows; DuckDB derives
    the domain with its own regexp/string SQL and recomputes share/HHI in
    integer arithmetic. ``top_n=1000`` ≥ #domains at every sf, so the
    ordered limit never truncates (no tie ambiguity in the compared
    set)."""
    from research_knowledge_graph_spark.operators.web import domain_skew_report

    d = _t(spark, sf_dir, "documents").select(_t54_messy_url().alias("url"))
    return domain_skew_report(d, top_n=1000)


def t36_sequence_packing(spark, sf_dir):
    """Training-sequence packing (operators/packing.py::pack_sequences) —
    the concat-and-chunk shard layout that turns the deduped corpus into
    fixed-capacity training sequences: documents are sharded by the
    portable 60-bit hash of doc_id, laid out in id order, and each doc is
    assigned to the 512-token pack its first token lands in. One row per
    (shard, pack) with doc/token mass and the id range — the stats a
    pretraining dataloader audits before a run (overfull packs, shard
    balance). ONE shuffle total: the per-(shard, pack) rollup reuses the
    window's hash(shard) partitioning (plan-pinned in tests/
    test_packing.py); all arithmetic exact bigints, pack division
    non-negative (Spark ``div`` == DuckDB ``//``)."""
    from research_knowledge_graph_spark.operators.packing import pack_sequences

    return pack_sequences(
        _t(spark, sf_dir, "documents"), capacity=512, n_shards=8
    )


def t37_vocab_coverage(spark, sf_dir):
    """Vocabulary coverage curve (operators/curation.py::vocab_coverage):
    the top-100 tokens by corpus frequency with their cumulative share in
    floor ppm — the Zipf-head read that sizes a vocabulary / stopword
    list. Total order (freq DESC, token ASC) makes every rank and the
    top-N boundary deterministic; the only window runs on the ≤100-row
    result frame (bounded by construction). Tokens via the ONE shared
    lowercased-whitespace tokenizer of the t24-t27 gram audits."""
    from research_knowledge_graph_spark.operators.curation import vocab_coverage

    return vocab_coverage(_docs_wide(spark, sf_dir), top_n=100)


def t41_term_burstiness(spark, sf_dir):
    """Church/Gale term-burstiness profile
    (operators/curation.py::term_burstiness): per top-100 corpus term, the
    variance-to-mean ratio of its per-document count (zeros included) in
    exact floor-ppm fixed point — low-VMR terms spread evenly (boilerplate
    / stopword candidates), high-VMR terms burst inside the documents
    that are about them (the topical signal). Same tokenizer and
    (freq DESC, token ASC) total order as t37's coverage curve; the VMR
    reduces to all-integer N·SS − S² arithmetic with a non-negative
    dividend, so the profile hash-compares bit-exactly."""
    from research_knowledge_graph_spark.operators.curation import term_burstiness

    return term_burstiness(_docs_wide(spark, sf_dir), top_n=100)


def t42_source_kl_drift(spark, sf_dir):
    """Per-source unigram KL divergence vs the whole corpus — the
    distribution-drift audit a training-data mixer runs before blending
    sources: KL(P_source ‖ P_corpus) in nats says how far each source's
    vocabulary usage sits from the blend it is entering (t30 answers the
    SET-overlap question; this weighs the shared terms by how differently
    they are USED). All probabilities are exact integer count ratios:
    per (source, term) the log ratio ln(c_st·n / (n_s·c_t)) is computed
    once in double (both factors cast to double BEFORE multiplying so the
    product cannot overflow bigint on either engine, IEEE-identical
    operand order cross-engine), fixed-pointed to nano units, and the
    KL sum Σ c_st·ln_nano accumulates as bigint — bit-identical under any
    partition merge order (the t23 rule); the single float division per
    source happens once at the end. A single-source corpus scores exactly
    0.0 (c_st==c_t and n_s==n make the double ratio exactly 1.0).
    Scale: one tokenize scan → (source, term) hash-agg with map-side
    combine; c_t reduces FROM c_st (no second corpus scan); the
    per-source totals dim is #sources rows — unbounded at web scale
    (sources are domains), so no broadcast hint, AQE decides (the t10
    rule). Overflow: |ln ratio|·10⁹ ≤ ~28·10⁹ at n=10¹², so the weighted
    term binds at c_st ≈ 3·10⁸ and the per-source sum at n_s ≈ 3·10⁸
    tokens/source — beyond that ANSI fails loudly; rescale to micro units
    for the 100-TB run. Tokenizer is the shared _tok3 (t22/t23), carrying
    `source` through the one explode instead of re-joining it on."""
    d = _docs_wide(spark, sf_dir)
    toks = _tok3(d, cols=("doc_id", "source"))
    cst = toks.groupBy("source", "term").agg(
        F.count(F.lit(1)).alias("c_st")
    )
    ct = cst.groupBy("term").agg(F.sum("c_st").alias("c_t"))
    ns = cst.groupBy("source").agg(
        F.sum("c_st").alias("n_s"), F.count(F.lit(1)).alias("n_terms")
    )
    # 1-row corpus total: broadcast bounded by construction
    n = ct.agg(F.sum("c_t").alias("n_total"))
    ratio = (F.col("c_st").cast("double") * F.col("n_total").cast("double")) / (
        F.col("n_s").cast("double") * F.col("c_t").cast("double")
    )
    ln_nano = F.round(F.log(ratio) * F.lit(1e9)).cast("long")
    ksum = (
        cst.join(ct, "term")
        .join(ns.select("source", "n_s"), "source")
        .crossJoin(F.broadcast(n))
        .select("source", (F.col("c_st") * ln_nano).alias("w"))
        .groupBy("source")
        .agg(F.sum("w").alias("s_nano"))
    )
    return ksum.join(ns, "source").select(
        "source",
        "n_s",
        "n_terms",
        F.round(F.col("s_nano") / (F.col("n_s") * F.lit(1e9)), 6).alias(
            "kl_nats"
        ),
    )


def g43_graph_summary(spark, sf_dir):
    """One-row graph summary card of the order co-usage graph — nodes,
    edges, wedges (Σ d·(d−1)/2), triangles, max degree and global
    transitivity (3·triangles/wedges, floor ppm): the one-glance shape
    read (how clustered? how heavy is the head?) taken before choosing
    per-operator strategies, next to g34's full histogram. Composition of
    the shared machinery: pair graph via _couse_pairs (cached), triangles
    via the degree-oriented enumeration (g18), degrees via the ONE shared
    undirected_degree definition. Every aggregate reduces map-side to one
    row; the final joins are three 1-row frames. Transitivity's dividend
    is non-negative ⇒ Spark ``div`` == DuckDB ``//`` bit-exactly; the
    oracle composes the same pe/co/tri CTE blocks as g18/g19 (shared
    literal, cannot drift)."""
    from research_knowledge_graph_spark.operators.graph_queries import (
        undirected_degree,
    )

    pairs = _couse_pairs(spark, sf_dir).select("node_a", "node_b")
    deg_stats = undirected_degree(pairs).agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.sum(F.expr("degree * (degree - 1) div 2"))
        .cast("long")
        .alias("n_wedges"),
        F.max("degree").cast("long").alias("max_degree"),
    )
    n_edges = pairs.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    tri = G.triangle_count(pairs).agg(
        F.expr("sum(n_triangles) div 3").cast("long").alias("n_triangles")
    )
    return (
        deg_stats.crossJoin(n_edges)
        .crossJoin(tri)
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            "n_triangles",
            "max_degree",
            F.expr("(3000000 * n_triangles) div greatest(n_wedges, 1L)")
            .cast("long")
            .alias("transitivity_ppm"),
        )
    )


def t38_mixture_rates(spark, sf_dir):
    """Mixture-rebalancing plan (operators/sampling.py::mixture_rates):
    per-source sampling rates that level the corpus to a uniform token
    mixture — the step between t32's composition audit and the t11
    stratified sampler, which consumes exactly these rate_ppm values.
    ONE corpus scan reduced map-side to #sources rows; all arithmetic
    exact bigints with non-negative floor division (bounds documented in
    the operator docstring, the t33 ANSI rule)."""
    from research_knowledge_graph_spark.operators.sampling import mixture_rates

    return mixture_rates(_t(spark, sf_dir, "documents"))


def v21_cohort_retention(spark, sf_dir):
    """Weekly cohort-retention matrix — users grouped by the epoch-week of
    their first event; for each (cohort_week, week_offset), how many came
    back and what share of the cohort that is. v08 answers next-DAY
    retention on calendar days; this is the full cohort × offset matrix
    every growth dashboard draws. Week index is pure integer day
    arithmetic (epoch days div 7 — no calendar week-truncation, which
    engines disagree on); retention_ppm = n_active·10⁶ div cohort_size is
    non-negative fixed point, bit-exact cross-engine. NULL ts dropped up
    front (the v16 rule). Scale: distinct (user, week) scan → per-user
    min reduce → equi-join back on the uniform user key → two bounded
    hash-aggs; the cohort-size dim is #weeks rows, left to AQE to
    broadcast."""
    _utc(spark)
    ev = _t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    weekly = ev.select(
        "user_id",
        F.expr(
            "CAST(datediff(to_date(ts), DATE '1970-01-01') div 7 AS BIGINT)"
        ).alias("week"),
    ).distinct()
    cohort = weekly.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    act = (
        weekly.join(cohort, "user_id")
        .groupBy(
            "cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
    )
    sizes = cohort.groupBy("cohort_week").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_size")
    )
    return act.join(sizes, "cohort_week").select(
        "cohort_week",
        "week_offset",
        "n_active",
        "cohort_size",
        F.expr("(1000000 * n_active) div cohort_size")
        .cast("long")
        .alias("retention_ppm"),
    )


def e16_quantization_audit(spark, sf_dir):
    """Int8 scalar-quantization audit — per vector, the exact error budget
    of quantizing the embedding to 127 levels with a per-vector scale
    (the standard serving compression for ANN indexes): components are
    fixed-pointed to micros (e10/e14's scaling), the per-vector scale is
    ``m0 = max(|x_micro|)``, the quantized level is round-half-up
    ``q = (|x|·254 + m0) div (2·m0)`` (dividend NON-negative, so Spark
    ``div`` == DuckDB ``//``), and the reconstruction error is kept in
    exact (127·micro) units: ``err = 127·|x| − q·m0`` — NO division, no
    float, so Σerr² and max|err| hash-compare bit-exactly. High sq_err =
    vectors that int8 serving would distort (heavy-tailed components);
    read next to e14's norm profile before switching an index to int8.
    Scale: pure map-side array math (one scan, no shuffle, no Python);
    bounds: |err| ≤ m0 ≤ ~2¹¹ micro at unit-normed inputs, err²·dims far
    inside int64."""
    em = _t(spark, sf_dir, "embeddings")
    return (
        em.select(
            "vec_id",
            F.expr(
                "transform(embedding,"
                " x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT))"
            ).alias("xm"),
        )
        .select(
            "vec_id",
            "xm",
            F.expr("aggregate(xm, 0L, (a, v) -> greatest(a, abs(v)))").alias(
                "max_abs_micro"
            ),
        )
        .withColumn("m0", F.expr("greatest(max_abs_micro, 1L)"))
        .withColumn(
            "err",
            F.expr(
                "transform(xm, v -> 127L * abs(v)"
                " - ((abs(v) * 254 + m0) div (2 * m0)) * m0)"
            ),
        )
        .select(
            "vec_id",
            "max_abs_micro",
            F.expr("CAST(size(xm) AS BIGINT)").alias("n_dims"),
            F.expr("aggregate(err, 0L, (a, e) -> a + e * e)").alias("sq_err"),
            F.expr("aggregate(err, 0L, (a, e) -> greatest(a, abs(e)))").alias(
                "max_abs_err"
            ),
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
    # ORDER MATTERS: the driver's correctness harness caps at its first 50
    # dict entries. Round-6 rotation (VERDICT r5 #3): the window is t21 (the
    # r5 red row, kept for re-confirmation of the order-invariant-mean fix)
    # plus 49 of the 54 oracled entries that have NEVER had a driver row —
    # the audit tier e12-e21, the graph long tail incl. g36 (whose driver
    # row confirms the salted wedge, clearing the r5 weak mark), the
    # curation/tokenizer tier t33-t53 and the behavioral tier v17-v31.
    # Five never-sampled entries (e15, g39, g41, g42, v20) plus every
    # previously-green entry wait at positions 51+; the local uncapped gate
    # (tests/test_entry_oracle.py) still runs ALL of them every session.
        "t21_source_curation": t21_source_curation,
        "t33_length_quality_corr": t33_length_quality_corr,
        "v17_user_concentration": v17_user_concentration,
        "t36_sequence_packing": t36_sequence_packing,
        "t37_vocab_coverage": t37_vocab_coverage,
        "g43_graph_summary": g43_graph_summary,
        "t38_mixture_rates": t38_mixture_rates,
        "v21_cohort_retention": v21_cohort_retention,
        "e16_quantization_audit": e16_quantization_audit,
        "t39_containment_audit": t39_containment_audit,
        "e17_srp_fidelity": e17_srp_fidelity,
        "t40_bigram_nll_quality": t40_bigram_nll_quality,
        "e18_ann_recall_audit": e18_ann_recall_audit,
        "v22_markov_stationary": v22_markov_stationary,
        "t41_term_burstiness": t41_term_burstiness,
        "t42_source_kl_drift": t42_source_kl_drift,
        "v23_rfm_segments": v23_rfm_segments,
        "e19_silhouette": e19_silhouette,
        "v24_activity_tail_index": v24_activity_tail_index,
        "g44_truncated_harmonic": g44_truncated_harmonic,
        "g45_neighborhood_function": g45_neighborhood_function,
        "v25_cusum_changepoint": v25_cusum_changepoint,
        "t43_term_zipf_tail": t43_term_zipf_tail,
        "t45_token_entropy": t45_token_entropy,
        "t47_dup_span_coverage": t47_dup_span_coverage,
        "v26_benford_audit": v26_benford_audit,
        "e20_hubness_audit": e20_hubness_audit,
        "t48_lexical_complexity": t48_lexical_complexity,
        "v27_diurnal_autocorr": v27_diurnal_autocorr,
        "t49_vocab_growth": t49_vocab_growth,
        "v28_burstiness_profile": v28_burstiness_profile,
        "g46_bowtie_probe": g46_bowtie_probe,
        "t50_length_ks_drift": t50_length_ks_drift,
        "v29_transition_entropy": v29_transition_entropy,
        "t51_detector_agreement": t51_detector_agreement,
        "v30_gap_histogram": v30_gap_histogram,
        "g47_component_size_histogram": g47_component_size_histogram,
        "t52_simhash_near_dups": t52_simhash_near_dups,
        "g48_type_mixing_matrix": g48_type_mixing_matrix,
        "v31_hour_of_day_profile": v31_hour_of_day_profile,
        "e21_intrinsic_dimension": e21_intrinsic_dimension,
        "t53_charset_audit": t53_charset_audit,
        "e12_label_confusion": e12_label_confusion,
        "g36_two_hop_reach": g36_two_hop_reach,
        "g37_type_cooccurrence": g37_type_cooccurrence,
        "v18_volume_anomalies": v18_volume_anomalies,
        "e13_centroid_separation": e13_centroid_separation,
        "t35_minhash_fidelity": t35_minhash_fidelity,
        "v19_user_tenure": v19_user_tenure,
        "e14_norm_profile": e14_norm_profile,
        "t54_url_canonical_dedup": t54_url_canonical_dedup,
        "t55_domain_skew": t55_domain_skew,
        "t32_composition_rollup": t32_composition_rollup,
        "g35_avg_neighbor_degree": g35_avg_neighbor_degree,
        "e11_kmeans_update": e11_kmeans_update,
        "t30_vocab_overlap": t30_vocab_overlap,
        "v16_daily_type_trend": v16_daily_type_trend,
        "v13_props_field_rollup": v13_props_field_rollup,
        "e09_label_centroids": e09_label_centroids,
        "g32_truncated_closeness": g32_truncated_closeness,
        "t28_cross_source_dup_matrix": t28_cross_source_dup_matrix,
        "g33_reciprocity": g33_reciprocity,
        "t29_snapshot_diff": t29_snapshot_diff,
        "e10_nearest_centroid": e10_nearest_centroid,
        "v14_user_type_entropy": v14_user_type_entropy,
        "v15_event_type_pmi": v15_event_type_pmi,
        "g34_degree_histogram": g34_degree_histogram,
        "t26_repetition_signals": t26_repetition_signals,
        "t27_decontaminate": t27_decontaminate,
        "t25_ngram_novelty": t25_ngram_novelty,
        "v12_interarrival_stats": v12_interarrival_stats,
        "g26_node_similarity": g26_node_similarity,
        "g27_k_truss": g27_k_truss,
        "e08_mmr_rerank": e08_mmr_rerank,
        "v07_cooccurrence_graph": v07_cooccurrence_graph,
        "v08_daily_retention": v08_daily_retention,
        "g25_k_core": g25_k_core,
        "t18_token_stats": t18_token_stats,
        "t19_winnow_fingerprints": t19_winnow_fingerprints,
        "t20_winnow_near_dups": t20_winnow_near_dups,
        "t22_tfidf_keywords": t22_tfidf_keywords,
        "t23_unigram_nll_quality": t23_unigram_nll_quality,
        "v11_event_transition_matrix": v11_event_transition_matrix,
        "v09_rolling_active_users": v09_rolling_active_users,
        "v10_funnel_conversion": v10_funnel_conversion,
        "g28_degree_assortativity": g28_degree_assortativity,
        "v02_user_value_topk": v02_user_value_topk,
        "v03_sessionize": v03_sessionize,
        "v04_asof_attribution": v04_asof_attribution,
        "v05_range_join_errors": v05_range_join_errors,
        "v06_asof_forward": v06_asof_forward,
        "e07_hybrid_search_rrf": e07_hybrid_search_rrf,
        "g23_louvain_refine": g23_louvain_refine,
        "g29_hits": g29_hits,
        "g30_resource_allocation": g30_resource_allocation,
        "g31_katz_centrality": g31_katz_centrality,
        "t24_frequent_kgrams": t24_frequent_kgrams,
        "g38_pagerank_exact": g38_pagerank_exact,
        "g40_link_prediction": g40_link_prediction,
        "e15_embed_fingerprint": e15_embed_fingerprint,
        "g39_rich_club": g39_rich_club,
        "g41_ppr_exact": g41_ppr_exact,
        "g42_community_conductance": g42_community_conductance,
        "v20_session_duration": v20_session_duration,
        "g21_weighted_label_propagation": g21_weighted_label_propagation,
        "t16_bm25_search": t16_bm25_search,
        "t17_bm25_indexed": t17_bm25_indexed,
        "g22_community_modularity": g22_community_modularity,
        "e03_knn_lsh": e03_knn_lsh,
        "e05_knn_lsh_multiprobe": e05_knn_lsh_multiprobe,
        "e06_knn_ivf_indexed": e06_knn_ivf_indexed,
        "t10_dedup_cluster_survivors": t10_dedup_cluster_survivors,
        "g08_recursive_chain": g08_recursive_chain,
        "g19_clustering_coefficient": g19_clustering_coefficient,
        "g20_label_propagation": g20_label_propagation,
        "g18_triangle_count": g18_triangle_count,
        "e01_knn_bruteforce": e01_knn_bruteforce,
        "e02_embedding_near_dups": e02_embedding_near_dups,
        "t07_minhash_lsh_pairs": t07_minhash_lsh_pairs,
        "g11_undirected_degree": g11_undirected_degree,
        "t01_normalize_labels": t01_normalize_labels,
        "t02_quality": t02_quality,
        "t04_exact_dedup": t04_exact_dedup,
        "t09_quality_quantiles": t09_quality_quantiles,
        "g17_shortest_paths": g17_shortest_paths,
        "t05_jaccard_pairs": t05_jaccard_pairs,
        "t06_simhash": t06_simhash,
        "g04_influence_topk": g04_influence_topk,
        "g05_supplier_stats": g05_supplier_stats,
        "g06_shared_entity_pairs": g06_shared_entity_pairs,
        "g15_connected_components": g15_connected_components,
        "v01_hourly_rollup": v01_hourly_rollup,
        "g14_motif_triangle": g14_motif_triangle,
        "t15_pii_redaction": t15_pii_redaction,
        "t11_stratified_sample": t11_stratified_sample,
        "t12_quota_sample": t12_quota_sample,
        "t13_token_budget_sample": t13_token_budget_sample,
        "t14_quality_floor": t14_quality_floor,
        "g09_bfs": g09_bfs,
        "g10_recent_orders": g10_recent_orders,
        "q05_window_top3": q05_window_top3,
        "q03_top_revenue": q03_top_revenue,
        "q01_pricing_summary": q01_pricing_summary,
        "g01_node_type_counts": g01_node_type_counts,
        "g02_neighbors_out": g02_neighbors_out,
        "g03_two_hop": g03_two_hop,
        "g07_reverse_reach": g07_reverse_reach,
        "g12_citation_network": g12_citation_network,
        "g13_papers_by_dataset": g13_papers_by_dataset,
        "t03_langid": t03_langid,
        "g16_pagerank": g16_pagerank,
        "t08_chunk_stats": t08_chunk_stats,
        "m01_media_features": m01_media_features,
        "e04_embed_documents": e04_embed_documents,
        "g24_personalized_pagerank": g24_personalized_pagerank,
        "t44_bpe_merges": t44_bpe_merges,
        "t46_bpe_fertility": t46_bpe_fertility,
    }


# ===========================================================================
# DuckDB oracle SQL
# ===========================================================================

_TOKENS = "list_filter(string_split_regex({col}, '\\s+'), w -> w != '')"

# pe/co/tri CTE blocks of the co-usage triangle oracles — ONE literal
# shared by g18/g19/g43 so the enumerated triangle set cannot drift
# between the per-node counts, the coefficients and the summary card.
_COUSE_TRI_CTE = """
            pe AS (SELECT DISTINCT from_node_id AS src, to_node_id AS tgt FROM edges WHERE edge_type = 'USES_PART'),
            co AS (
                SELECT a.src AS u, b.src AS v
                FROM pe a JOIN pe b ON a.tgt = b.tgt AND a.src < b.src
                GROUP BY a.src, b.src HAVING count(*) >= 2
            ),
            tri AS (
                SELECT e1.u AS a, e1.v AS b, e2.v AS c
                FROM co e1
                JOIN co e2 ON e2.u = e1.v
                JOIN co e3 ON e3.u = e1.u AND e3.v = e2.v
            )"""


def _shingles_sql(col: str, k: int) -> str:
    return (
        f"list_distinct(list_transform("
        f"range(1, greatest(length(lower({col})) - {k - 1}, 1) + 1),"
        f" i -> substr(lower({col}), CAST(i AS INT), {k})))"
    )


def _cosine_sql(a: str, b: str) -> str:
    return (
        f"CASE WHEN sqrt(list_dot_product({a},{a})) * sqrt(list_dot_product({b},{b})) > 0 "
        f"THEN list_dot_product({a},{b}) / (sqrt(list_dot_product({a},{a})) * sqrt(list_dot_product({b},{b}))) "
        f"ELSE 0.0 END"
    )


def _mmr_sql(nq: int = 3, pool: int = 20, k: int = 5, lam: float = 0.7) -> str:
    """e08's oracle: the greedy MMR selection unrolled as a k-step argmax
    CTE cascade. Every comparison happens on 9-decimal-rounded cosines and
    the λ-arithmetic runs on identical doubles in both engines, so the
    pick sequence is exact — same unroll-the-iterations playbook as the
    LPA/k-core oracles. AS MATERIALIZED throughout: cand/ps/all_i are
    each referenced by every later step, so default CTE inlining would
    blow up exponentially in k (the k-core fd-exhaustion lesson)."""
    cos_qd = _cosine_sql("qv", "dv")
    cos_ab = _cosine_sql("ea.dv", "eb.dv")
    w_rel = repr(lam)  # 0.7 and 1-0.7 parse to the identical doubles
    w_red = repr(1.0 - lam)  # numpy's (1.0 - lam) computes
    parts = [
        f"q AS MATERIALIZED (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv"
        f" FROM embeddings WHERE vec_id < {nq})",
        "d AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv FROM embeddings)",
        f"s AS MATERIALIZED (SELECT query_id, vec_id, round({cos_qd}, 9) AS rel9"
        " FROM q CROSS JOIN d WHERE query_id <> vec_id)",
        "cand AS MATERIALIZED (SELECT query_id, vec_id, rel9 FROM ("
        "SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY rel9 DESC, vec_id) AS rn"
        f" FROM s) WHERE rn <= {pool})",
        f"ps AS MATERIALIZED (SELECT a.query_id, a.vec_id AS ia, b.vec_id AS ib, round({cos_ab}, 9) AS s9"
        " FROM cand a JOIN cand b ON a.query_id = b.query_id AND a.vec_id <> b.vec_id"
        " JOIN d ea ON ea.vec_id = a.vec_id JOIN d eb ON eb.vec_id = b.vec_id)",
        "all1 AS MATERIALIZED (SELECT query_id, vec_id, rel9, 1 AS rank FROM ("
        "SELECT query_id, vec_id, rel9, row_number() OVER (PARTITION BY query_id"
        " ORDER BY rel9 DESC, vec_id) AS rn FROM cand) WHERE rn = 1)",
    ]
    for i in range(2, k + 1):
        parts.append(
            f"pick{i} AS MATERIALIZED (SELECT query_id, vec_id, rel9, {i} AS rank FROM ("
            "SELECT x.query_id, x.vec_id, x.rel9, row_number() OVER ("
            f"PARTITION BY x.query_id ORDER BY CAST({w_rel} AS DOUBLE) * x.rel9"
            f" - CAST({w_red} AS DOUBLE) * x.mx DESC, x.vec_id) AS rn FROM ("
            "SELECT c.query_id, c.vec_id, c.rel9, max(p.s9) AS mx FROM cand c"
            f" JOIN all{i - 1} sel ON sel.query_id = c.query_id"
            " JOIN ps p ON p.query_id = c.query_id AND p.ia = c.vec_id"
            " AND p.ib = sel.vec_id"
            f" WHERE NOT EXISTS (SELECT 1 FROM all{i - 1} z"
            " WHERE z.query_id = c.query_id AND z.vec_id = c.vec_id)"
            " GROUP BY c.query_id, c.vec_id, c.rel9) x) WHERE rn = 1)"
        )
        parts.append(
            f"all{i} AS MATERIALIZED (SELECT * FROM all{i - 1}"
            f" UNION ALL SELECT * FROM pick{i})"
        )
    return (
        "WITH "
        + ", ".join(parts)
        + f" SELECT query_id, CAST(rank AS INT) AS rank, vec_id,"
        f" round(rel9, 6) AS relevance FROM all{k}"
    )


def _lpa_parts(weighted: bool, iters: int = 5) -> list[str]:
    """CTE blocks for synchronous LPA over the co-usage graph as an
    UNROLLED cascade (VERDICT round-3 #2): votes are integer counts / sums
    and the arg-max tie-break (cnt DESC, label ASC) is exact, so — unlike
    PageRank's float accumulation — a fixed iteration count is
    bit-reproducible across engines. One (join → group → row_number) block
    per round, matching operators/communities.py::label_propagation round
    for round."""
    vote = "sum(e.w)" if weighted else "count(*)"
    parts = [
        "pe AS (SELECT DISTINCT from_node_id AS src, to_node_id AS tgt"
        " FROM edges WHERE edge_type = 'USES_PART')",
        "co AS (SELECT a.src AS u, b.src AS v, count(*) AS w"
        " FROM pe a JOIN pe b ON a.tgt = b.tgt AND a.src < b.src"
        " GROUP BY a.src, b.src HAVING count(*) >= 2)",
        "e AS (SELECT u, v, w FROM co UNION ALL SELECT v AS u, u AS v, w FROM co)",
        "r0 AS (SELECT DISTINCT u AS node_id, u AS community FROM e)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"n{i} AS (SELECT e.u AS node_id, l.community AS nl, {vote} AS cnt"
            f" FROM e JOIN r{i - 1} l ON l.node_id = e.v GROUP BY e.u, l.community)"
        )
        parts.append(
            f"r{i} AS (SELECT node_id, nl AS community FROM ("
            f"SELECT node_id, nl, row_number() OVER (PARTITION BY node_id"
            f" ORDER BY cnt DESC, nl ASC) AS rn FROM n{i}) WHERE rn = 1)"
        )
    return parts


def _lpa_sql(weighted: bool, iters: int = 5) -> str:
    return (
        f"WITH {GRAPH_CTE}, "
        + ", ".join(_lpa_parts(weighted, iters))
        + f" SELECT node_id, community FROM r{iters}"
    )


def _community_stats_parts(iters: int = 5) -> list[str]:
    """Shared CTE blocks behind the g22/g42 community-quality oracles:
    the LPA cascade plus per-community integer aggregates (lab, mm=|E|,
    ic=internal edges, degs, dc=(n_nodes, degree_sum)) — the SQL twin of
    operators/communities.py::_community_stats."""
    return _lpa_parts(False, iters) + [
        f"lab AS (SELECT node_id, community FROM r{iters})",
        "mm AS (SELECT count(*) AS m FROM co)",
        "ic AS (SELECT la.community, count(*) AS internal_edges"
        " FROM co JOIN lab la ON la.node_id = co.u"
        " JOIN lab lb ON lb.node_id = co.v"
        " WHERE la.community = lb.community GROUP BY la.community)",
        "degs AS (SELECT node_id, count(*) AS degree FROM ("
        "SELECT u AS node_id FROM co UNION ALL SELECT v FROM co"
        ") GROUP BY node_id)",
        "dc AS (SELECT l.community, count(*) AS n_nodes,"
        " sum(d.degree) AS degree_sum"
        " FROM degs d JOIN lab l USING (node_id) GROUP BY l.community)",
        # one shared base-stats row per community (the SQL twin of the
        # Python _community_stats frame): both g22 and g42 compose onto
        # THIS select, so a cast/coalesce fix cannot drift between them.
        "cbase AS (SELECT dc.community,"
        " CAST(dc.n_nodes AS BIGINT) AS n_nodes,"
        " CAST(COALESCE(ic.internal_edges, 0) AS BIGINT) AS internal_edges,"
        " CAST(dc.degree_sum AS BIGINT) AS degree_sum, mm.m AS m"
        " FROM dc LEFT JOIN ic USING (community) CROSS JOIN mm)",
    ]


def _modularity_sql(iters: int = 5) -> str:
    """Newman modularity per community, composed onto the LPA cascade —
    g22's oracle (all-integer aggregates, one final double division;
    NOTE DuckDB '^' is XOR, so the square is spelled as a product)."""
    d2m = "(CAST(degree_sum AS DOUBLE) / (2 * m))"
    return (
        f"WITH {GRAPH_CTE}, "
        + ", ".join(_community_stats_parts(iters))
        + " SELECT community, n_nodes, internal_edges, degree_sum,"
        " round(CAST(internal_edges AS DOUBLE) / m"
        f" - {d2m} * {d2m}, 9) AS modularity_term"
        " FROM cbase"
    )


def _conductance_sql(iters: int = 5) -> str:
    """g42's oracle: per-community conductance composed onto the same
    stats blocks as g22 — cut = degree_sum − 2·internal, denom =
    min(vol, 2m−vol), one non-negative fixed-point ppm floor division;
    zero-denominator communities dropped (the v12 no-baseline rule)."""
    return (
        f"WITH {GRAPH_CTE}, "
        + ", ".join(_community_stats_parts(iters))
        + ", cstats AS (SELECT community, n_nodes, internal_edges,"
        " degree_sum,"
        " CAST(degree_sum - 2 * internal_edges AS BIGINT) AS cut_edges,"
        " least(degree_sum, 2 * m - degree_sum) AS denom"
        " FROM cbase)"
        " SELECT community, n_nodes, internal_edges, degree_sum, cut_edges,"
        " CAST(cut_edges * 1000000 // denom AS BIGINT) AS conductance_ppm"
        " FROM cstats WHERE denom > 0"
    )


def _louvain_sql(iters: int = 5) -> str:
    """One synchronous Louvain local-move round composed onto the LPA
    cascade — g23's oracle. The move decision is the INTEGER value
    gain2 = 2m(k_uc − k_ua) − k_u(Σ_c − Σ_a + k_u) (dQ scaled by the
    positive constant 2m²), so best-move selection (gain2 DESC, cand ASC,
    apply iff gain2 > 0) is bit-reproducible — no float enters the
    cascade at all."""
    parts = _lpa_parts(False, iters) + [
        f"lab AS (SELECT node_id, community FROM r{iters})",
        "mm AS (SELECT count(*) AS m FROM co)",
        "degs AS (SELECT u AS node_id, count(*) AS k_u FROM e GROUP BY u)",
        "kuc AS (SELECT e.u AS node_id, l.community AS cand, count(*) AS k_uc"
        " FROM e JOIN lab l ON l.node_id = e.v GROUP BY e.u, l.community)",
        "sig AS (SELECT l.community, sum(d.k_u) AS sigma"
        " FROM degs d JOIN lab l USING (node_id) GROUP BY l.community)",
        "base AS (SELECT l.node_id, l.community AS a, d.k_u, s.sigma AS sigma_a"
        " FROM lab l JOIN degs d USING (node_id)"
        " JOIN sig s ON s.community = l.community)",
        "kua AS (SELECT b.node_id, COALESCE(k.k_uc, 0) AS k_ua FROM base b"
        " LEFT JOIN kuc k ON k.node_id = b.node_id AND k.cand = b.a)",
        "cands AS (SELECT k.node_id, k.cand,"
        " 2*mm.m*(k.k_uc - ka.k_ua) - b.k_u*(s.sigma - b.sigma_a + b.k_u) AS gain2"
        " FROM kuc k JOIN base b ON b.node_id = k.node_id"
        " JOIN kua ka ON ka.node_id = k.node_id"
        " JOIN sig s ON s.community = k.cand CROSS JOIN mm"
        " WHERE k.cand <> b.a)",
        "best AS (SELECT node_id, cand FROM (SELECT node_id, cand,"
        " row_number() OVER (PARTITION BY node_id"
        " ORDER BY gain2 DESC, cand ASC) AS rn FROM cands WHERE gain2 > 0)"
        " WHERE rn = 1)",
    ]
    return (
        f"WITH {GRAPH_CTE}, "
        + ", ".join(parts)
        + " SELECT b.node_id, COALESCE(best.cand, b.a) AS community"
        " FROM base b LEFT JOIN best USING (node_id)"
    )


def _kcore_sql(k: int = 3, iters: int = 16) -> str:
    """Unrolled k-core peel over the co-usage graph — g25's oracle. Round
    i restricts the edge list to round-(i-1) survivors and drops nodes
    under degree k; survivor sets are integer-exact and post-fixpoint
    rounds are the identity, so a fixed unroll depth equal to the Spark
    operator's max_iter reproduces it bit-for-bit regardless of where the
    peel actually converges."""
    # AS MATERIALIZED throughout: each d_i references a_{i-1} TWICE, so
    # DuckDB's default CTE inlining would expand the cascade 2^iters times
    # (observed as fd exhaustion re-opening lineitem.parquet); pinning
    # every block materialized makes the oracle linear in iters
    parts = [
        p.replace(" AS (", " AS MATERIALIZED (", 1)
        for p in _lpa_parts(False, 0)[:3]  # pe, co, e blocks only
    ]
    parts.append("a0 AS MATERIALIZED (SELECT DISTINCT u FROM e)")
    for i in range(1, iters + 1):
        parts.append(
            f"d{i} AS MATERIALIZED (SELECT e.u, count(*) AS c FROM e"
            f" JOIN a{i - 1} x ON x.u = e.u JOIN a{i - 1} y ON y.u = e.v"
            " GROUP BY e.u)"
        )
        parts.append(
            f"a{i} AS MATERIALIZED (SELECT u FROM d{i} WHERE c >= {k})"
        )
    return (
        f"WITH {GRAPH_CTE}, "
        + ", ".join(parts)
        + f" SELECT e.u AS node_id, count(*) AS core_degree FROM e"
        f" JOIN a{iters} x ON x.u = e.u JOIN a{iters} y ON y.u = e.v"
        f" GROUP BY e.u HAVING count(*) >= {k}"
    )


def _ktruss_sql(k: int = 3, iters: int = 8) -> str:
    """g27's oracle: unrolled k-truss peel over the co-usage graph. Round
    i re-enumerates triangles over the round-(i-1) surviving edge list
    with a plain id-ordered triple join (orientation-invariant, so it is
    a valid oracle for the degree-oriented Spark enumeration), explodes
    each triangle into its 3 canonical edges, and drops edges under k-2
    support. Integer-exact survivor sets + identity post-fixpoint rounds
    = unconditional parity at equal unroll depth (the k-core argument
    lifted to edges). AS MATERIALIZED: every c_i is referenced 4x."""
    parts = [
        p.replace(" AS (", " AS MATERIALIZED (", 1)
        for p in _lpa_parts(False, 0)[:2]  # pe, co blocks (co: u < v)
    ]
    parts.append("c0 AS MATERIALIZED (SELECT u, v FROM co)")
    for i in range(1, iters + 1):
        parts.append(
            f"tri{i} AS MATERIALIZED (SELECT t1.u AS a, t1.v AS b, t2.v AS c"
            f" FROM c{i - 1} t1 JOIN c{i - 1} t2 ON t2.u = t1.u AND t2.v > t1.v"
            f" JOIN c{i - 1} t3 ON t3.u = t1.v AND t3.v = t2.v)"
        )
        parts.append(
            f"s{i} AS MATERIALIZED (SELECT u, v, count(*) AS support FROM ("
            f"SELECT a AS u, b AS v FROM tri{i}"
            f" UNION ALL SELECT a AS u, c AS v FROM tri{i}"
            f" UNION ALL SELECT b AS u, c AS v FROM tri{i}) GROUP BY u, v)"
        )
        parts.append(
            f"c{i} AS MATERIALIZED (SELECT e.u, e.v FROM c{i - 1} e"
            f" JOIN s{i} s ON s.u = e.u AND s.v = e.v WHERE s.support >= {k - 2})"
        )
    return (
        f"WITH {GRAPH_CTE}, "
        + ", ".join(parts)
        + f" SELECT e.u AS node_a, e.v AS node_b, s.support FROM c{iters} e"
        f" JOIN s{iters} s ON s.u = e.u AND s.v = e.v"
    )


def _chunk_stats_sql() -> str:
    """t08's oracle: the 2000/200 chunk walk as a recursive CTE. Each
    recursion step is one loop iteration of ``chunk_text_py``: window
    ``w = text[start : start+2000]``; if the window is not final and the
    last ``.``/``\\n`` sits past 70% of it (bp > 1400 — 2000*0.7 is
    exactly 1400.0 in doubles, so the strict > is integer-safe), the cut
    moves to bp+1; next start = cut - 200 (strictly +1202 or more per
    step, so the recursion terminates). n_chunks = number of emitted
    windows; short docs are 1 chunk, NULL text is 0 (the UDF maps
    non-strings to []). Exhaustively parity-checked against
    ``chunk_text_py`` in tests/test_property_twins.py."""
    return """
WITH RECURSIVE
long_docs AS (SELECT doc_id, text, length(text) AS len FROM documents
              WHERE text IS NOT NULL AND length(text) > 2000),
walk AS (
  SELECT doc_id, text, len, 0 AS start, 1 AS n FROM long_docs
  UNION ALL
  SELECT doc_id, text, len,
    (CASE WHEN start + 2000 < len AND bp > 1400
          THEN start + bp + 1 ELSE start + 2000 END) - 200 AS start,
    n + 1 AS n
  FROM (
    SELECT doc_id, text, len, start, n,
      greatest(
        CASE WHEN contains(w, '.')
             THEN length(w) - position('.' IN reverse(w)) ELSE -1 END,
        CASE WHEN contains(w, chr(10))
             THEN length(w) - position(chr(10) IN reverse(w)) ELSE -1 END
      ) AS bp
    FROM (SELECT doc_id, text, len, start, n,
                 substr(text, start + 1, 2000) AS w FROM walk)
  )
  WHERE (CASE WHEN start + 2000 < len AND bp > 1400
              THEN start + bp + 1 ELSE start + 2000 END) - 200 < len
),
counts AS (SELECT doc_id, CAST(max(n) AS INT) AS n_chunks
           FROM walk GROUP BY doc_id)
SELECT d.doc_id,
  COALESCE(c.n_chunks, CASE WHEN d.text IS NULL THEN 0 ELSE 1 END) AS n_chunks
FROM documents d LEFT JOIN counts c USING (doc_id)
"""


# ONE literal for the per-user event-type transition counts — v11's oracle
# AND the transition block of v22's stationary cascade, so the chain
# definition cannot drift between them
# The ONE copy of the undirected-FOLLOWS connected-components blocks
# shared by the g15 oracle and g47's size histogram. NOTE: und's UNION
# runs with recursive (non-deduplicating) semantics inside WITH RECURSIVE
# (the DuckDB 1.0 pitfall documented at g46) — benign HERE because reach's
# own recursive UNION dedups and the min/GROUP BY fixpoint is
# duplicate-insensitive; do not copy this shape for plain set unions.
_CC_CTES = """und AS (
                SELECT from_node_id AS u, to_node_id AS v FROM edges WHERE edge_type = 'FOLLOWS'
                UNION
                SELECT to_node_id, from_node_id FROM edges WHERE edge_type = 'FOLLOWS'
            ),
            reach AS (
                SELECT u AS start, u AS node FROM (SELECT DISTINCT u FROM und)
                UNION
                SELECT r.start, und.v FROM reach r JOIN und ON und.u = r.node
            )"""


# The ONE copy of the per-(user, type) integer-second gap frame shared by
# the v28 burstiness and v30 gap-histogram oracles — matches
# operators/sessions.py::_typed_gaps exactly (lag over (user, type) ordered
# by (ts, event_id), floor to seconds)
_GAPS_SQL = """
            SELECT event_type, user_id, gap_us // 1000000 AS gap_s
            FROM (
                SELECT event_type, user_id,
                       epoch_us(ts) - lag(epoch_us(ts)) OVER (
                           PARTITION BY user_id, event_type
                           ORDER BY ts, event_id
                       ) AS gap_us
                FROM events
            ) lagged
            WHERE gap_us IS NOT NULL
        """


_TRANSITIONS_SQL = """
            WITH lagged AS (
                SELECT event_type,
                       lag(event_type) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                       ) AS prev_type
                FROM events
            )
            SELECT prev_type AS from_type, event_type AS to_type,
                   count(*) AS n_transitions
            FROM lagged WHERE prev_type IS NOT NULL
            GROUP BY prev_type, event_type
        """


def _markov_stationary_sql(iters: int = 4) -> str:
    """v22's oracle: the fixed-point power-iteration rounds unrolled as a
    CTE cascade over v11's transition counts (the SAME _TRANSITIONS_SQL
    literal) — per round one (π·n) // n_out contribution sum and one
    coalescing update, exactly the operator's bigint arithmetic."""
    parts = [
        "t AS MATERIALIZED (SELECT from_type AS src, to_type AS dst,"
        f" CAST(n_transitions AS BIGINT) AS n FROM ({_TRANSITIONS_SQL}))",
        "states AS MATERIALIZED (SELECT src AS sid FROM t"
        " UNION SELECT dst FROM t)",
        "rt AS MATERIALIZED (SELECT src, CAST(sum(n) AS BIGINT) AS n_out"
        " FROM t GROUP BY src)",
        "p0 AS MATERIALIZED (SELECT sid, CAST(1000000000 AS BIGINT) AS p"
        " FROM states)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"c{i} AS MATERIALIZED (SELECT t.dst AS sid,"
            f" sum((p{i - 1}.p * t.n) // rt.n_out) AS s"
            f" FROM t JOIN p{i - 1} ON p{i - 1}.sid = t.src"
            f" JOIN rt ON rt.src = t.src GROUP BY t.dst)"
        )
        parts.append(
            f"p{i} AS MATERIALIZED (SELECT s.sid,"
            f" CAST(COALESCE(c{i}.s, 0) AS BIGINT) AS p"
            f" FROM states s LEFT JOIN c{i} USING (sid))"
        )
    return (
        "WITH "
        + ", ".join(parts)
        + f" SELECT sid AS state, p AS pi_nano FROM p{iters}"
    )


def _pagerank_exact_sql(iters: int = 3, seeds: list[str] | None = None) -> str:
    """g38's oracle: the fixed-point PageRank rounds unrolled as a CTE
    cascade — per round one contribution sum (``p // deg`` floor
    divisions) and one update (``0.15·10⁹ + (850·Σ) // 1000``), exactly
    the operator's arithmetic. MATERIALIZED throughout: each p_i feeds
    both the next contribution join and (via nodes) the next update.
    ``seeds`` (g41) restricts p0 and the per-round restart term to the
    seed nodes via a CASE — the personalized variant's only change."""
    if seeds is None:
        p0_expr = "CAST(1000000000 AS BIGINT)"
        restart = "150000000"
    else:
        in_list = ", ".join(f"'{s}'" for s in sorted(set(seeds)))
        p0_expr = (
            f"CAST(CASE WHEN nid IN ({in_list}) THEN 1000000000 ELSE 0 END"
            " AS BIGINT)"
        )
        restart = f"(CASE WHEN n.nid IN ({in_list}) THEN 150000000 ELSE 0 END)"
    parts = [
        "g AS MATERIALIZED (SELECT DISTINCT from_node_id AS src,"
        " to_node_id AS dst FROM edges"
        " WHERE edge_type IN ('FOLLOWS', 'PLACED'))",
        "pnodes AS MATERIALIZED (SELECT src AS nid FROM g"
        " UNION SELECT dst FROM g)",
        "od AS MATERIALIZED (SELECT src, CAST(count(*) AS BIGINT) AS deg"
        " FROM g GROUP BY src)",
        f"p0 AS MATERIALIZED (SELECT nid, {p0_expr} AS p"
        " FROM pnodes)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"c{i} AS MATERIALIZED (SELECT g.dst AS nid,"
            f" sum(p{i - 1}.p // od.deg) AS s"
            f" FROM g JOIN p{i - 1} ON p{i - 1}.nid = g.src"
            f" JOIN od ON od.src = g.src GROUP BY g.dst)"
        )
        parts.append(
            f"p{i} AS MATERIALIZED (SELECT n.nid,"
            f" CAST({restart} + (850 * COALESCE(c{i}.s, 0)) // 1000"
            f" AS BIGINT) AS p"
            f" FROM pnodes n LEFT JOIN c{i} USING (nid))"
        )
    return (
        f"WITH {GRAPH_CTE}, "
        + ", ".join(parts)
        + f" SELECT nid AS node_id, p AS rank_nano FROM p{iters}"
    )


def _two_hop_reach_sql() -> str:
    """g36's oracle: exact 2-hop reach histogram over the co-usage graph.
    Same pe/co/e blocks as the LPA cascade; ``e`` is referenced three
    times (1-hop legs + wedge), so the shared blocks are pinned
    MATERIALIZED (the k-core inlining lesson)."""
    parts = [
        p.replace(" AS (", " AS MATERIALIZED (", 1)
        for p in _lpa_parts(False, 0)[:3]  # pe, co, e blocks
    ]
    parts.append(
        "two AS (SELECT a.u AS u, b.v AS w FROM e a JOIN e b ON a.v = b.u"
        " WHERE a.u <> b.v)"
    )
    parts.append(
        "nb AS (SELECT DISTINCT u, w FROM ("
        "SELECT u, v AS w FROM e UNION ALL SELECT u, w FROM two))"
    )
    parts.append(
        "rc AS (SELECT u, CAST(count(*) AS BIGINT) AS reach FROM nb GROUP BY u)"
    )
    return (
        f"WITH {GRAPH_CTE}, "
        + ", ".join(parts)
        + " SELECT reach, CAST(count(*) AS BIGINT) AS n_nodes"
        " FROM rc GROUP BY reach"
    )


def _node_sim_sql(min_shared: int = 2, top_k: int = 100) -> str:
    """g26's oracle: neighbor-set Jaccard over the co-usage graph. Same
    pe/co/e blocks as the LPA cascade; the wedge is a plain id-ordered
    self-join on the shared neighbor (orientation-free, so it is a valid
    oracle for the salted Spark wedge — exact-count parity pinned in
    tests/test_salt.py)."""
    parts = _lpa_parts(False, 0)[:3]  # pe, co, e blocks
    parts.append("deg AS (SELECT u AS node_id, count(*) AS degree FROM e GROUP BY u)")
    parts.append(
        "cn AS (SELECT a.u AS node_a, b.u AS node_b, count(*) AS shared"
        " FROM e a JOIN e b ON a.v = b.v AND a.u < b.u"
        f" GROUP BY a.u, b.u HAVING count(*) >= {min_shared})"
    )
    return (
        f"WITH {GRAPH_CTE}, "
        + ", ".join(parts)
        + " SELECT node_a, node_b, shared AS shared_neighbors,"
        " round(CAST(shared AS DOUBLE) / (dx.degree + dy.degree - shared), 6) AS jaccard"
        " FROM cn JOIN deg dx ON dx.node_id = node_a"
        " JOIN deg dy ON dy.node_id = node_b"
        f" ORDER BY jaccard DESC, node_a, node_b LIMIT {top_k}"
    )


def _resource_allocation_sql(min_shared: int = 1, top_k: int = 100) -> str:
    """g30's oracle: resource-allocation index over the co-usage graph.
    Same pe/co/e blocks as g26; the weight is pure integer floor division
    (DuckDB ``//`` == Spark ``div`` on bigints), so count and nano-sum are
    both exact bigints — no float tolerance anywhere."""
    parts = _lpa_parts(False, 0)[:3]  # pe, co, e blocks
    parts.append("deg AS (SELECT u AS node_id, count(*) AS degree FROM e GROUP BY u)")
    parts.append(
        "cn AS (SELECT a.u AS node_a, b.u AS node_b,"
        " CAST(count(*) AS BIGINT) AS shared_neighbors,"
        " CAST(sum(1000000000 // d.degree) AS BIGINT) AS ra_nano"
        " FROM e a JOIN e b ON a.v = b.v AND a.u < b.u"
        " JOIN deg d ON d.node_id = a.v"
        f" GROUP BY a.u, b.u HAVING count(*) >= {min_shared})"
    )
    return (
        f"WITH {GRAPH_CTE}, "
        + ", ".join(parts)
        + " SELECT node_a, node_b, shared_neighbors, ra_nano FROM cn"
        # prediction proper: already-adjacent pairs excluded (co is the
        # canonical u<v edge set, same as the operator's anti-join side)
        " WHERE NOT EXISTS (SELECT 1 FROM co"
        " WHERE co.u = cn.node_a AND co.v = cn.node_b)"
        f" ORDER BY ra_nano DESC, node_a, node_b LIMIT {top_k}"
    )


def _link_prediction_sql(min_shared: int = 1, top_k: int = 100) -> str:
    """g40's oracle: CN / Adamic–Adar / preferential-attachment scoreboard
    over the co-usage graph. Same pe/co/e/deg blocks as g30; the AA term
    is round(1e9/ln(deg)) per shared neighbor (one rounded double op —
    the v14 fixed-point-ln precedent) then exact bigint sums; CN and the
    endpoint degrees are exact counts, PA their product."""
    parts = _lpa_parts(False, 0)[:3]  # pe, co, e blocks
    parts.append("deg AS (SELECT u AS node_id, count(*) AS degree FROM e GROUP BY u)")
    parts.append(
        "cn AS (SELECT a.u AS node_a, b.u AS node_b,"
        " CAST(count(*) AS BIGINT) AS shared_neighbors,"
        " CAST(sum(CAST(round(1e9 / ln(d.degree)) AS BIGINT)) AS BIGINT) AS aa_nano,"
        " CAST(min(da.degree) AS BIGINT) AS deg_a,"
        " CAST(min(db.degree) AS BIGINT) AS deg_b"
        " FROM e a JOIN e b ON a.v = b.v AND a.u < b.u"
        " JOIN deg d ON d.node_id = a.v"
        " JOIN deg da ON da.node_id = a.u"
        " JOIN deg db ON db.node_id = b.u"
        f" GROUP BY a.u, b.u HAVING count(*) >= {min_shared})"
    )
    return (
        f"WITH {GRAPH_CTE}, "
        + ", ".join(parts)
        + " SELECT node_a, node_b, shared_neighbors, aa_nano, deg_a, deg_b,"
        " CAST(deg_a * deg_b AS BIGINT) AS pa FROM cn"
        " WHERE NOT EXISTS (SELECT 1 FROM co"
        " WHERE co.u = cn.node_a AND co.v = cn.node_b)"
        f" ORDER BY aa_nano DESC, node_a, node_b LIMIT {top_k}"
    )


def _lang_case_parts() -> tuple[str, str]:
    """(scores_sel, case_expr) for the marker-count language guess —
    shared by the t03 and t21 oracles."""
    toks = "list_transform(" + _TOKENS.format(col="lower(text)") + ", w -> w)"
    score = {
        lang: f"len(list_filter({toks}, w -> w IN ({', '.join(repr(m) for m in markers)})))"
        for lang, markers in _LANG_MARKERS.items()
    }
    max_expr = "greatest(" + ", ".join(f"s_{lg}" for lg in _LANG_MARKERS) + ")"
    case = "CASE WHEN " + max_expr + " <= 0 THEN 'und' " + " ".join(
        f"WHEN s_{lg} = {max_expr} THEN '{lg}'" for lg in _LANG_MARKERS
    ) + " END"
    scores_sel = ", ".join(f"{expr} AS s_{lg}" for lg, expr in score.items())
    return scores_sel, case


def _langid_sql() -> str:
    scores_sel, case = _lang_case_parts()
    return (
        f"WITH scored AS (SELECT {scores_sel} FROM documents) "
        f"SELECT {case} AS lang_guess, count(*) AS n FROM scored GROUP BY 1"
    )


def _source_curation_sql() -> str:
    """t21's oracle: per-source volume / dup-rate / quality / token /
    language report over the same per-doc feature expressions the t02-t04
    oracles pin individually."""
    scores_sel, case = _lang_case_parts()
    toks = _TOKENS.format(col="text")
    alpha = (
        "CASE WHEN length(text) > 0 THEN"
        " CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)"
        " / length(text) ELSE 0.0 END"
    )
    return f"""
        WITH feat AS (
            SELECT source, {_fingerprint_sql('text')} AS fp,
                   {alpha} AS alpha,
                   CAST(len({toks}) AS BIGINT) AS n_tokens,
                   {scores_sel}
            FROM documents
        ), scored AS (
            SELECT source, fp, alpha, n_tokens, {case} AS lang FROM feat
        )
        SELECT source, count(*) AS n_docs, count(DISTINCT fp) AS n_unique,
               round(CASE WHEN count(fp) > 0
                     THEN CAST(1.0 AS DOUBLE)
                          - CAST(count(DISTINCT fp) AS DOUBLE) / count(fp)
                     ELSE 0.0 END, 6) AS dup_rate,
               round(avg(alpha), 6) AS avg_alpha,
               coalesce(sum(n_tokens), 0) AS total_tokens,
               round(CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS DOUBLE)
                     / count(*), 6) AS en_share
        FROM scored GROUP BY source
    """


def _simhash_sql(bits: int = 16) -> str:
    h = portable_hash64_sql("w")
    inner = (
        f"SELECT doc_id, list_transform({_TOKENS.format(col='lower(text)')}, w -> {h}) AS hs "
        f"FROM documents"
    )
    bit_terms = []
    for b in range(bits):
        ones = f"len(list_filter(hs, h -> (h >> {b}) & 1 = 1))"
        bit_terms.append(
            f"CASE WHEN (2 * {ones} - len(hs)) > 0 THEN CAST({2**b} AS BIGINT) ELSE 0 END"
        )
    return (
        f"SELECT doc_id, CAST({' + '.join(bit_terms)} AS BIGINT) AS simhash FROM ({inner})"
    )


def _minhash_blocks(k: int = 8, shingle_k: int = 4, bands: int = 4) -> str:
    """The sh/sig/banded CTE blocks of the MinHash-LSH cascade — shared by
    the t07 candidate-pair oracle and t35's sketch-fidelity oracle so the
    signature arithmetic cannot drift between them."""
    rows = k // bands
    sh = _shingles_sql("text", shingle_k)
    sig_cols = ", ".join(
        f"list_min(list_transform(sh, s -> {portable_hash64_sql('s', seed=j)})) AS m{j}"
        for j in range(k)
    )
    band_selects = []
    for b in range(bands):
        concat = " || '_' || ".join(
            f"CAST(m{b * rows + i} AS VARCHAR)" for i in range(rows)
        )
        band_selects.append(
            f"SELECT doc_id, {b} AS band, {portable_hash64_sql(concat)} AS bucket FROM sig"
        )
    return (
        f"sh AS (SELECT doc_id, {sh} AS sh FROM documents), "
        f"sig AS (SELECT doc_id, {sig_cols} FROM sh), "
        f"banded AS ({' UNION ALL '.join(band_selects)})"
    )


def _minhash_lsh_sql(k: int = 8, shingle_k: int = 4, bands: int = 4) -> str:
    return (
        f"WITH {_minhash_blocks(k, shingle_k, bands)} "
        f"SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b "
        f"FROM banded a JOIN banded b ON a.band = b.band AND a.bucket = b.bucket "
        f"AND a.doc_id < b.doc_id"
    )


def _minhash_fidelity_sql(k: int = 8, shingle_k: int = 4, bands: int = 4) -> str:
    """t35's oracle: per LSH candidate pair, the signature-agreement
    estimate vs the exact shingle Jaccard, both in floor ppm — the same
    sh/sig/banded blocks as t07, MATERIALIZED (sig and sh are each
    referenced twice more by the fidelity join)."""
    agree = " + ".join(f"CASE WHEN a.m{j} = b.m{j} THEN 1 ELSE 0 END" for j in range(k))
    blocks = _minhash_blocks(k, shingle_k, bands).replace(
        " AS (", " AS MATERIALIZED (", 3
    )
    return f"""
        WITH {blocks},
        cand AS MATERIALIZED (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM banded a JOIN banded b ON a.band = b.band
             AND a.bucket = b.bucket AND a.doc_id < b.doc_id
        )
        SELECT c.doc_a, c.doc_b,
               CAST({agree} AS BIGINT) AS sig_agree,
               CAST(({agree}) * 1000000 // {k} AS BIGINT) AS est_ppm,
               CAST(len(list_intersect(s1.sh, s2.sh)) AS BIGINT) AS n_inter,
               CAST(len(list_intersect(s1.sh, s2.sh)) * 1000000
                    // (len(s1.sh) + len(s2.sh)
                        - len(list_intersect(s1.sh, s2.sh))) AS BIGINT)
                   AS exact_ppm
        FROM cand c
        JOIN sig a ON a.doc_id = c.doc_a
        JOIN sig b ON b.doc_id = c.doc_b
        JOIN sh s1 ON s1.doc_id = c.doc_a
        JOIN sh s2 ON s2.doc_id = c.doc_b
        WHERE (len(s1.sh) + len(s2.sh) - len(list_intersect(s1.sh, s2.sh))) > 0
    """


def _containment_sql(
    k: int = 8,
    shingle_k: int = 4,
    bands: int = 4,
    contain_ppm_floor: int = 850_000,
    jaccard_ppm_ceiling: int = 700_000,
) -> str:
    """t39's oracle: per LSH candidate pair, exact containment
    |A∩B| / min(|A|,|B|) vs symmetric Jaccard in floor ppm + the
    subset_like flag — the same sh/sig/banded blocks as t07/t35."""
    blocks = _minhash_blocks(k, shingle_k, bands).replace(
        " AS (", " AS MATERIALIZED (", 3
    )
    return f"""
        WITH {blocks},
        cand AS MATERIALIZED (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM banded a JOIN banded b ON a.band = b.band
             AND a.bucket = b.bucket AND a.doc_id < b.doc_id
        ),
        x AS (
            SELECT c.doc_a, c.doc_b,
                   CAST(len(list_intersect(s1.sh, s2.sh)) AS BIGINT) AS n_inter,
                   CAST(least(len(s1.sh), len(s2.sh)) AS BIGINT) AS n_min,
                   CAST(len(s1.sh) + len(s2.sh)
                        - len(list_intersect(s1.sh, s2.sh)) AS BIGINT) AS n_union
            FROM cand c
            JOIN sh s1 ON s1.doc_id = c.doc_a
            JOIN sh s2 ON s2.doc_id = c.doc_b
            WHERE least(len(s1.sh), len(s2.sh)) > 0
        )
        SELECT doc_a, doc_b, n_inter, n_min,
               CAST(n_inter * 1000000 // n_min AS BIGINT) AS contain_ppm,
               CAST(n_inter * 1000000 // n_union AS BIGINT) AS jaccard_ppm,
               CAST(CASE WHEN n_inter * 1000000 // n_min >= {contain_ppm_floor}
                          AND n_inter * 1000000 // n_union < {jaccard_ppm_ceiling}
                     THEN 1 ELSE 0 END AS INT) AS subset_like
        FROM x
    """


def _srp_fidelity_sql(dim: int = 64, planes: int = 16) -> str:
    """e17's oracle: per label-blocked vector pair, the SRP signature
    agreement (exact integer via xor + bit_count over the SAME hyperplane
    literals Spark inlines) next to the exact double cosine."""
    sig = _srp_bucket_sql("CAST(embedding AS DOUBLE[])", dim, planes)
    agree = f"({planes} - bit_count(xor(a.sig, b.sig)))"
    return f"""
        WITH v AS MATERIALIZED (
            SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS dv,
                   {sig} AS sig
            FROM embeddings
        )
        SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
               CAST({agree} AS BIGINT) AS agree_bits,
               round({_cosine_sql('a.dv', 'b.dv')}, 6) AS cosine,
               CAST({agree} * 1000000 // {planes} AS BIGINT) AS est_ppm
        FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
    """


def _srp_bucket_sql(vec_expr: str, dim: int, planes: int) -> str:
    """SRP bucket with the hyperplane signs precomputed in Python via the
    SAME portable hash the Spark expression uses — identical buckets."""
    terms = []
    for p in range(planes):
        signs = [
            "1.0" if portable_hash64_py(f"{p}_{i}") & 1 else "-1.0"
            for i in range(dim)
        ]
        plane = "[" + ", ".join(signs) + "]"
        terms.append(
            f"CASE WHEN list_dot_product({vec_expr}, {plane}) > 0 "
            f"THEN CAST({2**p} AS BIGINT) ELSE 0 END"
        )
    return "(" + " + ".join(terms) + ")"


def _knn_lsh_sql(dim: int = 64, planes: int = 6, k: int = 10, hamming: int = 0) -> str:
    """``hamming`` = the multi-probe radius: the DuckDB twin of Spark's
    exploded probe buckets is a θ-join on bucket Hamming distance (the probe
    set {b} ∪ {b⊕2^p} IS the Hamming-≤1 ball around b)."""
    cos = _cosine_sql("qv", "dv")
    qb = _srp_bucket_sql("qv", dim, planes)
    db = _srp_bucket_sql("dv", dim, planes)
    if hamming > 0:
        join = f"qb JOIN db ON bit_count(xor(qb.bucket, db.bucket)) <= {hamming}"
    else:
        join = "qb JOIN db USING (bucket)"
    return f"""
        WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id < 5),
        d AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv FROM embeddings),
        qb AS (SELECT query_id, qv, {qb} AS bucket FROM q),
        db AS (SELECT vec_id, dv, {db} AS bucket FROM d),
        s AS (
            SELECT query_id, vec_id, round({cos}, 9) AS s9
            FROM {join} WHERE query_id <> vec_id
        ),
        r AS (
            SELECT query_id, vec_id, s9,
                   row_number() OVER (PARTITION BY query_id ORDER BY s9 DESC, vec_id) AS rank
            FROM s
        )
        SELECT query_id, CAST(rank AS INT) AS rank, vec_id, round(s9, 6) AS cosine
        FROM r WHERE rank <= {k}
    """


def _fingerprint_sql(col: str) -> str:
    canon = f"array_to_string({_TOKENS.format(col=f'lower({col})')}, ' ')"
    return portable_hash64_sql(canon)


# The ONE copy of the 3-hop bounded-BFS min-distance cascade over
# FOLLOWS∪USES_PART, shared by the g32 (closeness) and g44 (harmonic)
# oracles — composed under each query's `WITH RECURSIVE {GRAPH_CTE}, ...`
_BFS3_CTES = """g AS (
                SELECT DISTINCT from_node_id AS u, to_node_id AS v FROM edges
                WHERE edge_type IN ('FOLLOWS', 'USES_PART')
            ),
            sp AS (
                SELECT u AS src, u AS node, 0 AS dist
                FROM (SELECT DISTINCT u FROM g)
                UNION
                SELECT sp.src, g.v, sp.dist + 1
                FROM sp JOIN g ON g.u = sp.node
                WHERE sp.dist < 3
            ),
            md AS (
                SELECT src, node, min(dist) AS dist FROM sp GROUP BY src, node
            )"""


# The ONE copy of the vector × candidate-centroid distance cascade
# (micro fixed point) shared by the e10 argmin oracle and the e19
# silhouette oracle — plain string (the struct braces would trip an
# f-string), composed by concatenation like the e12-on-e10 pattern.
_CENT_DIST_CTES = """vm AS (
                SELECT vec_id, label AS own_label,
                       list_transform(embedding,
                           x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS v
                FROM embeddings
            ),
            cent AS (
                SELECT label, u.dim AS dim,
                       CAST(floor(sum(u.micro) / count(*)) AS BIGINT) AS c
                FROM (
                    SELECT label,
                           unnest(list_transform(range(len(embedding)),
                               i -> {'dim': CAST(i AS INT),
                                     'micro': CAST(round(CAST(embedding[i+1] AS DOUBLE) * 1e6) AS BIGINT)})) AS u
                    FROM embeddings
                )
                GROUP BY label, u.dim
            ),
            carr AS (
                SELECT label AS cand_label, list(c ORDER BY dim) AS carr
                FROM cent GROUP BY label
            ),
            d AS (
                SELECT vm.vec_id, vm.own_label, carr.cand_label,
                       list_sum(list_transform(range(len(vm.v)),
                           i -> (vm.v[i+1] - carr.carr[i+1])
                                * (vm.v[i+1] - carr.carr[i+1]))) AS dist_micro2
                FROM vm CROSS JOIN carr
            )"""


def oracle_sql() -> dict[str, str]:
    norm50 = NORMALIZE_LABEL_SQL_TEMPLATE.format(col="substr(text, 1, 50)")
    toks = _TOKENS.format(col="text")
    en = ", ".join(repr(m) for m in _LANG_MARKERS["en"])
    sh4a, sh4b = _shingles_sql("a.text", 4), _shingles_sql("b.text", 4)
    cos_ab = _cosine_sql("CAST(a.embedding AS DOUBLE[])", "CAST(b.embedding AS DOUBLE[])")
    cos_qd = _cosine_sql("qv", "dv")

    # ONE literal for the exact-kNN frame — e01's oracle AND the baseline
    # side of e18's recall audit, so the exact top-k set cannot drift
    knn_exact_sql = f"""
            WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id < 5),
            d AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv FROM embeddings),
            s AS (
                SELECT query_id, vec_id, round({cos_qd}, 9) AS s9
                FROM q CROSS JOIN d WHERE query_id <> vec_id
            ),
            r AS (
                SELECT query_id, vec_id, s9,
                       row_number() OVER (PARTITION BY query_id ORDER BY s9 DESC, vec_id) AS rank
                FROM s
            )
            SELECT query_id, CAST(rank AS INT) AS rank, vec_id, round(s9, 6) AS cosine
            FROM r WHERE rank <= 10
        """

    sql = {
        "t32_composition_rollup": """
            SELECT coalesce(source, '<all>') AS source,
                   coalesce(lang, '<all>') AS lang,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                   CAST(GROUPING(source) AS INT) AS src_rolled,
                   CAST(GROUPING(lang) AS INT) AS lang_rolled
            FROM documents
            GROUP BY ROLLUP(source, lang)
        """,
        "e11_kmeans_update": """
            WITH vm AS (
                SELECT vec_id, label AS own_label,
                       list_transform(embedding,
                           x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS v
                FROM embeddings
            ),
            cent AS (
                SELECT label, u.dim AS dim,
                       CAST(floor(sum(u.micro) / count(*)) AS BIGINT) AS c
                FROM (
                    SELECT label,
                           unnest(list_transform(range(len(embedding)),
                               i -> {'dim': CAST(i AS INT),
                                     'micro': CAST(round(CAST(embedding[i+1] AS DOUBLE) * 1e6) AS BIGINT)})) AS u
                    FROM embeddings
                )
                GROUP BY label, u.dim
            ),
            carr AS (
                SELECT label AS cand_label, list(c ORDER BY dim) AS carr
                FROM cent GROUP BY label
            ),
            d AS (
                SELECT vm.vec_id, vm.own_label, carr.cand_label,
                       list_sum(list_transform(range(len(vm.v)),
                           i -> (vm.v[i+1] - carr.carr[i+1])
                                * (vm.v[i+1] - carr.carr[i+1]))) AS dist_micro2
                FROM vm CROSS JOIN carr
            ),
            asg AS (
                SELECT vec_id, cand_label AS label
                FROM (
                    SELECT *, row_number() OVER (
                        PARTITION BY vec_id ORDER BY dist_micro2, cand_label) AS rn
                    FROM d
                ) WHERE rn = 1
            ),
            ex AS (
                SELECT asg.label AS label,
                       unnest(list_transform(range(len(e.embedding)),
                           i -> {'dim': CAST(i AS INT),
                                 'micro': CAST(round(CAST(e.embedding[i+1] AS DOUBLE) * 1e6) AS BIGINT)})) AS u
                FROM embeddings e JOIN asg ON asg.vec_id = e.vec_id
            ),
            newc AS (
                SELECT label, u.dim AS dim,
                       CAST(count(*) AS BIGINT) AS n_vecs,
                       CAST(sum(u.micro) AS BIGINT) AS sum_micro,
                       CAST(floor(sum(u.micro) / count(*)) AS BIGINT) AS mean_micro
                FROM ex GROUP BY label, u.dim
            )
            SELECT n.label, n.dim, n.n_vecs, n.sum_micro, n.mean_micro,
                   c.c AS old_mean_micro,
                   CAST(n.mean_micro - c.c AS BIGINT) AS shift_micro
            FROM newc n JOIN cent c ON c.label = n.label AND c.dim = n.dim
        """,
        "t30_vocab_overlap": """
            WITH vocab AS (
                SELECT DISTINCT source,
                       unnest(list_filter(
                           string_split_regex(lower(text), '\\s+'),
                           w -> w != ''
                       )) AS token
                FROM documents
            ), sizes AS (
                SELECT source, CAST(count(*) AS BIGINT) AS n_vocab
                FROM vocab GROUP BY source
            ), pairs AS (
                SELECT a.source AS source_a, b.source AS source_b,
                       CAST(count(*) AS BIGINT) AS n_shared
                FROM vocab a
                JOIN vocab b ON b.token = a.token AND a.source < b.source
                GROUP BY 1, 2
            )
            SELECT source_a, source_b, n_shared,
                   sa.n_vocab AS vocab_a, sb.n_vocab AS vocab_b,
                   -- non-negative fixed point: // (floor) == Spark div
                   CAST(n_shared * 1000000
                        // (sa.n_vocab + sb.n_vocab - n_shared)
                        AS BIGINT) AS jaccard_ppm
            FROM pairs
            JOIN sizes sa ON sa.source = pairs.source_a
            JOIN sizes sb ON sb.source = pairs.source_b
        """,
        "v16_daily_type_trend": """
            WITH daily AS (
                SELECT event_type, CAST(ts AS DATE) AS day,
                       CAST(count(*) AS BIGINT) AS n_events
                FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
            ), lagged AS (
                SELECT event_type, day, n_events,
                       lag(n_events) OVER (
                           PARTITION BY event_type ORDER BY day
                       ) AS prev_n
                FROM daily
            )
            SELECT event_type, strftime(day, '%Y-%m-%d') AS day, n_events,
                   CAST(n_events - prev_n AS BIGINT) AS delta,
                   -- dividend is non-negative, so // (floor) == Spark div
                   -- (truncation) even though the result can be negative
                   CAST(n_events * 1000000 // prev_n - 1000000 AS BIGINT)
                       AS change_ppm
            FROM lagged WHERE prev_n IS NOT NULL
        """,
        "v15_event_type_pmi": """
            WITH b AS (
                SELECT DISTINCT user_id, CAST(ts AS DATE) AS day, event_type
                FROM events
            ),
            ct AS (
                SELECT event_type, CAST(count(*) AS BIGINT) AS c
                FROM b GROUP BY event_type
            ),
            n1 AS (
                SELECT CAST(count(*) AS BIGINT) AS n
                FROM (SELECT DISTINCT user_id, day FROM b)
            ),
            p AS (
                SELECT x.event_type AS type_a, y.event_type AS type_b,
                       CAST(count(*) AS BIGINT) AS c_ab
                FROM b x JOIN b y
                  ON x.user_id = y.user_id AND x.day = y.day
                 AND x.event_type < y.event_type
                GROUP BY 1, 2
            )
            SELECT p.type_a, p.type_b, p.c_ab,
                   CAST(round(ln((p.c_ab * n1.n) / (a.c * bb.c)) * 1e9) AS BIGINT)
                       AS pmi_nano
            FROM p
            JOIN ct a ON a.event_type = p.type_a
            JOIN ct bb ON bb.event_type = p.type_b
            CROSS JOIN n1
        """,
        "g35_avg_neighbor_degree": f"""
            WITH {GRAPH_CTE},
            und AS (
                SELECT DISTINCT least(from_node_id, to_node_id) AS u,
                       greatest(from_node_id, to_node_id) AS v
                FROM edges WHERE from_node_id <> to_node_id
            ),
            dr AS (SELECT u, v FROM und UNION ALL SELECT v AS u, u AS v FROM und),
            deg AS (
                SELECT u AS nid, CAST(count(*) AS BIGINT) AS deg
                FROM dr GROUP BY u
            ),
            e AS (
                SELECT a.deg AS ds, b.deg AS dd
                FROM dr JOIN deg a ON a.nid = dr.u JOIN deg b ON b.nid = dr.v
            ),
            per_k AS (
                SELECT ds AS degree, CAST(count(*) AS BIGINT) AS n_incidences,
                       CAST(sum(dd) AS BIGINT) AS sum_neighbor_deg
                FROM e GROUP BY ds
            ),
            nk AS (SELECT deg AS degree, CAST(count(*) AS BIGINT) AS n_nodes
                   FROM deg GROUP BY deg)
            SELECT p.degree, nk.n_nodes, p.n_incidences, p.sum_neighbor_deg,
                   -- non-negative fixed point: // (floor) == Spark div
                   CAST(p.sum_neighbor_deg * 1000 // p.n_incidences AS BIGINT)
                       AS knn_milli
            FROM per_k p JOIN nk ON nk.degree = p.degree
        """,
        "g34_degree_histogram": f"""
            WITH {GRAPH_CTE},
            und AS (
                SELECT DISTINCT least(from_node_id, to_node_id) AS u,
                       greatest(from_node_id, to_node_id) AS v
                FROM edges WHERE from_node_id <> to_node_id
            ),
            deg AS (
                SELECT node_id, count(*) AS degree
                FROM (SELECT u AS node_id FROM und
                      UNION ALL SELECT v FROM und)
                GROUP BY node_id
            )
            SELECT CAST(degree AS BIGINT) AS degree,
                   CAST(count(*) AS BIGINT) AS n_nodes
            FROM deg GROUP BY degree
        """,
        "v14_user_type_entropy": """
            WITH c AS (
                SELECT user_id, event_type, count(*) AS c
                FROM events GROUP BY 1, 2
            ),
            tot AS (SELECT user_id, sum(c) AS n FROM c GROUP BY user_id),
            t AS (
                SELECT c.user_id, c.c, tot.n,
                       CAST(round(ln(CAST(c.c AS DOUBLE) / tot.n) * 1e9) AS BIGINT)
                           AS lnp_nano
                FROM c JOIN tot USING (user_id)
            )
            SELECT user_id,
                   CAST(max(n) AS BIGINT) AS n_events,
                   CAST(count(*) AS BIGINT) AS n_types,
                   round(-CAST(sum(c * lnp_nano) AS DOUBLE) / (max(n) * 1e9), 6)
                       AS entropy
            FROM t GROUP BY user_id
        """,
        "v13_props_field_rollup": """
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
                   CAST(count(k) AS BIGINT) AS n_k,
                   CAST(sum(k) AS BIGINT) AS sum_k,
                   CAST(min(k) AS BIGINT) AS min_k,
                   CAST(max(k) AS BIGINT) AS max_k,
                   CAST(sum(k) // count(k) AS BIGINT) AS avg_k
            FROM (
                SELECT event_type, user_id,
                       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
                FROM events
            )
            GROUP BY event_type
        """,
        "e09_label_centroids": """
            SELECT label, u.dim AS dim,
                   CAST(count(*) AS BIGINT) AS n_vecs,
                   CAST(sum(u.nano) AS BIGINT) AS sum_nano,
                   CAST(floor(sum(u.nano) / count(*)) AS BIGINT) AS mean_nano
            FROM (
                SELECT label,
                       unnest(list_transform(range(len(embedding)),
                           i -> {'dim': CAST(i AS INT),
                                 'nano': CAST(round(CAST(embedding[i+1] AS DOUBLE) * 1e9) AS BIGINT)})) AS u
                FROM embeddings
            )
            GROUP BY label, u.dim
        """,
        "q01_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(avg(l_quantity), 6) AS avg_qty,
                   count(*) AS count_order
            FROM lineitem WHERE l_shipdate <= TIMESTAMP '1995-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "q03_top_revenue": """
            SELECT o_orderkey,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM customer JOIN orders ON c_custkey = o_custkey
                          JOIN lineitem ON o_orderkey = l_orderkey
            WHERE c_mktsegment = 'BUILDING'
            GROUP BY o_orderkey
            ORDER BY revenue DESC, o_orderkey LIMIT 10
        """,
        "q05_window_top3": """
            SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn FROM (
                SELECT o_custkey, o_orderkey, o_totalprice,
                       row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
                FROM orders
            ) WHERE rn <= 3
        """,
        "g01_node_type_counts": f"WITH {GRAPH_CTE} SELECT node_type, count(*) AS n FROM nodes GROUP BY node_type",
        "g02_neighbors_out": f"""
            WITH {GRAPH_CTE}
            SELECT n.id AS neighbor_id, n.label AS neighbor_label, e.confidence
            FROM edges e JOIN nodes n ON e.to_node_id = n.id
            WHERE e.from_node_id = 'c1' AND e.edge_type = 'PLACED'
        """,
        "g03_two_hop": f"""
            WITH {GRAPH_CTE}
            SELECT DISTINCT e1.from_node_id AS start_id, e2.to_node_id AS end_id, n.label AS end_label
            FROM edges e1
            JOIN edges e2 ON e1.to_node_id = e2.from_node_id AND e2.edge_type = 'USES_PART'
            JOIN nodes n ON e2.to_node_id = n.id AND n.node_type = 'part'
            WHERE e1.edge_type = 'PLACED'
        """,
        "g04_influence_topk": f"""
            WITH {GRAPH_CTE}
            SELECT n.label, count(DISTINCT e.from_node_id) AS usage_count
            FROM nodes n LEFT JOIN edges e ON e.to_node_id = n.id AND e.edge_type = 'USES_PART'
            WHERE n.node_type = 'part'
            GROUP BY n.id, n.label
            ORDER BY usage_count DESC, n.label ASC LIMIT 20
        """,
        "g05_supplier_stats": f"""
            WITH {GRAPH_CTE}
            SELECT n.label, count(DISTINCT e.to_node_id) AS n_parts
            FROM nodes n JOIN edges e ON e.from_node_id = n.id AND e.edge_type = 'SUPPLIES'
            WHERE n.node_type = 'supplier'
            GROUP BY n.label
        """,
        "g06_shared_entity_pairs": f"""
            WITH {GRAPH_CTE},
            pe AS (SELECT DISTINCT from_node_id AS src, to_node_id AS tgt FROM edges WHERE edge_type = 'USES_PART')
            SELECT a.src AS node_a, b.src AS node_b, count(*) AS shared_count
            FROM pe a JOIN pe b ON a.tgt = b.tgt AND a.src < b.src
            GROUP BY a.src, b.src HAVING count(*) >= 2
        """,
        "g07_reverse_reach": f"""
            WITH {GRAPH_CTE}
            SELECT DISTINCT p.from_node_id AS customer_id
            FROM edges u JOIN edges p ON p.to_node_id = u.from_node_id AND p.edge_type = 'PLACED'
            WHERE u.edge_type = 'USES_PART' AND u.to_node_id = 'p1'
        """,
        "g08_recursive_chain": f"""
            WITH RECURSIVE {GRAPH_CTE},
            chain AS (
                SELECT node_id AS start_id, node_id, 0 AS depth FROM first_orders
                UNION ALL
                SELECT c.start_id, e.from_node_id, c.depth + 1
                FROM chain c JOIN edges e ON e.to_node_id = c.node_id AND e.edge_type = 'FOLLOWS'
                WHERE c.depth < 5
            )
            SELECT DISTINCT start_id, node_id, depth FROM chain
        """,
        "g09_bfs": f"""
            WITH {GRAPH_CTE},
            und AS (SELECT from_node_id AS u, to_node_id AS v FROM edges
                    UNION SELECT to_node_id, from_node_id FROM edges),
            l1 AS (SELECT DISTINCT v AS node_id FROM und WHERE u = 'c1' AND v <> 'c1'),
            l2 AS (SELECT DISTINCT v AS node_id FROM und JOIN l1 ON und.u = l1.node_id
                   WHERE v <> 'c1' AND v NOT IN (SELECT node_id FROM l1))
            SELECT 'c1' AS node_id, 0 AS depth
            UNION ALL SELECT node_id, 1 FROM l1
            UNION ALL SELECT node_id, 2 FROM l2
        """,
        "g10_recent_orders": """
            SELECT o_orderkey, c_name, strftime(o_orderdate, '%Y-%m-%d') AS order_date, o_totalprice
            FROM orders JOIN customer ON o_custkey = c_custkey
            ORDER BY o_orderdate DESC NULLS LAST, o_orderkey LIMIT 50
        """,
        "g12_citation_network": f"""
            WITH {GRAPH_CTE}
            SELECT o1.o_orderkey AS citing_order, strftime(o1.o_orderdate, '%Y-%m-%d') AS citing_date,
                   o2.o_orderkey AS cited_order, strftime(o2.o_orderdate, '%Y-%m-%d') AS cited_date,
                   e.confidence
            FROM edges e
            JOIN orders o1 ON e.from_node_id = 'o' || CAST(o1.o_orderkey AS VARCHAR)
            JOIN orders o2 ON e.to_node_id = 'o' || CAST(o2.o_orderkey AS VARCHAR)
            WHERE e.edge_type = 'FOLLOWS'
            ORDER BY citing_date DESC, citing_order, cited_order LIMIT 100
        """,
        "g13_papers_by_dataset": f"""
            WITH {GRAPH_CTE}
            SELECT o.o_orderkey AS order_key, strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
                   n.label AS part_name, e.confidence
            FROM orders o
            JOIN edges e ON e.from_node_id = 'o' || CAST(o.o_orderkey AS VARCHAR)
                        AND e.edge_type = 'USES_PART'
            JOIN nodes n ON e.to_node_id = n.id AND n.node_type = 'part'
            ORDER BY order_date DESC, order_key, part_name, e.to_node_id LIMIT 100
        """,
        "g14_motif_triangle": f"""
            WITH {GRAPH_CTE}
            SELECT f.from_node_id AS o1_id, f.to_node_id AS o2_id,
                   u1.to_node_id AS p_id, n.label AS p_label
            FROM edges f
            JOIN edges u1 ON u1.from_node_id = f.from_node_id AND u1.edge_type = 'USES_PART'
            JOIN edges u2 ON u2.from_node_id = f.to_node_id AND u2.edge_type = 'USES_PART'
                         AND u2.to_node_id = u1.to_node_id
            JOIN nodes n ON n.id = u1.to_node_id
            WHERE f.edge_type = 'FOLLOWS'
        """,
        "g15_connected_components": f"""
            WITH RECURSIVE {GRAPH_CTE},
            {_CC_CTES}
            SELECT start AS node_id, min(node) AS component FROM reach GROUP BY start
        """,
        # g47 wraps the SAME und/reach CC blocks as g15 (ONE literal):
        # component sizes -> size histogram + floor-ppm node share
        "g47_component_size_histogram": f"""
            WITH RECURSIVE {GRAPH_CTE},
            {_CC_CTES},
            comp AS (
                SELECT start AS node_id, min(node) AS component
                FROM reach GROUP BY start
            ),
            sizes AS (
                SELECT component, CAST(count(*) AS BIGINT) AS component_size
                FROM comp GROUP BY component
            ),
            hist AS (
                SELECT component_size,
                       CAST(count(*) AS BIGINT) AS n_components
                FROM sizes GROUP BY component_size
            ),
            tot AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM comp)
            SELECT component_size, n_components,
                   CAST((component_size * n_components * 1000000) // tot.n_nodes
                        AS BIGINT) AS node_share_ppm
            FROM hist CROSS JOIN tot
        """,
        "t01_normalize_labels": f"SELECT doc_id, {norm50} AS norm_label FROM documents",
        "t02_quality": f"""
            SELECT doc_id,
                   CAST(length(text) AS BIGINT) AS n_chars,
                   CAST(len({toks}) AS BIGINT) AS n_tokens,
                   round(CASE WHEN length(text) > 0 THEN CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / length(text) ELSE 0.0 END, 6) AS alpha_ratio,
                   round(CASE WHEN len({toks}) > 0 THEN CAST(len(list_filter({toks}, w -> lower(w) IN ({en}))) AS DOUBLE) / len({toks}) ELSE 0.0 END, 6) AS stopword_ratio,
                   round(CASE WHEN len({toks}) > 0 THEN CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / len({toks}) ELSE 0.0 END, 6) AS mean_token_len
            FROM documents
        """,
        "t03_langid": _langid_sql(),
        "t21_source_curation": _source_curation_sql(),
        "t04_exact_dedup": f"""
            SELECT source, count(*) AS n_docs, count(DISTINCT {_fingerprint_sql('text')}) AS n_unique
            FROM documents GROUP BY source
        """,
        "t05_jaccard_pairs": f"""
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   round(CAST(len(list_intersect({sh4a}, {sh4b})) AS DOUBLE)
                         / (len({sh4a}) + len({sh4b}) - len(list_intersect({sh4a}, {sh4b}))), 6) AS jaccard
            FROM documents a JOIN documents b ON a.source = b.source AND a.doc_id < b.doc_id
            WHERE round(CAST(len(list_intersect({sh4a}, {sh4b})) AS DOUBLE)
                        / (len({sh4a}) + len({sh4b}) - len(list_intersect({sh4a}, {sh4b}))), 6) >= 0.5
        """,
        "t09_quality_quantiles": """
            WITH scored AS (
                SELECT source,
                       CASE WHEN length(text) > 0
                            THEN CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / length(text)
                            ELSE 0.0 END AS score
                FROM documents
            )
            SELECT source, count(*) AS n,
                   round(quantile_cont(score, 0.1), 6) AS p10,
                   round(quantile_cont(score, 0.5), 6) AS p50,
                   round(quantile_cont(score, 0.9), 6) AS p90
            FROM scored GROUP BY source
        """,
        "t06_simhash": _simhash_sql(16),
        "t07_minhash_lsh_pairs": _minhash_lsh_sql(k=8, shingle_k=4, bands=4),
        "g28_degree_assortativity": f"""
            WITH {GRAPH_CTE},
            pe AS (SELECT DISTINCT from_node_id AS src, to_node_id AS tgt FROM edges WHERE edge_type = 'USES_PART'),
            co AS (
                SELECT a.src AS u, b.src AS v
                FROM pe a JOIN pe b ON a.tgt = b.tgt AND a.src < b.src
                GROUP BY a.src, b.src HAVING count(*) >= 2
            ),
            dir AS (SELECT u AS s, v AS d FROM co UNION ALL SELECT v AS s, u AS d FROM co),
            deg AS (SELECT s AS nid, count(*) AS deg FROM dir GROUP BY s),
            j AS (
                SELECT d1.deg AS ds, d2.deg AS dd
                FROM dir JOIN deg d1 ON d1.nid = dir.s JOIN deg d2 ON d2.nid = dir.d
            ),
            sums AS (
                SELECT count(*) AS n, sum(ds) AS sx, sum(dd) AS sy,
                       sum(ds * dd) AS sxy, sum(ds * ds) AS sxx, sum(dd * dd) AS syy
                FROM j
            )
            SELECT CAST(n AS BIGINT) AS n_directed_edges,
                   round(CAST(n * sxy - sx * sy AS DOUBLE) /
                         (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
                          sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6) AS assortativity
            FROM sums
        """,
        "g18_triangle_count": f"""
            WITH {GRAPH_CTE},{_COUSE_TRI_CTE},
            pern AS (
                SELECT node_id, count(*) AS n_triangles FROM (
                    SELECT a AS node_id FROM tri
                    UNION ALL SELECT b FROM tri
                    UNION ALL SELECT c FROM tri
                ) GROUP BY node_id
            ),
            nodes_in AS (
                SELECT DISTINCT u AS node_id FROM co
                UNION SELECT v FROM co
            )
            SELECT n.node_id, COALESCE(p.n_triangles, 0) AS n_triangles
            FROM nodes_in n LEFT JOIN pern p USING (node_id)
        """,
        "g19_clustering_coefficient": f"""
            WITH {GRAPH_CTE},{_COUSE_TRI_CTE},
            pern AS (
                SELECT node_id, count(*) AS n_triangles FROM (
                    SELECT a AS node_id FROM tri
                    UNION ALL SELECT b FROM tri
                    UNION ALL SELECT c FROM tri
                ) GROUP BY node_id
            ),
            degs AS (
                SELECT node_id, count(*) AS degree FROM (
                    SELECT u AS node_id FROM co
                    UNION ALL SELECT v FROM co
                ) GROUP BY node_id
            )
            SELECT d.node_id, d.degree,
                   COALESCE(p.n_triangles, 0) AS n_triangles,
                   round(CASE WHEN d.degree >= 2
                         THEN 2.0 * COALESCE(p.n_triangles, 0) / (d.degree * (d.degree - 1))
                         ELSE 0.0 END, 6) AS coefficient
            FROM degs d LEFT JOIN pern p USING (node_id)
        """,
        # g43: one-row summary card composed from the SAME pe/co/tri blocks
        # as g18/g19 (shared literal) — scalar subqueries over tiny frames
        "g43_graph_summary": f"""
            WITH {GRAPH_CTE},{_COUSE_TRI_CTE},
            deg AS (
                SELECT node_id, count(*) AS d FROM (
                    SELECT u AS node_id FROM co
                    UNION ALL SELECT v FROM co
                ) GROUP BY node_id
            ),
            s AS (
                SELECT CAST((SELECT count(*) FROM deg) AS BIGINT) AS n_nodes,
                       CAST((SELECT count(*) FROM co) AS BIGINT) AS n_edges,
                       CAST((SELECT sum(d * (d - 1) // 2) FROM deg) AS BIGINT) AS n_wedges,
                       CAST((SELECT count(*) FROM tri) AS BIGINT) AS n_triangles,
                       CAST((SELECT max(d) FROM deg) AS BIGINT) AS max_degree
            )
            SELECT n_nodes, n_edges, n_wedges, n_triangles, max_degree,
                   CAST(3000000 * n_triangles // greatest(n_wedges, 1) AS BIGINT)
                       AS transitivity_ppm
            FROM s
        """,
        "g20_label_propagation": _lpa_sql(weighted=False),
        "g21_weighted_label_propagation": _lpa_sql(weighted=True),
        "g22_community_modularity": _modularity_sql(),
        "g42_community_conductance": _conductance_sql(),
        "g23_louvain_refine": _louvain_sql(),
        "g25_k_core": _kcore_sql(k=2),
        "g26_node_similarity": _node_sim_sql(min_shared=1, top_k=100),
        "g30_resource_allocation": _resource_allocation_sql(min_shared=1, top_k=100),
        "g27_k_truss": _ktruss_sql(k=3, iters=8),
        "t18_token_stats": f"""
            SELECT doc_id,
                   CAST(len({toks}) AS BIGINT) AS n_ws_tokens,
                   CAST(len(regexp_extract_all(text, '{TOKEN_PATTERN}')) AS BIGINT) AS n_bpe_tokens,
                   round(CAST(n_chars AS DOUBLE)
                         / greatest(len(regexp_extract_all(text, '{TOKEN_PATTERN}')), 1),
                         6) AS chars_per_bpe_token
            FROM documents
        """,
        # t36: same whitespace token count as t18, portable-hash sharding,
        # running sum per shard, pack = floor(tokens-before / capacity)
        "t36_sequence_packing": f"""
            WITH t AS (
                SELECT doc_id,
                       CAST(len({toks}) AS BIGINT) AS tok,
                       {portable_hash64_sql("doc_id")} % 8 AS shard
                FROM documents
            ),
            c AS (
                SELECT shard, doc_id, tok,
                       sum(tok) OVER (PARTITION BY shard ORDER BY doc_id
                                      ROWS UNBOUNDED PRECEDING) AS cum
                FROM t
            )
            SELECT CAST(shard AS BIGINT) AS shard,
                   CAST((cum - tok) // 512 AS BIGINT) AS pack_id,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(tok) AS BIGINT) AS pack_tokens,
                   min(doc_id) AS first_doc,
                   max(doc_id) AS last_doc
            FROM c GROUP BY shard, pack_id
        """,
        # t37: t24-t27's lowercased-whitespace tokenizer; the (freq DESC,
        # token ASC) total order pins the top-N boundary and every rank
        "t37_vocab_coverage": f"""
            WITH words AS (
                SELECT unnest({_TOKENS.format(col="lower(text)")}) AS token
                FROM documents
            ),
            freq AS (
                SELECT token, CAST(count(*) AS BIGINT) AS freq
                FROM words GROUP BY token
            ),
            tot AS (SELECT sum(freq) AS total_tokens FROM freq),
            top AS (
                SELECT token, freq FROM freq
                ORDER BY freq DESC, token LIMIT 100
            ),
            r AS (
                SELECT CAST(row_number() OVER (ORDER BY freq DESC, token) AS BIGINT)
                           AS "rank",
                       token, freq,
                       sum(freq) OVER (ORDER BY freq DESC, token
                                       ROWS UNBOUNDED PRECEDING) AS cum_freq
                FROM top
            )
            SELECT "rank", token, freq,
                   CAST(1000000 * cum_freq // total_tokens AS BIGINT) AS cum_ppm
            FROM r, tot
        """,
        # t41: same tokenizer + (freq DESC, token ASC) order as t37; VMR
        # over all docs (zeros included) as N·SS − S² integer arithmetic —
        # the dividend is non-negative by Cauchy–Schwarz, so // == div
        "t41_term_burstiness": f"""
            WITH per AS (
                SELECT doc_id, unnest({_TOKENS.format(col="lower(text)")}) AS token
                FROM documents
            ),
            pc AS (
                SELECT doc_id, token, CAST(count(*) AS BIGINT) AS c
                FROM per GROUP BY doc_id, token
            ),
            st AS (
                SELECT token,
                       CAST(count(*) AS BIGINT) AS n_docs,
                       CAST(sum(c) AS BIGINT) AS freq,
                       CAST(sum(c * c) AS BIGINT) AS sq_freq
                FROM pc GROUP BY token
            ),
            n AS (SELECT CAST(count(*) AS BIGINT) AS n_corpus FROM documents),
            top AS (
                SELECT token, n_docs, freq, sq_freq,
                       CAST(row_number() OVER (ORDER BY freq DESC, token)
                            AS BIGINT) AS "rank"
                FROM st ORDER BY freq DESC, token LIMIT 100
            )
            SELECT "rank", token, n_docs, freq, sq_freq,
                   CAST((n_corpus * sq_freq - freq * freq) * 1000000
                        // (n_corpus * freq) AS BIGINT) AS vmr_ppm
            FROM top, n
        """,
        # t42: shared _tok3 tokenizer (source-carrying variant derived
        # from the ONE literal); ln ratio with double casts BEFORE the
        # products (IEEE-identical operand order to the Spark side),
        # nano fixed-point weighted sum as exact bigint (the t23 rule)
        "t42_source_kl_drift": f"""
            WITH {_TOK3_SRC_CTE},
            cst AS (
                SELECT source, term, CAST(count(*) AS BIGINT) AS c_st
                FROM toks3 GROUP BY source, term
            ),
            ct AS (SELECT term, CAST(sum(c_st) AS BIGINT) AS c_t FROM cst GROUP BY term),
            ns AS (
                SELECT source, CAST(sum(c_st) AS BIGINT) AS n_s,
                       CAST(count(*) AS BIGINT) AS n_terms
                FROM cst GROUP BY source
            ),
            n AS (SELECT CAST(sum(c_t) AS BIGINT) AS n_total FROM ct),
            w AS (
                SELECT cst.source,
                       cst.c_st * CAST(round(ln(
                           (CAST(cst.c_st AS DOUBLE) * CAST(n.n_total AS DOUBLE))
                           / (CAST(ns.n_s AS DOUBLE) * CAST(ct.c_t AS DOUBLE))
                       ) * 1e9) AS BIGINT) AS w
                FROM cst
                JOIN ct USING (term)
                JOIN ns USING (source)
                CROSS JOIN n
            ),
            ks AS (SELECT source, CAST(sum(w) AS BIGINT) AS s_nano FROM w GROUP BY source)
            SELECT ns.source, ns.n_s, ns.n_terms,
                   round(ks.s_nano / (ns.n_s * 1e9), 6) AS kl_nats
            FROM ks JOIN ns USING (source)
        """,
        # t38: same whitespace token count as t18/t36; uniform target =
        # total div n_sources; every division non-negative floor
        "t38_mixture_rates": f"""
            WITH per AS (
                SELECT source,
                       CAST(count(*) AS BIGINT) AS n_docs,
                       CAST(coalesce(sum(len({toks})), 0) AS BIGINT) AS n_tokens
                FROM documents GROUP BY source
            ),
            tot AS (
                SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
                       CAST(count(*) AS BIGINT) AS n_sources
                FROM per
            ),
            r AS (
                SELECT source, n_docs, n_tokens,
                       CAST(1000000 * n_tokens // greatest(total_tokens, 1) AS BIGINT)
                           AS share_ppm,
                       CAST(least(1000000,
                                  (1000000 * (total_tokens // n_sources))
                                  // greatest(n_tokens, 1)) AS BIGINT) AS rate_ppm
                FROM per, tot
            )
            SELECT source, n_docs, n_tokens, share_ppm, rate_ppm,
                   CAST((n_tokens * rate_ppm) // 1000000 AS BIGINT) AS expected_tokens
            FROM r
        """,
        # v21: epoch-week index = day-diff from 1970-01-01 div 7 (pure
        # integer — no calendar week truncation); v19's CAST(ts AS DATE)
        "v21_cohort_retention": """
            WITH weekly AS (
                SELECT DISTINCT user_id,
                       CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7
                            AS BIGINT) AS week
                FROM events WHERE ts IS NOT NULL
            ),
            cohort AS (
                SELECT user_id, min(week) AS cohort_week
                FROM weekly GROUP BY user_id
            ),
            act AS (
                SELECT c.cohort_week, w.week - c.cohort_week AS week_offset,
                       CAST(count(*) AS BIGINT) AS n_active
                FROM weekly w JOIN cohort c USING (user_id)
                GROUP BY 1, 2
            ),
            sizes AS (
                SELECT cohort_week, CAST(count(*) AS BIGINT) AS cohort_size
                FROM cohort GROUP BY cohort_week
            )
            SELECT a.cohort_week, a.week_offset, a.n_active, s.cohort_size,
                   CAST(1000000 * a.n_active // s.cohort_size AS BIGINT)
                       AS retention_ppm
            FROM act a JOIN sizes s USING (cohort_week)
        """,
        "t19_winnow_fingerprints": f"""
            SELECT doc_id, unnest({winnow_fingerprints_sql("text")}) AS fingerprint
            FROM documents
        """,
        "t20_winnow_near_dups": f"""
            WITH f AS MATERIALIZED (
                SELECT doc_id, unnest({winnow_fingerprints_sql("text")}) AS fp
                FROM documents
            ),
            keep AS (SELECT fp FROM f GROUP BY fp HAVING count(*) <= 1000),
            g AS MATERIALIZED (SELECT f.doc_id, f.fp FROM f JOIN keep USING (fp))
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
            FROM g a JOIN g b ON a.fp = b.fp AND a.doc_id < b.doc_id
            GROUP BY 1, 2 HAVING count(*) >= 2
        """,
        # t51: the SAME sh/sig/banded minhash blocks as t07/t35 plus the
        # SAME winnow cascade as t20 (wf/wkeep/wg renames avoid CTE
        # collisions), then plain set algebra on the two pair frames
        "t51_detector_agreement": f"""
            WITH {_minhash_blocks(8, 4, 4)},
            lshp AS (
                SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                FROM banded a
                JOIN banded b ON a.band = b.band AND a.bucket = b.bucket
                    AND a.doc_id < b.doc_id
            ),
            wf AS MATERIALIZED (
                SELECT doc_id, unnest({winnow_fingerprints_sql("text")}) AS fp
                FROM documents
            ),
            wkeep AS (SELECT fp FROM wf GROUP BY fp HAVING count(*) <= 1000),
            wg AS MATERIALIZED (
                SELECT wf.doc_id, wf.fp FROM wf JOIN wkeep USING (fp)
            ),
            winp AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
                FROM wg a JOIN wg b ON a.fp = b.fp AND a.doc_id < b.doc_id
                GROUP BY 1, 2 HAVING count(*) >= 2
            ),
            u AS (
                SELECT l.doc_a IS NOT NULL AS in_l,
                       w.doc_a IS NOT NULL AS in_w
                FROM lshp l
                FULL JOIN winp w
                    ON l.doc_a = w.doc_a AND l.doc_b = w.doc_b
            ),
            a AS (
                SELECT
                    CAST(COALESCE(sum(CASE WHEN in_l THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_lsh,
                    CAST(COALESCE(sum(CASE WHEN in_w THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_winnow,
                    CAST(COALESCE(sum(CASE WHEN in_l AND in_w THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_both
                FROM u
            )
            SELECT n_lsh, n_winnow, n_both,
                   CAST(n_lsh - n_both AS BIGINT) AS n_lsh_only,
                   CAST(n_winnow - n_both AS BIGINT) AS n_winnow_only,
                   CAST(CASE WHEN n_lsh + n_winnow - n_both = 0 THEN NULL
                        ELSE (1000000 * n_both) // (n_lsh + n_winnow - n_both)
                        END AS BIGINT) AS agreement_ppm
            FROM a
        """,
        # t52: t06's simhash CTE verbatim + the banded pigeonhole cascade.
        # Bucket guard mirrors the operator's max_bucket; DISTINCT over
        # (pair, fingerprints) dedups multi-band matches exactly because
        # the fingerprint is functional on doc_id.
        "t52_simhash_near_dups": f"""
            WITH sh AS ({_simhash_sql(16)}),
            bb AS (
                SELECT doc_id, simhash, b, (simhash >> (b * 4)) & 15 AS chunk
                FROM sh CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS b)
            ),
            keepb AS (
                SELECT b, chunk FROM bb
                GROUP BY b, chunk HAVING count(*) <= 100000
            ),
            kept AS (SELECT bb.* FROM bb JOIN keepb USING (b, chunk)),
            cand AS (
                SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b,
                       a.simhash AS sh_a, b2.simhash AS sh_b
                FROM kept a JOIN kept b2
                  ON a.b = b2.b AND a.chunk = b2.chunk
                 AND a.doc_id < b2.doc_id
            )
            SELECT doc_a, doc_b,
                   CAST(bit_count(xor(sh_a, sh_b)) AS BIGINT) AS hamming
            FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= 3
        """,
        "g48_type_mixing_matrix": f"""
            WITH {GRAPH_CTE},
            typed AS (
                SELECT e.edge_type, nf.node_type AS from_type,
                       nt.node_type AS to_type
                FROM edges e
                JOIN nodes nf ON nf.id = e.from_node_id
                JOIN nodes nt ON nt.id = e.to_node_id
            ),
            cells AS (
                SELECT edge_type, from_type, to_type,
                       CAST(count(*) AS BIGINT) AS n_edges
                FROM typed GROUP BY 1, 2, 3
            ),
            tot AS (SELECT CAST(sum(n_edges) AS BIGINT) AS n_total FROM cells)
            SELECT edge_type, from_type, to_type, n_edges,
                   CAST((n_edges * 1000000) // n_total AS BIGINT) AS share_ppm
            FROM cells CROSS JOIN tot
        """,
        # v31: positive-epoch hour-of-day (both engines truncate toward
        # zero); the 24-hour spine makes missing hours real zeros
        "v31_hour_of_day_profile": """
            WITH hourly AS (
                SELECT event_type,
                       CAST((epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) % 24
                            AS BIGINT) AS hour,
                       CAST(count(*) AS BIGINT) AS n
                FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
            ),
            spine AS (
                SELECT DISTINCT event_type, CAST(h AS BIGINT) AS hour
                FROM hourly CROSS JOIN (SELECT unnest(range(24)) AS h)
            ),
            full_h AS (
                SELECT s.event_type, s.hour,
                       CAST(COALESCE(hourly.n, 0) AS BIGINT) AS n
                FROM spine s
                LEFT JOIN hourly ON hourly.event_type = s.event_type
                                AND hourly.hour = s.hour
            ),
            tot AS (
                SELECT event_type, CAST(sum(n) AS BIGINT) AS n_type
                FROM full_h GROUP BY event_type
            )
            SELECT f.event_type, f.hour, f.n,
                   CAST((f.n * 1000000) // t.n_type AS BIGINT) AS share_ppm
            FROM full_h f JOIN tot t USING (event_type)
        """,
        # t53: every class an explicit ASCII range (the Java/RE2-identical
        # subset), DuckDB regexp_replace needs the 'g' flag (default is
        # first-match-only, unlike Java), U+FFFD via literal replace;
        # both engines' length() counts code points
        "t53_charset_audit": """
            WITH per AS (
                SELECT source,
                       CAST(length(text) AS BIGINT) AS chars,
                       CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS BIGINT) AS letters,
                       CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT) AS digits,
                       CAST(length(text) - length(regexp_replace(text, '[ \\t\\n\\r]', '', 'g')) AS BIGINT) AS ws,
                       CAST(length(text) - length(regexp_replace(text, '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]', '', 'g')) AS BIGINT) AS ctl,
                       CAST(length(text) - length(regexp_replace(text, '[^\\x00-\\x7f]', '', 'g')) AS BIGINT) AS nonascii,
                       CAST(length(text) - length(replace(text, chr(65533), '')) AS BIGINT) AS repl
                FROM documents WHERE text IS NOT NULL
            ),
            ag AS (
                SELECT source,
                       CAST(count(*) AS BIGINT) AS n_docs,
                       CAST(sum(chars) AS BIGINT) AS n_chars,
                       CAST(sum(letters) AS BIGINT) AS n_letters,
                       CAST(sum(digits) AS BIGINT) AS n_digits,
                       CAST(sum(ws) AS BIGINT) AS n_ws,
                       CAST(sum(ctl) AS BIGINT) AS n_control,
                       CAST(sum(nonascii) AS BIGINT) AS n_nonascii,
                       CAST(sum(repl) AS BIGINT) AS n_replacement
                FROM per GROUP BY source
            )
            SELECT source, n_docs, n_chars, n_letters, n_digits, n_ws,
                   n_control, n_nonascii, n_replacement,
                   CAST(n_nonascii * 1000000 // n_chars AS BIGINT) AS nonascii_ppm,
                   CAST(n_control * 1000000 // n_chars AS BIGINT) AS control_ppm,
                   CAST(n_replacement * 1000000 // n_chars AS BIGINT) AS replacement_ppm
            FROM ag WHERE n_chars > 0
        """,
        # e21: e20's vm/pairs CTEs verbatim, rank-2 conditional agg,
        # the v24 nano-ln idiom per distance (d2 ≥ 1 when > 0, so every
        # ln ≥ 0 and round-half-away == Spark's HALF_UP everywhere)
        "e21_intrinsic_dimension": """
            WITH vm AS (
                SELECT vec_id, label,
                       list_transform(embedding,
                           c -> CAST(round(CAST(c AS DOUBLE) * 1000000) AS BIGINT)) AS v
                FROM embeddings
            ),
            pairs AS (
                SELECT a.vec_id AS a_id, a.label, b.vec_id AS b_id,
                       list_sum(list_transform(range(1, len(a.v) + 1),
                           i -> (a.v[i] - b.v[i]) * (a.v[i] - b.v[i]))) AS d2
                FROM vm a JOIN vm b ON a.label = b.label AND a.vec_id <> b.vec_id
            ),
            rnk AS (
                SELECT a_id, label, d2,
                       -- (a_id, label), not a_id: a multi-probe vector in
                       -- several blocks ranks independently per block
                       row_number() OVER (PARTITION BY a_id, label ORDER BY d2, b_id) AS rn
                FROM pairs
            ),
            two AS (
                SELECT a_id, label,
                       min(CASE WHEN rn = 1 THEN d2 END) AS d2_1,
                       min(CASE WHEN rn = 2 THEN d2 END) AS d2_2
                FROM rnk WHERE rn <= 2 GROUP BY a_id, label
            ),
            per AS (
                SELECT label,
                       CAST(round(ln(CAST(d2_2 AS DOUBLE)) * 1e9) AS BIGINT)
                       - CAST(round(ln(CAST(d2_1 AS DOUBLE)) * 1e9) AS BIGINT)
                       AS term_nano
                FROM two WHERE d2_1 > 0 AND d2_2 IS NOT NULL
            ),
            ag AS (
                SELECT label, CAST(count(*) AS BIGINT) AS n_used,
                       CAST(sum(term_nano) AS BIGINT) AS sum_ln2x_nano
                FROM per GROUP BY label
            )
            SELECT label, n_used, sum_ln2x_nano,
                   round(2e9 * n_used / sum_ln2x_nano, 6) AS id_est
            FROM ag WHERE sum_ln2x_nano > 0
        """,
        "t17_bm25_indexed": bm25_sql(["spark", "hash", "vector"]),
        # unnormalized fixed-iteration HITS: exact integer sums, both
        # h-then-a rounds unrolled (a0≡1 ⇒ h1 = out-degree). CASTs keep
        # DuckDB's SUM(BIGINT)→HUGEINT promotion out of the compared schema.
        "g29_hits": f"""
            WITH {GRAPH_CTE},
            e AS (
                SELECT DISTINCT from_node_id AS s, to_node_id AS d FROM edges
                WHERE edge_type IN ('FOLLOWS', 'PLACED')
            ),
            n AS (SELECT s AS node_id FROM e UNION SELECT d FROM e),
            h1 AS (SELECT s, CAST(count(*) AS BIGINT) AS v FROM e GROUP BY s),
            a1 AS (
                SELECT e.d, CAST(sum(h1.v) AS BIGINT) AS v
                FROM e JOIN h1 ON e.s = h1.s GROUP BY e.d
            ),
            h2 AS (
                SELECT e.s, CAST(sum(a1.v) AS BIGINT) AS v
                FROM e JOIN a1 ON e.d = a1.d GROUP BY e.s
            ),
            a2 AS (
                SELECT e.d, CAST(sum(h2.v) AS BIGINT) AS v
                FROM e JOIN h2 ON e.s = h2.s GROUP BY e.d
            )
            SELECT n.node_id,
                   COALESCE(h2.v, 0) AS hub_score,
                   COALESCE(a2.v, 0) AS auth_score
            FROM n
            LEFT JOIN h2 ON n.node_id = h2.s
            LEFT JOIN a2 ON n.node_id = a2.d
        """,
        # truncated Katz, beta_inv=4, iters=3: katz_scaled = 16*p1 +
        # 4*p2 + p3 over exact directed-walk counts (p0≡1 ⇒ p1 =
        # in-degree); all-integer, so checked bit-exactly like g29.
        "g31_katz_centrality": f"""
            WITH {GRAPH_CTE},
            e AS (
                SELECT DISTINCT from_node_id AS s, to_node_id AS d FROM edges
                WHERE edge_type IN ('FOLLOWS', 'PLACED')
            ),
            n AS (SELECT s AS node_id FROM e UNION SELECT d FROM e),
            p1 AS (SELECT d, CAST(count(*) AS BIGINT) AS v FROM e GROUP BY d),
            p2 AS (
                SELECT e.d, CAST(sum(p1.v) AS BIGINT) AS v
                FROM e JOIN p1 ON e.s = p1.d GROUP BY e.d
            ),
            p3 AS (
                SELECT e.d, CAST(sum(p2.v) AS BIGINT) AS v
                FROM e JOIN p2 ON e.s = p2.d GROUP BY e.d
            )
            SELECT n.node_id,
                   CAST(16 * COALESCE(p1.v, 0) + 4 * COALESCE(p2.v, 0)
                        + COALESCE(p3.v, 0) AS BIGINT) AS katz_scaled
            FROM n
            LEFT JOIN p1 ON n.node_id = p1.d
            LEFT JOIN p2 ON n.node_id = p2.d
            LEFT JOIN p3 ON n.node_id = p3.d
        """,
        "g33_reciprocity": f"""
            WITH {GRAPH_CTE},
            e AS (
                SELECT DISTINCT edge_type, from_node_id AS u, to_node_id AS v
                FROM edges WHERE from_node_id <> to_node_id
            ),
            r AS (
                SELECT e.edge_type, count(*) AS n_recip
                FROM e
                WHERE EXISTS (
                    SELECT 1 FROM e e2
                    WHERE e2.edge_type = e.edge_type
                      AND e2.u = e.v AND e2.v = e.u
                )
                GROUP BY e.edge_type
            ),
            t AS (
                SELECT edge_type, count(*) AS n_edges FROM e GROUP BY edge_type
            )
            SELECT t.edge_type,
                   CAST(t.n_edges AS BIGINT) AS n_edges,
                   CAST(COALESCE(r.n_recip, 0) AS BIGINT) AS n_reciprocal,
                   CAST((1000000 * COALESCE(r.n_recip, 0)) // t.n_edges AS BIGINT)
                       AS reciprocity_ppm
            FROM t LEFT JOIN r USING (edge_type)
        """,
        "g32_truncated_closeness": f"""
            WITH RECURSIVE {GRAPH_CTE},
            {_BFS3_CTES}
            SELECT src AS node_id,
                   CAST(count(*) AS BIGINT) AS n_reached,
                   CAST(sum(dist) AS BIGINT) AS total_dist,
                   CAST((1000000 * count(*)) // sum(dist) AS BIGINT) AS closeness_ppm
            FROM md WHERE dist > 0 GROUP BY src
        """,
        # g46 bowtie: two single-source bounded recursive CTEs (forward +
        # reversed) from the max-out-degree pivot — membership only, so
        # UNION-dedup on (node, dist) rows terminates at the horizon
        "g46_bowtie_probe": f"""
            WITH RECURSIVE {GRAPH_CTE},
            bt_g AS (
                SELECT DISTINCT from_node_id AS u, to_node_id AS v
                FROM edges
                WHERE edge_type IN ('PLACED', 'FOLLOWS', 'USES_PART')
            ),
            bt_pivot AS (
                SELECT u AS p FROM bt_g GROUP BY u
                ORDER BY count(*) DESC, u ASC LIMIT 1
            ),
            bt_fw(node, dist) AS (
                SELECT p, 0 FROM bt_pivot
                UNION
                SELECT bt_g.v, bt_fw.dist + 1
                FROM bt_fw JOIN bt_g ON bt_g.u = bt_fw.node
                WHERE bt_fw.dist < 3
            ),
            bt_bw(node, dist) AS (
                SELECT p, 0 FROM bt_pivot
                UNION
                SELECT bt_g.u, bt_bw.dist + 1
                FROM bt_bw JOIN bt_g ON bt_g.v = bt_bw.node
                WHERE bt_bw.dist < 3
            ),
            bt_f AS (SELECT DISTINCT node FROM bt_fw),
            bt_b AS (SELECT DISTINCT node FROM bt_bw),
            -- NOT `UNION`: inside WITH RECURSIVE, DuckDB 1.0 gives every
            -- CTE's UNION recursive (non-deduplicating) semantics even
            -- when the CTE never references itself — verified live; use
            -- UNION ALL + DISTINCT for plain set union here
            bt_all AS (
                SELECT DISTINCT node FROM (
                    SELECT u AS node FROM bt_g
                    UNION ALL SELECT v FROM bt_g
                )
            ),
            bt_cls AS (
                SELECT CASE
                    WHEN f.node IS NOT NULL AND b.node IS NOT NULL THEN 'CORE'
                    WHEN b.node IS NOT NULL THEN 'IN'
                    WHEN f.node IS NOT NULL THEN 'OUT'
                    ELSE 'OUTSIDE_HORIZON' END AS region
                FROM bt_all a
                LEFT JOIN bt_f f ON f.node = a.node
                LEFT JOIN bt_b b ON b.node = a.node
            )
            SELECT region, CAST(count(*) AS BIGINT) AS n_nodes,
                   (SELECT p FROM bt_pivot) AS pivot_node_id
            FROM bt_cls GROUP BY region
        """,
        # g44 shares g32's bounded-BFS CTE blocks (ONE definition of the
        # 3-hop min-distance frame); 6 // dist is exact for dist in 1..3
        # (6 = lcm), so the harmonic score carries zero rounding
        "g44_truncated_harmonic": f"""
            WITH RECURSIVE {GRAPH_CTE},
            {_BFS3_CTES}
            SELECT src AS node_id,
                   CAST(count(*) AS BIGINT) AS n_reached,
                   CAST(sum(6 // dist) AS BIGINT) AS h_units,
                   CAST((1000 * sum(6 // dist)) // 6 AS BIGINT) AS harmonic_milli
            FROM md WHERE dist > 0 GROUP BY src
        """,
        "g17_shortest_paths": f"""
            WITH RECURSIVE {GRAPH_CTE},
            g AS (
                SELECT from_node_id, to_node_id FROM edges
                WHERE edge_type IN ('FOLLOWS', 'USES_PART')
            ),
            sp AS (
                SELECT landmark, landmark AS node_id, 0 AS dist
                FROM (VALUES ('p1'), ('p2')) L(landmark)
                UNION
                SELECT sp.landmark, g.from_node_id, sp.dist + 1
                FROM sp JOIN g ON g.to_node_id = sp.node_id
                WHERE sp.dist < 6
            )
            SELECT landmark, node_id, min(dist) AS dist
            FROM sp GROUP BY landmark, node_id
        """,
        "e10_nearest_centroid": "WITH " + _CENT_DIST_CTES + """,
            r AS (
                SELECT *, row_number() OVER (
                    PARTITION BY vec_id ORDER BY dist_micro2, cand_label) AS rn
                FROM d
            )
            SELECT vec_id, own_label, cand_label AS assigned_label,
                   CAST(dist_micro2 AS BIGINT) AS dist_micro2
            FROM r WHERE rn = 1
        """,
        "t29_snapshot_diff": f"""
            WITH newt AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS text
                FROM documents WHERE doc_id % 10 <> 0
                UNION ALL
                SELECT doc_id + 1000000, 'added ' || text
                FROM documents WHERE doc_id % 13 = 0
            ),
            of AS (
                SELECT doc_id AS key, {_fingerprint_sql('text')} AS fp FROM documents
            ),
            nf AS (
                SELECT doc_id AS key, {_fingerprint_sql('text')} AS fp FROM newt
            )
            SELECT COALESCE(of.key, nf.key) AS key,
                   CASE WHEN of.key IS NULL THEN 'added'
                        WHEN nf.key IS NULL THEN 'removed'
                        WHEN of.fp IS DISTINCT FROM nf.fp THEN 'changed'
                        ELSE 'unchanged' END AS status
            FROM of FULL OUTER JOIN nf ON of.key = nf.key
        """,
        "t28_cross_source_dup_matrix": f"""
            WITH pairs AS (
                SELECT * FROM ({_minhash_lsh_sql(k=8, shingle_k=4, bands=4)})
            )
            SELECT least(da.source, db.source) AS source_a,
                   greatest(da.source, db.source) AS source_b,
                   CAST(count(*) AS BIGINT) AS n_pairs
            FROM pairs p
            JOIN documents da ON p.doc_a = da.doc_id
            JOIN documents db ON p.doc_b = db.doc_id
            GROUP BY 1, 2
        """,
        "t10_dedup_cluster_survivors": f"""
            WITH RECURSIVE pairs AS (
                SELECT * FROM ({_minhash_lsh_sql(k=8, shingle_k=4, bands=4)})
            ),
            und AS (
                SELECT doc_a AS u, doc_b AS v FROM pairs
                UNION
                SELECT doc_b, doc_a FROM pairs
            ),
            reach AS (
                SELECT u AS start, u AS node FROM (SELECT DISTINCT u FROM und)
                UNION
                SELECT r.start, und.v FROM reach r JOIN und ON und.u = r.node
            ),
            comp AS (
                SELECT start AS doc_id, min(node) AS survivor_id
                FROM reach GROUP BY start
            )
            SELECT doc_id, survivor_id,
                   count(*) OVER (PARTITION BY survivor_id) AS n_docs
            FROM comp
        """,
        "t11_stratified_sample": f"""
            WITH rates(source, rate_ppm) AS (
                VALUES {", ".join(f"('src{i}', {200000 if i % 2 == 0 else 50000})" for i in range(20))}
            )
            SELECT d.doc_id, d.source, d.lang
            FROM documents d JOIN rates r USING (source)
            WHERE {portable_hash64_sql("d.doc_id", seed=7)} % 1000000 < r.rate_ppm
        """,
        "t12_quota_sample": f"""
            WITH h AS (
                SELECT doc_id, source,
                       {portable_hash64_sql("doc_id", seed=7)} % 1000000 AS b
                FROM documents
            ),
            r AS (
                SELECT doc_id, source,
                       CAST(row_number() OVER (PARTITION BY source ORDER BY b, doc_id) AS INT) AS pick
                FROM h
            )
            SELECT doc_id, source, pick FROM r WHERE pick <= 10
        """,
        "t13_token_budget_sample": f"""
            WITH h AS (
                SELECT doc_id, source,
                       {portable_hash64_sql("doc_id", seed=7)} % 1000000 AS b,
                       CAST(len({toks}) AS BIGINT) AS n_tok
                FROM documents
            ),
            c AS (
                SELECT doc_id, source,
                       CAST(sum(n_tok) OVER (
                           PARTITION BY source ORDER BY b, doc_id
                           ROWS UNBOUNDED PRECEDING
                       ) AS BIGINT) AS cum_tokens
                FROM h
            )
            SELECT doc_id, source, cum_tokens FROM c WHERE cum_tokens <= 700
        """,
        "t14_quality_floor": """
            WITH scored AS (
                SELECT doc_id, source,
                       round(CASE WHEN length(text) > 0
                             THEN CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / length(text)
                             ELSE 0.0 END, 6) AS score6
                FROM documents
            ),
            thr AS (
                SELECT source, round(quantile_cont(score6, 0.1), 6) AS floor6
                FROM scored GROUP BY source
            )
            SELECT doc_id, scored.source AS source, score6
            FROM scored JOIN thr ON scored.source IS NOT DISTINCT FROM thr.source
            WHERE score6 >= floor6
        """,
        "t16_bm25_search": bm25_sql(["spark", "hash", "vector"]),
        "t15_pii_redaction": """
            WITH pii AS (
                SELECT doc_id,
                       text || ' contact user' || CAST(doc_id AS VARCHAR)
                            || '@example.com ph 555-867-'
                            || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                            || ' ip 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1'
                           AS s
                FROM documents
            ),
            e AS (
                SELECT doc_id,
                       CAST(len(regexp_extract_all(s, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
                       regexp_replace(s, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[EMAIL]', 'g') AS s1
                FROM pii
            ),
            p AS (
                SELECT doc_id, n_email,
                       CAST(len(regexp_extract_all(s1, '\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b')) AS BIGINT) AS n_phone,
                       regexp_replace(s1, '\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b', '[PHONE]', 'g') AS s2
                FROM e
            )
            SELECT doc_id, n_email, n_phone,
                   CAST(len(regexp_extract_all(s2, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS BIGINT) AS n_ip,
                   regexp_replace(s2, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '[IP]', 'g') AS redacted
            FROM p
        """,
        "e03_knn_lsh": _knn_lsh_sql(dim=64, planes=6, k=10),
        "e05_knn_lsh_multiprobe": _knn_lsh_sql(dim=64, planes=6, k=10, hamming=1),
        "g11_undirected_degree": f"""
            WITH {GRAPH_CTE},
            und AS (
                SELECT from_node_id AS node_id FROM edges WHERE edge_type = 'FOLLOWS'
                UNION ALL
                SELECT to_node_id FROM edges WHERE edge_type = 'FOLLOWS'
            )
            SELECT node_id, count(*) AS degree FROM und GROUP BY node_id
        """,
        "e01_knn_bruteforce": knn_exact_sql,
        "e02_embedding_near_dups": f"""
            SELECT a.vec_id AS doc_a, b.vec_id AS doc_b, round({cos_ab}, 6) AS cosine
            FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
            WHERE round({cos_ab}, 6) >= 0.25
        """,
        "v01_hourly_rollup": """
            SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour, event_type,
                   count(*) AS n, round(sum(value), 2) AS total_value
            FROM events GROUP BY 1, 2
        """,
        "v02_user_value_topk": """
            SELECT user_id, round(sum(value), 2) AS total_value, count(*) AS n_events
            FROM events GROUP BY user_id
            ORDER BY total_value DESC, user_id LIMIT 10
        """,
        "v04_asof_attribution": """
            WITH p AS (
                SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS purchase_us
                FROM events WHERE event_type = 'purchase'
            ),
            c AS (
                SELECT user_id, event_id AS click_id, epoch_us(ts) AS click_us
                FROM events WHERE event_type = 'click'
            )
            SELECT p.user_id, p.purchase_id, p.purchase_us, c.click_id, c.click_us
            FROM p ASOF JOIN c
              ON p.user_id = c.user_id AND p.purchase_us >= c.click_us
        """,
        "v06_asof_forward": """
            WITH e AS (
                SELECT user_id, event_id AS error_id, epoch_us(ts) AS error_us
                FROM events WHERE event_type = 'error'
            ),
            p AS (
                SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS purchase_us
                FROM events WHERE event_type = 'purchase'
            )
            SELECT e.user_id, e.error_id, e.error_us, p.purchase_id, p.purchase_us
            FROM e ASOF JOIN p
              ON e.user_id = p.user_id AND e.error_us <= p.purchase_us
        """,
        "e08_mmr_rerank": _mmr_sql(nq=3, pool=20, k=5, lam=0.7),
        "v07_cooccurrence_graph": """
            WITH b AS (
                SELECT DISTINCT CAST(user_id AS VARCHAR) AS uid,
                       replace(replace(event_type, '\\', '\\\\'), '|', '\\|') || '|' ||
                       strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS blk
                FROM events
            ),
            cn AS (
                SELECT a.uid AS user_a, c.uid AS user_b, count(*) AS weight
                FROM b a JOIN b c ON a.blk = c.blk AND a.uid < c.uid
                GROUP BY 1, 2 HAVING count(*) >= 2
            )
            SELECT user_a, user_b, weight FROM cn
            ORDER BY weight DESC, user_a, user_b LIMIT 100
        """,
        "v08_daily_retention": """
            WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
            daily AS (SELECT day, count(DISTINCT user_id) AS n_active FROM act GROUP BY day),
            ret AS (
                SELECT a.day + 1 AS day, count(DISTINCT a.user_id) AS n_retained
                FROM act a JOIN act b ON b.user_id = a.user_id AND b.day = a.day + 1
                GROUP BY a.day
            )
            SELECT strftime(d.day, '%Y-%m-%d') AS day, d.n_active,
                   coalesce(r.n_retained, 0) AS n_retained,
                   round(CAST(coalesce(r.n_retained, 0) AS DOUBLE) / p.n_active, 6) AS retention_rate
            FROM daily d
            LEFT JOIN ret r ON r.day = d.day
            JOIN daily p ON p.day = d.day - 1
        """,
        "v09_rolling_active_users": """
            WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
            offs AS (SELECT CAST(unnest(generate_series(0, 6)) AS INTEGER) AS off),
            win AS (SELECT a.user_id, a.day + o.off AS win_day FROM act a CROSS JOIN offs o)
            SELECT strftime(win_day, '%Y-%m-%d') AS day,
                   count(DISTINCT user_id) AS n_active_7d
            FROM win WHERE win_day <= (SELECT max(day) FROM act)
            GROUP BY win_day
        """,
        "v10_funnel_conversion": """
            WITH v AS (
                SELECT user_id, min(ts) AS t_view FROM events
                WHERE event_type = 'view' GROUP BY user_id
            ),
            c AS (
                SELECT e.user_id, min(e.ts) AS t_click
                FROM events e JOIN v ON v.user_id = e.user_id
                WHERE e.event_type = 'click' AND e.ts > v.t_view
                  AND e.ts <= v.t_view + INTERVAL 6 HOUR
                GROUP BY e.user_id
            ),
            p AS (
                SELECT e.user_id, min(e.ts) AS t_purchase
                FROM events e JOIN c ON c.user_id = e.user_id
                WHERE e.event_type = 'purchase' AND e.ts > c.t_click
                  AND e.ts <= c.t_click + INTERVAL 6 HOUR
                GROUP BY e.user_id
            )
            SELECT (SELECT count(*) FROM v) AS n_viewed,
                   (SELECT count(*) FROM c) AS n_clicked_after_view,
                   (SELECT count(*) FROM p) AS n_purchased_after_click
        """,
        # duplicated-passage audit: same lower+whitespace tokenizer as the
        # Spark side; DuckDB range(1, L-6) is empty for L<8 (the operator's
        # explicit short-doc guard), slice ts[i:i+7] is 1-based inclusive =
        # 8 tokens. countDistinct is exact on both sides (two-phase salted
        # partials are slot-disjoint in Spark).
        "t25_ngram_novelty": r"""
            WITH toks AS (
                SELECT doc_id,
                       list_filter(string_split_regex(lower(text), '\s+'),
                                   w -> w != '') AS ts
                FROM documents
            ), starts AS (
                SELECT doc_id, ts,
                       unnest(range(1, greatest(len(ts) - 6, 1))) AS i
                FROM toks
            ), grams AS (
                SELECT DISTINCT doc_id,
                       array_to_string(ts[i : i + 7], ' ') AS gram
                FROM starts
            ), gdf AS (
                SELECT gram, count(*) AS df FROM grams GROUP BY gram
            )
            SELECT g.doc_id,
                   CAST(count(*) AS BIGINT) AS n_grams,
                   CAST(count(*) FILTER (WHERE d.df >= 2) AS BIGINT)
                       AS n_shared,
                   CAST((1000000 * count(*) FILTER (WHERE d.df >= 2))
                        // count(*) AS BIGINT) AS shared_ppm
            FROM grams g JOIN gdf d USING (gram)
            GROUP BY g.doc_id
        """,
        "t26_repetition_signals": r"""
            WITH toks AS (
                SELECT doc_id,
                       list_filter(string_split_regex(lower(text), '\s+'),
                                   w -> w != '') AS ts
                FROM documents
            ), words AS (
                SELECT doc_id, unnest(ts) AS word FROM toks
            ), wh AS (
                SELECT doc_id, word, count(*) AS c
                FROM words GROUP BY doc_id, word
            ), pw AS (
                SELECT doc_id, sum(c) AS n_words, max(c) AS topc
                FROM wh GROUP BY doc_id
            ), starts AS (
                SELECT doc_id, ts,
                       unnest(range(1, greatest(len(ts), 1))) AS i
                FROM toks
            ), grams AS (
                SELECT doc_id, array_to_string(ts[i : i + 1], ' ') AS gram
                FROM starts
            ), gh AS (
                SELECT doc_id, gram, count(*) AS c
                FROM grams GROUP BY doc_id, gram
            ), pg AS (
                SELECT doc_id, sum(c) AS n_2grams, count(*) AS nd,
                       max(c) AS maxrep
                FROM gh GROUP BY doc_id
            )
            SELECT pw.doc_id,
                   CAST(pw.n_words AS BIGINT) AS n_words,
                   CAST((1000000 * pw.topc) // pw.n_words AS BIGINT)
                       AS top_word_ppm,
                   CAST(pg.n_2grams AS BIGINT) AS n_2grams,
                   CAST((1000000 * (pg.n_2grams - pg.nd)) // pg.n_2grams
                        AS BIGINT) AS dup_2gram_ppm,
                   CAST(pg.maxrep AS BIGINT) AS max_2gram_repeat
            FROM pw JOIN pg USING (doc_id)
        """,
        "t27_decontaminate": r"""
            WITH toks AS (
                SELECT doc_id,
                       list_filter(string_split_regex(lower(text), '\s+'),
                                   w -> w != '') AS ts
                FROM documents
            ), starts AS (
                SELECT doc_id, ts,
                       unnest(range(1, greatest(len(ts) - 6, 1))) AS i
                FROM toks
            ), grams AS (
                SELECT DISTINCT doc_id,
                       array_to_string(ts[i : i + 7], ' ') AS gram
                FROM starts
            ), bg AS (
                SELECT DISTINCT gram FROM grams WHERE doc_id % 10 = 0
            ), cg AS (
                SELECT doc_id, gram FROM grams WHERE doc_id % 10 != 0
            ), hits AS (
                SELECT cg.doc_id, count(*) AS n_grams,
                       count(*) FILTER (WHERE bg.gram IS NOT NULL) AS n_hit
                FROM cg LEFT JOIN bg ON cg.gram = bg.gram
                GROUP BY cg.doc_id
            )
            SELECT d.doc_id,
                   CAST(coalesce(h.n_grams, 0) AS BIGINT) AS n_grams,
                   CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit_grams,
                   CAST(CASE WHEN coalesce(h.n_hit, 0) > 0 THEN 1 ELSE 0 END
                        AS BIGINT) AS contaminated
            FROM (SELECT doc_id FROM documents WHERE doc_id % 10 != 0) d
            LEFT JOIN hits h USING (doc_id)
        """,
        "v12_interarrival_stats": """
            WITH lagged AS (
                SELECT user_id,
                       epoch_us(ts) - lag(epoch_us(ts)) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                       ) AS gap_us
                FROM events
            )
            SELECT user_id,
                   CAST(count(*) AS BIGINT) AS n_gaps,
                   CAST(min(gap_us) AS BIGINT) AS min_gap_us,
                   CAST(max(gap_us) AS BIGINT) AS max_gap_us,
                   CAST(sum(gap_us) // count(*) AS BIGINT) AS avg_gap_us
            FROM lagged WHERE gap_us IS NOT NULL
            GROUP BY user_id
        """,
        "v28_burstiness_profile": f"""
            WITH gaps AS ({_GAPS_SQL}), agg AS (
                SELECT event_type,
                       CAST(count(DISTINCT user_id) AS BIGINT) AS n_sequences,
                       CAST(count(*) AS BIGINT) AS n_gaps,
                       CAST(sum(gap_s) AS BIGINT) AS sum_gap_s,
                       CAST(sum(gap_s * gap_s) AS BIGINT) AS sum_gap2_s
                FROM gaps GROUP BY event_type
            )
            SELECT event_type, n_sequences, n_gaps, sum_gap_s, sum_gap2_s,
                   CAST(sum_gap_s // n_gaps AS BIGINT) AS mean_gap_s,
                   CAST(1 AS DOUBLE) - (2 * CAST(sum_gap_s AS DOUBLE)
                       * CAST(sum_gap_s AS DOUBLE))
                       / (CAST(n_gaps AS DOUBLE)
                          * CAST(sum_gap2_s AS DOUBLE)) AS burstiness
            FROM agg WHERE sum_gap2_s > 0
        """,
        # v30: the SAME _GAPS_SQL literal as v28; bucket = exact binary
        # bit-length (length(bin(x)) identical both engines), shares via
        # a window over the bounded histogram frame
        "v30_gap_histogram": f"""
            WITH g AS (
                SELECT event_type, gap_s,
                       CASE WHEN gap_s = 0 THEN 0
                            ELSE length(bin(gap_s)) END AS bucket
                FROM ({_GAPS_SQL})
            ),
            h AS (
                SELECT event_type, CAST(bucket AS BIGINT) AS bucket,
                       CAST(count(*) AS BIGINT) AS n_gaps,
                       CAST(min(gap_s) AS BIGINT) AS min_gap_s,
                       CAST(max(gap_s) AS BIGINT) AS max_gap_s
                FROM g GROUP BY event_type, bucket
            )
            SELECT event_type, bucket, n_gaps, min_gap_s, max_gap_s,
                   CAST((1000000 * n_gaps) // (sum(n_gaps) OVER (
                       PARTITION BY event_type)) AS BIGINT) AS share_ppm
            FROM h
        """,
        # v29: the SAME _TRANSITIONS_SQL literal as v11/v22 nested as a
        # derived table; nano-ln per exact count, sum as bigint, one
        # non-negative floor division (every term >= 0: round is monotone)
        "v29_transition_entropy": f"""
            WITH t AS (
                SELECT from_type, to_type,
                       CAST(n_transitions AS BIGINT) AS n
                FROM ({_TRANSITIONS_SQL})
            ),
            tot AS (
                SELECT from_type, CAST(sum(n) AS BIGINT) AS n_out,
                       CAST(count(*) AS BIGINT) AS n_next_types
                FROM t GROUP BY from_type
            ),
            j AS (
                SELECT t.from_type,
                       t.n * (CAST(round(ln(CAST(tot.n_out AS DOUBLE)) * 1e9) AS BIGINT)
                              - CAST(round(ln(CAST(t.n AS DOUBLE)) * 1e9) AS BIGINT)) AS term,
                       tot.n_out, tot.n_next_types
                FROM t JOIN tot USING (from_type)
            ),
            a AS (
                SELECT from_type, max(n_out) AS n_out,
                       max(n_next_types) AS n_next_types,
                       CAST(sum(term) AS BIGINT) AS sum_term_nano
                FROM j GROUP BY from_type
            )
            SELECT from_type, CAST(n_out AS BIGINT) AS n_out,
                   CAST(n_next_types AS BIGINT) AS n_next_types,
                   sum_term_nano,
                   CAST(sum_term_nano // n_out AS BIGINT) AS h_nano
            FROM a
        """,
        # t50: exact-integer KS — DuckDB's SUM(BIGINT) runs in HUGEINT so
        # the cross-multiplied deviations never overflow there; Spark's
        # long arithmetic is the binding side (documented on the operator)
        "t50_length_ks_drift": """
            WITH per AS (
                SELECT source, CAST(length(text) AS BIGINT) AS v
                FROM documents WHERE text IS NOT NULL
            ), cnt AS (
                SELECT source, v, CAST(count(*) AS BIGINT) AS c_sv
                FROM per GROUP BY source, v
            ), vals AS (SELECT DISTINCT v FROM cnt),
            srcs AS (
                SELECT source, CAST(sum(c_sv) AS BIGINT) AS n_s
                FROM cnt GROUP BY source
            ), cv AS (
                SELECT v, CAST(sum(c_sv) AS BIGINT) AS c_v
                FROM cnt GROUP BY v
            ), tot AS (SELECT CAST(sum(c_v) AS BIGINT) AS n_total FROM cv),
            spine AS (SELECT s.source, s.n_s, vals.v FROM srcs s CROSS JOIN vals),
            j AS (
                SELECT sp.source, sp.n_s, sp.v,
                       COALESCE(cnt.c_sv, 0) AS c_sv, cv.c_v
                FROM spine sp
                LEFT JOIN cnt ON cnt.source = sp.source AND cnt.v = sp.v
                JOIN cv ON cv.v = sp.v
            ), cum AS (
                SELECT source, n_s, v,
                       sum(c_sv) OVER (PARTITION BY source ORDER BY v) AS cum_s,
                       sum(c_v) OVER (PARTITION BY source ORDER BY v) AS cum_all
                FROM j
            ), d AS (
                SELECT source, n_s, v,
                       tot.n_total - n_s AS n_rest,
                       abs(cum_s * (tot.n_total - n_s)
                           - (cum_all - cum_s) * n_s) AS d_num
                FROM cum CROSS JOIN tot
            ), r AS (
                SELECT *, row_number() OVER (
                    PARTITION BY source ORDER BY d_num DESC, v ASC
                ) AS rn
                FROM d
            )
            SELECT source, n_s AS n_docs, CAST(n_rest AS BIGINT) AS n_rest,
                   CAST(d_num AS BIGINT) AS ks_num,
                   CAST((1000000 * d_num) // (n_s * n_rest) AS BIGINT) AS ks_ppm,
                   CAST(v AS BIGINT) AS ks_at_value
            FROM r WHERE rn = 1 AND n_rest > 0
        """,
        "t24_frequent_kgrams": r"""
            WITH toks AS (
                SELECT doc_id, source,
                       list_filter(string_split_regex(lower(text), '\s+'),
                                   w -> w != '') AS ts
                FROM documents
            ), starts AS (
                SELECT doc_id, source, ts,
                       unnest(range(1, greatest(len(ts) - 6, 1))) AS i
                FROM toks
            ), grams AS (
                SELECT source, doc_id,
                       array_to_string(ts[i : i + 7], ' ') AS gram
                FROM starts
            )
            SELECT source, gram,
                   CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
            FROM grams GROUP BY source, gram
            HAVING count(DISTINCT doc_id) >= 2
            ORDER BY n_docs DESC, source, gram LIMIT 200
        """,
        "t22_tfidf_keywords": f"""
            WITH {_TOK3_CTE},
            tf AS (SELECT doc_id, term, count(*) AS tf FROM toks3 GROUP BY doc_id, term),
            df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
            n AS (SELECT count(*) AS n_docs FROM documents),
            scored AS (
                SELECT tf.doc_id, tf.term, tf.tf,
                       round(tf.tf * ln(CAST(1 + n.n_docs AS DOUBLE) / (1 + df.df)), 6)
                           AS tfidf_score
                FROM tf JOIN df USING (term) CROSS JOIN n
            ),
            ranked AS (
                SELECT doc_id, term, tfidf_score,
                       row_number() OVER (
                           PARTITION BY doc_id
                           ORDER BY tfidf_score DESC, term
                       ) AS rank
                FROM scored
            )
            SELECT doc_id, term, rank, tfidf_score FROM ranked WHERE rank <= 3
        """,
        "t23_unigram_nll_quality": f"""
            WITH {_TOK3_CTE},
            tc AS (SELECT term, count(*) AS n_term FROM toks3 GROUP BY term),
            tot AS (SELECT sum(n_term) AS n_total FROM tc),
            ts AS (
                SELECT term,
                       CAST(round(ln(CAST(n_term AS DOUBLE) / n_total) * 1e9) AS BIGINT)
                           AS lnp_nano
                FROM tc CROSS JOIN tot
            )
            SELECT t.doc_id, count(*) AS n_tokens,
                   round(-sum(s.lnp_nano) / (count(*) * 1e9), 6) AS nll
            FROM toks3 t JOIN ts s USING (term)
            GROUP BY t.doc_id
        """,
        # t40: same ≥3-letter token filter as t23, paired AFTER filtering;
        # DuckDB lists are 1-indexed and range(1, n) excludes n, so
        # a[i] || ' ' || a[i+1] over i ∈ range(1, len(a)) enumerates exactly
        # the len-1 ordered adjacent pairs
        "t40_bigram_nll_quality": """
            WITH arr AS (
                SELECT doc_id,
                       list_filter(
                           regexp_split_to_array(lower(text), '[^a-z]+'),
                           w -> len(w) >= 3) AS a
                FROM documents
            ),
            bg AS (
                SELECT doc_id,
                       unnest(list_transform(range(1, len(a)),
                                             i -> a[i] || ' ' || a[i+1])) AS bg
                FROM arr WHERE len(a) >= 2
            ),
            bc AS (SELECT bg, count(*) AS n_bg FROM bg GROUP BY bg),
            pc AS (
                SELECT split_part(bg, ' ', 1) AS w1, sum(n_bg) AS n_prefix
                FROM bc GROUP BY 1
            ),
            ts AS (
                SELECT bg,
                       CAST(round(ln(CAST(n_bg AS DOUBLE) / n_prefix) * 1e9)
                            AS BIGINT) AS lnp_nano
                FROM bc JOIN pc ON split_part(bc.bg, ' ', 1) = pc.w1
            )
            SELECT b.doc_id, count(*) AS n_bigrams,
                   round(-sum(s.lnp_nano) / (count(*) * 1e9), 6) AS nll
            FROM bg b JOIN ts s USING (bg)
            GROUP BY b.doc_id
        """,
        "v11_event_transition_matrix": _TRANSITIONS_SQL,
        "e07_hybrid_search_rrf": f"""
            WITH lex AS (
                SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rank
                FROM ({bm25_sql(["spark", "hash", "vector"], limit=50)})
            ),
            q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
            dd AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv FROM embeddings),
            s AS (
                SELECT vec_id AS doc_id, round({cos_qd}, 9) AS s9
                FROM q CROSS JOIN dd WHERE vec_id <> 0
            ),
            semr AS (
                SELECT doc_id, row_number() OVER (ORDER BY s9 DESC, doc_id) AS rank
                FROM s
            ),
            u AS (
                SELECT doc_id, rank FROM lex
                UNION ALL SELECT doc_id, rank FROM semr WHERE rank <= 50
            )
            SELECT doc_id,
                   round(sum(CAST(1.0 AS DOUBLE) / (60 + rank)), 9) AS rrf_score,
                   count(*) AS n_lists
            FROM u GROUP BY doc_id
            ORDER BY rrf_score DESC, doc_id ASC LIMIT 20
        """,
        "v05_range_join_errors": """
            WITH p AS (
                SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS pus
                FROM events WHERE event_type = 'purchase'
            ),
            e AS (
                SELECT user_id, event_id AS error_id, epoch_us(ts) AS eus
                FROM events WHERE event_type = 'error'
            )
            SELECT p.user_id, p.purchase_id, e.error_id, e.eus - p.pus AS delta_us
            FROM p JOIN e ON p.user_id = e.user_id
             AND e.eus BETWEEN p.pus - 600 * 1000000 AND p.pus + 600 * 1000000
        """,
        "v03_sessionize": """
            WITH flagged AS (
                SELECT user_id, ts, event_id, value,
                       CASE WHEN lag(ts) OVER w IS NULL
                                 OR CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 30 * 60
                            THEN 1 ELSE 0 END AS is_new
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ),
            sess AS (
                SELECT user_id, ts, value,
                       sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING) AS session_idx
                FROM flagged
            )
            SELECT user_id, CAST(session_idx AS INT) AS session_idx,
                   count(*) AS n_events,
                   max(CAST(floor(epoch(ts)) AS BIGINT)) - min(CAST(floor(epoch(ts)) AS BIGINT)) AS duration_sec,
                   round(sum(value), 2) AS total_value
            FROM sess GROUP BY user_id, session_idx
        """,
    }
    # e06 answers the e01 query set THROUGH the persisted IVF index with
    # nprobe == k_cells (full probe == exact search), so its oracle is
    # e01's brute-force SQL verbatim
    sql["e06_knn_ivf_indexed"] = sql["e01_knn_bruteforce"]
    # v20 wraps the v03 session CTE verbatim in one more rollup (the
    # e12-on-e10 composition pattern): one definition of "session"
    sql["v20_session_duration"] = (
        "WITH base AS ("
        + sql["v03_sessionize"]
        + """)
        SELECT CAST(duration_sec // 60 AS BIGINT) AS duration_min,
               CAST(count(*) AS BIGINT) AS n_sessions,
               CAST(sum(n_events) AS BIGINT) AS n_events,
               CAST(max(duration_sec) AS BIGINT) AS max_duration_sec
        FROM base GROUP BY 1
    """
    )
    # e19 shares the _CENT_DIST_CTES trunk with e10 (one definition of
    # the vector × centroid distance), then splits own-vs-nearest-foreign
    # with sign-split per-mille divisions (non-negative dividends both
    # branches: // == div)
    sql["e19_silhouette"] = (
        "WITH " + _CENT_DIST_CTES + """,
        pv AS (
            SELECT vec_id, own_label,
                   max(CASE WHEN cand_label = own_label THEN dist_micro2 END) AS a2,
                   min(CASE WHEN cand_label <> own_label THEN dist_micro2 END) AS b2
            FROM d GROUP BY vec_id, own_label
        ),
        s AS (
            SELECT own_label AS label,
                   CASE WHEN b2 - a2 >= 0
                        THEN (b2 - a2) * 1000 // greatest(a2, b2, 1)
                        ELSE -((a2 - b2) * 1000 // greatest(a2, b2, 1)) END AS sil_milli
            FROM pv WHERE a2 IS NOT NULL AND b2 IS NOT NULL
        ),
        ag AS (
            SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
                   CAST(sum(CASE WHEN sil_milli < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_negative,
                   CAST(sum(sil_milli) AS BIGINT) AS sum_sil_milli
            FROM s GROUP BY label
        )
        SELECT label, n_vecs, n_negative, sum_sil_milli,
               CAST(CASE WHEN sum_sil_milli >= 0
                         THEN sum_sil_milli // n_vecs
                         ELSE -((-sum_sil_milli) // n_vecs) END AS BIGINT) AS mean_sil_milli
        FROM ag
    """
    )
    # e12 is e10's assignment cascade extended with the confusion rollup
    # (plain concatenation — the e10 literal contains struct braces, so
    # an f-string would mangle it)
    sql["e12_label_confusion"] = (
        "WITH assign AS ("
        + sql["e10_nearest_centroid"]
        + """)
        , conf AS (
            SELECT own_label, assigned_label,
                   CAST(count(*) AS BIGINT) AS n_vecs
            FROM assign GROUP BY own_label, assigned_label
        )
        SELECT own_label, assigned_label, n_vecs,
               CAST(sum(n_vecs) OVER (PARTITION BY own_label) AS BIGINT)
                   AS row_total,
               -- dividend non-negative: // (floor) == Spark div (trunc)
               CAST(n_vecs * 1000000
                    // sum(n_vecs) OVER (PARTITION BY own_label) AS BIGINT)
                   AS share_ppm
        FROM conf
    """
    )
    sql["g36_two_hop_reach"] = _two_hop_reach_sql()
    sql["g38_pagerank_exact"] = _pagerank_exact_sql()
    sql["g41_ppr_exact"] = _pagerank_exact_sql(seeds=["c1", "c2"])
    sql["t08_chunk_stats"] = _chunk_stats_sql()
    # e15: DuckDB recomputes the hashing-trick embedding from its own
    # md5() — little-endian first-4-bytes bucket, 5th-byte-low-bit sign —
    # and aggregates the same exact-bigint fingerprints. Tokenization
    # twin: python str.split() splits on UNICODE whitespace (RE2 \s is
    # ASCII-only), so the split class spells out python's exact set:
    # \x09-\x0d, \x1c-\x1f, space, \x85, category Zs (incl. \xa0), and
    # Zl/Zp ( / ) — validated char-for-char against
    # str.isspace() over the BMP in tests/test_property_twins.py.
    sql["e15_embed_fingerprint"] = r"""
        WITH toks AS (
            SELECT doc_id,
                   unnest(regexp_split_to_array(
                       lower(text),
                       '[\x09-\x0d\x1c-\x1f \x85\p{Zs}\x{2028}\x{2029}]+'
                   )) AS tok
            FROM documents WHERE text IS NOT NULL AND text <> ''
        ),
        hashed AS (
            SELECT doc_id,
                CAST('0x' || substr(h, 7, 2) || substr(h, 5, 2)
                     || substr(h, 3, 2) || substr(h, 1, 2) AS BIGINT)
                    % 32 AS idx,
                CASE WHEN CAST('0x' || substr(h, 9, 2) AS INT) % 2 = 1
                     THEN 1 ELSE -1 END AS sign
            FROM (SELECT doc_id, md5(tok) AS h FROM toks WHERE tok <> '')
        ),
        comps AS (
            SELECT doc_id, idx, CAST(sum(sign) AS BIGINT) AS v
            FROM hashed GROUP BY doc_id, idx
        ),
        stats AS (
            SELECT doc_id,
                CAST(count(*) FILTER (WHERE v <> 0) AS BIGINT) AS nnz,
                CAST(sum(v * v) AS BIGINT) AS sq_norm_raw,
                CAST(sum(v) AS BIGINT) AS comp_sum
            FROM comps GROUP BY doc_id
        )
        SELECT d.doc_id,
               COALESCE(s.nnz, 0) AS nnz,
               COALESCE(s.sq_norm_raw, 0) AS sq_norm_raw,
               COALESCE(s.comp_sum, 0) AS comp_sum
        FROM documents d LEFT JOIN stats s USING (doc_id)
    """
    sql["t35_minhash_fidelity"] = _minhash_fidelity_sql(k=8, shingle_k=4, bands=4)
    sql["t39_containment_audit"] = _containment_sql(k=8, shingle_k=4, bands=4)
    sql["e17_srp_fidelity"] = _srp_fidelity_sql(dim=64, planes=16)

    def _recall_block(method: str, ap_sql: str) -> str:
        # e18: exact frame (knn_exact_sql — the SAME literal as e01's
        # oracle) left-joined to one approximate path's top-k
        return f"""
            SELECT '{method}' AS method, ex.query_id,
                   CAST(count(*) AS BIGINT) AS n_exact,
                   CAST(count(ap.vec_id) AS BIGINT) AS n_hit,
                   CAST(count(ap.vec_id) * 1000000 // count(*) AS BIGINT)
                       AS recall_ppm
            FROM (SELECT query_id, vec_id FROM ({knn_exact_sql})) ex
            LEFT JOIN (SELECT query_id, vec_id FROM ({ap_sql})) ap
              ON ex.query_id = ap.query_id AND ex.vec_id = ap.vec_id
            GROUP BY ex.query_id
        """

    sql["e18_ann_recall_audit"] = (
        _recall_block("lsh", _knn_lsh_sql(dim=64, planes=6, k=10))
        + " UNION ALL "
        + _recall_block("multiprobe", _knn_lsh_sql(dim=64, planes=6, k=10, hamming=1))
    )
    sql["v22_markov_stationary"] = _markov_stationary_sql(iters=4)
    sql["e14_norm_profile"] = """
        WITH n AS (
            SELECT CAST(list_sum(list_transform(
                       list_transform(embedding,
                           x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT)),
                       y -> y * y)) AS BIGINT) AS norm2
            FROM embeddings
        )
        SELECT CAST(norm2 // 100000000000 AS BIGINT) AS bucket,
               CAST(count(*) AS BIGINT) AS n_vecs,
               CAST(min(norm2) AS BIGINT) AS min_norm2,
               CAST(max(norm2) AS BIGINT) AS max_norm2
        FROM n GROUP BY bucket
    """
    # e16: e14's micro scaling; quantization div has a non-negative
    # dividend; the error term 127·|x| − q·m0 needs NO division at all
    sql["e16_quantization_audit"] = """
        WITH x AS (
            SELECT vec_id,
                   list_transform(embedding,
                       x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS xm
            FROM embeddings
        ),
        mm AS (
            SELECT vec_id, xm,
                   CAST(list_max(list_transform(xm, v -> abs(v))) AS BIGINT)
                       AS max_abs_micro,
                   greatest(CAST(list_max(list_transform(xm, v -> abs(v))) AS BIGINT), 1)
                       AS m0,
                   CAST(len(xm) AS BIGINT) AS n_dims
            FROM x
        ),
        e AS (
            SELECT vec_id, max_abs_micro, n_dims,
                   list_transform(xm,
                       v -> 127 * abs(v) - ((abs(v) * 254 + m0) // (2 * m0)) * m0) AS err
            FROM mm
        )
        SELECT vec_id, max_abs_micro, n_dims,
               CAST(list_sum(list_transform(err, e -> e * e)) AS BIGINT) AS sq_err,
               CAST(list_max(list_transform(err, e -> abs(e))) AS BIGINT) AS max_abs_err
        FROM e
    """
    sql["g40_link_prediction"] = _link_prediction_sql(min_shared=1, top_k=100)
    sql["g39_rich_club"] = f"""
        WITH {GRAPH_CTE},
        und AS (
            SELECT DISTINCT least(from_node_id, to_node_id) AS u,
                   greatest(from_node_id, to_node_id) AS v
            FROM edges WHERE from_node_id <> to_node_id
        ),
        deg AS (
            SELECT node_id, count(*) AS degree
            FROM (SELECT u AS node_id FROM und
                  UNION ALL SELECT v FROM und)
            GROUP BY node_id
        ),
        dh AS (
            SELECT degree AS k, CAST(count(*) AS BIGINT) AS n_nodes,
                   CAST(0 AS BIGINT) AS n_edges
            FROM deg GROUP BY degree
        ),
        eh AS (
            SELECT least(da.degree, db.degree) AS k,
                   CAST(0 AS BIGINT) AS n_nodes,
                   CAST(count(*) AS BIGINT) AS n_edges
            FROM und
            JOIN deg da ON und.u = da.node_id
            JOIN deg db ON und.v = db.node_id
            GROUP BY 1
        ),
        hh AS (
            SELECT k, sum(n_nodes) AS nn, sum(n_edges) AS ne
            FROM (SELECT * FROM dh UNION ALL SELECT * FROM eh)
            GROUP BY k
        ),
        s AS (
            SELECT k,
                   coalesce(sum(nn) OVER (ORDER BY k DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       AS n_nodes_gt,
                   coalesce(sum(ne) OVER (ORDER BY k DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       AS n_edges_gt
            FROM hh
        )
        SELECT CAST(k AS BIGINT) AS k,
               CAST(n_nodes_gt AS BIGINT) AS n_nodes_gt,
               CAST(n_edges_gt AS BIGINT) AS n_edges_gt,
               -- dividend non-negative: // (floor) == Spark div (trunc)
               CAST(2 * n_edges_gt * 1000000
                    // (n_nodes_gt * (n_nodes_gt - 1)) AS BIGINT) AS phi_ppm
        FROM s WHERE n_nodes_gt >= 2
    """
    # v24: Hill MLE over per-(type,user) counts; ln terms nano bigints
    # (exact sums), zero-sum types dropped on both sides (α undefined)
    sql["v24_activity_tail_index"] = """
        WITH per AS (
            SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS cnt
            FROM events GROUP BY event_type, user_id
        ),
        tail AS (SELECT * FROM per WHERE cnt >= 2),
        ag AS (
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n_tail,
                   CAST(sum(CAST(round(ln(CAST(cnt AS DOUBLE) / CAST(2 AS DOUBLE)) * 1e9) AS BIGINT)) AS BIGINT) AS sum_ln_nano
            FROM tail GROUP BY event_type
        )
        -- CAST(1 AS DOUBLE): a bare 1.0 literal is DECIMAL in DuckDB
        SELECT event_type, n_tail, sum_ln_nano,
               round(CAST(1 AS DOUBLE) + n_tail * 1e9 / sum_ln_nano, 6) AS alpha
        FROM ag WHERE sum_ln_nano > 0
    """
    # g45: the SAME _BFS3_CTES min-distance frame as g32/g44; histogram +
    # running windows on the ≤3-row per-dist aggregate, all exact bigints
    sql["g45_neighborhood_function"] = f"""
        WITH RECURSIVE {GRAPH_CTE},
        {_BFS3_CTES},
        pd AS (
            SELECT CAST(dist AS BIGINT) AS dist,
                   CAST(count(*) AS BIGINT) AS n_pairs
            FROM md WHERE dist > 0 GROUP BY dist
        )
        SELECT dist, n_pairs,
               CAST(sum(n_pairs) OVER (ORDER BY dist) AS BIGINT) AS cum_pairs,
               CAST(sum(n_pairs) OVER () AS BIGINT) AS total_pairs,
               CAST((1000000 * sum(n_pairs) OVER (ORDER BY dist))
                    // (sum(n_pairs) OVER ()) AS BIGINT) AS cum_ppm
        FROM pd
    """
    # v25: centered prefix statistic s_k = nd·prefix − k·sn exact bigint
    # per prefix; argmax tie-broken (|s_k| desc, day asc); the published
    # z is ONE double expression from the same exact ints (v18 pattern);
    # zero-variance types dropped by the exact predicate
    sql["v25_cusum_changepoint"] = """
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   CAST(count(*) AS BIGINT) AS n
            FROM events WHERE ts IS NOT NULL GROUP BY event_type, CAST(ts AS DATE)
        ),
        st AS (
            SELECT event_type, CAST(count(*) AS BIGINT) AS nd,
                   CAST(sum(n) AS BIGINT) AS sn,
                   CAST(sum(n * n) AS BIGINT) AS snn
            FROM daily GROUP BY event_type
        ),
        pre AS (
            SELECT d.event_type, d.day, s.nd, s.sn, s.snn,
                   CAST(s.nd * sum(d.n) OVER (PARTITION BY d.event_type ORDER BY d.day)
                        - (row_number() OVER (PARTITION BY d.event_type ORDER BY d.day)) * s.sn
                        AS BIGINT) AS s_k
            FROM daily d JOIN st s USING (event_type)
        ),
        ranked AS (
            SELECT *, row_number() OVER (
                       PARTITION BY event_type
                       ORDER BY abs(s_k) DESC, day ASC) AS rn
            FROM pre
        )
        SELECT event_type, nd AS nd_days, day AS change_day,
               CAST(abs(s_k) AS BIGINT) AS s_abs_max,
               CAST(nd * (nd * snn - sn * sn) AS BIGINT) AS d_denom,
               round(CAST(abs(s_k) AS DOUBLE)
                     / sqrt(CAST(nd * (nd * snn - sn * sn) AS DOUBLE)), 9) AS cusum_z
        FROM ranked WHERE rn = 1 AND nd * snn - sn * sn > 0
    """
    # t43: v24's Hill fixed point over the shared source-carrying
    # tokenizer CTE (derived from the ONE _TOK3_CTE literal)
    sql["t43_term_zipf_tail"] = f"""
        WITH {_TOK3_SRC_CTE},
        per AS (
            SELECT source, term, CAST(count(*) AS BIGINT) AS cnt
            FROM toks3 GROUP BY source, term
        ),
        tail AS (SELECT * FROM per WHERE cnt >= 2),
        ag AS (
            SELECT source,
                   CAST(count(*) AS BIGINT) AS n_tail,
                   CAST(sum(CAST(round(ln(CAST(cnt AS DOUBLE) / CAST(2 AS DOUBLE)) * 1e9) AS BIGINT)) AS BIGINT) AS sum_ln_nano
            FROM tail GROUP BY source
        )
        -- CAST(1 AS DOUBLE): a bare 1.0 literal is DECIMAL in DuckDB
        SELECT source, n_tail, sum_ln_nano,
               round(CAST(1 AS DOUBLE) + n_tail * 1e9 / sum_ln_nano, 6) AS alpha
        FROM ag WHERE sum_ln_nano > 0
    """
    # t45: nano fixed-point ln BEFORE the c· multiply (exact int product),
    # floor div (non-negative) — the entropy integer is engine-exact
    sql["t45_token_entropy"] = f"""
        WITH {_TOK3_CTE},
        pc AS (
            SELECT doc_id, term, CAST(count(*) AS BIGINT) AS c
            FROM toks3 GROUP BY doc_id, term
        ),
        ag AS (
            SELECT doc_id,
                   CAST(sum(c) AS BIGINT) AS n_tokens,
                   CAST(count(*) AS BIGINT) AS n_distinct,
                   CAST(sum(c * CAST(round(ln(CAST(c AS DOUBLE)) * 1e9) AS BIGINT)) AS BIGINT) AS s_clnc_nano
            FROM pc GROUP BY doc_id
        )
        SELECT doc_id, n_tokens, n_distinct,
               CAST(CAST(round(ln(CAST(n_tokens AS DOUBLE)) * 1e9) AS BIGINT)
                    - s_clnc_nano // n_tokens AS BIGINT) AS entropy_nano,
               round((CAST(round(ln(CAST(n_tokens AS DOUBLE)) * 1e9) AS BIGINT)
                      - s_clnc_nano // n_tokens) / 1e9, 9) AS entropy_nats
        FROM ag
    """
    # t47: same tokenizer (array form), same 1-based gram starts, same
    # sorted-starts sweep; sums CAST to BIGINT (DuckDB sum(int)→HUGEINT)
    sql["t47_dup_span_coverage"] = """
        WITH arrs AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                               t -> length(t) >= 3) AS arr
            FROM documents
        ),
        base AS (SELECT doc_id, CAST(len(arr) AS BIGINT) AS n_tokens, arr FROM arrs),
        grams AS (
            SELECT doc_id, CAST(s AS BIGINT) AS pos,
                   array_to_string(list_slice(arr, s, s + 12), ' ') AS gram
            FROM base, unnest(range(1, CAST(n_tokens AS BIGINT) - 11)) AS t(s)
        ),
        dup AS (
            SELECT gram FROM (SELECT DISTINCT gram, doc_id FROM grams)
            GROUP BY gram HAVING count(*) >= 2
        ),
        hits AS (SELECT g.doc_id, g.pos FROM grams g JOIN dup USING (gram)),
        sweep AS (
            SELECT doc_id,
                   least(13, coalesce(
                       lead(pos) OVER (PARTITION BY doc_id ORDER BY pos) - pos,
                       13)) AS c
            FROM hits
        ),
        cov AS (
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_positions,
                   CAST(sum(c) AS BIGINT) AS covered_tokens
            FROM sweep GROUP BY doc_id
        )
        SELECT b.doc_id, b.n_tokens,
               coalesce(cov.n_dup_positions, 0) AS n_dup_positions,
               coalesce(cov.covered_tokens, 0) AS covered_tokens,
               CASE WHEN b.n_tokens = 0 THEN 0
                    ELSE coalesce(cov.covered_tokens, 0) * 1000000 // b.n_tokens
               END AS coverage_ppm
        FROM base b LEFT JOIN cov USING (doc_id)
    """
    # v26: first digit from the exact-cents string head, hardcoded ppm
    # expectation constants, full type×digit spine so absent digits count
    sql["v26_benford_audit"] = """
        WITH digits AS (
            SELECT event_type,
                   CAST(substring(CAST(abs(CAST(round(value * 100) AS BIGINT)) AS VARCHAR), 1, 1) AS BIGINT) AS digit
            FROM events
            WHERE abs(CAST(round(value * 100) AS BIGINT)) > 0
        ),
        counts AS (
            SELECT event_type, digit, CAST(count(*) AS BIGINT) AS n_events
            FROM digits GROUP BY event_type, digit
        ),
        benford(digit, benford_ppm) AS (
            VALUES (1, 301030), (2, 176091), (3, 124939), (4, 96910),
                   (5, 79181), (6, 66947), (7, 57992), (8, 51153), (9, 45757)
        ),
        spine AS (
            SELECT t.event_type, CAST(b.digit AS BIGINT) AS digit,
                   CAST(b.benford_ppm AS BIGINT) AS benford_ppm
            FROM (SELECT DISTINCT event_type FROM counts) t, benford b
        ),
        fullg AS (
            SELECT s.event_type, s.digit, s.benford_ppm,
                   coalesce(c.n_events, 0) AS n_events
            FROM spine s LEFT JOIN counts c USING (event_type, digit)
        ),
        w AS (
            SELECT event_type, digit, n_events, benford_ppm,
                   CAST(sum(n_events) OVER (PARTITION BY event_type) AS BIGINT) AS n_type
            FROM fullg
        ),
        d AS (
            SELECT event_type, digit, n_events,
                   n_events * 1000000 // n_type AS obs_ppm, benford_ppm,
                   n_events * 1000000 // n_type - benford_ppm AS dev_ppm
            FROM w
        )
        SELECT event_type, digit, n_events, obs_ppm, benford_ppm, dev_ppm,
               CAST(sum(abs(dev_ppm)) OVER (PARTITION BY event_type) AS BIGINT) // 2 AS tvd_ppm
        FROM d
    """
    # t48: shared tokenizer CTE, vowel-group runs via regexp_extract_all,
    # all-integer counts and floor-ppm ratios
    sql["t48_lexical_complexity"] = f"""
        WITH {_TOK3_CTE},
        syl AS (
            SELECT doc_id,
                   CAST(len(regexp_extract_all(term, '[aeiou]+')) AS BIGINT) AS s
            FROM toks3
        ),
        per AS (
            SELECT doc_id,
                   CAST(count(*) AS BIGINT) AS n_tokens,
                   CAST(sum(s) AS BIGINT) AS n_syllables,
                   CAST(sum(CASE WHEN s >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_complex
            FROM syl GROUP BY doc_id
        )
        SELECT doc_id, n_tokens, n_syllables, n_complex,
               n_syllables * 1000000 // n_tokens AS syll_per_token_ppm,
               n_complex * 1000000 // n_tokens AS complex_ppm
        FROM per
    """
    # t49: shared source-carrying tokenizer CTE, nano-rounded lns BEFORE
    # the ratio, all counts/ppm pure bigint
    sql["t49_vocab_growth"] = f"""
        WITH {_TOK3_SRC_CTE},
        per AS (
            SELECT source, term, CAST(count(*) AS BIGINT) AS c
            FROM toks3 GROUP BY source, term
        ),
        ag AS (
            SELECT source,
                   CAST(sum(c) AS BIGINT) AS n_tokens,
                   CAST(count(*) AS BIGINT) AS v_types,
                   CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax_count,
                   CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS dis_count
            FROM per GROUP BY source
        )
        SELECT source, n_tokens, v_types, hapax_count, dis_count,
               v_types * 1000000 // n_tokens AS ttr_ppm,
               hapax_count * 1000000 // v_types AS hapax_ppm,
               CAST(round(ln(CAST(v_types AS DOUBLE)) * 1e9) AS BIGINT) AS ln_v_nano,
               CAST(round(ln(CAST(n_tokens AS DOUBLE)) * 1e9) AS BIGINT) AS ln_n_nano,
               round(CAST(CAST(round(ln(CAST(v_types AS DOUBLE)) * 1e9) AS BIGINT) AS DOUBLE)
                     / CAST(round(ln(CAST(n_tokens AS DOUBLE)) * 1e9) AS BIGINT), 9) AS heaps_beta
        FROM ag WHERE n_tokens >= 2
    """
    # v27: exact epoch-hour spine (zeros are real), lead-24 pairing,
    # all-bigint Pearson algebra, one double at the end
    sql["v27_diurnal_autocorr"] = """
        WITH hourly AS (
            SELECT event_type, epoch_us(ts) // 3600000000 AS h,
                   CAST(count(*) AS BIGINT) AS n
            FROM events WHERE ts IS NOT NULL GROUP BY event_type, h
        ),
        span AS (
            SELECT event_type, min(h) AS h0, max(h) AS h1
            FROM hourly GROUP BY event_type
        ),
        spine AS (
            SELECT event_type, CAST(t.h AS BIGINT) AS h
            FROM span, unnest(range(h0, h1 + 1)) AS t(h)
        ),
        fullh AS (
            SELECT s.event_type, s.h, coalesce(hourly.n, 0) AS x
            FROM spine s LEFT JOIN hourly USING (event_type, h)
        ),
        pairs AS (
            SELECT event_type, x,
                   lead(x, 24) OVER (PARTITION BY event_type ORDER BY h) AS y
            FROM fullh
        ),
        st AS (
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n_pairs,
                   CAST(sum(x) AS BIGINT) AS sx,
                   CAST(sum(y) AS BIGINT) AS sy,
                   CAST(sum(x * y) AS BIGINT) AS sxy,
                   CAST(sum(x * x) AS BIGINT) AS sxx,
                   CAST(sum(y * y) AS BIGINT) AS syy
            FROM pairs WHERE y IS NOT NULL GROUP BY event_type
        )
        SELECT event_type, n_pairs,
               CAST(n_pairs * sxy - sx * sy AS BIGINT) AS acf_num,
               CAST(n_pairs * sxx - sx * sx AS BIGINT) AS var_x,
               CAST(n_pairs * syy - sy * sy AS BIGINT) AS var_y,
               round(CAST(n_pairs * sxy - sx * sy AS DOUBLE)
                     / sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE)
                            * CAST(n_pairs * syy - sy * sy AS DOUBLE)), 9) AS acf24
        FROM st
        WHERE n_pairs * sxx - sx * sx > 0 AND n_pairs * syy - sy * sy > 0
    """
    # e20: micro fixed-point components, exact bigint squared-L2, total
    # order (d2, id) so every rank is engine-exact; inbound in pure ints
    sql["e20_hubness_audit"] = """
        WITH vm AS (
            SELECT vec_id, label,
                   list_transform(embedding,
                       c -> CAST(round(CAST(c AS DOUBLE) * 1000000) AS BIGINT)) AS v
            FROM embeddings
        ),
        pairs AS (
            SELECT a.vec_id AS a_id, b.vec_id AS b_id,
                   list_sum(list_transform(range(1, len(a.v) + 1),
                       i -> (a.v[i] - b.v[i]) * (a.v[i] - b.v[i]))) AS d2
            FROM vm a JOIN vm b ON a.label = b.label AND a.vec_id <> b.vec_id
        ),
        topk AS (
            SELECT b_id FROM (
                SELECT a_id, b_id,
                       row_number() OVER (PARTITION BY a_id ORDER BY d2, b_id) AS rn
                FROM pairs
            ) WHERE rn <= 5
        ),
        inb AS (
            SELECT b_id AS vec_id, CAST(count(*) AS BIGINT) AS n_inbound
            FROM topk GROUP BY b_id
        ),
        blocks AS (
            SELECT label, CAST(count(*) AS BIGINT) AS n_block
            FROM embeddings GROUP BY label
        )
        SELECT e.vec_id, e.label, blocks.n_block,
               coalesce(inb.n_inbound, 0) AS n_inbound,
               coalesce(inb.n_inbound, 0) * 1000000 // 5 AS inbound_ppm_of_k
        FROM embeddings e JOIN blocks USING (label) LEFT JOIN inb USING (vec_id)
    """
    # v23: exact integer cents summed as bigint, quartiles via the rank
    # formula over a (metric, user_id) total order — no ntile()
    sql["v23_rfm_segments"] = """
        WITH per AS (
            SELECT user_id,
                   max(CAST(ts AS DATE)) AS last_day,
                   CAST(count(*) AS BIGINT) AS f_events,
                   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS m_cents
            FROM events WHERE ts IS NOT NULL GROUP BY user_id
        ),
        anchor AS (SELECT max(last_day) AS corpus_last_day FROM per),
        base AS (
            SELECT user_id,
                   CAST(date_diff('day', last_day, corpus_last_day) AS BIGINT) AS r_days,
                   f_events, m_cents
            FROM per, anchor
        ),
        n AS (SELECT CAST(count(*) AS BIGINT) AS n_users FROM base),
        rk AS (
            SELECT user_id, r_days, f_events, m_cents,
                   CAST(row_number() OVER (ORDER BY r_days DESC, user_id) AS BIGINT) AS ri,
                   CAST(row_number() OVER (ORDER BY f_events, user_id) AS BIGINT) AS fi,
                   CAST(row_number() OVER (ORDER BY m_cents, user_id) AS BIGINT) AS mi
            FROM base
        )
        SELECT user_id, r_days, f_events, m_cents,
               CAST((ri - 1) * 4 // n_users + 1 AS BIGINT) AS r_q,
               CAST((fi - 1) * 4 // n_users + 1 AS BIGINT) AS f_q,
               CAST((mi - 1) * 4 // n_users + 1 AS BIGINT) AS m_q,
               CAST(((ri - 1) * 4 // n_users + 1) * 100
                    + ((fi - 1) * 4 // n_users + 1) * 10
                    + ((mi - 1) * 4 // n_users + 1) AS BIGINT) AS rfm_code
        FROM rk, n
    """
    sql["v19_user_tenure"] = """
        WITH pu AS (
            SELECT user_id, min(CAST(ts AS DATE)) AS f,
                   max(CAST(ts AS DATE)) AS l
            FROM events WHERE ts IS NOT NULL GROUP BY user_id
        )
        SELECT CAST(date_diff('day', f, l) AS BIGINT) AS tenure_days,
               CAST(count(*) AS BIGINT) AS n_users
        FROM pu GROUP BY tenure_days
    """
    sql["g37_type_cooccurrence"] = f"""
        WITH {GRAPH_CTE},
        nt AS (SELECT DISTINCT from_node_id AS nid, edge_type FROM edges),
        diag AS (
            SELECT edge_type, CAST(count(*) AS BIGINT) AS n
            FROM nt GROUP BY edge_type
        ),
        p AS (
            SELECT a.edge_type AS type_a, b.edge_type AS type_b,
                   CAST(count(*) AS BIGINT) AS n_both
            FROM nt a JOIN nt b
              ON a.nid = b.nid AND a.edge_type < b.edge_type
            GROUP BY a.edge_type, b.edge_type
        )
        SELECT type_a, type_b, da.n AS n_a, db.n AS n_b, n_both,
               CAST(n_both * 1000000 // (da.n + db.n - n_both) AS BIGINT)
                   AS jaccard_ppm
        FROM p JOIN diag da ON da.edge_type = type_a
               JOIN diag db ON db.edge_type = type_b
    """
    sql["e13_centroid_separation"] = """
        WITH cent AS (
            SELECT label, u.dim AS dim,
                   CAST(floor(sum(u.micro) / count(*)) AS BIGINT) AS c
            FROM (
                SELECT label,
                       unnest(list_transform(range(len(embedding)),
                           i -> {'dim': CAST(i AS INT),
                                 'micro': CAST(round(CAST(embedding[i+1] AS DOUBLE) * 1e6) AS BIGINT)})) AS u
                FROM embeddings
            )
            GROUP BY label, u.dim
        ), carr AS (
            SELECT label, list(c ORDER BY dim) AS carr FROM cent GROUP BY label
        ), d AS (
            SELECT a.label AS label, b.label AS other_label,
                   list_sum(list_transform(range(len(a.carr)),
                       i -> (a.carr[i+1] - b.carr[i+1])
                            * (a.carr[i+1] - b.carr[i+1]))) AS dist_micro2
            FROM carr a JOIN carr b ON a.label <> b.label
        ), r AS (
            SELECT *, row_number() OVER (
                PARTITION BY label ORDER BY dist_micro2, other_label) AS rn
            FROM d
        )
        SELECT label, other_label AS nearest_label,
               CAST(dist_micro2 AS BIGINT) AS dist_micro2
        FROM r WHERE rn = 1
    """
    sql["v18_volume_anomalies"] = """
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   CAST(count(*) AS BIGINT) AS n_events
            FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
        ), stats AS (
            SELECT event_type, CAST(count(*) AS BIGINT) AS nd,
                   CAST(sum(n_events) AS BIGINT) AS sn,
                   CAST(sum(n_events * n_events) AS BIGINT) AS snn
            FROM daily GROUP BY event_type
        )
        SELECT d.event_type, strftime(d.day, '%Y-%m-%d') AS day, d.n_events,
               round(CAST(d.n_events * s.nd - s.sn AS DOUBLE)
                     / sqrt(CAST(s.nd * s.snn - s.sn * s.sn AS DOUBLE)), 9)
                   AS z
        FROM daily d JOIN stats s USING (event_type)
        WHERE (s.nd * s.snn - s.sn * s.sn) > 0
          AND (d.n_events * s.nd - s.sn) * (d.n_events * s.nd - s.sn)
              >= 4 * (s.nd * s.snn - s.sn * s.sn)
    """
    sql["v17_user_concentration"] = """
        WITH pu AS (
            SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS cnt
            FROM events GROUP BY event_type, user_id
        ), r AS (
            SELECT event_type, cnt,
                   CAST(row_number() OVER (
                       PARTITION BY event_type ORDER BY cnt, user_id
                   ) AS BIGINT) AS i,
                   CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
            FROM pu
        ), a AS (
            SELECT event_type, max(n) AS n_users,
                   sum(cnt) AS total_events,
                   sum(i * cnt) AS sum_i_cnt,
                   sum(CASE WHEN i > n - (n + 9) // 10 THEN cnt ELSE 0 END)
                       AS top_events
            FROM r GROUP BY event_type
        )
        SELECT event_type,
               CAST(n_users AS BIGINT) AS n_users,
               CAST(total_events AS BIGINT) AS total_events,
               CAST(sum_i_cnt AS BIGINT) AS sum_i_cnt,
               CAST(top_events * 1000000 // total_events AS BIGINT)
                   AS top_decile_share_ppm,
               round(CAST(2 * sum_i_cnt AS DOUBLE)
                     / (CAST(n_users AS DOUBLE) * CAST(total_events AS DOUBLE))
                     - (CAST(n_users AS DOUBLE) + 1.0) / CAST(n_users AS DOUBLE),
                     9) AS gini
        FROM a
    """
    sql["t33_length_quality_corr"] = """
        WITH xy AS (
            SELECT source, CAST(n_chars AS BIGINT) AS x,
                   CAST(CASE WHEN length(text) > 0 THEN
                        length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                        * 1000 // length(text)
                        ELSE 0 END AS BIGINT) AS y
            FROM documents
        ), s AS (
            SELECT source, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
                   sum(x*y) AS sxy, sum(x*x) AS sxx, sum(y*y) AS syy
            FROM xy GROUP BY source
        )
        SELECT source, CAST(n AS BIGINT) AS n_docs,
               round(CAST(n*sxy - sx*sy AS DOUBLE) /
                     (sqrt(CAST(n*sxx - sx*sx AS DOUBLE)) *
                      sqrt(CAST(n*syy - sy*sy AS DOUBLE))), 6)
                   AS len_quality_corr
        FROM s
        WHERE n >= 2 AND (n*sxx - sx*sx) > 0 AND (n*syy - sy*sy) > 0
    """
    # t54/t55: DuckDB re-implements the WHOLE canonicalization
    # independently (its own regexp_extract/list_filter/list_sort SQL)
    # over the same deterministic messy-url construction (_t54_messy_url
    # twin, ONE literal shared by both entries) — regex texts shared
    # verbatim with operators/web.py (lookaround-free, Java regex == RE2).
    messy_cte = r"""messy AS (
            SELECT doc_id, n_chars,
                (CASE WHEN (doc_id // 7) % 4 = 0 THEN 'HTTPS://' ELSE 'https://' END)
                || (CASE WHEN (doc_id // 7) % 4 = 2 THEN 'www.' ELSE '' END)
                || (CASE WHEN (doc_id // 7) % 4 = 1 THEN upper(source) ELSE source END)
                || (CASE WHEN (doc_id // 7) % 4 = 3 THEN '.Example.COM:443' ELSE '.example.com' END)
                || '/A/' || CAST(doc_id // 149 AS VARCHAR)
                || (CASE WHEN (doc_id // 7) % 4 = 0 THEN '/' ELSE '' END)
                || (CASE (doc_id // 7) % 4 WHEN 0 THEN '?utm_source=feed&b=2&a=1#top'
                                    WHEN 1 THEN '?a=1&b=2'
                                    WHEN 2 THEN '?b=2&a=1&utm_campaign=x'
                                    ELSE '?a=1&b=2&gclid=abc#s' END) AS url
            FROM documents
        )"""
    sql["t54_url_canonical_dedup"] = r"""
        WITH """ + messy_cte + r""",
        parsed AS (
            SELECT doc_id, n_chars,
                lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
                -- userinfo (…@, case-SENSITIVE) preserved; only host:port folds
                regexp_extract(regexp_extract(url,
                    '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1), '^(.*@)', 1) AS userinfo,
                lower(regexp_extract(regexp_extract(url,
                    '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1), '([^@]*)$', 1)) AS hostport,
                regexp_replace(
                    regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1),
                    '/+$', '') AS path,
                regexp_extract(url, '^[^?#]*\?([^#]*)', 1) AS query
            FROM messy
        ),
        norm AS (
            SELECT doc_id, n_chars, scheme, userinfo, path,
                CASE WHEN scheme = 'http'
                     THEN regexp_replace(regexp_replace(hostport, '^www\.', ''), ':80$', '')
                     WHEN scheme = 'https'
                     THEN regexp_replace(regexp_replace(hostport, '^www\.', ''), ':443$', '')
                     ELSE regexp_replace(hostport, '^www\.', '') END AS host,
                array_to_string(list_sort(list_filter(string_split(query, '&'),
                    x -> x <> '' AND NOT regexp_matches(x,
                        '^(utm_[^=]*|gclid|fbclid|msclkid|mc_cid|mc_eid|ref|igshid)(=|$)'))),
                    '&') AS kept
            FROM parsed
        )
        SELECT scheme || '://' || userinfo || host || path
                 || CASE WHEN kept <> '' THEN '?' || kept ELSE '' END AS canonical_url,
               MIN(doc_id) AS kept_doc_id,
               CAST(count(*) AS BIGINT) AS dup_count,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM norm
        GROUP BY 1
    """
    # t55: domain derivation (hostport past userinfo, www-/any-port-strip)
    # + exact integer-ppm share/HHI — DuckDB's own regexp/string SQL and
    # hugeint `//` vs Spark's DECIMAL(38,0) `div`.
    sql["t55_domain_skew"] = (
        r"""
        WITH """
        + messy_cte
        + r""",
        dom AS (
            SELECT regexp_replace(regexp_replace(
                       lower(regexp_extract(regexp_extract(url,
                           '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1),
                           '([^@]*)$', 1)),
                       '^www\.', ''), ':[0-9]+$', '') AS domain
            FROM messy
        ),
        per AS (
            SELECT domain, CAST(count(*) AS BIGINT) AS n_pages
            FROM dom WHERE domain <> '' GROUP BY domain
        ),
        tot AS (
            SELECT CAST(sum(n_pages) AS BIGINT) AS total,
                   CAST((sum(n_pages * n_pages) * 1000000)
                        // (sum(n_pages) * sum(n_pages)) AS BIGINT) AS hhi
            FROM per
        )
        SELECT domain, n_pages,
               CAST((n_pages * 1000000) // total AS BIGINT) AS share_ppm,
               hhi AS corpus_hhi_ppm
        FROM per CROSS JOIN tot
    """
    )
    return sql
