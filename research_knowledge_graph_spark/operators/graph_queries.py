"""Graph query operators over materialized ``nodes``/``edges`` tables.

The reference's query surface, re-expressed as single declarative plans:

- neighbor expansion with type filters (G4, ``graph_service.py:318-396``;
  J2, ``repository.py:317-366``) — was an N+1 point-lookup loop, here one
  broadcast-hash join;
- reverse reachability + distinct (J3, ``repository.py:368-383``);
- shared-entity pairs (J8/J9, ``sql/example_queries.sql:82-97``);
- influence top-k (A3, ``sql/example_queries.sql:114-126``);
- usage counts (A2, ``sql/example_queries.sql:54-65``);
- multi-hop chains (J10, ``sql/example_queries.sql:36-51``);
- recursive improvement chain (G2, ``sql/example_queries.sql:129-160``) —
  iterative DataFrame joins with a path-array cycle guard;
- bidirectional BFS subgraph (G1, ``graph_visualizer.py:238-311``);
- SIMILAR_TO union both directions (E4, ``graph_service.py:403-458``).

All operators take and return DataFrames; nothing collects to the driver.
Iterative operators (`recursive_chain`, `bfs`) localCheckpoint per round to
cut lineage — at depth d the alternative is a 2^d-deep plan.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def neighbors_out(
    nodes: DataFrame,
    edges: DataFrame,
    from_node_id: str | None = None,
    edge_type: str | None = None,
    to_node_type: str | None = None,
) -> DataFrame:
    """Outgoing neighbor expansion with optional type filters (P4 + J2).
    Filters land on partition columns (edge_type/node_type) → pruning."""
    e = edges
    if from_node_id is not None:
        e = e.filter(F.col("from_node_id") == from_node_id)
    if edge_type is not None:
        e = e.filter(F.col("edge_type") == edge_type)
    n = nodes
    if to_node_type is not None:
        n = n.filter(F.col("node_type") == to_node_type)
    return e.join(n, e.to_node_id == n.id).select(
        "from_node_id",
        F.col("id").alias("neighbor_id"),
        F.col("node_type").alias("neighbor_type"),
        F.col("label").alias("neighbor_label"),
        "edge_type",
        "confidence",
    )


def neighbors_in(
    nodes: DataFrame,
    edges: DataFrame,
    to_node_id: str | None = None,
    edge_type: str | None = None,
    from_node_type: str | None = None,
) -> DataFrame:
    """Incoming mirror (get_edges_to_node + lookups, e.g. paper improvements
    ``graph_service.py:318-340``)."""
    e = edges
    if to_node_id is not None:
        e = e.filter(F.col("to_node_id") == to_node_id)
    if edge_type is not None:
        e = e.filter(F.col("edge_type") == edge_type)
    n = nodes
    if from_node_type is not None:
        n = n.filter(F.col("node_type") == from_node_type)
    return e.join(n, e.from_node_id == n.id).select(
        "to_node_id",
        F.col("id").alias("neighbor_id"),
        F.col("node_type").alias("neighbor_type"),
        F.col("label").alias("neighbor_label"),
        "edge_type",
        "confidence",
    )


def connected_docs(nodes: DataFrame, edges: DataFrame, entity_id: str) -> DataFrame:
    """Docs connected to an entity node, DISTINCT (J3)."""
    return (
        edges.filter(F.col("to_node_id") == entity_id)
        .join(nodes, edges.from_node_id == nodes.id)
        .select("id", "node_type", "label")
        .distinct()
    )


def shared_entity_pairs(
    edges: DataFrame,
    entity_edge_types: list[str] | None = None,
    salt_above: int | None = 256,
    max_salts: int = 16,
) -> DataFrame:
    """Unordered pairs of source nodes sharing ≥1 target node (J8/J9 shape).
    Returns (node_a, node_b, shared_count).

    Skew: a hot target of degree d contributes d²/2 pairs; degree-aware
    salting (on by default, same defense as the cross-link pipeline's
    ``candidate_pairs``) splits any target hotter than ``salt_above`` across
    ``min(max_salts, ceil(deg/salt_above))`` salt slots so no single reducer
    owns a head key's quadratic blowup. Every pair still meets in exactly
    ONE slot, so shared_count is preserved bit-for-bit (parity pinned in
    tests/test_salt.py); cold targets compile to the identical unsalted
    plan. ``salt_above=None`` disables. Callers should still cap truly
    pathological degrees upstream — salting spreads the work, it does not
    shrink the quadratic pair count itself.

    Cost containment: only the HOT key set (degree > salt_above — at most
    |rows|/salt_above keys by pigeonhole, in practice the Zipf head) is
    joined back; cold rows default to one slot without a second full
    shuffle of the posting table. Measured 2.2× → ~1× query overhead on a
    corpus with no hot keys vs the exact-degree join. The hot dim is NOT
    force-broadcast: AQE converts the join to broadcast at runtime when
    the set is actually small (the normal case), and degrades to a
    shuffle join on a pathological many-moderately-hot-keys corpus where
    a forced broadcast would OOM the driver."""
    e = edges
    if entity_edge_types:
        e = e.filter(F.col("edge_type").isin(*entity_edge_types))
    pe = e.select(F.col("from_node_id").alias("src"), F.col("to_node_id").alias("tgt")).distinct()
    return _wedge_pair_agg(
        pe,
        [F.count(F.lit(1)).alias("shared_count")],
        salt_above,
        max_salts,
    )


def _wedge_pair_agg(
    pe: DataFrame,
    aggs: list,
    salt_above: int | None,
    max_salts: int,
    deg_attached: bool = False,
) -> DataFrame:
    """The ONE copy of the salted wedge self-join (postings (src, tgt
    [, extras]) → per-(node_a < node_b) aggregate), shared by
    :func:`shared_entity_pairs` and :func:`resource_allocation_topk` so the
    skew defense can't drift between them. ``aggs`` run under
    ``groupBy(a.src AS node_a, b.src AS node_b)`` — qualify extra columns
    with the ``a.``/``b.`` alias. ``deg_attached=True`` means ``pe``
    already carries the EXACT per-tgt degree as ``deg`` (a caller that
    joined degrees anyway, e.g. for weights); the salt-slot count
    ``min(max_salts, ceil(deg/salt_above))`` is bit-identical to the
    hot-key-only attach since every cold key (true deg ≤ salt_above, or
    attach default 1) lands on nsalt = 1 either way."""
    from research_knowledge_graph_spark.functions.salt import (
        attach_hot_degrees,
        salted_self_join_sides,
    )

    if salt_above is not None:
        if not deg_attached:
            pe = attach_hot_degrees(pe, "tgt", salt_above)
        sa, sb = salted_self_join_sides(pe, "src", salt_above, max_salts)
        a, b = sa.alias("a"), sb.alias("b")
        cond = (
            (F.col("a.tgt") == F.col("b.tgt"))
            & (F.col("a._salt") == F.col("b._salt"))
            & (F.col("a.src") < F.col("b.src"))
        )
    else:
        a, b = pe.alias("a"), pe.alias("b")
        cond = (F.col("a.tgt") == F.col("b.tgt")) & (F.col("a.src") < F.col("b.src"))
    return (
        a.join(b, cond)
        .groupBy(F.col("a.src").alias("node_a"), F.col("b.src").alias("node_b"))
        .agg(*aggs)
    )


def influence_topk(
    nodes: DataFrame,
    edges: DataFrame,
    node_type: str,
    edge_types: list[str],
    k: int = 20,
) -> DataFrame:
    """Most-influential nodes of a type by distinct in-degree (A3/q8):
    left join keeps zero-usage nodes, deterministic (count desc, label).

    Plan shape: the edge side is aggregated to a per-target distinct count
    BEFORE the join, so the join's build side is the tiny count dim rather
    than the full edge set (the previous join-then-aggregate form made the
    planner broadcast the O(edges) side — a left-outer join can only build
    right — measured as the query's dominant cost). Output identical: the
    old per-(id, label) group over joined rows ≡ distinct node rows +
    their target's count, with no-edge nodes reading coalesce(0) exactly
    as countDistinct over the left join's NULLs did."""
    n = nodes.filter(F.col("node_type") == node_type)
    e = edges.filter(F.col("edge_type").isin(*edge_types))
    cnt = e.groupBy("to_node_id").agg(
        F.countDistinct("from_node_id").alias("usage_count")
    )
    return (
        n.select("id", "label")
        .distinct()  # = the old groupBy (id, label) grouping of node rows
        .join(cnt, n.id == cnt.to_node_id, "left")
        .select(
            "id",
            "label",
            F.coalesce("usage_count", F.lit(0).cast("long")).alias("usage_count"),
        )
        .orderBy(F.desc("usage_count"), F.asc("label"))
        .limit(k)
    )


def two_hop(
    nodes: DataFrame,
    edges: DataFrame,
    e1_type: str,
    e2_type: str,
    end_node_type: str | None = None,
) -> DataFrame:
    """Chained equi-joins: a -e1→ b -e2→ c (J10/q3 shape), DISTINCT ends."""
    e1 = edges.filter(F.col("edge_type") == e1_type).select(
        F.col("from_node_id").alias("a"), F.col("to_node_id").alias("b")
    )
    e2 = edges.filter(F.col("edge_type") == e2_type).select(
        F.col("from_node_id").alias("b2"), F.col("to_node_id").alias("c")
    )
    n = nodes if end_node_type is None else nodes.filter(F.col("node_type") == end_node_type)
    return (
        e1.join(e2, F.col("b") == F.col("b2"))
        .join(n, F.col("c") == n.id)
        .select(F.col("a").alias("start_id"), F.col("c").alias("end_id"), F.col("label").alias("end_label"))
        .distinct()
    )


def similar_union(nodes: DataFrame, edges: DataFrame, node_id: str, edge_type: str = "SIMILAR_TO") -> DataFrame:
    """SIMILAR_TO in both directions, neighbor-side selection, dedup (E4)."""
    e = edges.filter(F.col("edge_type") == edge_type)
    out = e.filter(F.col("from_node_id") == node_id).select(
        F.col("to_node_id").alias("other_id"), "confidence"
    )
    inn = e.filter(F.col("to_node_id") == node_id).select(
        F.col("from_node_id").alias("other_id"), "confidence"
    )
    both = out.unionByName(inn).groupBy("other_id").agg(F.max("confidence").alias("confidence"))
    return both.join(nodes, both.other_id == nodes.id).select(
        "other_id", "label", "node_type", "confidence"
    )


def recursive_chain(
    edges: DataFrame,
    start: DataFrame,
    edge_type: str = "IMPROVES_ON",
    max_depth: int = 5,
) -> DataFrame:
    """Recursive chain expansion (G2, the reference's WITH RECURSIVE q9):
    from each start node, repeatedly follow ``edge_type`` edges *into* the
    current frontier (who improves on me), guarding cycles with a path array.

    ``start``: DataFrame with column ``node_id``. Returns
    (start_id, node_id, depth) for every reached node incl. depth 0.

    Iterative joins with localCheckpoint per level — the standard Spark
    recursion pattern (Spark SQL has no recursive CTE). The filtered edge
    projection is localCheckpoint-ed ONCE up front: it is joined at every
    level, and an unmaterialized frame would re-derive the whole edge
    input (for a window-derived edge set, a shuffle + sort) per level
    (guide §2.4 — the pagerank family already does this).
    """
    e = (
        edges.filter(F.col("edge_type") == edge_type)
        .select(
            F.col("from_node_id").alias("child"), F.col("to_node_id").alias("parent")
        )
        .localCheckpoint(eager=True)
    )
    frontier = start.select(
        F.col("node_id").alias("start_id"),
        F.col("node_id").alias("node_id"),
        F.lit(0).alias("depth"),
        F.array(F.col("node_id")).alias("path"),
    )
    out = frontier
    for _ in range(max_depth):
        nxt = (
            frontier.join(e, frontier.node_id == e.parent)
            .filter(~F.array_contains(F.col("path"), F.col("child")))
            .select(
                "start_id",
                F.col("child").alias("node_id"),
                (F.col("depth") + 1).alias("depth"),
                F.array_append(F.col("path"), F.col("child")).alias("path"),
            )
        )
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            break
        out = out.unionByName(nxt)
        frontier = nxt
    return out.select("start_id", "node_id", "depth").distinct()


def bfs_subgraph(
    nodes: DataFrame, edges: DataFrame, root_id: str, max_depth: int = 2
) -> DataFrame:
    """Bidirectional BFS to depth k (G1, ``graph_visualizer.py:238-311``):
    returns (node_id, depth) with the minimal depth per visited node."""
    und = (
        edges.select(F.col("from_node_id").alias("u"), F.col("to_node_id").alias("v"))
        .unionByName(
            edges.select(
                F.col("to_node_id").alias("u"), F.col("from_node_id").alias("v")
            )
        )
        .distinct()
        # joined at every BFS level — materialize once (recursive_chain rule)
        .localCheckpoint(eager=True)
    )

    visited = nodes.sparkSession.createDataFrame(
        [(root_id, 0)], "node_id string, depth int"
    )
    frontier = visited
    for d in range(1, max_depth + 1):
        nxt = (
            frontier.join(und, frontier.node_id == und.u)
            .select(F.col("v").alias("node_id"), F.lit(d).alias("depth"))
            .distinct()
            .join(visited.select("node_id"), "node_id", "left_anti")
        )
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt)
        frontier = nxt
    return visited


def _canonical_undirected(pairs: DataFrame) -> DataFrame:
    """(node_a, node_b) in any order/multiplicity → id-canonical distinct
    undirected edges (u < v), self-loops dropped."""
    return (
        pairs.select(
            F.least("node_a", "node_b").alias("u"),
            F.greatest("node_a", "node_b").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _undirected_incidences(pairs: DataFrame):
    """Shared frames behind the degree-correlation family — the ONE
    construction of undirected-graph degree semantics (loops dropped,
    duplicates/direction collapsed), so a future change lands in every
    consumer (g34/g35/g28/g36/g39/g40 and undirected_degree): ``und``
    (the canonical u<v edge set), ``dr`` (both orientations — one row
    per incidence) and ``deg`` (per-node degree, keyed ``nid``/``deg``)."""
    und = _canonical_undirected(pairs)
    dr = und.unionByName(und.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = dr.groupBy(F.col("u").alias("nid")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    return und, dr, deg


def undirected_degree(pairs: DataFrame) -> DataFrame:
    """Per-node degree ``(node_id, degree)`` over the id-canonical
    distinct undirected edge set (self-loops dropped) — the one
    definition of "degree" shared by g34's histogram,
    :func:`avg_neighbor_degree` and :func:`degree_assortativity`, so a
    future change to loop/duplicate handling lands in every consumer."""
    _, _, deg = _undirected_incidences(pairs)
    return deg.select(
        F.col("nid").alias("node_id"), F.col("deg").alias("degree")
    )


def avg_neighbor_degree(pairs: DataFrame) -> DataFrame:
    """Average-neighbor-degree curve k_nn(k) of an undirected pair graph
    (columns ``node_a``/``node_b``, any order/multiplicity) — the full
    degree-correlation PROFILE behind :func:`degree_assortativity`'s
    single coefficient: for each degree class k, the mean degree of the
    neighbors of degree-k nodes. Rising curve = assortative (hubs wire to
    hubs), falling = disassortative (hubs wire to leaves — the typical
    web/citation shape); read alongside g34's histogram when choosing
    salting thresholds, because a disassortative head means hot keys join
    AGAINST cold keys, exactly the case degree-aware salting splits.

    Returns one row per degree value: (degree, n_nodes, n_incidences,
    sum_neighbor_deg, knn_milli). Exactness: ONE division total —
    ``knn_milli = sum_neighbor_deg·10³ div n_incidences`` over
    non-negative bigints (trunc == floor cross-engine); everything else
    is exact integer counts/sums, so the two-level average is published
    as the canonical single-ratio form Σdeg(nb)/(k·N_k) rather than a
    float mean-of-means. ``n_incidences == degree × n_nodes`` by
    construction (each degree-k node contributes k incidences) — both
    published so the consumer can sanity-check the invariant.

    Scale: same shape as :func:`degree_assortativity` — the degree dim is
    one row per node (unbounded, NEVER hinted; uniform node-id equi-joins
    left to AQE), the final rollup keys on degree values (bounded by max
    degree, map-side combinable), and the N_k histogram joins on that
    same bounded key."""
    _, dr, deg = _undirected_incidences(pairs)
    e = (
        dr.join(deg.select(F.col("nid").alias("u"), F.col("deg").alias("ds")), "u")
        .join(deg.select(F.col("nid").alias("v"), F.col("deg").alias("dd")), "v")
    )
    per_k = e.groupBy(F.col("ds").alias("degree")).agg(
        F.count(F.lit(1)).cast("long").alias("n_incidences"),
        F.sum("dd").cast("long").alias("sum_neighbor_deg"),
    )
    nk = deg.groupBy(F.col("deg").alias("degree")).agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes")
    )
    return per_k.join(nk, "degree").select(
        "degree",
        "n_nodes",
        "n_incidences",
        "sum_neighbor_deg",
        F.expr(
            "CAST(sum_neighbor_deg * 1000L div n_incidences AS BIGINT)"
        ).alias("knn_milli"),
    )


def degree_assortativity(pairs: DataFrame) -> DataFrame:
    """Degree assortativity of an undirected pair graph (columns
    ``node_a``/``node_b``, any order/multiplicity): Pearson correlation
    of endpoint degrees across the directed edge list (both
    orientations). Returns a 1-row frame ``(n_directed_edges,
    assortativity)``.

    Computed from SIX exact integer sums (n, Σdx, Σdy, Σdxdy, Σdx²,
    Σdy²) — map-side-combinable bigint aggregates, so the result is
    bit-identical regardless of partition merge order (a Welford-style
    running corr would be order-sensitive); the float formula runs once
    on the final 1-row frame. A degree-regular graph has zero variance:
    the guard returns NULL instead of raising DIVIDE_BY_ZERO under ANSI
    mode, matching SQL NULL-on-zero-division semantics."""
    _, dr, deg = _undirected_incidences(pairs)
    e = (
        dr.join(deg.select(F.col("nid").alias("u"), F.col("deg").alias("ds")), "u")
        .join(deg.select(F.col("nid").alias("v"), F.col("deg").alias("dd")), "v")
    )
    sums = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("ds").alias("sx"),
        F.sum("dd").alias("sy"),
        F.sum(F.col("ds") * F.col("dd")).alias("sxy"),
        F.sum(F.col("ds") * F.col("ds")).alias("sxx"),
        F.sum(F.col("dd") * F.col("dd")).alias("syy"),
    )
    # products in DECIMAL(38,0): n·sxx is ~n²·d̄² and overflows bigint near
    # 1e8 incidences (a single ~55k-degree hub does it alone — ANSI would
    # crash on exactly the web graphs this audit targets). DuckDB's side
    # auto-promotes bigint products to HUGEINT, so exact decimal keeps the
    # two engines' nearest-double conversions identical (g28 stays
    # hash-green); float-first products would not.
    def _d(c: str) -> Column:
        return F.col(c).cast("decimal(38,0)")

    num = (_d("n") * _d("sxy") - _d("sx") * _d("sy")).cast("double")
    den = F.sqrt(
        (_d("n") * _d("sxx") - _d("sx") * _d("sx")).cast("double")
    ) * F.sqrt(
        (_d("n") * _d("syy") - _d("sy") * _d("sy")).cast("double")
    )
    return sums.select(
        F.col("n").alias("n_directed_edges"),
        F.when(den != F.lit(0.0), F.round(num / den, 6)).alias("assortativity"),
    )


def rich_club(pairs: DataFrame) -> DataFrame:
    """Rich-club coefficient curve φ(k) of an undirected pair graph
    (columns ``node_a``/``node_b``, any order/multiplicity): for each
    degree threshold k, the density of the subgraph induced by nodes of
    degree > k — φ(k) = 2·E_k / (N_k·(N_k−1)). A rising tail means the
    hubs form a densely wired club (the web/citation norm); flat means
    hubs ignore each other. Read next to g34's histogram and g35's
    k_nn(k) curve when sizing skew defenses: a rich club is the case
    where the hot keys ALSO join each other, so hub–hub pairs survive
    every degree-aware filter.

    Returns one row per distinct degree value k: (k, n_nodes_gt,
    n_edges_gt, phi_ppm), rows with N_k < 2 dropped (φ undefined).
    Exactness: an edge counts toward E_k for every k < min(deg_u,
    deg_v), so E_k and N_k are SUFFIX sums of two bounded histograms —
    exact bigint counts; the one division is ``2·E_k·10⁶ div
    (N_k·(N_k−1))`` over non-negative bigints (trunc == floor
    cross-engine, the g30/t23 fixed-point rule).

    Scale: the degree attach is two uniform node-id equi-joins (the
    unbounded per-node degree dim is NEVER hinted — AQE decides); both
    histograms are map-side-combinable rollups to ≤ #distinct-degrees
    rows, and the suffix-sum window runs on that union frame — bounded
    by max degree, not corpus size, so the single-partition
    no-PARTITION-BY window is safe by construction."""
    from pyspark.sql import Window

    und, _, deg = _undirected_incidences(pairs)
    m = (
        und.join(deg.select(F.col("nid").alias("u"), F.col("deg").alias("du")), "u")
        .join(deg.select(F.col("nid").alias("v"), F.col("deg").alias("dv")), "v")
        .select(F.least("du", "dv").alias("k"))
    )
    eh = m.groupBy("k").agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    dh = deg.groupBy(F.col("deg").alias("k")).agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes")
    )
    h = dh.select("k", "n_nodes", F.lit(0).cast("long").alias("n_edges")).unionByName(
        eh.select("k", F.lit(0).cast("long").alias("n_nodes"), "n_edges")
    )
    hh = h.groupBy("k").agg(
        F.sum("n_nodes").alias("nn"), F.sum("n_edges").alias("ne")
    )
    w = (
        Window.orderBy(F.col("k").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    s = hh.select(
        "k",
        F.coalesce(F.sum("nn").over(w), F.lit(0)).cast("long").alias("n_nodes_gt"),
        F.coalesce(F.sum("ne").over(w), F.lit(0)).cast("long").alias("n_edges_gt"),
    )
    return s.filter(F.col("n_nodes_gt") >= 2).select(
        F.col("k").cast("long").alias("k"),
        "n_nodes_gt",
        "n_edges_gt",
        F.expr(
            "CAST(2 * n_edges_gt * 1000000L div (n_nodes_gt * (n_nodes_gt - 1)) AS BIGINT)"
        ).alias("phi_ppm"),
    )


def _triangle_internals(pairs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Shared core for triangle_count / clustering_coefficient: returns
    (per-node zero-filled triangle counts, per-node degrees) computed from
    ONE canonicalization + one degree aggregate.

    Enumeration is DEGREE-ORIENTED (each edge directed from its
    lower-(degree, id) endpoint): every triangle then has exactly one
    'apex' node with two out-edges, so one wedge self-join on the apex
    plus one closing equi-join finds each triangle exactly once — and a
    hot node of degree d contributes wedges only through edges where it
    is the LOW end, capping the classic d² wedge blowup at high-degree
    nodes (the standard compact-forward mitigation). The wedge tips are
    kept in id order, so the closing edge is matched against the
    id-CANONICAL edge set with a plain two-column equi-join — an OR over
    both orientations would defeat Catalyst's equi-key extraction and
    compile to a CartesianProduct. The triangle SET is
    orientation-invariant, so a plain id-ordered triple join is a valid
    oracle."""
    e0 = _canonical_undirected(pairs)
    deg = (
        e0.select(F.col("u").alias("node_id"))
        .unionByName(e0.select(F.col("v").alias("node_id")))
        .groupBy("node_id")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    tris = _enumerate_triangles(e0, deg)
    per = (
        tris.select(F.explode(F.array("a", "b", "c")).alias("node_id"))
        .groupBy("node_id")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    counts = deg.select("node_id").join(per, "node_id", "left").select(
        "node_id", F.coalesce("n_triangles", F.lit(0)).alias("n_triangles")
    )
    return counts, deg


def _enumerate_triangles(e0: DataFrame, deg: DataFrame) -> DataFrame:
    """Degree-oriented triangle enumeration over an id-canonical edge list
    ``e0`` (u < v) with node ``deg``rees: returns each triangle exactly
    once as (a, b, c) where a is the orientation apex and b < c (see
    :func:`_triangle_internals` for the scale rationale). Shared by the
    per-node counters and the k-truss per-edge support."""
    with_deg = (
        e0.join(
            deg.select(F.col("node_id").alias("u"), F.col("degree").alias("du")),
            "u",
        ).join(
            deg.select(F.col("node_id").alias("v"), F.col("degree").alias("dv")),
            "v",
        )
    )
    lo_is_u = F.struct(F.col("du"), F.col("u")) < F.struct(F.col("dv"), F.col("v"))
    oriented = with_deg.select(
        F.when(lo_is_u, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(lo_is_u, F.col("v")).otherwise(F.col("u")).alias("dst"),
    )
    w1, w2 = oriented.alias("w1"), oriented.alias("w2")
    cl = e0.alias("cl")
    tris = (
        w1.join(
            w2,
            (F.col("w1.src") == F.col("w2.src"))
            & (F.col("w1.dst") < F.col("w2.dst")),
        )
        # tips are id-ordered (w1.dst < w2.dst) and e0 is id-canonical, so
        # the closing undirected edge IS the row (u=w1.dst, v=w2.dst):
        # hash-joinable equi-keys, each triangle matched exactly once
        .join(
            cl,
            (F.col("cl.u") == F.col("w1.dst"))
            & (F.col("cl.v") == F.col("w2.dst")),
        )
        .select(
            F.col("w1.src").alias("a"),
            F.col("w1.dst").alias("b"),
            F.col("w2.dst").alias("c"),
        )
    )
    return tris


def triangle_count(pairs: DataFrame) -> DataFrame:
    """Per-node triangle counts over an undirected simple graph (the
    GraphFrames ``triangleCount`` surface). ``pairs``: (node_a, node_b)
    edges in any order/multiplicity; returns (node_id, n_triangles) for
    every endpoint, zero-filled. See :func:`_triangle_internals` for the
    degree-oriented enumeration and its scale rationale."""
    counts, _ = _triangle_internals(pairs)
    return counts


def clustering_coefficient(pairs: DataFrame) -> DataFrame:
    """Local clustering coefficient per node: 2T / (d·(d-1)) — how close a
    node's neighborhood is to a clique (0.0 for degree-1 nodes). One
    canonicalization + one degree aggregate shared with the triangle
    enumeration; rounded to 6 decimals for engine parity. Returns
    (node_id, degree, n_triangles, coefficient)."""
    counts, deg = _triangle_internals(pairs)
    return counts.join(deg, "node_id").select(
        "node_id",
        "degree",
        "n_triangles",
        F.round(
            F.when(
                F.col("degree") >= 2,
                2.0 * F.col("n_triangles") / (F.col("degree") * (F.col("degree") - 1)),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("coefficient"),
    )


def shortest_paths(
    edges: DataFrame,
    landmarks: list[str],
    max_depth: int = 6,
    edge_types: list[str] | None = None,
) -> DataFrame:
    """Directed single-source shortest paths to a set of LANDMARK nodes
    (the GraphFrames ``shortestPaths`` surface): for every node that can
    reach a landmark within ``max_depth`` hops following edge direction,
    the minimal hop count. Returns (landmark, node_id, dist), including
    (l, l, 0).

    All landmarks expand in ONE frontier (the landmark id is part of the
    frontier key), so k landmarks cost the same number of join rounds as
    one — each round is a single equi-join frontier⨝edges plus an anti-join
    against the visited set. First visit = minimal distance (BFS
    invariant), so no min-aggregation is ever needed; ``localCheckpoint``
    per level cuts the iterative-join lineage. Frontier/visited stay
    partitioned on node_id across rounds — the join key never changes."""
    spark = edges.sparkSession
    e = edges
    if edge_types is not None:
        e = e.filter(F.col("edge_type").isin(edge_types))
    # reach TO the landmark: u→v means dist(u) ≤ dist(v)+1; joined at every
    # level — materialize once (recursive_chain rule)
    rev = (
        e.select(F.col("to_node_id").alias("u"), F.col("from_node_id").alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    visited = spark.createDataFrame(
        [(l, l, 0) for l in landmarks], "landmark string, node_id string, dist int"
    )
    frontier = visited
    for d in range(1, max_depth + 1):
        nxt = (
            frontier.join(rev, frontier.node_id == rev.u)
            .select("landmark", F.col("v").alias("node_id"), F.lit(d).alias("dist"))
            .distinct()
            .join(
                visited.select("landmark", "node_id"),
                ["landmark", "node_id"],
                "left_anti",
            )
        )
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt)
        frontier = nxt
    return visited


def node_similarity_jaccard(
    pairs: DataFrame,
    min_shared: int = 2,
    top_k: int = 100,
    salt_above: int | None = 256,
    max_salts: int = 16,
) -> DataFrame:
    """Structural 'related entities': neighbor-set Jaccard similarity
    between node pairs of an undirected graph (the graph-native analog of
    the reference's SIMILAR_TO edges, ``graph_service.py:403-458`` — there
    derived from embedding cosine, here from shared graph context).

    For nodes x < y sharing ≥ ``min_shared`` neighbors:
    ``jaccard = |N(x)∩N(y)| / (|N(x)| + |N(y)| − |N(x)∩N(y)|)``.
    Returns (node_a, node_b, shared_neighbors, jaccard) — top ``top_k`` by
    (jaccard DESC, node_a, node_b), a total order so the cut is
    deterministic.

    Scale: the common-neighbor wedge join is the same d²-per-hot-key shape
    as :func:`shared_entity_pairs`, so it goes THROUGH that operator — the
    undirected adjacency (u→neighbor) is re-cast as a (src, tgt) posting
    list and gets the identical degree-aware salting (hot neighbors split
    across salt slots, exact counts preserved). Degrees come from one
    extra aggregate over the canonical edge list; the final top-k is a
    TakeOrdered (no full sort). ``min_shared`` prunes the quadratic pair
    output before the degree joins."""
    e0 = _canonical_undirected(pairs)
    und = e0.select(F.col("u"), F.col("v")).unionByName(
        e0.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    # wedge join: nodes sharing a neighbor == postings (src=node, tgt=neighbor)
    common = shared_entity_pairs(
        und.select(
            F.col("u").alias("from_node_id"), F.col("v").alias("to_node_id")
        ),
        None,
        salt_above,
        max_salts,
    ).filter(F.col("shared_count") >= min_shared)
    deg = (
        und.groupBy(F.col("u").alias("node_id"))
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return (
        common.join(
            deg.select(F.col("node_id").alias("node_a"), F.col("degree").alias("da")),
            "node_a",
        )
        .join(
            deg.select(F.col("node_id").alias("node_b"), F.col("degree").alias("db")),
            "node_b",
        )
        .select(
            "node_a",
            "node_b",
            F.col("shared_count").alias("shared_neighbors"),
            F.round(
                F.col("shared_count")
                / (F.col("da") + F.col("db") - F.col("shared_count")),
                6,
            ).alias("jaccard"),
        )
        .orderBy(F.desc("jaccard"), "node_a", "node_b")
        .limit(top_k)
    )


def resource_allocation_topk(
    pairs: DataFrame,
    min_shared: int = 1,
    top_k: int = 100,
    salt_above: int | None = 256,
    max_salts: int = 16,
    exclude_existing: bool = True,
) -> DataFrame:
    """Resource-allocation link prediction (Zhou/Lü/Zhang 2009): for node
    pairs x < y of an undirected graph, ``RA(x,y) = Σ_{z ∈ N(x)∩N(y)}
    1/deg(z)`` — common neighbors weighted by how *exclusive* they are (a
    shared hub says little; a shared degree-2 node says a lot). The
    degree-weighted sibling of :func:`node_similarity_jaccard`, and the
    graph-native analog of the reference's SIMILAR_TO edge derivation
    (``graph_service.py:403-458``, there embedding-cosine).

    ``exclude_existing`` (default True — prediction proper) anti-joins
    already-adjacent pairs out before the cut, so the top-k holds only
    candidate NEW links; False scores every co-neighbored pair (the
    similarity-scoreboard reading, adjacent pairs included).

    Exactness: weights are integer nanos ``w(z) = 10⁹ div deg(z)`` (floor
    integer division — no floating point anywhere), so ``ra_nano = Σ w(z)``
    is an exact bigint, bit-reproducible across engines and partitionings
    (the t23 fixed-point pattern applied to link prediction). Rankings
    match the float form up to the 1e-9 quantization.

    Returns top ``top_k`` (node_a, node_b, shared_neighbors, ra_nano) by
    (ra_nano DESC, node_a, node_b) — a total order, deterministic cut.

    Scale: the wedge join shares :func:`_wedge_pair_agg` (the
    :func:`shared_entity_pairs` skew defense — a hot shared neighbor's
    d²/2 pairs spread over salt slots, every pair meeting in exactly ONE
    slot, so the integer sums are preserved bit-for-bit). The weight
    attach joins the posting list to the degree dim on ``tgt`` — the same
    key the wedge join shuffles on next — and that exact degree doubles
    as the salter's ``deg`` column, so no second degree pass runs. The
    existing-edge anti-join is edge-sized, before the top-k TakeOrdered
    (no full sort)."""
    e0, dr, deg0 = _undirected_incidences(pairs)
    deg = deg0.select(F.col("nid").alias("tgt"), "deg")
    pe = (
        dr.select(F.col("u").alias("src"), F.col("v").alias("tgt"))
        .join(deg, "tgt")
        .withColumn("w", F.expr("1000000000 div deg"))
    )
    scored = _wedge_pair_agg(
        pe,
        [
            F.count(F.lit(1)).cast("long").alias("shared_neighbors"),
            F.sum("a.w").cast("long").alias("ra_nano"),
        ],
        salt_above,
        max_salts,
        deg_attached=True,
    ).filter(F.col("shared_neighbors") >= min_shared)
    if exclude_existing:
        scored = scored.join(
            e0,
            (F.col("node_a") == F.col("u")) & (F.col("node_b") == F.col("v")),
            "left_anti",
        )
    return scored.orderBy(F.desc("ra_nano"), "node_a", "node_b").limit(top_k)


def link_prediction_scoreboard(
    pairs: DataFrame,
    min_shared: int = 1,
    top_k: int = 100,
    salt_above: int | None = 256,
    max_salts: int = 16,
    exclude_existing: bool = True,
) -> DataFrame:
    """Multi-index link-prediction scoreboard over an undirected pair
    graph: for each non-adjacent candidate pair x < y, the three classic
    structural indices side by side — common neighbors ``CN = |N(x) ∩
    N(y)|``, Adamic–Adar ``AA = Σ_{z} 1/ln(deg(z))`` (common neighbors
    discounted by how promiscuous they are — the log-damped sibling of
    :func:`resource_allocation_topk`'s 1/deg), and preferential
    attachment ``PA = deg(x)·deg(y)`` (the null-model baseline: how much
    linking two hubs "should" happen by volume alone). Publishing all
    three lets the consumer read WHERE a candidate's support comes from:
    high CN + low PA is a tight niche; high PA + low CN is hub noise.

    Exactness: CN and the degrees are exact bigints; AA terms are
    ``round(10⁹ / ln(deg(z)))`` — ONE rounded double op per posting row
    (the v14/t23 fixed-point-ln precedent), then exact bigint sums, so
    the scoreboard hash-compares cross-engine. A common neighbor is
    adjacent to both endpoints, so ``deg(z) ≥ 2`` and ``ln`` never sees
    1 or 0. ``exclude_existing`` (default True — prediction proper)
    anti-joins adjacent pairs out before the cut. Returns top ``top_k``
    rows by (aa_nano DESC, node_a, node_b) — a total order.

    Scale: the wedge join shares :func:`_wedge_pair_agg` (g06's
    degree-aware salted self-join — sums and per-pair-constant mins are
    both slot-merge-safe). Both weight attaches are edge-sized equi-joins
    on the posting list (``tgt`` for the AA weight — the same key the
    wedge shuffles on next, and that exact degree doubles as the salter's
    ``deg``; ``src`` for the endpoint degree, carried through the wedge as
    a per-pair-constant min so no post-agg join runs on the pair frame)."""
    e0, dr, deg0 = _undirected_incidences(pairs)
    deg = deg0.select(F.col("nid").alias("tgt"), "deg")
    pe = (
        dr.select(F.col("u").alias("src"), F.col("v").alias("tgt"))
        .join(deg, "tgt")
        .withColumn(
            # deg==1 targets can never seed a wedge (only one posting row),
            # but the projection may run BEFORE the wedge join prunes them,
            # and ln(1)=0 trips ANSI DIVIDE_BY_ZERO — guard with a dead 0.
            "w_aa",
            F.when(
                F.col("deg") >= 2,
                F.round(
                    F.lit(1000000000.0) / F.log(F.col("deg").cast("double"))
                ).cast("long"),
            ).otherwise(F.lit(0).cast("long")),
        )
        .join(
            deg.select(F.col("tgt").alias("src"), F.col("deg").alias("ds")),
            "src",
        )
    )
    scored = _wedge_pair_agg(
        pe,
        [
            F.count(F.lit(1)).cast("long").alias("shared_neighbors"),
            F.sum("a.w_aa").cast("long").alias("aa_nano"),
            F.min("a.ds").cast("long").alias("deg_a"),
            F.min("b.ds").cast("long").alias("deg_b"),
        ],
        salt_above,
        max_salts,
        deg_attached=True,
    ).filter(F.col("shared_neighbors") >= min_shared)
    if exclude_existing:
        scored = scored.join(
            e0,
            (F.col("node_a") == F.col("u")) & (F.col("node_b") == F.col("v")),
            "left_anti",
        )
    return scored.select(
        "node_a",
        "node_b",
        "shared_neighbors",
        "aa_nano",
        "deg_a",
        "deg_b",
        (F.col("deg_a") * F.col("deg_b")).cast("long").alias("pa"),
    ).orderBy(F.desc("aa_nano"), "node_a", "node_b").limit(top_k)


def _bounded_bfs_visited(
    edges: DataFrame,
    max_depth: int,
    edge_types: list[str] | None = None,
    sources: DataFrame | None = None,
) -> DataFrame:
    """The ONE copy of the bounded all-sources BFS trunk shared by
    :func:`truncated_closeness` and :func:`truncated_harmonic`: returns
    the (src, node_id, dist) min-distance frame for every source within
    ``max_depth`` directed hops. Per-level join → distinct → anti-join
    against visited, each level localCheckpoint-ed (iterative lineage +
    growing visited set — the :func:`shortest_paths` shape). Scale notes
    (Σ|ball| working set, the ``sources`` sampling escape hatch) live on
    :func:`truncated_closeness`."""
    if max_depth < 1:
        raise ValueError(f"bounded BFS needs max_depth >= 1, got {max_depth}")
    e = edges
    if edge_types is not None:
        e = e.filter(F.col("edge_type").isin(edge_types))
    fwd = (
        e.select(F.col("from_node_id").alias("u"), F.col("to_node_id").alias("v"))
        .distinct()
        # joined at every level — materialize once (recursive_chain rule)
        .localCheckpoint(eager=True)
    )
    if sources is None:
        # only nodes WITH out-edges can reach anything within the horizon
        sources = fwd.select(F.col("u").alias("node_id")).distinct()
    visited = sources.select(
        F.col("node_id").alias("src"),
        F.col("node_id").alias("node_id"),
        F.lit(0).alias("dist"),
    )
    frontier = visited
    for d in range(1, max_depth + 1):
        nxt = (
            frontier.join(fwd, frontier.node_id == fwd.u)
            .select("src", F.col("v").alias("node_id"), F.lit(d).alias("dist"))
            .distinct()
            .join(visited.select("src", "node_id"), ["src", "node_id"], "left_anti")
        )
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt)
        frontier = nxt
    return visited


def truncated_harmonic(
    edges: DataFrame,
    max_depth: int = 3,
    edge_types: list[str] | None = None,
    sources: DataFrame | None = None,
) -> DataFrame:
    """Truncated HARMONIC centrality — Σ 1/dist over the nodes reachable
    within ``max_depth`` directed hops. The robust sibling of
    :func:`truncated_closeness` (Boldi–Vigna's recommended centrality for
    disconnected/web graphs: unreachable nodes contribute 0 instead of
    poisoning a mean), and the EXACT-arithmetic one: with hop distances
    in 1..max_depth the reciprocals are rationals over
    ``L = lcm(1..max_depth)``, so the score is the exact integer
    ``h_units = Σ n_d · (L div d)`` with NO rounding anywhere (at depth 3,
    L = 6: h = 6·n₁ + 3·n₂ + 2·n₃ sixths). ``harmonic_milli =
    (1000·h_units) div L`` is published for readability — non-negative
    floor division, Spark ``div`` == DuckDB ``//``.

    Returns (node_id, n_reached, h_units, harmonic_milli); sources that
    reach nothing are absent (same contract as closeness). Scale: shares
    the :func:`_bounded_bfs_visited` trunk — same Σ|ball| working set and
    ``sources`` sampling escape hatch."""
    L = math.lcm(*range(1, max_depth + 1))
    visited = _bounded_bfs_visited(edges, max_depth, edge_types, sources)
    return (
        visited.filter(F.col("dist") > 0)
        .groupBy(F.col("src").alias("node_id"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_reached"),
            # L div dist is EXACT by construction (L = lcm of all dists)
            F.sum(F.expr(f"{L}L div dist")).cast("long").alias("h_units"),
        )
        .withColumn(
            "harmonic_milli",
            F.expr("(1000 * h_units) div " + str(L)).cast("long"),
        )
    )


def neighborhood_function(
    edges: DataFrame,
    max_depth: int = 3,
    edge_types: list[str] | None = None,
    sources: DataFrame | None = None,
) -> DataFrame:
    """The neighbourhood function N(d) within ``max_depth`` directed hops:
    for each distance d, the EXACT number of ordered (src, dst) pairs at
    min-distance exactly d, its running cumulative, and the cumulative as
    ppm of all reachable pairs at the horizon — the web-graph
    distance-distribution / effective-diameter audit (the statistic
    HyperANF approximates with sketches; here the horizon bound makes the
    exact count affordable, and the ``sources`` sampling hook is the
    sketch-free fallback at extreme scale). The smallest d whose
    ``cum_ppm ≥ 900000`` is the (horizon-clipped) 90%-effective-diameter
    read.

    Completes the bounded-BFS family: g32 closeness (mean distance), g44
    harmonic (Σ 1/d), this (the full distribution) — all three share ONE
    :func:`_bounded_bfs_visited` trunk, so the pair frame is computed
    identically. Returns (dist, n_pairs, cum_pairs, total_pairs,
    cum_ppm), every column an exact bigint (floor-div ppm, Spark ``div``
    == DuckDB ``//``).

    Scale: the only unbounded work is the shared BFS (Σ|ball| rows); the
    distance histogram is a map-side-combinable count on ≤ max_depth
    keys, and the two windows below run on the ≤ max_depth-row AGGREGATE
    (a deliberate single-partition window over a handful of rows — the
    exception to the no-global-window rule, bounded by construction)."""
    from pyspark.sql.window import Window

    visited = _bounded_bfs_visited(edges, max_depth, edge_types, sources)
    per = (
        visited.filter(F.col("dist") > 0)
        .groupBy(F.col("dist").cast("long").alias("dist"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    )
    w_cum = Window.orderBy("dist").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.orderBy("dist").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return per.select(
        "dist",
        "n_pairs",
        F.sum("n_pairs").over(w_cum).cast("long").alias("cum_pairs"),
        F.sum("n_pairs").over(w_all).cast("long").alias("total_pairs"),
    ).withColumn(
        "cum_ppm",
        F.expr("(1000000 * cum_pairs) div total_pairs").cast("long"),
    )


def truncated_closeness(
    edges: DataFrame,
    max_depth: int = 3,
    edge_types: list[str] | None = None,
    sources: DataFrame | None = None,
) -> DataFrame:
    """Truncated (bounded-horizon) closeness centrality: for every source
    node, the number of nodes reachable within ``max_depth`` directed hops
    and the exact sum of their hop distances — the "how central is this
    entity in its neighborhood" rank the reference's influence surface
    (``graph_service.py`` influence queries) approximates with degree.

    Returns (node_id, n_reached, total_dist, closeness_ppm) where
    ``closeness_ppm = 10^6 * n_reached div total_dist`` — hop counts and
    their sums are non-negative integers, so every column is an exact
    bigint and the floor division matches DuckDB ``//`` bit-for-bit (the
    t23/g30 fixed-point pattern). Sources that reach nothing within the
    horizon (no out-edges on the chosen types) are absent — documented;
    the oracle filters identically.

    Scale: this is the bounded all-sources BFS — frontier rows are
    (src, node) pairs, so the working set is Σ_v |ball(v, max_depth)|,
    NOT all-pairs: the horizon is the cap (depth 3 on a degree-d graph
    bounds each ball at d³). At web scale you pass ``sources`` (a 1-column
    ``node_id`` DataFrame — e.g. a deterministic hash sample, t11's
    pattern) to profile a sample of the graph instead of every node; the
    per-level join/anti-join stays keyed on node_id either way, and each
    level is localCheckpoint-ed to cut the iterative lineage (the
    :func:`shortest_paths` shape — many rounds + growing visited set, the
    case where per-level checkpointing wins; contrast the measured
    no-checkpoint choice for 2-3 round unrolls in ``pagerank.hits``)."""
    visited = _bounded_bfs_visited(edges, max_depth, edge_types, sources)
    return (
        visited.filter(F.col("dist") > 0)
        .groupBy(F.col("src").alias("node_id"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_reached"),
            F.sum("dist").cast("long").alias("total_dist"),
        )
        .withColumn(
            "closeness_ppm",
            F.expr("(1000000 * n_reached) div total_dist").cast("long"),
        )
    )


def reciprocity(edges: DataFrame) -> DataFrame:
    """Per-edge-type reciprocity: of the distinct directed non-loop edges,
    how many have their reverse present — the mutual-link share (Newman's
    reciprocity) that separates citation-like DAG-ish types from
    conversation-like mutual types. The reference's SIMILAR_TO edges are
    written in both directions by design (``graph_service.py`` E4 union);
    this is the audit that verifies such invariants hold corpus-wide.

    Returns (edge_type, n_edges, n_reciprocal, reciprocity_ppm) with
    ``reciprocity_ppm = 10^6 * n_reciprocal div n_edges`` — all counts
    over DISTINCT (type, from, to) triples with self-loops excluded
    (a loop is trivially its own reverse), so every column is an exact
    bigint. Scale: one distinct on the composite key, one self
    LEFT SEMI join on the reversed key (equi-join, same shuffle
    partitioning both sides), two map-side-combinable aggregates keyed by
    edge_type (#types rows)."""
    e = (
        edges.select("edge_type", "from_node_id", "to_node_id")
        .filter(F.col("from_node_id") != F.col("to_node_id"))
        .distinct()
    )
    rev = e.select(
        "edge_type",
        F.col("to_node_id").alias("from_node_id"),
        F.col("from_node_id").alias("to_node_id"),
    )
    recip = (
        e.join(rev, ["edge_type", "from_node_id", "to_node_id"], "left_semi")
        .groupBy("edge_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_reciprocal"))
    )
    totals = e.groupBy("edge_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_edges")
    )
    return (
        totals.join(recip, "edge_type", "left")
        .select(
            "edge_type",
            "n_edges",
            F.coalesce("n_reciprocal", F.lit(0)).cast("long").alias("n_reciprocal"),
        )
        .withColumn(
            "reciprocity_ppm",
            F.expr("(1000000 * n_reciprocal) div n_edges").cast("long"),
        )
    )


def two_hop_reach(
    pairs: DataFrame, salt_above: int | None = 256, max_salts: int = 16
) -> DataFrame:
    """Two-hop reach histogram — the neighborhood function N(v, 2) of an
    undirected pair graph (columns ``node_a``/``node_b``, any order /
    multiplicity), rolled up by reach value: how many nodes can touch
    exactly k distinct others within two hops. The expansion profile read
    alongside g34/g35 when judging how explosive a wedge/path query will
    be (a graph whose 2-hop ball is already half the node set makes any
    friend-of-friend join quadratic).

    Returns (reach, n_nodes) — bounded by #distinct-reach-values rows.
    Exact integer counts end to end.

    Scale: the wedge self-join fans out d² per node, keyed on the MIDDLE
    node — degree-aware salted by default (``salt_above``), the same
    defense as :func:`shared_entity_pairs`: a middle node hotter than
    ``salt_above`` has its wedge spread over
    ``min(max_salts, ceil(deg/salt_above))`` reducer slots (left leg
    hashed into one slot by its outer endpoint, right leg replicated into
    every slot), so no single reducer owns a hub's d² blowup; every
    (x, m, w) wedge still meets in exactly one slot, so the downstream
    DISTINCT union is bit-identical (salted==unsalted parity pinned in
    tests/test_salt.py). Cold middle nodes get one slot — the plan the
    unsalted join would produce. The per-node DISTINCT union is the
    remaining memory hog at web scale, where the standard move is the
    ANF/HyperLogLog form (replace the exact distinct + count with
    per-node ``approx_count_distinct`` over the same union — one pass,
    constant state per node; Palmer et al., KDD'02). This operator keeps
    the exact form because the histogram is the oracle contract; swap the
    last two aggregates for the sketch at 100×."""
    _, dr, _ = _undirected_incidences(pairs)
    if salt_above is not None:
        from research_knowledge_graph_spark.functions.salt import (
            salted_join_sides,
        )

        # middle-node degree, hot keys only (pigeonhole-bounded dim, the
        # attach_hot_degrees shape — inlined because the two sides key the
        # SAME degree on different columns: a's middle is v, b's is u)
        hot = (
            dr.groupBy("u")
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") > salt_above)
            .select(F.col("u").alias("_hk"), "deg")
        )
        a_side = (
            dr.join(hot, dr.v == hot._hk, "left")
            .drop("_hk")
            .withColumn("deg", F.coalesce("deg", F.lit(1)))
        )
        b_side = (
            dr.join(hot, dr.u == hot._hk, "left")
            .drop("_hk")
            .withColumn("deg", F.coalesce("deg", F.lit(1)))
        )
        big, small = salted_join_sides(a_side, b_side, "u", salt_above, max_salts)
        two = (
            big.alias("a")
            .join(
                small.alias("b"),
                (F.col("a.v") == F.col("b.u"))
                & (F.col("a._salt") == F.col("b._salt")),
            )
            .select(F.col("a.u").alias("u"), F.col("b.v").alias("w"))
            .filter(F.col("u") != F.col("w"))
        )
    else:
        two = (
            dr.alias("a")
            .join(dr.alias("b"), F.col("a.v") == F.col("b.u"))
            .select(F.col("a.u").alias("u"), F.col("b.v").alias("w"))
            .filter(F.col("u") != F.col("w"))
        )
    reach = (
        dr.select("u", F.col("v").alias("w"))
        .unionByName(two)
        .distinct()
        .groupBy("u")
        .agg(F.count(F.lit(1)).cast("long").alias("reach"))
    )
    return reach.groupBy("reach").agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes")
    )


def bowtie_probe(
    edges: DataFrame,
    max_depth: int = 3,
    edge_types: list[str] | None = None,
) -> DataFrame:
    """Broder-style BOWTIE probe of the graph around a deterministic pivot
    — the classic web-graph macro-structure read (Broder et al., WWW'00:
    CORE / IN / OUT decomposition of the crawl graph), horizon-bounded so
    every set is exact. Pivot = the max-out-degree node (ties to the
    smallest node_id — a total order); two balls off the ONE shared
    :func:`_bounded_bfs_visited` trunk: F = nodes reachable FROM the
    pivot within ``max_depth`` directed hops, B = nodes that REACH the
    pivot (the same trunk over the reversed edge frame). Regions:
    ``CORE`` = F∩B (the pivot's within-horizon SCC approximation),
    ``IN`` = B∖F, ``OUT`` = F∖B, ``OUTSIDE_HORIZON`` = every other
    endpoint (tendrils/tubes/disconnected — named honestly: the horizon
    clips the classic unbounded definition). Empty regions are absent
    (the oracle computes the same sets).

    Returns (region, n_nodes, pivot_node_id) — exact bigint counts, the
    pivot carried as a constant column off a bounded 1-row broadcast.

    Scale: the two BFS balls grow with the pivot's neighborhood, not the
    corpus; pivot selection is a degree hash-agg + TakeOrdered(1); the
    node universe is one distinct over edge endpoints; the two
    membership joins are ball-sized → AQE broadcasts them. No stage
    touches all-pairs anything."""
    e = edges
    if edge_types is not None:
        e = e.filter(F.col("edge_type").isin(edge_types))
    # materialize ONCE: pivot's lineage (full edge distinct + degree agg +
    # TakeOrdered) is otherwise embedded in both balls' seeds, both
    # membership joins and the final crossJoin — and the trunk's per-level
    # isEmpty() actions would recompute it ~5+ times per query
    fwd = (
        e.select(
            F.col("from_node_id").alias("u"), F.col("to_node_id").alias("v")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    pivot = (
        fwd.groupBy("u")
        .agg(F.count(F.lit(1)).alias("outdeg"))
        .orderBy(F.col("outdeg").desc(), F.col("u").asc())
        .limit(1)
        .select(F.col("u").alias("node_id"))
        .localCheckpoint(eager=True)
    )
    # both trunk inputs derive from the ONE distinct (u,v) frame — already
    # type-filtered, so the trunk gets edge_types=None (and this keeps the
    # operator usable on bare (from,to) frames with no edge_type column)
    fe = fwd.select(
        F.col("u").alias("from_node_id"), F.col("v").alias("to_node_id")
    )
    rev = fwd.select(
        F.col("v").alias("from_node_id"), F.col("u").alias("to_node_id")
    )
    f_ball = (
        _bounded_bfs_visited(fe, max_depth, None, sources=pivot)
        .select("node_id")
        .distinct()
        .withColumn("in_f", F.lit(True))
    )
    b_ball = (
        _bounded_bfs_visited(rev, max_depth, None, sources=pivot)
        .select("node_id")
        .distinct()
        .withColumn("in_b", F.lit(True))
    )
    universe = (
        fwd.select(F.col("u").alias("node_id"))
        .unionByName(fwd.select(F.col("v").alias("node_id")))
        .distinct()
    )
    cls = (
        universe.join(f_ball, "node_id", "left")
        .join(b_ball, "node_id", "left")
        .select(
            F.when(F.col("in_f") & F.col("in_b"), F.lit("CORE"))
            .when(F.col("in_b"), F.lit("IN"))
            .when(F.col("in_f"), F.lit("OUT"))
            .otherwise(F.lit("OUTSIDE_HORIZON"))
            .alias("region")
        )
    )
    counts = cls.groupBy("region").agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes")
    )
    # bounded 1-row dim by construction (limit(1)) — the broadcast-hint
    # guard the t10 fix established: hint only provably-bounded dims
    return counts.crossJoin(
        F.broadcast(pivot.select(F.col("node_id").alias("pivot_node_id")))
    )
