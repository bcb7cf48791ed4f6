"""Community detection by synchronous label propagation (LPA).

The GraphFrames ``labelPropagation`` surface: every node starts in its own
community and repeatedly adopts the most frequent community among its
neighbors. LPA is the standard cheap community detector at web scale — no
modularity matrix, no global state, just k rounds of (join → count →
arg-max), each one shuffle on the node id.

Determinism: textbook LPA breaks count ties randomly; this implementation
breaks them by (count DESC, label ASC) and updates SYNCHRONOUSLY, so the
result is a pure function of the graph — reproducible across runs,
engines, and partitionings (pinned against a pure-Python twin in
tests/test_communities.py). Unlike PageRank (float accumulation order),
the votes are integer counts / sums and the arg-max is exact, so a fixed
iteration count IS cross-engine reproducible — the driver oracle unrolls
the rounds as a CTE cascade in DuckDB (g20/g21).

``weight_col`` (optional) votes each neighbor by an integer edge weight
instead of 1 — e.g. the co-usage graph's ``shared_count`` — a weighted-
modularity-flavored refinement: tightly-coupled nodes pull harder.

Scale shape per iteration: edges⨝labels is an equi-join on the node id;
the (node, neighbor_label) count is a partial-aggregatable hash-agg; the
per-node arg-max is ``max_by`` over a struct — one shuffle stage, no
windows, no sorts. ``localCheckpoint`` each round cuts the iterative-join
lineage (same pattern as connected components / PageRank)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def label_propagation(
    pairs: DataFrame, max_iter: int = 5, weight_col: str | None = None
) -> DataFrame:
    """(node_a, node_b[, weight]) undirected edges → (node_id, community)
    after ``max_iter`` synchronous rounds; community ids are node ids (each
    node's initial label). Isolated nodes don't appear (no edges = no
    neighbors = label never changes). With ``weight_col``, each neighbor's
    vote counts its (integer) edge weight; duplicate (node_a, node_b) rows
    collapse to their MAX weight — a simple weighted graph, mirroring the
    unweighted path's distinct() so both modes see one edge per pair."""
    wsel = [F.col(weight_col).alias("w")] if weight_col else []
    e = (
        pairs.select(F.col("node_a").alias("u"), F.col("node_b").alias("v"), *wsel)
        .unionByName(
            pairs.select(
                F.col("node_b").alias("u"), F.col("node_a").alias("v"), *wsel
            )
        )
        .filter(F.col("u") != F.col("v"))
    )
    if weight_col:
        e = e.groupBy("u", "v").agg(F.max("w").alias("w"))
    else:
        e = e.distinct()
    # joined every round — materialize once instead of re-running the
    # union + distinct/max-weight shuffle per iteration (the k_core /
    # recursive_chain idiom)
    e = e.localCheckpoint(eager=True)
    labels = e.select(F.col("u").alias("node_id")).distinct().withColumn(
        "community", F.col("node_id")
    )
    vote = F.sum("w") if weight_col else F.count(F.lit(1))
    for _ in range(max_iter):
        neigh = (
            e.join(
                labels.select(
                    F.col("node_id").alias("v"), F.col("community").alias("nl")
                ),
                "v",
            )
            .groupBy(F.col("u").alias("node_id"), F.col("nl"))
            .agg(vote.alias("cnt"))
        )
        # arg-max with deterministic tie-break: most frequent neighbor
        # label, ties to the SMALLEST label. max_by picks the max of
        # (cnt, negated-order label); labels are strings, so invert the
        # comparison by max_by over struct(cnt, label) with label order
        # flipped via a second aggregation instead: min_by over
        # struct(-cnt, label) — one hash-agg, no window.
        new_labels = neigh.groupBy("node_id").agg(
            F.min_by(
                F.col("nl"), F.struct((-F.col("cnt")).alias("neg"), F.col("nl"))
            ).alias("community")
        )
        labels = new_labels.localCheckpoint(eager=True)
    return labels


def _community_stats(pairs: DataFrame, labels: DataFrame) -> DataFrame:
    """Shared per-community integer aggregates behind :func:`modularity`
    and :func:`conductance` — ONE construction so the two quality scores
    can't drift: (community, n_nodes, internal_edges, degree_sum, m),
    all exact bigints, m (the global undirected edge count) attached as
    a broadcast 1-row constant column. Two label-dim joins onto the edge
    list + hash-aggs; nothing floats. Edge canonicalization and degrees
    come from graph_queries' shared undirected-incidence trunk (the ONE
    copy of loop/duplicate/direction semantics — a change there must
    reach modularity/conductance too)."""
    from research_knowledge_graph_spark.operators.graph_queries import (
        _undirected_incidences,
    )

    und, _dr, deg_shared = _undirected_incidences(pairs)
    lab = labels.select("node_id", "community")
    m1 = und.agg(F.count(F.lit(1)).alias("m"))
    ic = (
        und.join(
            lab.select(F.col("node_id").alias("u"), F.col("community").alias("cu")),
            "u",
        )
        .join(
            lab.select(F.col("node_id").alias("v"), F.col("community").alias("cv")),
            "v",
        )
        .filter(F.col("cu") == F.col("cv"))
        .groupBy(F.col("cu").alias("community"))
        .agg(F.count(F.lit(1)).alias("internal_edges"))
    )
    deg = deg_shared.select(
        F.col("nid").alias("node_id"), F.col("deg").alias("degree")
    )
    dc = (
        deg.join(lab, "node_id")
        .groupBy("community")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum("degree").alias("degree_sum"),
        )
    )
    return (
        dc.join(ic, "community", "left")
        .crossJoin(F.broadcast(m1))
        .select(
            "community",
            "n_nodes",
            F.coalesce("internal_edges", F.lit(0)).alias("internal_edges"),
            "degree_sum",
            "m",
        )
    )


def modularity(pairs: DataFrame, labels: DataFrame) -> DataFrame:
    """Per-community decomposition of Newman's modularity over the
    undirected simple graph of ``pairs``:

        Q_c = e_c / m  -  (d_c / (2m))^2        (Q = sum over communities)

    where e_c = edges inside community c, d_c = total degree of c's nodes,
    m = |edges|. ``labels``: (node_id, community) — e.g.
    :func:`label_propagation`'s output — making this the quality score for
    a community assignment (how much denser inside communities than a
    random degree-preserving graph; Q=0.5 is the two-clique optimum).

    Returns (community, n_nodes, internal_edges, degree_sum,
    modularity_term), term rounded to 9 decimals. Everything is integer
    aggregation (:func:`_community_stats`) until the final division; m
    rides a 1-row broadcast. Fully SQL-expressible, so the driver oracle
    (g22) composes it onto the same unrolled LPA cascade that checks
    g20/g21."""
    return _community_stats(pairs, labels).select(
        "community",
        "n_nodes",
        "internal_edges",
        "degree_sum",
        F.round(
            F.col("internal_edges").cast("double") / F.col("m")
            - (F.col("degree_sum").cast("double") / (2.0 * F.col("m")))
            * (F.col("degree_sum").cast("double") / (2.0 * F.col("m"))),
            9,
        ).alias("modularity_term"),
    )


def conductance(pairs: DataFrame, labels: DataFrame) -> DataFrame:
    """Per-community conductance over the undirected simple graph of
    ``pairs`` — the cut-quality score read next to :func:`modularity`
    (modularity rewards internal density vs a degree-preserving null;
    conductance measures the boundary directly):

        phi(c) = cut(c) / min(vol(c), 2m - vol(c))

    with ``cut(c)`` = edges leaving c = ``vol(c) - 2·internal(c)`` and
    ``vol(c)`` = the community's degree sum — both already exact bigints
    in :func:`_community_stats`, so NO extra pass over the edges. Low phi
    = well-separated community; phi near 1 = a label that mostly borders
    out.

    Returns (community, n_nodes, internal_edges, degree_sum, cut_edges,
    conductance_ppm) — the one division is non-negative fixed-point ppm
    floor division (trunc == floor cross-engine, the g30/t23 rule).
    Communities whose denominator is 0 (the whole graph under one label,
    or an all-isolated complement) are dropped rather than published as
    NULL (the v12 no-baseline rule)."""
    s = _community_stats(pairs, labels).select(
        "community",
        "n_nodes",
        "internal_edges",
        "degree_sum",
        (F.col("degree_sum") - 2 * F.col("internal_edges"))
        .cast("long")
        .alias("cut_edges"),
        F.least(
            F.col("degree_sum"), 2 * F.col("m") - F.col("degree_sum")
        ).alias("denom"),
    )
    return s.filter(F.col("denom") > 0).select(
        "community",
        F.col("n_nodes").cast("long").alias("n_nodes"),
        F.col("internal_edges").cast("long").alias("internal_edges"),
        F.col("degree_sum").cast("long").alias("degree_sum"),
        "cut_edges",
        F.expr(
            "CAST(cut_edges * 1000000L div denom AS BIGINT)"
        ).alias("conductance_ppm"),
    )


def louvain_move_round(pairs: DataFrame, labels: DataFrame) -> DataFrame:
    """One synchronous Louvain local-move round over an existing community
    assignment (typically :func:`label_propagation`'s output) — the
    refinement step of Louvain with :func:`modularity` as the objective.

    Every node evaluates moving into each NEIGHBOR community c against the
    CURRENT labels. The modularity gain of moving u from its community a
    to c is

        dQ = (k_uc - k_ua)/m - k_u*(sigma_c - sigma_a + k_u)/(2*m^2)

    (k_uc = u's edges into c, k_u = u's degree, sigma_c = total degree of
    c's members, m = |edges|). Multiplying by the positive constant 2*m^2
    gives the INTEGER decision value

        gain2 = 2*m*(k_uc - k_ua) - k_u*(sigma_c - sigma_a + k_u)

    so move selection (max gain2, ties to the smallest community id, move
    only if gain2 > 0) is exact integer arithmetic — bit-reproducible
    across engines, which is what lets the driver oracle unroll this round
    as SQL on top of the LPA CTE cascade (g23). Moves are applied
    synchronously (all nodes against the same snapshot — the standard
    distributed-Louvain relaxation of the sequential sweep); each
    individual move is strictly modularity-improving against the snapshot,
    and the aggregate improvement on the engine's community benches is
    pinned in tests/test_modularity.py.

    Scale shape: two label-dim joins onto the edge list + hash-aggs (all
    partial-aggregatable), m on a 1-row broadcast, and a per-node integer
    arg-max via ``min_by`` — one shuffle per aggregation, no windows.

    Returns (node_id, community) — one row per ``labels`` row; unchanged
    rows (including labeled nodes with no edge in ``pairs``) keep their
    label. Nodes appearing in ``pairs`` but absent from ``labels`` have
    no community to move FROM and are not assigned one (their edges still
    count toward labeled neighbors' degrees, but offer no candidate
    community)."""
    from research_knowledge_graph_spark.operators.graph_queries import (
        _canonical_undirected,
    )

    und = _canonical_undirected(pairs)
    e = und.unionByName(und.select(F.col("v").alias("u"), F.col("u").alias("v")))
    m1 = und.agg(F.count(F.lit(1)).alias("m"))
    lab = labels.select("node_id", "community")
    deg = e.groupBy(F.col("u").alias("node_id")).agg(
        F.count(F.lit(1)).alias("k_u")
    )
    # u's edge count into each neighboring community (k_uc)
    kuc = (
        e.join(
            lab.select(F.col("node_id").alias("v"), F.col("community").alias("cand")),
            "v",
        )
        .groupBy(F.col("u").alias("node_id"), "cand")
        .agg(F.count(F.lit(1)).alias("k_uc"))
    )
    sigma = (
        deg.join(lab, "node_id").groupBy("community").agg(F.sum("k_u").alias("sigma"))
    )
    base = (
        lab.join(deg, "node_id")
        .join(sigma.withColumnRenamed("sigma", "sigma_a"), "community")
        .select("node_id", F.col("community").alias("a"), "k_u", "sigma_a")
    )
    kua = base.join(
        kuc.select("node_id", F.col("cand").alias("a"), F.col("k_uc").alias("k_ua")),
        ["node_id", "a"],
        "left",
    ).select("node_id", F.coalesce("k_ua", F.lit(0)).alias("k_ua"))
    cand = (
        kuc.join(base, "node_id")
        .filter(F.col("cand") != F.col("a"))
        .join(kua, "node_id")
        .join(sigma.withColumnRenamed("community", "cand"), "cand")
        .crossJoin(F.broadcast(m1))
        .select(
            "node_id",
            "cand",
            (
                2 * F.col("m") * (F.col("k_uc") - F.col("k_ua"))
                - F.col("k_u") * (F.col("sigma") - F.col("sigma_a") + F.col("k_u"))
            ).alias("gain2"),
        )
    )
    best = (
        cand.filter(F.col("gain2") > 0)
        .groupBy("node_id")
        .agg(
            F.min_by(
                F.col("cand"), F.struct((-F.col("gain2")).alias("neg"), F.col("cand"))
            ).alias("moved")
        )
    )
    # return from lab, not base: base inner-joins deg, so a labeled node
    # with NO edge in `pairs` (isolated node, or labels from a larger
    # graph than this edge subset) would silently vanish from the
    # assignment — the contract is "unchanged rows keep their label",
    # and an edge-less node has no positive-gain move by construction
    return lab.join(best, "node_id", "left").select(
        "node_id", F.coalesce("moved", "community").alias("community")
    )


def k_core(pairs: DataFrame, k: int = 3, max_iter: int = 16) -> DataFrame:
    """(node_a, node_b) undirected edges → (node_id, core_degree): the
    k-core — the maximal subgraph in which every node has degree ≥ k —
    with each surviving node's degree INSIDE the core. The standard
    cohesion/denseness decomposition (reference analog: the graph
    service's "highly connected entity" notion, ``src/services/
    graph_service.py`` linking strategies) and a classic curation
    primitive: nodes outside any k-core are peripheral.

    Algorithm: synchronous peeling. Round i recomputes degrees over edges
    restricted to the round-(i-1) survivor set and drops nodes under k.
    The survivor set a_i is a deterministic function of a_{i-1} and rounds
    after the fixpoint are the identity, so a run capped at ``max_iter``
    rounds equals the fixpoint whenever peeling converges by then — and
    equals the driver oracle's unrolled ``max_iter``-round CTE cascade
    UNCONDITIONALLY (both engines compute the same a_i sequence; integer
    degrees, no ties to break). Early exit when a round removes nothing.

    Scale shape per round: one hash-agg for degrees (partial-aggregatable
    on the node id) + two semi-joins restricting the edge list — no
    windows, no collects; ``localCheckpoint`` truncates the iterative
    lineage like the other fixpoint operators. Peel depth, not graph
    size, bounds the round count; each round's edge list only shrinks.
    At very large scale the per-round ``count()`` convergence probe can
    be amortized by probing every j rounds — not done here because the
    probe rides the same job that materializes the checkpoint."""
    if k < 1:
        raise ValueError("k_core needs k >= 1")
    if max_iter < 1:
        # zero rounds would return a one-shot degree filter over the RAW
        # edge set, not a core (k_truss carries the same guard)
        raise ValueError("k_core needs max_iter >= 1")
    from research_knowledge_graph_spark.operators.graph_queries import (
        _canonical_undirected,
    )

    und = _canonical_undirected(pairs)
    e = und.unionByName(
        und.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint(eager=True)
    # convergence probe on the EDGE count: every peeled node had degree
    # ≥ 1 (it appeared in e), so a round that removes any node removes
    # at least one edge — edge count stalls iff the peel stalled. A
    # shuffle-free count over the just-checkpointed frame, vs the
    # distinct-node probe's extra exchange per round.
    n_edges = e.count()
    for _ in range(max_iter):
        deg = e.groupBy("u").agg(F.count(F.lit(1)).alias("core_degree"))
        alive = deg.filter(F.col("core_degree") >= k).select("u")
        e = (
            e.join(alive, "u", "left_semi")
            .join(alive.select(F.col("u").alias("v")), "v", "left_semi")
            .localCheckpoint(eager=True)
        )
        n_now = e.count()
        if n_now == n_edges:
            break
        n_edges = n_now
    return (
        e.groupBy("u")
        .agg(F.count(F.lit(1)).alias("core_degree"))
        .filter(F.col("core_degree") >= k)
        .select(F.col("u").alias("node_id"), "core_degree")
    )


def k_truss(pairs: DataFrame, k: int = 3, max_iter: int = 8) -> DataFrame:
    """(node_a, node_b) undirected edges → the k-truss: the maximal
    subgraph in which every EDGE participates in ≥ k−2 triangles. The
    edge-level sibling of :func:`k_core` — strictly stronger cohesion
    (every k-truss sits inside the (k−1)-core) and the standard
    community-nucleus extractor. Returns surviving edges
    (node_a, node_b, support) with their final-round triangle support.

    Algorithm: synchronous peel. Round i enumerates triangles over the
    round-(i−1) surviving edge list (the degree-oriented wedge join of
    graph_queries._enumerate_triangles — each triangle found once, hot-
    degree d² wedge blowup capped at the low end), explodes each triangle
    into its 3 canonical edges, hash-aggregates per-edge support, and
    drops edges under k−2. Survivor sets are integer-exact deterministic
    functions of the previous round, post-fixpoint rounds are the
    identity, so a fixed ``max_iter`` unroll matches the driver oracle's
    CTE cascade unconditionally (the k_core argument, lifted to edges).
    Early exit when a round drops nothing; ``localCheckpoint`` truncates
    the per-round lineage."""
    if k < 3:
        raise ValueError("k_truss needs k >= 3 (k-2 >= 1 triangle per edge)")
    if max_iter < 1:
        raise ValueError("k_truss needs max_iter >= 1")
    from research_knowledge_graph_spark.operators.graph_queries import (
        _canonical_undirected,
        _enumerate_triangles,
    )

    e = _canonical_undirected(pairs).localCheckpoint(eager=True)
    n_edges = e.count()
    for _ in range(max_iter):
        deg = (
            e.select(F.col("u").alias("node_id"))
            .unionByName(e.select(F.col("v").alias("node_id")))
            .groupBy("node_id")
            .agg(F.count(F.lit(1)).alias("degree"))
        )
        tris = _enumerate_triangles(e, deg)
        edge3 = tris.select(
            F.explode(
                F.array(
                    F.struct(
                        F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
                    ),
                    F.struct(
                        F.least("a", "c").alias("u"), F.greatest("a", "c").alias("v")
                    ),
                    F.struct(F.col("b").alias("u"), F.col("c").alias("v")),
                )
            ).alias("e")
        ).select("e.u", "e.v")
        sup = edge3.groupBy("u", "v").agg(F.count(F.lit(1)).alias("support"))
        kept = (
            e.join(sup, ["u", "v"], "left")
            .withColumn("support", F.coalesce("support", F.lit(0)))
            .filter(F.col("support") >= k - 2)
            .localCheckpoint(eager=True)
        )
        n_kept = kept.count()
        e = kept.select("u", "v")
        if n_kept == n_edges:
            return kept.select(
                F.col("u").alias("node_a"),
                F.col("v").alias("node_b"),
                "support",
            )
        n_edges = n_kept
    return kept.select(
        F.col("u").alias("node_a"), F.col("v").alias("node_b"), "support"
    )
