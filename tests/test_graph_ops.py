"""Unit pins for iterative graph operators on hand-built graphs where the
expected answer is checkable by eye (the sf-scale oracle twin is
tests/test_entry_oracle.py::g17)."""

from pyspark.sql import functions as F

from research_knowledge_graph_spark.operators.graph_queries import (
    shortest_paths,
    triangle_count,
)


def _edges(spark, rows):
    return spark.createDataFrame(
        [(a, b, t, 1.0) for a, b, t in rows],
        "from_node_id string, to_node_id string, edge_type string, confidence double",
    )


def test_shortest_paths_min_dist_and_direction(spark):
    # a→b→c→L plus shortcut a→c; direction matters: L reaches nothing.
    e = _edges(
        spark,
        [("a", "b", "E"), ("b", "c", "E"), ("c", "L", "E"), ("a", "c", "E")],
    )
    got = {
        (r.landmark, r.node_id, r.dist)
        for r in shortest_paths(e, ["L"], max_depth=5).collect()
    }
    assert got == {("L", "L", 0), ("L", "c", 1), ("L", "b", 2), ("L", "a", 2)}


def test_shortest_paths_multi_landmark_and_cycle(spark):
    # cycle x→y→x must terminate; both landmarks expand in one frontier
    e = _edges(
        spark,
        [("x", "y", "E"), ("y", "x", "E"), ("x", "L1", "E"), ("y", "L2", "E")],
    )
    sp = shortest_paths(e, ["L1", "L2"], max_depth=4)
    got = {(r.landmark, r.node_id, r.dist) for r in sp.collect()}
    assert ("L1", "x", 1) in got and ("L1", "y", 2) in got
    assert ("L2", "y", 1) in got and ("L2", "x", 2) in got
    # one row per (landmark, node): first visit IS the minimum
    assert sp.groupBy("landmark", "node_id").count().filter(
        F.col("count") > 1
    ).count() == 0


def test_shortest_paths_depth_cap_and_type_filter(spark):
    e = _edges(
        spark,
        [("a", "b", "E"), ("b", "L", "E"), ("z", "L", "OTHER")],
    )
    got = {
        (r.node_id, r.dist)
        for r in shortest_paths(e, ["L"], max_depth=1, edge_types=["E"]).collect()
    }
    assert got == {("L", 0), ("b", 1)}  # a is 2 hops → capped out; z wrong type


def test_triangle_count(spark):
    # K4 on {a,b,c,d} (4 triangles, each node in 3) plus a pendant edge
    # d-e (e: zero triangles) and a disconnected pair f-g
    edges = [
        ("a", "b"), ("a", "c"), ("a", "d"),
        ("b", "c"), ("b", "d"), ("c", "d"),
        ("d", "e"), ("f", "g"),
    ]
    pairs = spark.createDataFrame(edges, "node_a string, node_b string")
    got = {(r.node_id, r.n_triangles) for r in triangle_count(pairs).collect()}
    assert got == {
        ("a", 3), ("b", 3), ("c", 3), ("d", 3),
        ("e", 0), ("f", 0), ("g", 0),
    }
    # duplicate / reversed input edges change nothing
    noisy = pairs.unionByName(
        spark.createDataFrame(
            [("b", "a"), ("c", "a"), ("a", "b")], "node_a string, node_b string"
        )
    )
    got2 = {(r.node_id, r.n_triangles) for r in triangle_count(noisy).collect()}
    assert got2 == got

    # clustering coefficient: K4 members are fully clustered except d,
    # whose pendant edge to e dilutes its neighborhood
    from research_knowledge_graph_spark.operators.graph_queries import (
        clustering_coefficient,
    )

    cc = {
        r.node_id: (r.degree, r.coefficient)
        for r in clustering_coefficient(pairs).collect()
    }
    assert cc["a"] == (3, 1.0) and cc["b"] == (3, 1.0) and cc["c"] == (3, 1.0)
    assert cc["d"] == (4, 0.5)  # 3 triangles of 6 possible neighbor pairs
    assert cc["e"] == (1, 0.0) and cc["f"] == (1, 0.0)


def test_node_similarity_jaccard(spark):
    from research_knowledge_graph_spark.operators.graph_queries import (
        node_similarity_jaccard,
    )

    # path a-b-c-d plus edge a-c:
    #   N(a)={b,c} N(b)={a,c} N(c)={a,b,d} N(d)={c}
    # common neighbors: (a,b)={c}, (a,c)={b}, (b,c)={a}, (a,d)={c},
    # (b,d)={c}; (c,d) share none
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("a", "c")]
    pairs = spark.createDataFrame(edges, "node_a string, node_b string")
    got = {
        (r.node_a, r.node_b): (r.shared_neighbors, r.jaccard)
        for r in node_similarity_jaccard(pairs, min_shared=1, top_k=10).collect()
    }
    assert got == {
        ("a", "b"): (1, round(1 / 3, 6)),   # |{c}| / |{a,b,c}|
        ("a", "c"): (1, 0.25),              # |{b}| / |{a,b,c,d}|
        ("b", "c"): (1, 0.25),              # |{a}| / |{a,b,c,d}|
        ("a", "d"): (1, round(1 / 2, 6)),   # |{c}| / |{b,c}|... N(a)∪N(d)={b,c}
        ("b", "d"): (1, 0.5),               # |{c}| / |{a,c}|
    }
    # min_shared prunes single-neighbor pairs; duplicates/reversed edges
    # change nothing
    noisy = pairs.unionByName(
        spark.createDataFrame([("b", "a"), ("c", "b")], "node_a string, node_b string")
    )
    assert node_similarity_jaccard(noisy, min_shared=2, top_k=10).count() == 0
    got2 = {
        (r.node_a, r.node_b): (r.shared_neighbors, r.jaccard)
        for r in node_similarity_jaccard(noisy, min_shared=1, top_k=10).collect()
    }
    assert got2 == got
    # top_k cuts on the (jaccard DESC, ids) total order
    top2 = node_similarity_jaccard(pairs, min_shared=1, top_k=2).collect()
    assert [(r.node_a, r.node_b) for r in top2] == [("a", "d"), ("b", "d")]


def test_degree_assortativity_regular_graph_is_null(spark):
    from research_knowledge_graph_spark.operators.graph_queries import (
        degree_assortativity,
    )

    # two disjoint edges: every node has degree 1 — zero variance, so the
    # Pearson denominator is 0.0; ANSI mode must NOT raise, and the
    # result must be NULL (the SQL double/0.0 semantics the oracle uses)
    pairs = spark.createDataFrame(
        [("a", "b"), ("c", "d")], "node_a string, node_b string"
    )
    row = degree_assortativity(pairs).collect()[0]
    assert row.n_directed_edges == 4
    assert row.assortativity is None


def test_degree_assortativity_star_is_minus_one(spark):
    from research_knowledge_graph_spark.operators.graph_queries import (
        degree_assortativity,
    )

    # star K_{1,3}: hub degree 3, leaves degree 1 — every edge joins a
    # 3 to a 1, perfectly disassortative: exactly -1.0 from the integer
    # sums (n=6 sx=sy=12 sxy=18 sxx=syy=30 → -36 / 36). Duplicate and
    # reversed input edges must not change the canonical edge set.
    pairs = spark.createDataFrame(
        [("h", "a"), ("h", "b"), ("h", "c"), ("a", "h"), ("h", "b")],
        "node_a string, node_b string",
    )
    row = degree_assortativity(pairs).collect()[0]
    assert row.n_directed_edges == 6
    assert row.assortativity == -1.0


def test_resource_allocation_hand_computed(spark):
    """Exact integer-nano RA on the same a-b-c-d(+a-c) graph as the
    Jaccard pin. Degrees a:2 b:2 c:3 d:1; w = 10^9 div deg. With the
    default exclude_existing=True only the non-adjacent pairs (a,d)/(b,d)
    survive (both share the deg-3 hub c → 333333333); with False the full
    scoreboard includes the adjacent pairs sharing degree-2 b or a at
    500000000."""
    from research_knowledge_graph_spark.operators.graph_queries import (
        resource_allocation_topk,
    )

    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("a", "c")],
        "node_a string, node_b string",
    )
    got = {
        (r.node_a, r.node_b): (r.shared_neighbors, r.ra_nano)
        for r in resource_allocation_topk(pairs, min_shared=1, top_k=10).collect()
    }
    assert got == {
        ("a", "d"): (1, 333333333),
        ("b", "d"): (1, 333333333),
    }
    full = {
        (r.node_a, r.node_b): (r.shared_neighbors, r.ra_nano)
        for r in resource_allocation_topk(
            pairs, min_shared=1, top_k=10, exclude_existing=False
        ).collect()
    }
    assert full == {
        ("a", "c"): (1, 500000000),
        ("b", "c"): (1, 500000000),
        ("a", "b"): (1, 333333333),
        ("a", "d"): (1, 333333333),
        ("b", "d"): (1, 333333333),
    }
    # duplicate / reversed input edges change nothing (canonicalized)
    noisy = pairs.unionByName(
        spark.createDataFrame(
            [("b", "a"), ("c", "b")], "node_a string, node_b string"
        )
    )
    got2 = {
        (r.node_a, r.node_b): (r.shared_neighbors, r.ra_nano)
        for r in resource_allocation_topk(noisy, min_shared=1, top_k=10).collect()
    }
    assert got2 == got
    # top_k cuts on the (ra_nano DESC, ids) total order
    top2 = resource_allocation_topk(
        pairs, min_shared=1, top_k=2, exclude_existing=False
    ).collect()
    assert [(r.node_a, r.node_b) for r in top2] == [("a", "c"), ("b", "c")]


def test_resource_allocation_salted_parity(spark):
    """Hot-hub graph (star K_{1,40} + a clique rim): the salted wedge
    (salt_above=8 forces real splitting) must equal the unsalted plan
    bit-for-bit — every pair meets in exactly one salt slot, so the
    integer count and nano sums are preserved."""
    from research_knowledge_graph_spark.operators.graph_queries import (
        resource_allocation_topk,
    )

    rows = [("hub", f"l{i}") for i in range(40)]
    rows += [(f"l{i}", f"l{i+1}") for i in range(0, 38, 2)]
    pairs = spark.createDataFrame(rows, "node_a string, node_b string")
    key = lambda r: (r.node_a, r.node_b)  # noqa: E731
    salted = {
        key(r): (r.shared_neighbors, r.ra_nano)
        for r in resource_allocation_topk(
            pairs, min_shared=1, top_k=10000, salt_above=8, max_salts=16
        ).collect()
    }
    plain = {
        key(r): (r.shared_neighbors, r.ra_nano)
        for r in resource_allocation_topk(
            pairs, min_shared=1, top_k=10000, salt_above=None
        ).collect()
    }
    assert salted == plain and len(plain) > 700  # C(40,2)=780 hub wedges


def test_truncated_closeness_hand_computed(spark):
    """Chain+branch at depth 2: exact n_reached/total_dist/ppm; parallel
    edges collapse (distinct); sinks (no out-edges) are absent."""
    from research_knowledge_graph_spark.operators.graph_queries import (
        truncated_closeness,
    )

    edges = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("b", "c"), ("c", "d"), ("b", "e")],
        "from_node_id string, to_node_id string",
    )
    rows = {
        r.node_id: (r.n_reached, r.total_dist, r.closeness_ppm)
        for r in truncated_closeness(edges, max_depth=2).collect()
    }
    # a: b@1, c@2, e@2 -> (3, 5, 600000); b: c@1, e@1, d@2 -> (3, 4, 750000)
    # c: d@1 -> (1, 1, 1000000); d, e: sinks, absent
    assert rows == {
        "a": (3, 5, 600000),
        "b": (3, 4, 750000),
        "c": (1, 1, 1000000),
    }


def test_truncated_closeness_cycle_excludes_self(spark):
    """A 2-cycle never counts the source itself (dist-0 visited blocks the
    return step) and terminates within the horizon."""
    from research_knowledge_graph_spark.operators.graph_queries import (
        truncated_closeness,
    )

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a")], "from_node_id string, to_node_id string"
    )
    rows = {
        r.node_id: (r.n_reached, r.total_dist)
        for r in truncated_closeness(edges, max_depth=3).collect()
    }
    assert rows == {"a": (1, 1), "b": (1, 1)}


def test_truncated_closeness_validates_depth(spark):
    from research_knowledge_graph_spark.operators.graph_queries import (
        truncated_closeness,
    )
    import pytest as _pytest

    edges = spark.createDataFrame(
        [("a", "b")], "from_node_id string, to_node_id string"
    )
    with _pytest.raises(ValueError):
        truncated_closeness(edges, max_depth=0)


def test_truncated_harmonic_hand_computed(spark):
    """Same chain+branch as the closeness pin, depth 3 (lcm 6): exact
    sixths with zero rounding — a reaches b@1,c@2,e@2,d@3 → 6+3+3+2=14
    sixths (harmonic_milli 2333); sinks absent; the depth guard fires."""
    from research_knowledge_graph_spark.operators.graph_queries import (
        truncated_harmonic,
    )
    import pytest as _pytest

    edges = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("b", "c"), ("c", "d"), ("b", "e")],
        "from_node_id string, to_node_id string",
    )
    rows = {
        r.node_id: (r.n_reached, r.h_units, r.harmonic_milli)
        for r in truncated_harmonic(edges, max_depth=3).collect()
    }
    # b: c@1, e@1, d@2 -> 6+6+3 = 15 sixths -> 2500 milli
    # c: d@1 -> 6 sixths -> 1000 milli
    assert rows == {
        "a": (4, 14, 2333),
        "b": (3, 15, 2500),
        "c": (1, 6, 1000),
    }
    with _pytest.raises(ValueError):
        truncated_harmonic(edges, max_depth=0)


def test_neighborhood_function_hand_computed(spark):
    """Same chain+branch graph as the closeness/harmonic pins: pairs at
    dist 1/2/3 are 4/3/1 (total 8), cumulative 4/7/8, floor-ppm
    500000/875000/1000000 — all exact bigints."""
    from research_knowledge_graph_spark.operators.graph_queries import (
        neighborhood_function,
    )

    edges = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("b", "c"), ("c", "d"), ("b", "e")],
        "from_node_id string, to_node_id string",
    )
    rows = sorted(
        tuple(r) for r in neighborhood_function(edges, max_depth=3).collect()
    )
    assert rows == [
        (1, 4, 4, 8, 500000),
        (2, 3, 7, 8, 875000),
        (3, 1, 8, 8, 1000000),
    ]


def test_reciprocity_hand_computed(spark):
    """Mutual pair counts both directions; self-loops and duplicate rows
    are excluded before counting; types with no mutuals read 0."""
    from research_knowledge_graph_spark.operators.graph_queries import (
        reciprocity,
    )

    edges = spark.createDataFrame(
        [
            ("T", "a", "b"), ("T", "b", "a"),  # mutual pair -> 2 reciprocal
            ("T", "a", "c"),                    # one-way
            ("T", "a", "c"),                    # duplicate row, collapses
            ("T", "d", "d"),                    # self-loop, excluded
            ("U", "x", "y"),                    # one-way only type
        ],
        "edge_type string, from_node_id string, to_node_id string",
    )
    rows = {
        r.edge_type: (r.n_edges, r.n_reciprocal, r.reciprocity_ppm)
        for r in reciprocity(edges).collect()
    }
    assert rows == {"T": (3, 2, 666666), "U": (1, 0, 0)}


def test_avg_neighbor_degree_star_is_disassortative(spark):
    """Star K_{1,3}: leaves (deg 1) neighbor only the hub (deg 3) ->
    k_nn(1) = 3.000; the hub neighbors only leaves -> k_nn(3) = 1.000.
    Duplicate/reversed input edges collapse first."""
    from research_knowledge_graph_spark.operators.graph_queries import (
        avg_neighbor_degree,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 3), (1, 4), (1, 4)],
        "node_a long, node_b long",
    )
    rows = {r.degree: r for r in avg_neighbor_degree(pairs).collect()}
    assert set(rows) == {1, 3}
    r1, r3 = rows[1], rows[3]
    assert (r1.n_nodes, r1.n_incidences, r1.sum_neighbor_deg, r1.knn_milli) == (3, 3, 9, 3000)
    assert (r3.n_nodes, r3.n_incidences, r3.sum_neighbor_deg, r3.knn_milli) == (1, 3, 3, 1000)
    # invariant published for sanity-checking: n_incidences = degree * n_nodes
    assert all(r.n_incidences == d * r.n_nodes for d, r in rows.items())


def test_undirected_degree_collapses_loops_dups_and_direction(spark):
    """The ONE shared degree definition (g34/g35/g28): self-loops dropped,
    duplicate and reversed edges collapse to one undirected edge."""
    from research_knowledge_graph_spark.operators.graph_queries import (
        undirected_degree,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 2), (3, 3), (2, 3)],
        "node_a long, node_b long",
    )
    got = {(r.node_id, r.degree) for r in undirected_degree(pairs).collect()}
    assert got == {(1, 1), (2, 2), (3, 1)}


def test_two_hop_reach_path_and_triangle(spark):
    """Path a-b-c-d: N(a,2)={b,c}, N(b,2)={a,c,d} -> histogram {2:2, 3:2}.
    Triangle x-y-z (with dup/reversed input edges): every node reaches the
    other two in one hop and two-hop adds nothing -> all reach 2."""
    from research_knowledge_graph_spark.operators.graph_queries import (
        two_hop_reach,
    )

    path = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "node_a long, node_b long"
    )
    got = {(r.reach, r.n_nodes) for r in two_hop_reach(path).collect()}
    assert got == {(2, 2), (3, 2)}

    tri = spark.createDataFrame(
        [(10, 11), (11, 10), (11, 12), (10, 12), (12, 12)],
        "node_a long, node_b long",
    )
    got = {(r.reach, r.n_nodes) for r in two_hop_reach(tri).collect()}
    assert got == {(2, 3)}


def test_rich_club_hand_computed(spark):
    """Near-K4 core {1,2,3,4} minus edge (1,2), leaves 5,6,7 on 1,2,3
    (one edge duplicated + one reversed to exercise collapsing).
    Degrees: 3->4, {1,2,4}->3, leaves->1.
    k=4: N_k=0 dropped; k=3: N_k=1 dropped; k=1: N_k=4 core nodes,
    E_k=5 core edges -> phi = 2*5*1e6 div (4*3) = 833333."""
    from research_knowledge_graph_spark.operators.graph_queries import rich_club

    pairs = spark.createDataFrame(
        [(1, 3), (3, 1), (2, 3), (1, 4), (2, 4), (3, 4), (1, 5), (2, 6), (3, 7), (3, 7)],
        "node_a long, node_b long",
    )
    rows = {r.k: r for r in rich_club(pairs).collect()}
    assert set(rows) == {1}
    r = rows[1]
    assert (r.n_nodes_gt, r.n_edges_gt, r.phi_ppm) == (4, 5, 833333)


def test_rich_club_path(spark):
    """Path 1-2-3-4-5: only k=1 survives (3 inner nodes, 2 inner edges)
    -> phi = 2*2*1e6 div (3*2) = 666666."""
    from research_knowledge_graph_spark.operators.graph_queries import rich_club

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "node_a long, node_b long"
    )
    rows = rich_club(pairs).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.k, r.n_nodes_gt, r.n_edges_gt, r.phi_ppm) == (1, 3, 2, 666666)


def test_link_prediction_scoreboard_hand_computed(spark):
    """Triangle 1-2-3 plus pendant 3-4 (one dup edge to exercise
    collapsing). Non-adjacent candidate pairs via common neighbor z=3
    (deg 3): (1,4) and (2,4), each CN=1, AA = round(1e9/ln(3)),
    PA = 2*1 = 2. Adjacent pairs are anti-joined out."""
    import math

    from research_knowledge_graph_spark.operators.graph_queries import (
        link_prediction_scoreboard,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4), (4, 3)], "node_a long, node_b long"
    )
    rows = link_prediction_scoreboard(pairs).collect()
    aa3 = int(round(1e9 / math.log(3)))
    got = [
        (r.node_a, r.node_b, r.shared_neighbors, r.aa_nano, r.deg_a, r.deg_b, r.pa)
        for r in rows
    ]
    assert got == [(1, 4, 1, aa3, 2, 1, 2), (2, 4, 1, aa3, 2, 1, 2)]


def test_link_prediction_scoreboard_include_adjacent(spark):
    """exclude_existing=False keeps adjacent pairs: in the triangle+pendant
    graph, (1,2) shares z=3, (1,3)/(2,3) share the deg-2 apexes."""
    import math

    from research_knowledge_graph_spark.operators.graph_queries import (
        link_prediction_scoreboard,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4)], "node_a long, node_b long"
    )
    rows = link_prediction_scoreboard(pairs, exclude_existing=False).collect()
    aa2 = int(round(1e9 / math.log(2)))
    aa3 = int(round(1e9 / math.log(3)))
    got = {
        (r.node_a, r.node_b): (r.shared_neighbors, r.aa_nano, r.pa) for r in rows
    }
    assert got == {
        (1, 2): (1, aa3, 4),   # shared z=3
        (1, 3): (1, aa2, 6),   # shared z=2
        (2, 3): (1, aa2, 6),   # shared z=1
        (1, 4): (1, aa3, 2),
        (2, 4): (1, aa3, 2),
    }


def test_link_prediction_scoreboard_salted_parity(spark):
    """Salted (salt_above=1 forces every key hot) == unsalted, bit-for-bit."""
    from research_knowledge_graph_spark.operators.graph_queries import (
        link_prediction_scoreboard,
    )

    import random

    rng = random.Random(7)
    edges = [(rng.randrange(30), rng.randrange(30)) for _ in range(120)]
    pairs = spark.createDataFrame(edges, "node_a long, node_b long")
    a = sorted(map(tuple, link_prediction_scoreboard(pairs, top_k=1000, salt_above=None).collect()))
    b = sorted(map(tuple, link_prediction_scoreboard(pairs, top_k=1000, salt_above=1, max_salts=4).collect()))
    assert a == b


def test_bowtie_probe_hand_computed(spark):
    """Planted bowtie: cycle a→b→c→a plus branch a→x, feeder i→a, and a
    detached pair y→z. Pivot = a (out-degree 2, all others 1). F(a,3) =
    {a,b,x,c}, B(a,3) = {a,b,c,i} → CORE {a,b,c}, IN {i}, OUT {x},
    OUTSIDE_HORIZON {y,z}; pivot rides every row as a constant."""
    from research_knowledge_graph_spark.operators.graph_queries import (
        bowtie_probe,
    )

    edges = spark.createDataFrame(
        [
            ("a", "b"), ("a", "x"), ("b", "c"), ("c", "a"),
            ("i", "a"), ("y", "z"),
        ],
        "from_node_id string, to_node_id string",
    )
    rows = {r.region: r for r in bowtie_probe(edges, max_depth=3).collect()}
    assert {k: v.n_nodes for k, v in rows.items()} == {
        "CORE": 3, "IN": 1, "OUT": 1, "OUTSIDE_HORIZON": 2,
    }
    assert all(r.pivot_node_id == "a" for r in rows.values())
    # horizon clip: depth 1 shrinks the core to {a} (b needs 2 hops back)
    rows1 = {
        r.region: r.n_nodes for r in bowtie_probe(edges, max_depth=1).collect()
    }
    assert rows1["CORE"] == 1  # a alone: F={a,b,x}, B={a,c,i}
    assert rows1["IN"] == 2 and rows1["OUT"] == 2


def test_component_size_histogram_hand_computed(spark, tmp_path):
    """Planted components: a 3-chain, and two 2-pairs → histogram
    {3: 1 component, 2: 2 components} over 7 nodes, shares in floor ppm
    (3/7 → 428571, 4/7 → 571428); edge-less nodes absent (g15's
    contract — the pair frame never sees them)."""
    import importlib.util
    import os as _os

    entry_path = _os.path.join(
        _os.path.dirname(__file__), "..", "__spark_entry__.py"
    )
    spec = importlib.util.spec_from_file_location("__spark_entry__", entry_path)
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)

    from research_knowledge_graph_spark.operators.canonicalize import (
        connected_components,
    )

    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("d", "e"), ("f", "g")],
        "key_a string, key_b string",
    )
    comp = connected_components(pairs)
    sizes = comp.groupBy("component").count()
    assert sorted(r["count"] for r in sizes.collect()) == [2, 2, 3]
    # the entry-level histogram arithmetic on the same frame shape
    hist = (
        comp.groupBy("component")
        .agg(F.count(F.lit(1)).cast("long").alias("component_size"))
        .groupBy("component_size")
        .agg(F.count(F.lit(1)).cast("long").alias("n_components"))
    )
    got = {r.component_size: r.n_components for r in hist.collect()}
    assert got == {3: 1, 2: 2}
    assert (3 * 1 * 1_000_000) // 7 == 428_571
    assert (2 * 2 * 1_000_000) // 7 == 571_428
