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


# ---------------------------------------------------------------------------
# Degree-aware salting wired into the blocking self-join (cross_link hot path)
# ---------------------------------------------------------------------------


def _zipf_pe(spark):
    """Synthetic blocking table with a Zipf head: entity j has ~2000/(j+1)
    papers — the degree profile sources/pages.py's head entities produce."""
    rows = []
    for j in range(40):
        deg = max(2000 // (j + 1), 2)
        rows.extend((f"p{j}_{i}", f"e{j}", deg) for i in range(deg))
    return spark.createDataFrame(rows, "paper_id string, entity_id string, deg int")


def test_salted_pair_sides_balance(spark):
    """Per-shuffle-partition comparison load of the salted join stays within
    2x of ideal on a Zipf corpus; the unsalted join does not."""
    from pyspark.sql import functions as F

    from research_knowledge_graph_spark.functions.salt import salted_self_join_sides

    pe = _zipf_pe(spark)
    n_part = 32

    # salt_above bounds per-slot load at deg_max * salt_above comparisons;
    # max_salts high enough that the head key is never re-capped
    sa, sb = salted_self_join_sides(pe, "paper_id", salt_above=32, max_salts=64)
    na = sa.groupBy("entity_id", "_salt").agg(F.count("*").alias("n_a"))
    nb = sb.groupBy("entity_id", "_salt").agg(F.count("*").alias("n_b"))
    load = (
        na.join(nb, ["entity_id", "_salt"])
        .withColumn("part", F.pmod(F.xxhash64("entity_id", "_salt"), F.lit(n_part)))
        .groupBy("part")
        .agg(F.sum(F.col("n_a") * F.col("n_b")).alias("load"))
    )
    stats = load.agg(F.max("load").alias("mx"), F.sum("load").alias("tot")).first()
    ideal = stats.tot / n_part
    assert stats.mx / ideal < 2.0, (stats.mx, ideal)

    # unsalted baseline: the head key's deg^2 dominates a single partition
    un = (
        pe.groupBy("entity_id").agg(F.count("*").alias("n"))
        .withColumn("part", F.pmod(F.xxhash64("entity_id"), F.lit(n_part)))
        .groupBy("part")
        .agg(F.sum(F.col("n") * F.col("n")).alias("load"))
    )
    ustats = un.agg(F.max("load").alias("mx"), F.sum("load").alias("tot")).first()
    assert ustats.mx / (ustats.tot / n_part) > 2.0  # skew the salt removes


def test_candidate_pairs_salted_identical_output(spark):
    """Salting is a physical-plan change only: pair sets match exactly on a
    pipeline-derived graph from the Zipf page corpus."""
    from pyspark.sql import functions as F

    from research_knowledge_graph_spark.operators import extraction as X
    from research_knowledge_graph_spark.operators import html_text as H
    from research_knowledge_graph_spark.operators import linking as L
    from research_knowledge_graph_spark.operators import validation as V
    from research_knowledge_graph_spark.sources.pages import synthesize_pages

    pages = synthesize_pages(spark, 150)
    docs = H.extract_text(pages).select(
        "url", "warc_ts", F.col("extracted_text").alias("text"), "lang"
    )
    meta = X.extract_metadata(docs)
    mv = V.validate_mentions(X.extract_mentions_heuristic(docs))
    tv = V.validate_triples(X.extract_triples_heuristic(docs))
    nodes = L.build_paper_nodes(meta).unionByName(L.build_entity_nodes(mv))
    edges = L.build_edges(meta, mv, tv, resolve_titles=True)

    salted = {
        (r.paper_a, r.paper_b)
        for r in L.candidate_pairs(nodes, edges, salt_above=4, max_salts=8).collect()
    }
    plain = {
        (r.paper_a, r.paper_b)
        for r in L.candidate_pairs(nodes, edges, salt_above=None).collect()
    }
    assert salted == plain and len(plain) > 0


def test_incremental_candidate_pairs_salted_identical_output(spark):
    """The incremental cross-link path salts its big (full-posting) side by
    default now (round-2 verdict #5): on a skewed batch the salted and
    unsalted pair sets match exactly, and both equal the salted result with
    an aggressive threshold."""
    from pyspark.sql import functions as F

    from research_knowledge_graph_spark.operators import extraction as X
    from research_knowledge_graph_spark.operators import html_text as H
    from research_knowledge_graph_spark.operators import linking as L
    from research_knowledge_graph_spark.operators import validation as V
    from research_knowledge_graph_spark.sources.pages import synthesize_pages

    pages = synthesize_pages(spark, 150)
    docs = H.extract_text(pages).select(
        "url", "warc_ts", F.col("extracted_text").alias("text"), "lang"
    )
    meta = X.extract_metadata(docs)
    mv = V.validate_mentions(X.extract_mentions_heuristic(docs))
    tv = V.validate_triples(X.extract_triples_heuristic(docs))
    nodes = L.build_paper_nodes(meta).unionByName(L.build_entity_nodes(mv))
    edges = L.build_edges(meta, mv, tv, resolve_titles=True)
    # skewed batch: the slice of edges touching the head entities
    new_edges = edges.filter(F.pmod(F.xxhash64("id"), F.lit(4)) == 0)

    def pairs(**kw):
        return {
            (r.paper_a, r.paper_b)
            for r in L.incremental_candidate_pairs(nodes, edges, new_edges, **kw).collect()
        }

    plain = pairs(salt_above=None)
    assert len(plain) > 0
    assert pairs(salt_above=4, max_salts=8) == plain  # aggressive salting
    assert pairs() == plain  # the default


# ---------------------------------------------------------------------------
# Two-phase salted aggregation
# ---------------------------------------------------------------------------


def test_two_phase_aggs_match_direct(spark):
    """On a Zipf-keyed table the two-phase count / countDistinct /
    collect_set equal their single-shuffle counterparts exactly."""
    from pyspark.sql import functions as F

    from research_knowledge_graph_spark.functions.salt import (
        two_phase_collect_set,
        two_phase_count,
        two_phase_count_distinct,
    )

    rows = []
    for j in range(20):
        n = max(3000 // (j + 1) ** 2, 3)
        rows.extend((f"k{j}", f"v{i % max(n // 3, 1)}") for i in range(n))
    df = spark.createDataFrame(rows, "key string, val string").repartition(8)

    direct_n = {r.key: r.n for r in df.groupBy("key").agg(F.count(F.lit(1)).alias("n")).collect()}
    got_n = {r.key: r.n for r in two_phase_count(df, ["key"]).collect()}
    assert got_n == direct_n

    direct_d = {
        r.key: r.d for r in df.groupBy("key").agg(F.countDistinct("val").alias("d")).collect()
    }
    got_d = {r.key: r.n_distinct for r in two_phase_count_distinct(df, ["key"], "val").collect()}
    assert got_d == direct_d

    direct_s = {
        r.key: sorted(r.s)
        for r in df.groupBy("key").agg(F.collect_set("val").alias("s")).collect()
    }
    got_s = {r.key: list(r.values) for r in two_phase_collect_set(df, ["key"], "val").collect()}
    assert got_s == direct_s


# ---------------------------------------------------------------------------
# Query-surface pair graph (shared_entity_pairs) — VERDICT round-3 #1
# ---------------------------------------------------------------------------


def test_shared_entity_pairs_salted_parity_and_balance(spark):
    """The query-surface co-usage self-join routes through the same
    degree-aware salting as the pipeline: (a) salted == unsalted including
    shared_count (every pair meets in exactly one slot); (b) on a Zipf
    graph the per-shuffle-partition comparison load stays within 2x of
    ideal, while the unsalted key layout does not."""
    from pyspark.sql import functions as F

    from research_knowledge_graph_spark.functions.salt import salted_self_join_sides
    from research_knowledge_graph_spark.operators.graph_queries import (
        shared_entity_pairs,
    )

    # Zipf edge table: target e_j is used by ~1200/(j+1) sources; sources
    # overlap so shared_counts > 1 exist
    rows = []
    for j in range(30):
        deg = max(1200 // (j + 1), 2)
        rows.extend(
            (f"s{(i * 7 + j) % 900}", f"e{j}", "USES_PART") for i in range(deg)
        )
    edges = spark.createDataFrame(
        rows, "from_node_id string, to_node_id string, edge_type string"
    )

    plain = {
        (r.node_a, r.node_b, r.shared_count)
        for r in shared_entity_pairs(edges, ["USES_PART"], salt_above=None).collect()
    }
    salted = {
        (r.node_a, r.node_b, r.shared_count)
        for r in shared_entity_pairs(
            edges, ["USES_PART"], salt_above=16, max_salts=64
        ).collect()
    }
    assert salted == plain and len(plain) > 100
    assert max(c for _, _, c in plain) >= 2  # counts exercised, not all 1

    # (b) load balance of the salted (tgt, _salt) key vs the raw tgt key
    pe = (
        edges.select(
            F.col("from_node_id").alias("src"), F.col("to_node_id").alias("tgt")
        )
        .distinct()
    )
    deg = pe.groupBy("tgt").agg(F.count(F.lit(1)).alias("deg"))
    sa, sb = salted_self_join_sides(pe.join(deg, "tgt"), "src", 16, 64)
    n_part = 32
    na = sa.groupBy("tgt", "_salt").agg(F.count("*").alias("n_a"))
    nb = sb.groupBy("tgt", "_salt").agg(F.count("*").alias("n_b"))
    load = (
        na.join(nb, ["tgt", "_salt"])
        .withColumn("part", F.pmod(F.xxhash64("tgt", "_salt"), F.lit(n_part)))
        .groupBy("part")
        .agg(F.sum(F.col("n_a") * F.col("n_b")).alias("load"))
    )
    stats = load.agg(F.max("load").alias("mx"), F.sum("load").alias("tot")).first()
    # pigeonhole caveat (ROUND_NOTES): ~60 hot slots into 32 partitions
    # co-locate a couple of them, so bound loosely vs ideal and strictly
    # vs the unsalted layout's head-key monolith
    assert stats.mx / (stats.tot / n_part) < 3.0, (stats.mx, stats.tot)

    un = (
        pe.groupBy("tgt").agg(F.count("*").alias("n"))
        .withColumn("part", F.pmod(F.xxhash64("tgt"), F.lit(n_part)))
        .groupBy("part")
        .agg(F.sum(F.col("n") * F.col("n")).alias("load"))
    )
    ustats = un.agg(F.max("load").alias("mx"), F.sum("load").alias("tot")).first()
    assert ustats.mx / (ustats.tot / n_part) > 2.0
    assert stats.mx < ustats.mx / 4, (stats.mx, ustats.mx)


# ---------------------------------------------------------------------------
# Tagged-binary id narrowing on the blocking path (hashing.id_to_bin)
# ---------------------------------------------------------------------------


def test_id_bin_roundtrip_and_order(spark):
    """id_to_bin/bin_to_id: exact round-trip for det_id hex, UPPERCASE hex
    (must NOT come back lowercased), non-hex, '61'-vs-'a' alias candidates,
    empty and non-ASCII ids; binary sort order == string order within the
    lowercase-hex space (the pair-canonicalization invariant)."""
    from pyspark.sql import functions as F

    from research_knowledge_graph_spark.functions.hashing import bin_to_id, id_to_bin

    ids = [
        "0123456789abcdef0123456789abcdef",
        "0123456789ABCDEF0123456789ABCDEF",
        "p1", "61", "a", "", "ünïcode—id",
    ]
    df = spark.createDataFrame([(i,) for i in ids], "id string")
    got = df.select(
        "id",
        bin_to_id(id_to_bin("id")).alias("rt"),
        id_to_bin("id").alias("b"),
    ).collect()
    assert all(r.id == r.rt for r in got), [(r.id, r.rt) for r in got]
    # alias-freedom: distinct ids stay distinct post-narrowing
    assert len({bytes(r.b) for r in got}) == len(ids)

    import random

    rng = random.Random(7)
    hexids = sorted("%032x" % rng.getrandbits(128) for _ in range(300))
    d2 = spark.createDataFrame([(i,) for i in hexids], "id string")
    in_bin_order = [
        r.id for r in d2.select("id", id_to_bin("id").alias("b")).orderBy("b").collect()
    ]
    assert in_bin_order == hexids


def test_candidate_pairs_non_hex_ids(spark):
    """The narrowing is internal: candidate_pairs over a FOREIGN corpus with
    arbitrary (non-det_id) string ids still returns the exact string pair
    set with string-ordered orientation."""
    from research_knowledge_graph_spark.operators import linking as L

    nodes = spark.createDataFrame(
        [("e1", "dataset"), ("E-two", "method"), ("61", "concept")],
        "id string, node_type string",
    )
    edges = spark.createDataFrame(
        [("paperB", "e1"), ("paperA", "e1"), ("paperA", "E-two"),
         ("a", "61"), ("paperB", "61")],
        "from_node_id string, to_node_id string",
    )
    got = {
        (r.paper_a, r.paper_b)
        for r in L.candidate_pairs(nodes, edges).collect()
    }
    assert got == {("paperA", "paperB"), ("a", "paperB")}


def test_candidate_pairs_mixed_id_spaces_string_order(spark):
    """Cross-tag ordering (review finding): a corpus mixing 32-char
    lowercase-hex ids with other shapes must STILL orient pairs by string
    order — the tag byte would otherwise sort every packed-hex id before
    every raw id ('1aaa…' < '0' in tag order, but '0' < '1aaa…' as
    strings, flipping edge direction and det_id)."""
    from research_knowledge_graph_spark.operators import linking as L

    hexid = "1aaa" + "0" * 28
    nodes = spark.createDataFrame([("ent", "dataset")], "id string, node_type string")
    edges = spark.createDataFrame(
        [("0", "ent"), (hexid, "ent")],
        "from_node_id string, to_node_id string",
    )
    got = {(r.paper_a, r.paper_b) for r in L.candidate_pairs(nodes, edges).collect()}
    assert got == {("0", hexid)}
    # incremental enumerator shares the contract
    inc = {
        (r.paper_a, r.paper_b)
        for r in L.incremental_candidate_pairs(nodes, edges, edges).collect()
    }
    assert inc == {("0", hexid)}


def test_salted_repartition_guards_existing_salt(spark):
    import pytest

    from research_knowledge_graph_spark.functions.salt import (
        replicate_for_salted_join,
        salted_repartition,
    )

    small = spark.createDataFrame([("k1", 1)], "k string, v int")
    replicated = replicate_for_salted_join(small, 4)  # carries _salt
    with pytest.raises(ValueError, match="_salt"):
        salted_repartition(replicated, "k", 8)


def test_couse_pairs_numeric_rewrite_matches_generic(spark):
    """The entry-side co-usage pair build (g06: numeric long postings,
    persisted once, strings rebuilt after the >=2 filter with
    least/greatest) must emit exactly the rows of the generic
    string-keyed shared_entity_pairs path it replaced."""
    import importlib.util

    from research_knowledge_graph_spark.operators import graph_queries as G
    from research_knowledge_graph_spark.plans import tpch_graph as TG

    spec = importlib.util.spec_from_file_location(
        "entry_for_couse_test", "/root/repo/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)

    sf_dir = "/root/testdata/sf0.001"
    got = sorted(
        (r.node_a, r.node_b, r.shared_count)
        for r in m._couse_pairs(spark, sf_dir).collect()
    )
    generic = sorted(
        (r.node_a, r.node_b, r.shared_count)
        for r in G.shared_entity_pairs(
            TG.derive_edges(spark, sf_dir), ["USES_PART"]
        )
        .filter(F.col("shared_count") >= 2)
        .collect()
    )
    assert got == generic and len(got) > 0
    for df in m._COUSE_CACHE.values():
        df.unpersist()
    m._COUSE_CACHE.clear()


def test_two_hop_reach_salted_identical_output(spark):
    """g36's wedge join is salted on the middle node by default; the reach
    histogram must be bit-identical to the unsalted form on a Zipf-skewed
    graph whose head node is far hotter than salt_above."""
    import random

    from research_knowledge_graph_spark.operators.graph_queries import (
        two_hop_reach,
    )

    rng = random.Random(7)
    rows = []
    # hub node n0 linked to 600 others (deg >> salt_above=16 below), plus
    # a random sparse tail
    for i in range(1, 601):
        rows.append((f"n0", f"n{i}"))
    for _ in range(800):
        a, b = rng.randrange(1, 650), rng.randrange(1, 650)
        rows.append((f"n{a}", f"n{b}"))
    pairs = spark.createDataFrame(rows, "node_a string, node_b string")

    salted = sorted(
        (r.reach, r.n_nodes)
        for r in two_hop_reach(pairs, salt_above=16, max_salts=8).collect()
    )
    plain = sorted(
        (r.reach, r.n_nodes)
        for r in two_hop_reach(pairs, salt_above=None).collect()
    )
    assert salted == plain and len(salted) > 0
