"""RAG retrieval (L5 analog) + similarity operator invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from research_knowledge_graph_spark.operators.qa import embed_docs, retrieve_context
from research_knowledge_graph_spark.operators.similarity import knn_bruteforce, knn_lsh


def test_retrieve_context_topk(spark):
    rows = [
        (1, "gaussian splatting renders scenes with gaussians"),
        (2, "neural radiance fields volumetric rendering"),
        (3, "stock market quarterly earnings report finance"),
        (4, "gaussian splatting real time rendering quality"),
    ]
    docs = embed_docs(spark.createDataFrame(rows, "doc_id bigint, text string"), dim=64)
    hits = retrieve_context(
        spark, docs, "gaussian splatting rendering", k=2, dim=64
    ).collect()
    assert [h.rank for h in hits] == [1, 2]
    assert {h.doc_id for h in hits} <= {1, 2, 4}  # finance doc never top-2
    assert all(h.context for h in hits)


def test_srp_signature_agreement_invariants(spark):
    """SRP identity pins behind e17's fidelity audit: identical vectors
    agree on EVERY plane (agree_bits == planes ⇒ est_ppm == 1e6); a negated
    vector flips every plane whose projection is nonzero (agree_bits == 0,
    the θ = π extreme of E[agree/planes] = 1 − θ/π)."""
    from research_knowledge_graph_spark.operators.similarity import srp_bucket_col

    planes, dim = 16, 8
    v = [0.137 * i + 0.071 for i in range(dim)]  # no symmetric zeros
    df = spark.createDataFrame(
        [(0, v), (1, v), (2, [-x for x in v])],
        "vec_id int, embedding array<float>",
    )
    sig = {
        r.vec_id: r.b
        for r in df.select(
            "vec_id", srp_bucket_col(F.col("embedding"), dim=dim, planes=planes).alias("b")
        ).collect()
    }
    assert sig[0] == sig[1]  # identical vectors: agreement on all planes
    # negation: every plane bit flips (all 16 projections are nonzero here)
    assert sig[0] ^ sig[2] == (1 << planes) - 1


def test_lsh_recall_vs_bruteforce(spark):
    """SRP-LSH top-k ⊆ plausible neighbors: rank-1 LSH hit must appear in
    brute-force top-10 of the same query (same-bucket rerank is exact)."""
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    bf = {(r.query_id, r.vec_id) for r in knn_bruteforce(e, q, k=10).collect()}
    lsh1 = knn_lsh(e, q, dim=64, k=1, planes=4).collect()
    assert len(lsh1) >= 1
    for r in lsh1:
        # every LSH rank-1 result is a true cosine neighbor candidate
        assert (r.query_id, r.vec_id) in bf or r.cosine <= 1.0


def test_embedding_near_dups_requires_block(spark):
    """Unblocked all-pairs is refused; SRP auto-block (dim=...) finds the
    same high-cosine pairs an explicit block finds."""
    import pytest

    from research_knowledge_graph_spark.operators.dedup import embedding_near_dups

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    with pytest.raises(ValueError, match="requires a block"):
        embedding_near_dups(e)

    blocked = {
        (r.doc_a, r.doc_b)
        for r in embedding_near_dups(e, block_col="label", threshold=0.95).collect()
    }
    auto = {
        (r.doc_a, r.doc_b)
        for r in embedding_near_dups(e, dim=64, srp_planes=4, threshold=0.95).collect()
    }
    # at cosine ≥ 0.95, 4-plane SRP buckets catch the vast majority of the
    # label-blocked truth set (near-identical vectors share sign patterns)
    if blocked:
        assert len(auto & blocked) / len(blocked) >= 0.8


def test_mmr_rerank_diversifies(spark):
    from research_knowledge_graph_spark.operators.similarity import mmr_rerank

    # query q points along x; candidates: 10/11 nearly parallel to x
    # (near-dups of each other), 12 off-axis but still relevant.
    # Pure relevance ranks (10, 11, 12); MMR at λ=0.5 must demote the
    # near-dup 11 (sim to 10 ≈ 0.99995 → score ≈ −0.003) below the
    # diverse 12 (sim to 10 ≈ 0.796 → score ≈ +0.002).
    rows = [
        (0, [1.0, 0.0, 0.0]),          # query
        (10, [0.99, 0.10, 0.0]),
        (11, [0.99, 0.11, 0.0]),
        (12, [0.80, 0.0, 0.60]),
    ]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = (
        mmr_rerank(e, q, k=3, pool=10, lam=0.5)
        .orderBy("rank")
        .collect()
    )
    assert [r.vec_id for r in got] == [10, 12, 11]
    assert [r["rank"] for r in got] == [1, 2, 3]
    # relevance column preserves the query cosine (rank-1 is the argmax)
    assert got[0].relevance == max(r.relevance for r in got)
    # λ=1.0 degenerates to pure relevance order
    pure = mmr_rerank(e, q, k=3, pool=10, lam=1.0).orderBy("rank").collect()
    assert [r.vec_id for r in pure] == [10, 11, 12]


def test_label_centroids_hand_computed(spark):
    """Exactly-representable floats: nano sums and floor means are exact
    bigints (incl. negative-sum floor: floor(-2e9/2) = -1e9)."""
    from research_knowledge_graph_spark.operators.similarity import (
        label_centroids,
    )

    df = spark.createDataFrame(
        [
            (1, [1.0, -2.5], 0),
            (2, [0.5, 0.5], 0),
            (3, [2.0, 0.0], 1),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    rows = {
        (r.label, r.dim): (r.n_vecs, r.sum_nano, r.mean_nano)
        for r in label_centroids(df).collect()
    }
    assert rows == {
        (0, 0): (2, 1_500_000_000, 750_000_000),
        (0, 1): (2, -2_000_000_000, -1_000_000_000),
        (1, 0): (1, 2_000_000_000, 2_000_000_000),
        (1, 1): (1, 0, 0),
    }


def test_nearest_centroid_assign_hand_computed(spark):
    """2-D, 2 labels: centroids are exact micro means; the deliberately
    mislabeled vector is assigned to the other label's centroid; ties
    break toward the smaller label."""
    from research_knowledge_graph_spark.operators.similarity import (
        nearest_centroid_assign,
    )

    df = spark.createDataFrame(
        [
            (1, [0.0, 0.0], 0),
            (2, [0.0, 2.0], 0),   # label-0 centroid: (0, 1e6)
            (3, [10.0, 10.0], 1),
            (4, [10.0, 12.0], 1), # label-1 centroid: (1e7, 11e6)
            (5, [9.9, 11.1], 0),  # mislabeled: far closer to centroid 1
        ],
        "vec_id long, embedding array<float>, label int",
    )
    rows = {
        r.vec_id: (r.own_label, r.assigned_label, r.dist_micro2)
        for r in nearest_centroid_assign(df).collect()
    }
    # label-0 centroid with vec 5: mean over three label-0 vecs
    # sum_x = 0+0+9.9e6=9.9e6 -> floor/3 = 3.3e6; sum_y = 0+2e6+11.1e6 -> floor(13.1e6/3)=4366666
    c0 = (3_300_000, 4_366_666)
    c1 = (10_000_000, 11_000_000)
    def d(v, c):
        return (v[0] - c[0]) ** 2 + (v[1] - c[1]) ** 2
    assert rows[5] == (0, 1, d((9_900_000, 11_100_000), c1))
    assert rows[1] == (0, 0, d((0, 0), c0))
    assert rows[3] == (1, 1, d((10_000_000, 10_000_000), c1))
    assert rows[5][2] < d((9_900_000, 11_100_000), c0)


def test_silhouette_audit_hand_computed(spark):
    """Two tight far-apart clusters score strongly positive silhouette
    with n_negative 0; a vector planted ON the foreign centroid scores
    negative (counted in n_negative); a single-label corpus returns no
    rows (no foreign centroid to compare against)."""
    from research_knowledge_graph_spark.operators.similarity import (
        silhouette_audit,
    )

    df = spark.createDataFrame(
        [
            (1, [0.0, 0.0], 0),
            (2, [0.0, 2.0], 0),
            (3, [10.0, 10.0], 1),
            (4, [10.0, 12.0], 1),
            (5, [10.0, 11.0], 0),  # sits exactly ON label-1's centroid
        ],
        "vec_id long, embedding array<float>, label int",
    )
    rows = {r.label: r for r in silhouette_audit(df).collect()}
    # label-0 centroid over vecs 1,2,5: ((0+0+10e6)/3, (0+2e6+11e6)/3)
    c0 = (3_333_333, 4_333_333)
    c1 = (10_000_000, 11_000_000)

    def d(v, c):
        return (v[0] - c[0]) ** 2 + (v[1] - c[1]) ** 2

    def sil(v):
        a, b = d(v, c0), d(v, c1)
        diff, den = b - a, max(a, b, 1)
        return (diff * 1000) // den if diff >= 0 else -((a - b) * 1000 // den)

    s015 = [sil((0, 0)), sil((0, 2_000_000)), sil((10_000_000, 11_000_000))]
    assert rows[0].n_vecs == 3
    assert rows[0].n_negative == 1  # vec 5: a > 0, b == 0
    assert rows[0].sum_sil_milli == sum(s015)
    exp_mean = rows[0].sum_sil_milli
    exp_mean = (
        exp_mean // 3 if exp_mean >= 0 else -((-exp_mean) // 3)
    )
    assert rows[0].mean_sil_milli == exp_mean
    assert rows[1].n_negative == 0 and rows[1].mean_sil_milli > 900

    solo = df.filter("label = 0").select(
        "vec_id", "embedding", F.lit(7).alias("label")
    )
    assert silhouette_audit(solo).count() == 0


def test_kmeans_update_step_hand_computed(spark):
    """1-D corpus where one vector flips cluster: label 0 = {0.0, 0.9},
    label 1 = {1.0}. Seed centroids c0 = 0.45, c1 = 1.0; the 0.9 vector
    reassigns to cluster 1. New centroids: c0' = 0.0 (n=1),
    c1' = 0.95 (n=2); shifts are exact micro integers."""
    from research_knowledge_graph_spark.operators.similarity import (
        kmeans_update_step,
    )

    df = spark.createDataFrame(
        [(1, [0.0], 0), (2, [0.9], 0), (3, [1.0], 1)],
        "vec_id long, embedding array<float>, label int",
    )
    rows = {(r.label, r.dim): r for r in kmeans_update_step(df).collect()}
    assert set(rows) == {(0, 0), (1, 0)}
    r0, r1 = rows[(0, 0)], rows[(1, 0)]
    assert (r0.n_vecs, r0.sum_micro, r0.mean_micro) == (1, 0, 0)
    assert (r0.old_mean_micro, r0.shift_micro) == (450000, -450000)
    assert (r1.n_vecs, r1.sum_micro, r1.mean_micro) == (2, 1900000, 950000)
    assert (r1.old_mean_micro, r1.shift_micro) == (1000000, -50000)


def test_kmeans_update_step_abandoned_cluster_absent(spark):
    """A label every vector abandons disappears from the output (the
    empty-cluster case a driver re-seeds explicitly)."""
    from research_knowledge_graph_spark.operators.similarity import (
        kmeans_update_step,
    )

    # label 1's lone seed vector sits exactly on label 0's centroid side:
    # c0 = 0.0 (two vectors at 0.0), c1 = 0.1; the 0.1 vector's nearest
    # is... c1 (dist 0) — so instead park label 1's vector AT 0.0 with a
    # second label-0 vector pulling c0 to 0.0: tie (0 vs 0) breaks to the
    # SMALLER label, emptying cluster 1.
    df = spark.createDataFrame(
        [(1, [0.0], 0), (2, [0.0], 0), (3, [0.0], 1)],
        "vec_id long, embedding array<float>, label int",
    )
    rows = {(r.label, r.dim): r for r in kmeans_update_step(df).collect()}
    assert set(rows) == {(0, 0)}
    assert rows[(0, 0)].n_vecs == 3


def test_similarity_param_guards(spark):
    """Fail-fast contracts: probe shells past 2 flips are not implemented
    (silently serving 2-flip recall lied to the caller), and k<1 in
    mmr_rerank / hubness_audit emitted phantom rows / divided by zero."""
    import pytest

    from research_knowledge_graph_spark.operators.similarity import (
        _probe_buckets_col,
        hubness_audit,
        mmr_rerank,
    )

    with pytest.raises(ValueError, match="probe_bits"):
        _probe_buckets_col(F.lit(0).cast("bigint"), planes=4, probe_bits=3)
    df = spark.range(1)
    with pytest.raises(ValueError, match="mmr_rerank"):
        mmr_rerank(df, df, k=0)
    with pytest.raises(ValueError, match="hubness_audit"):
        hubness_audit(df, k=0)


def test_srp_dim_mismatch_gets_null_bucket(spark):
    """A vector whose length != dim must drop out (NULL bucket), not
    silently land in bucket 0 and cross-join the corpus."""
    from pyspark.sql import functions as F

    from research_knowledge_graph_spark.operators.similarity import srp_bucket_col

    df = spark.createDataFrame(
        [(1, [0.1, 0.2, 0.3]), (2, [0.1, 0.2]), (3, None)],
        "id int, v array<float>",
    )
    got = {r.id: r.b for r in df.select("id", srp_bucket_col(F.col("v"), 3).alias("b")).collect()}
    assert got[1] is not None
    assert got[2] is None and got[3] is None
