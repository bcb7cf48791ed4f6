"""ANN recall@10 vs brute force on a corpus with real neighbor structure.

The driver's synthetic embeddings are quasi-random (mean top-10 neighbor
cosine ≈0.30), where EVERY sublinear ANN method's recall degenerates to its
scan fraction — those sweeps are documented in BASELINE.md §ANN. Here the
operators are held to ≥0.9 recall on a clustered corpus (the regime ANN is
for), with deterministic seeds so the numbers are stable.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from research_knowledge_graph_spark.operators.ann_eval import (
    clustered_embeddings,
    recall_at_k,
)
from research_knowledge_graph_spark.operators.ann_ivf import knn_ivf, train_centroids
from research_knowledge_graph_spark.operators.similarity import knn_bruteforce, knn_lsh


@pytest.fixture(scope="module")
def corpus(spark):
    e = clustered_embeddings(spark, n_clusters=40, per_cluster=100, dim=64, noise=0.4)
    e = e.cache()
    q = e.filter(F.col("vec_id") % 133 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    bf = knn_bruteforce(e, q, k=10).cache()
    bf.count()
    return e, q, bf


def test_recall_of_exact_is_one(corpus):
    _, _, bf = corpus
    assert recall_at_k(bf, bf) == 1.0


def test_lsh_multiprobe_recall(corpus):
    """Defaults that hit the ≥0.9 bar: planes=8 with 2-bit multi-probe
    (37/256 buckets probed ≈ 14% scan). Single-probe at the same planes is
    far below — the probe_bits lever is what buys the recall."""
    e, q, bf = corpus
    r_multi = recall_at_k(knn_lsh(e, q, dim=64, k=10, planes=8, probe_bits=2), bf)
    assert r_multi >= 0.9, r_multi
    r_single = recall_at_k(knn_lsh(e, q, dim=64, k=10, planes=8, probe_bits=0), bf)
    assert r_multi > r_single + 0.3


def test_ivf_recall(corpus):
    """Cells aligned with the cluster structure: nprobe=2 of 32 cells
    (~6% scan) is already ≥0.95."""
    e, q, bf = corpus
    spark = e.sparkSession
    cents = train_centroids(e, 32)
    r = recall_at_k(
        knn_ivf(spark, e, q, k_cells=32, nprobe=2, k=10, centroids=cents), bf
    )
    assert r >= 0.95, r
