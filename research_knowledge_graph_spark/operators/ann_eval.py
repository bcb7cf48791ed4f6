"""ANN quality evaluation: recall@k of an approximate kNN result against
exact brute force, plus a deterministic clustered-embedding generator.

Why this exists: SRP-LSH / IVF recall is a property of the DATA's neighbor
structure, not just the index parameters. On quasi-random vectors (the
driver's synthetic ``embeddings`` table: mean top-10 neighbor cosine ≈0.30)
every sublinear ANN method's recall collapses to its scan fraction — there
is nothing angular to exploit. Real embedding corpora are clustered; tuning
``planes`` / ``nprobe`` needs a measurement harness over BOTH regimes, so:

- :func:`recall_at_k` — distributed recall computation (joins, no collect);
- :func:`clustered_embeddings` — seeded Gaussian-cluster corpus where
  neighbor structure exists and defaults can be validated (≥0.9 recall
  targets live in ``tests/test_ann_recall.py``; the measured sweep is
  tabulated in BASELINE.md §ANN).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def recall_at_k(approx: DataFrame, exact: DataFrame) -> float:
    """Mean per-query recall of ``approx`` vs ``exact`` — both in the kNN
    output shape (query_id, vec_id, ...). Computed with joins; only the
    one-row average ever reaches the driver."""
    a = approx.select("query_id", "vec_id")
    e = exact.select("query_id", "vec_id")
    hits = a.join(e, ["query_id", "vec_id"]).groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_hit")
    )
    truth = e.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_true"))
    per_q = truth.join(hits, "query_id", "left").select(
        (F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("n_true")).alias("r")
    )
    return float(per_q.agg(F.avg("r")).first()[0])


def clustered_embeddings(
    spark: SparkSession,
    n_clusters: int = 40,
    per_cluster: int = 100,
    dim: int = 64,
    noise: float = 0.25,
    seed: int = 13,
) -> DataFrame:
    """Deterministic clustered corpus: unit-norm cluster centers + Gaussian
    noise of total norm ≈ ``noise`` (per-component σ = noise/√dim), so
    same-cluster cosine ≈ 1/(1+noise²) and cross-cluster ≈ 0 — the neighbor
    structure real text/image embeddings have. Test-scale generator
    (driver-side numpy, seeded); at production scale embeddings come from
    the corpus itself."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    pts = np.repeat(centers, per_cluster, axis=0) + (
        noise / np.sqrt(dim)
    ) * rng.normal(size=(n_clusters * per_cluster, dim))
    rows = [
        (int(i), int(i // per_cluster), [float(x) for x in v])
        for i, v in enumerate(pts)
    ]
    return spark.createDataFrame(
        rows, "vec_id bigint, cluster int, embedding array<float>"
    )
