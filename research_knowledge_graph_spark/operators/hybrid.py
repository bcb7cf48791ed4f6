"""Hybrid retrieval: reciprocal-rank fusion (RRF) of ranked result lists.

The standard way to combine lexical (BM25, ``text_search.py``) and semantic
(embedding kNN, ``similarity.py``) retrieval without score calibration:
each list contributes ``1/(k + rank)`` per document and the fused ranking
orders by the sum (Cormack et al.'s RRF, the default hybrid mode of every
major search engine). Rank arithmetic only — no score normalization across
heterogeneous scales, which is exactly why RRF is robust.

Scale shape: the inputs are already top-N lists (tiny — N rows per
retriever), so the fusion is a union + one hash-agg + an ordered limit over
|lists|·N rows, regardless of corpus size. The heavy lifting happened in
the retrievers, each with its own scale story (BM25: term-filtered explode
+ broadcast dims; kNN: broadcast queries / LSH buckets / IVF cells).

Determinism: fused scores are exact sums of rationals computed in doubles,
rounded to 9 decimals with a doc-id tie-break — a pure function of the
input rankings (DuckDB oracle e07 matches rows + schema + value hash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rrf_fuse(
    ranked: list[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 60,
    limit: int = 20,
) -> DataFrame:
    """Fuse ranked lists (each with ``id_col`` + 1-based ``rank_col``) into
    (doc_id, rrf_score, n_lists) ordered (score DESC, doc_id ASC).
    ``k`` dampens the head (60 is the published default)."""
    if not ranked:
        raise ValueError("ranked must contain at least one DataFrame")
    u = None
    for df in ranked:
        part = df.select(
            F.col(id_col).alias("_id"), F.col(rank_col).cast("long").alias("_rank")
        )
        u = part if u is None else u.unionByName(part)
    return (
        u.groupBy("_id")
        .agg(
            F.round(
                F.sum(F.lit(1.0) / (F.lit(float(k)) + F.col("_rank"))), 9
            ).alias("rrf_score"),
            F.count(F.lit(1)).alias("n_lists"),
        )
        .orderBy(F.desc("rrf_score"), F.asc("_id"))
        .limit(limit)
        .select(F.col("_id").alias(id_col), "rrf_score", "n_lists")
    )
