"""BM25 full-text ranking as a pure Catalyst plan.

The classic Robertson/Lucene scoring function — the retrieval baseline
every corpus-curation and RAG stack needs *before* embeddings enter the
picture (and the lexical half of hybrid search). For query terms T and
document d::

    score(d) = Σ_{t∈T} idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1-b+b·dl/avgdl))
    idf(t)   = ln((N - df(t) + 0.5) / (df(t) + 0.5) + 1)

Scale shape (everything stays JVM-side, no UDFs):

- tokenize + explode + ``isin(query_terms)`` filter is map-only and fuses
  into the scan stage — rows surviving to the first shuffle are only the
  (doc, query-term) hits;
- tf is one partial-aggregating hash-agg keyed by (doc, term); df and the
  corpus stats (N, avgdl) are tiny aggregates broadcast back — the corpus
  is never shuffled whole;
- the final per-doc sum + ordered limit is a top-k over ≤ |T| rows per doc.

At 10¹²-doc scale the explode-per-query is the wrong serving shape — the
inverted index (``linking.py``'s A4 postings table) precomputes exactly the
(term, doc, tf) rows this derives, turning each query into a |T|-key
lookup; this operator IS the batch/one-off form and the index builder's
scoring contract.

Determinism: scores are rounded to 6 decimals and ordered with a doc-id
tie-break, so the top-k is a pure function of the corpus (DuckDB oracle
t16 matches on rows + schema + value hash).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from research_knowledge_graph_spark.functions.hashing import (
    portable_hash64,
    portable_hash64_py,
)

# whitespace tokens over lower(text) — byte-compatible with the DuckDB twin
BM25_TOKENS_SQL_TEMPLATE = (
    "list_filter(string_split_regex(lower({col}), '\\s+'), w -> w != '')"
)


def bm25_tokens_col(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), r"\s+"), lambda w: w != F.lit(""))


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    limit: int = 20,
) -> DataFrame:
    """Top-``limit`` documents for ``query_terms`` by BM25. Returns
    (doc_id, score) ordered (score DESC, doc_id ASC), score rounded to 6
    decimals for cross-engine parity."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = [t.lower() for t in query_terms]
    base = docs.select(
        F.col(id_col).alias("doc_id"), bm25_tokens_col(text_col).alias("_toks")
    )
    dl = base.select("doc_id", F.size("_toks").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        base.select("doc_id", F.explode("_toks").alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return _bm25_score(tf, dl, stats, k1, b, limit)


def _bm25_score(
    tf: DataFrame,
    dl: DataFrame,
    stats: DataFrame,
    k1: float,
    b: float,
    limit: int,
) -> DataFrame:
    """Shared scoring tail of the scan and indexed paths: (doc_id, term,
    tf) + doc lengths + 1-row corpus stats → ordered top-k. One scoring
    implementation ⇒ the served results are the scan results by
    construction."""
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    denom = F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    scored = (
        tf.join(dl, "doc_id")
        .crossJoin(F.broadcast(stats.select("n_docs", "avgdl")))
        .join(F.broadcast(dfreq), "term")
        .withColumn("_s", idf * F.col("tf") * (k1 + 1.0) / denom)
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.round(F.sum("_s"), 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(limit)
    )


def build_text_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
) -> None:
    """Materialize the inverted index bm25 serving needs — the A4 postings
    table with scoring sidecars (the 10¹²-doc serving shape; mirrors the
    persisted-IVF story of ``operators/ann_ivf.py``):

    - ``postings/``: (term, doc_id, tf), hive-partitioned by
      ``bucket = portable_hash64(term) % n_buckets`` — a query routes to
      ≤ |terms| buckets via PARTITION PRUNING (the python-side twin hash
      computes the same buckets on the driver), so serving never scans
      the corpus or even the full index;
    - ``doclen/``: (doc_id, dl) — the per-doc normalization term;
    - ``stats/``: one row (n_docs, avgdl, n_buckets).

    Build cost is one explode + hash-agg over the corpus — the same work
    a single scan-form query pays, amortized over every query after."""
    import os

    if n_buckets < 1:
        # a negative count builds an index whose Spark-side pmod buckets
        # (non-negative) disagree with the serving twin's python `%`
        # (negative) — every query would silently return empty; 0 only
        # dies later with an opaque DIVIDE_BY_ZERO
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")

    # tokenize ONCE: the postings and doclen/stats writes all consume the
    # cached tokenized frame (without it the corpus pays two full
    # scan+regex passes — caught in review)
    base = docs.select(
        F.col(id_col).alias("doc_id"), bm25_tokens_col(text_col).alias("_toks")
    ).persist()
    try:
        tf = (
            base.select("doc_id", F.explode("_toks").alias("term"))
            .groupBy("doc_id", "term")
            .agg(F.count(F.lit(1)).alias("tf"))
            .withColumn(
                "bucket", F.pmod(portable_hash64(F.col("term")), F.lit(n_buckets))
            )
        )
        tf.write.mode("overwrite").partitionBy("bucket").parquet(
            os.path.join(path, "postings")
        )
        dl = base.select("doc_id", F.size("_toks").alias("dl"))
        dl.write.mode("overwrite").parquet(os.path.join(path, "doclen"))
        dl.agg(
            F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
        ).withColumn("n_buckets", F.lit(n_buckets)).write.mode("overwrite").parquet(
            os.path.join(path, "stats")
        )
    finally:
        base.unpersist()


def bm25_indexed(
    spark,
    path: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    limit: int = 20,
) -> DataFrame:
    """Serve a BM25 query from a :func:`build_text_index` index: identical
    results to :func:`bm25_scores` (pinned in tests/test_text_index.py —
    same scoring tail by construction), but the postings scan reads only
    the query terms' hash buckets (partition filter, plan-pinned) —
    near-constant work per query regardless of corpus size."""
    import os

    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = [t.lower() for t in query_terms]
    stats = spark.read.parquet(os.path.join(path, "stats"))
    n_buckets = int(stats.select("n_buckets").first()[0])
    buckets = sorted({portable_hash64_py(t) % n_buckets for t in terms})
    postings = (
        spark.read.parquet(os.path.join(path, "postings"))
        .filter(F.col("bucket").isin([int(x) for x in buckets]))
        .filter(F.col("term").isin(terms))
        .select("doc_id", "term", "tf")
    )
    dl = spark.read.parquet(os.path.join(path, "doclen"))
    return _bm25_score(postings, dl, stats, k1, b, limit)


def bm25_sql(
    query_terms: list[str],
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    limit: int = 20,
) -> str:
    """The DuckDB twin of :func:`bm25_scores` — identical tokenization,
    formula, rounding, and ordering (the driver oracle). Terms are
    SQL-escaped (doubled quotes) — an apostrophe must not terminate the
    literal."""
    terms = ", ".join("'" + t.lower().replace("'", "''") + "'" for t in query_terms)
    tk = BM25_TOKENS_SQL_TEMPLATE.format(col=text_col)
    return f"""
        WITH toks AS (SELECT {id_col} AS doc_id, {tk} AS tk FROM {table}),
        dl AS (SELECT doc_id, len(tk) AS dl FROM toks),
        stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
        tf AS (
            SELECT doc_id, term, count(*) AS tf
            FROM (SELECT doc_id, unnest(tk) AS term FROM toks)
            WHERE term IN ({terms})
            GROUP BY doc_id, term
        ),
        dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term)
        SELECT t.doc_id,
               round(sum(ln((s.n_docs - f.df + 0.5) / (f.df + 0.5) + 1.0)
                         * t.tf * ({k1} + 1.0)
                         / (t.tf + {k1} * (1.0 - {b} + {b} * d.dl / s.avgdl))), 6) AS score
        FROM tf t
        JOIN dl d USING (doc_id)
        CROSS JOIN stats s
        JOIN dfreq f USING (term)
        GROUP BY t.doc_id
        ORDER BY score DESC, t.doc_id ASC
        LIMIT {limit}
    """
