"""RAG-style question answering over the document store (reference L5,
``src/services/qa_service.py:10-30``).

The reference embeds the question (OpenAI), takes the top-1 similar paper
(pgvector), and prompts an LLM with the paper as context. Here: the
deterministic hashing embedding (same operator the pipeline uses for L4),
exact cosine top-k via the window ranker, and context assembly as a column
expression. Answer *synthesis* is out of scope for correctness scoring (it
was an LLM call); the retrieval + context construction is the data path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from research_knowledge_graph_spark.functions.vectors import (
    EMBEDDING_DIM_DEFAULT,
    embed_text_py,
    make_embed_udf,
)
from research_knowledge_graph_spark.operators.similarity import knn_bruteforce


def embed_docs(
    docs: DataFrame,
    text_col: str = "text",
    dim: int = EMBEDDING_DIM_DEFAULT,
    normalize: bool = True,
) -> DataFrame:
    """Attach deterministic hash embeddings (Arrow-batched pandas UDF).
    ``normalize=False`` yields raw signed token counts (exact integers)."""
    return docs.withColumn(
        "embedding", make_embed_udf(dim, normalize)(F.col(text_col))
    )


def retrieve_context(
    spark: SparkSession,
    doc_embeddings: DataFrame,
    question: str,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = EMBEDDING_DIM_DEFAULT,
    max_context_chars: int = 2000,
) -> DataFrame:
    """Top-k docs for a question + truncated context column.

    The reference truncates context to bound the prompt
    (``qa_service.py:24``, F6) — replicated via substring.

    Doc ids are compared as STRINGS against a sentinel query id:
    ``knn_bruteforce``'s self-match filter does ``query_id != vec_id``, so
    a typed (bigint) sentinel against string doc ids either crashed with
    CAST_INVALID_INPUT under ANSI mode or NULLed every comparison with it
    off — only bigint-id corpora worked. The string cast lives only in
    the knn projection; ``doc_id`` keeps the caller's original type via
    the qualified join-back (which also resolves ``id_col='vec_id'``
    inputs that previously raised AMBIGUOUS_REFERENCE)."""
    qvec = embed_text_py(question, dim)
    # \x1f-framed sentinel: no real corpus id contains the unit separator
    queries = spark.createDataFrame(
        [("\x1fqa-query\x1f", qvec)], "query_id string, query_vec array<float>"
    )
    hits = knn_bruteforce(
        doc_embeddings.select(
            F.col(id_col).cast("string").alias("vec_id"), F.col("embedding")
        ),
        queries,
        k=k,
    )
    # explicit aliases: hits DERIVES from doc_embeddings, so the join-back
    # is a self-join and unaliased refs are lineage-ambiguous
    h, emb = hits.alias("h"), doc_embeddings.alias("emb")
    return (
        h.join(emb, F.col("h.vec_id") == F.col(f"emb.{id_col}").cast("string"))
        .select(
            F.col("h.rank").alias("rank"),
            F.col(f"emb.{id_col}").alias("doc_id"),
            F.col("h.cosine").alias("cosine"),
            F.substring(F.col(f"emb.{text_col}"), 1, max_context_chars).alias(
                "context"
            ),
        )
        .orderBy("rank")
    )
