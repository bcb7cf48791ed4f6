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
    """
    qvec = embed_text_py(question, dim)
    queries = spark.createDataFrame(
        [(-1, qvec)], f"query_id bigint, query_vec array<float>"
    )
    hits = knn_bruteforce(
        doc_embeddings.select(F.col(id_col).alias("vec_id"), F.col("embedding")),
        queries,
        k=k,
    )
    return (
        hits.join(doc_embeddings, hits.vec_id == doc_embeddings[id_col])
        .select(
            "rank",
            F.col("vec_id").alias("doc_id"),
            "cosine",
            F.substring(F.col(text_col), 1, max_context_chars).alias("context"),
        )
        .orderBy("rank")
    )
