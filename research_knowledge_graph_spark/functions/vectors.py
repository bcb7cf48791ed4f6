"""Vector math on ``array<float>`` columns — pure Catalyst, JVM-side.

Replaces the reference's pgvector ``<->`` operator
(``src/db/repository.py:290-309,385-418``, HNSW index
``sql/init_pgvector.sql:17-21``). Dot products / norms are
``zip_with`` + ``aggregate`` expressions (whole-stage codegen), never Python.
The embedding generator replaces OpenAI ``text-embedding-3-small``
(``src/utils/llm.py:124-147``) with a deterministic hashing-trick projection
(Arrow-batched pandas UDF, numpy-vectorized inside the batch).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

EMBEDDING_DIM_DEFAULT = 64  # reference uses 1536; tests use a small dim


def dot_col(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double precision, sequential left-to-right (so DuckDB's
    ``list_dot_product`` over the same values reproduces the bits)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm_col(a: Column) -> Column:
    return F.sqrt(dot_col(a, a))


def cosine_col(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 when either norm is 0."""
    denom = norm_col(a) * norm_col(b)
    return F.when(denom > 0, dot_col(a, b) / denom).otherwise(F.lit(0.0))


def cosine_sql(a_expr: str, b_expr: str) -> str:
    """DuckDB rendering with the same double-precision sequential algebra."""
    da, db = f"CAST({a_expr} AS DOUBLE[])", f"CAST({b_expr} AS DOUBLE[])"
    return (
        f"CASE WHEN sqrt(list_dot_product({da}, {da})) * sqrt(list_dot_product({db}, {db})) > 0 "
        f"THEN list_dot_product({da}, {db}) / (sqrt(list_dot_product({da}, {da})) * sqrt(list_dot_product({db}, {db}))) "
        f"ELSE 0.0 END"
    )


# ---------------------------------------------------------------------------
# Deterministic hashing-trick embedding (replaces LLM embeddings, L4)
# ---------------------------------------------------------------------------

def _embed_batch(texts: pd.Series, dim: int, normalize: bool = True) -> pd.Series:
    """Hashing-trick bag-of-words embedding, L2-normalized by default.
    Deterministic: token -> md5 -> (index, sign). Vectorized per Arrow
    batch. ``normalize=False`` keeps the raw signed token counts — exact
    small integers (float32-representable), which is what lets the e15
    fingerprint entry hash-compare against a pure-SQL md5 oracle; the
    normalized form's sqrt+divide rounding cannot."""
    out = []
    for t in texts:
        vec = np.zeros(dim, dtype=np.float64)
        if isinstance(t, str) and t:
            for tok in t.lower().split():
                h = hashlib.md5(tok.encode("utf-8")).digest()
                idx = int.from_bytes(h[:4], "little") % dim
                sign = 1.0 if h[4] & 1 else -1.0
                vec[idx] += sign
        if normalize:
            n = np.linalg.norm(vec)
            if n > 0:
                vec /= n
        out.append(vec.astype(np.float32).tolist())
    return pd.Series(out)


def make_embed_udf(dim: int = EMBEDDING_DIM_DEFAULT, normalize: bool = True):
    """Scalar iterator pandas UDF: reuses batch setup, Arrow transfer only."""

    @pandas_udf(T.ArrayType(T.FloatType()))
    def embed_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for texts in it:
            yield _embed_batch(texts, dim, normalize)

    return embed_udf


def embed_text_py(
    text: str, dim: int = EMBEDDING_DIM_DEFAULT, normalize: bool = True
) -> list[float]:
    """Python twin for tests."""
    return _embed_batch(pd.Series([text]), dim, normalize)[0]
