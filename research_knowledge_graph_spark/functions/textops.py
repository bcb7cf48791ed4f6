"""Text operators: assembly, chunking, tokenization, language-ID, quality,
fingerprinting.

The assembly/chunking pair replicates the reference's ingestion agent
byte-for-byte (``src/agents/paper_ingestion_agent.py:69-81`` text assembly,
``:187-221`` chunking) — the "byte-identical extracted text per url"
invariant. Chunking is inherently sequential per document, so it runs as an
Arrow-batched pandas UDF returning ``array<string>`` (one Python call per
document *batch*, never per row); everything else is pure Catalyst.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


# ---------------------------------------------------------------------------
# Text assembly (reference paper_ingestion_agent.py:69-81)
# ---------------------------------------------------------------------------

def assemble_text_col(title: Column, abstract: Column, body: Column) -> Column:
    """``"Title: {t}\\n\\nAbstract: {a}\\n\\n{body}"`` with absent (null/empty)
    parts skipped — exactly the reference's ``"\\n\\n".join(text_parts)``."""
    part = lambda prefix, c: F.when(  # noqa: E731
        c.isNotNull() & (c != ""), F.concat(F.lit(prefix), c)
    )
    return F.concat_ws(
        "\n\n",
        part("Title: ", title),
        part("Abstract: ", abstract),
        F.when(body.isNotNull() & (body != ""), body),
    )


def assemble_text_py(title: str | None, abstract: str | None, body: str | None) -> str:
    """Python twin (re-derived from the documented reference behavior)."""
    parts = []
    if title:
        parts.append(f"Title: {title}")
    if abstract:
        parts.append(f"Abstract: {abstract}")
    if body:
        parts.append(body)
    return "\n\n".join(parts)


ASSEMBLE_TEXT_SQL_TEMPLATE = (
    "concat_ws(chr(10)||chr(10), "
    "CASE WHEN {title} IS NOT NULL AND {title} != '' THEN 'Title: ' || {title} END, "
    "CASE WHEN {abstract} IS NOT NULL AND {abstract} != '' THEN 'Abstract: ' || {abstract} END, "
    "CASE WHEN {body} IS NOT NULL AND {body} != '' THEN {body} END)"
)


# ---------------------------------------------------------------------------
# Chunking (reference paper_ingestion_agent.py:187-221)
# ---------------------------------------------------------------------------

def chunk_text_py(text: str, chunk_size: int = 2000, overlap: int = 200) -> list[str]:
    """Fixed windows with overlap; prefer breaking at the last ``.``/``\\n``
    when it falls past 70% of the window. Exact reference semantics."""
    if len(text) <= chunk_size:
        return [text]
    chunks = []
    start = 0
    while start < len(text):
        end = start + chunk_size
        chunk = text[start:end]
        if end < len(text):
            last_period = chunk.rfind(".")
            last_newline = chunk.rfind("\n")
            break_point = max(last_period, last_newline)
            if break_point > chunk_size * 0.7:
                chunk = chunk[: break_point + 1]
                end = start + break_point + 1
        chunks.append(chunk.strip())
        start = end - overlap
    return chunks


@pandas_udf(T.ArrayType(T.StringType()))
def chunk_text_udf(texts: pd.Series) -> pd.Series:
    """Arrow-batched chunker: one vectorized call per batch of documents."""
    return texts.map(lambda t: chunk_text_py(t) if isinstance(t, str) else [])


# ---------------------------------------------------------------------------
# Tokenization / counting (training-data pipeline surface)
# ---------------------------------------------------------------------------

# BPE-ish pre-tokenizer: word pieces, numbers, or single non-space symbols.
TOKEN_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def tokens_col(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(TOKEN_PATTERN), 0)


def token_count_col(col: Column | str) -> Column:
    """Whitespace token count as a pure expression (no UDF)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.filter(F.split(c, "\\s+"), lambda w: w != F.lit("")))


TOKEN_COUNT_SQL_TEMPLATE = (
    "len(list_filter(string_split_regex({col}, '\\s+'), w -> w != ''))"
)


# ---------------------------------------------------------------------------
# Language ID (n-gram/stopword heuristic) — pure Catalyst, no UDF
# ---------------------------------------------------------------------------

_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in"],
    "de": ["der", "die", "und", "das", "nicht"],
    "fr": ["le", "la", "les", "des", "est"],
    "es": ["el", "los", "las", "una", "que"],
}


def lang_id_col(col: Column | str) -> Column:
    """Heuristic language ID: count hits of per-language stopword markers in
    the lowercased token set; argmax with 'und' (undetermined) fallback.
    Deterministic tie-break by language code order en < de < fr < es via
    strictly-greater comparison chain."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.filter(F.split(F.lower(c), "\\s+"), lambda w: w != F.lit(""))
    def _marker_hits(markers: list[str]):
        # NOTE: a 2-arg lambda would make F.filter pass the array index as
        # the second arg — close over `markers` instead.
        return F.size(F.filter(toks, lambda w: w.isin(markers)))

    scores = {lang: _marker_hits(markers) for lang, markers in _LANG_MARKERS.items()}
    max_s = F.greatest(*scores.values())
    out = F.when(max_s <= 0, F.lit("und"))
    for lang in _LANG_MARKERS:  # dict order = tie-break priority (en first)
        out = out.when(scores[lang] == max_s, F.lit(lang))
    return out


# ---------------------------------------------------------------------------
# Quality scoring (length / punctuation / stopword ratios) — pure Catalyst
# ---------------------------------------------------------------------------

def quality_features_cols(col: Column | str) -> dict[str, Column]:
    c = F.col(col) if isinstance(col, str) else col
    n_chars = F.length(c)
    toks = F.filter(F.split(c, "\\s+"), lambda w: w != F.lit(""))
    n_tokens = F.size(toks)
    n_alpha = F.length(F.regexp_replace(c, "[^A-Za-z]", ""))
    n_punct = F.length(F.regexp_replace(c, "[^.,;:!?]", ""))
    n_stop = F.size(F.filter(toks, lambda w: F.lower(w).isin(_LANG_MARKERS["en"])))
    safe = lambda num, den: F.when(den > 0, num.cast("double") / den.cast("double")).otherwise(F.lit(0.0))  # noqa: E731
    return {
        "n_chars": n_chars.cast("bigint"),
        "n_tokens": n_tokens.cast("bigint"),
        "alpha_ratio": safe(n_alpha, n_chars),
        "punct_ratio": safe(n_punct, n_chars),
        "stopword_ratio": safe(n_stop, n_tokens),
        "mean_token_len": safe(n_alpha, n_tokens),
    }


# ---------------------------------------------------------------------------
# Shingles + fingerprint
# ---------------------------------------------------------------------------

def char_shingles_col(col: Column | str, k: int = 5) -> Column:
    """Distinct character k-grams of the lowercased text, as array<string>.
    Pure Catalyst: sequence + transform + substring; no UDF, no explode
    amplification unless the caller asks for it."""
    c = F.lower(F.col(col) if isinstance(col, str) else col)
    n = F.greatest(F.length(c) - F.lit(k - 1), F.lit(1))
    idx = F.sequence(F.lit(1), n)
    return F.array_distinct(F.transform(idx, lambda i: F.substring(c, i, k)))


def char_shingles_lowered_col(col: Column | str, k: int = 5) -> Column:
    """Character k-grams of an ALREADY-LOWERCASED **attribute** column —
    the staged form of :func:`char_shingles_col`. Catalyst re-evaluates a
    non-attribute expression embedded in a higher-order-function lambda
    once per element per reference, so ``substring(lower(text), i, k)``
    re-lowercases the whole document per shingle (O(len²) per row);
    callers stage ``lower(text)`` as a real column first and shingle over
    the attribute. Same values as char_shingles_col on the same text."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.greatest(F.length(c) - F.lit(k - 1), F.lit(1))
    idx = F.sequence(F.lit(1), n)
    return F.array_distinct(F.transform(idx, lambda i: F.substring(c, i, k)))


def shingle_rows(
    docs, id_col: str, text_col: str, k: int = 5, out: str = "sh"
):
    """(id, shingle-array) frame with the lowercase pass staged as its own
    projection (see :func:`char_shingles_lowered_col`)."""
    return docs.select(
        F.col(id_col), F.lower(F.col(text_col)).alias("_lc")
    ).select(F.col(id_col), char_shingles_lowered_col("_lc", k).alias(out))


def char_shingles_sql(col_expr: str, k: int = 5) -> str:
    return (
        f"list_distinct(list_transform(range(1, greatest(length(lower({col_expr})) - {k - 1}, 1) + 1),"
        f" i -> substr(lower({col_expr}), i::INT, {k})))"
    )


def fingerprint_col(col: Column | str) -> Column:
    """Document fingerprint: portable 60-bit hash of the
    whitespace-normalized, lowercased text (rolling-hash analog that both
    engines compute identically)."""
    from research_knowledge_graph_spark.functions.hashing import portable_hash64

    c = F.col(col) if isinstance(col, str) else col
    canon = F.array_join(F.filter(F.split(F.lower(c), "\\s+"), lambda w: w != F.lit("")), " ")
    return portable_hash64(canon)


# ---------------------------------------------------------------------------
# Winnowing document fingerprints (Schleimer/Wilkerson/Aiken rolling-hash
# selection) — pure Catalyst array ops, no UDF, no explode amplification
# ---------------------------------------------------------------------------

def winnow_fingerprints_col(
    col: Column | str, k: int = 3, w: int = 4
) -> Column:
    """Distinct winnowing fingerprints of the text as ``array<bigint>``.

    Token k-grams are hashed with the engine-portable 60-bit hash and each
    window of ``w`` consecutive gram hashes contributes its MINIMUM — the
    winnowing selection guarantees any shared substring of length
    ``k + w - 1`` tokens between two documents yields at least one shared
    fingerprint, which is what makes the fingerprint set a locality-
    sensitive document signature (near-dup detection, provenance lookup)
    at a fraction of the full shingle set's size.

    Degenerate inputs fall back instead of vanishing: fewer than ``k``
    tokens → one gram over the whole text; fewer than ``w`` grams → one
    window over all grams. Everything is sequence/transform/slice over
    per-row arrays — JVM-side whole-stage codegen, cost linear in tokens
    per row, embarrassingly parallel (no shuffle at all until the caller
    aggregates the fingerprints)."""
    from research_knowledge_graph_spark.functions.hashing import portable_hash64

    # NULL text behaves like '' (one empty-gram fingerprint) — matching
    # the SQL rendering's COALESCE, so t19/t20 stay oracle-exact on a
    # nullable-text corpus
    c = F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit(""))
    toks = F.filter(F.split(F.lower(c), "\\s+"), lambda t: t != F.lit(""))
    n = F.size(toks)
    # NOTE (measured, do not "optimize" into element_at/least lookups):
    # an outer expression referenced inside a higher-order-function lambda
    # is EMBEDDED per reference and re-evaluated per element — rewriting
    # array_join(slice(toks,i,k)) as concat_ws over k element_at(toks,…)
    # multiplied the re-evaluation of the whole tokenize/hash chain by
    # k (resp. w for the window minimum) and made t19 9× slower
    # (11.4 s → 103 s at sf0.1). One reference per lambda body is the
    # cheapest form available to a single Column expression.
    grams = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - F.lit(k - 1)),
            lambda i: F.array_join(F.slice(toks, i, k), " "),
        ),
    ).otherwise(F.array(F.array_join(toks, " ")))
    # explicit 1-arg lambda: passing portable_hash64 directly would let
    # F.transform feed the array INDEX into its seed= default (the
    # default-arg-lambda gotcha) and silently change every hash
    hashes = F.transform(grams, lambda g: portable_hash64(g))
    ng = F.size(hashes)
    fps = F.when(
        ng >= w,
        F.transform(
            F.sequence(F.lit(1), ng - F.lit(w - 1)),
            lambda j: F.array_min(F.slice(hashes, j, w)),
        ),
    ).otherwise(F.array(F.array_min(hashes)))
    return F.array_distinct(fps)


def winnow_fingerprint_rows(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    w: int = 4,
    fp_name: str = "fp",
):
    """Exploded (id, fingerprint) winnowing rows via STAGED projections —
    the DataFrame-level form every operator/entry should consume.

    Identical values to ``explode(winnow_fingerprints_col(text))`` (pinned
    bit-for-bit), but each intermediate array (tokens → grams → hashes) is
    materialized as a real column between selects, so the next stage's
    lambda references an O(1) attribute instead of re-evaluating the
    embedded upstream expression tree per element — a Catalyst
    higher-order-function property: an outer NON-attribute expression
    inside a lambda body is duplicated per reference and recomputed per
    element, which made the single-expression form quadratic in tokens.
    Measured 11.9 s → 0.47 s (25×) on the sf0.1 corpus, same output."""
    from research_knowledge_graph_spark.functions.hashing import portable_hash64

    c = F.coalesce(F.col(text_col), F.lit(""))
    toks = F.filter(F.split(F.lower(c), "\\s+"), lambda t: t != F.lit(""))
    d1 = docs.select(F.col(id_col), toks.alias("_toks"))
    n = F.size(F.col("_toks"))
    grams = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - F.lit(k - 1)),
            lambda i: F.array_join(F.slice(F.col("_toks"), i, k), " "),
        ),
    ).otherwise(F.array(F.array_join(F.col("_toks"), " ")))
    d2 = d1.select(F.col(id_col), grams.alias("_grams"))
    d3 = d2.select(
        F.col(id_col),
        F.transform(F.col("_grams"), lambda g: portable_hash64(g)).alias("_h"),
    )
    ng = F.size(F.col("_h"))
    fps = F.when(
        ng >= w,
        F.transform(
            F.sequence(F.lit(1), ng - F.lit(w - 1)),
            lambda j: F.array_min(F.slice(F.col("_h"), j, w)),
        ),
    ).otherwise(F.array(F.array_min(F.col("_h"))))
    return d3.select(
        F.col(id_col), F.explode(F.array_distinct(fps)).alias(fp_name)
    )


def winnow_fingerprints_sql(col_expr: str, k: int = 3, w: int = 4) -> str:
    """DuckDB rendering of :func:`winnow_fingerprints_col` (same bits:
    same tokens, same grams, same portable md5-derived hash, same window
    minima). Returns a list expression; callers unnest it."""
    from research_knowledge_graph_spark.functions.hashing import portable_hash64_sql

    toks = (
        f"list_filter(string_split_regex(lower({col_expr}), '\\s+'),"
        " t -> t != '')"
    )
    grams = (
        f"CASE WHEN len({toks}) >= {k}"
        f" THEN list_transform(range(1, len({toks}) - {k - 1} + 1),"
        f" i -> array_to_string(list_slice({toks}, i, i + {k - 1}), ' '))"
        # COALESCE: DuckDB array_to_string([]) is NULL, Spark array_join is ''
        f" ELSE [COALESCE(array_to_string({toks}, ' '), '')] END"
    )
    hashes = f"list_transform({grams}, g -> {portable_hash64_sql('g')})"
    return (
        f"CASE WHEN len({hashes}) >= {w}"
        f" THEN list_distinct(list_transform(range(1, len({hashes}) - {w - 1} + 1),"
        f" j -> list_min(list_slice({hashes}, j, j + {w - 1}))))"
        f" ELSE [list_min({hashes})] END"
    )
