"""Staged-projection forms == single-Column forms, bit-for-bit.

Round-6 optimization pins: the staged DataFrame-level forms
(winnow_fingerprint_rows / shingle_rows / minhash_signatures) exist because
Catalyst re-evaluates a non-attribute expression embedded in a
higher-order-function lambda once per element per reference — the staged
plans are orders of magnitude cheaper but MUST return exactly the values of
the Column originals, including the degenerate branches (<k tokens, <w
grams, empty and NULL text)."""

from __future__ import annotations

from pyspark.sql import functions as F

from research_knowledge_graph_spark.functions.textops import (
    char_shingles_col,
    shingle_rows,
    winnow_fingerprint_rows,
    winnow_fingerprints_col,
)
from research_knowledge_graph_spark.operators.dedup import (
    minhash_signature_col,
    minhash_signatures,
)

DOCS = [
    ("d1", "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    ("d2", "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    ("d3", "one two"),            # < k tokens → single whole-text gram
    ("d4", "a b c d"),            # k ≤ tokens, < w grams → single window
    ("d5", ""),                   # empty text
    ("d6", None),                 # NULL text
    ("d7", "Mixed CASE Text with  double  spaces and\ttabs here now ok"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id string, text string")


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_winnow_rows_match_inline_column(spark):
    d = _docs(spark)
    inline = d.select(
        "doc_id", F.explode(winnow_fingerprints_col(F.col("text"), 3, 4)).alias("fp")
    )
    staged = winnow_fingerprint_rows(d, "doc_id", "text", 3, 4, fp_name="fp")
    assert _sorted_rows(staged) == _sorted_rows(inline)


def test_winnow_rows_match_inline_nondefault_kw(spark):
    d = _docs(spark)
    inline = d.select(
        "doc_id", F.explode(winnow_fingerprints_col(F.col("text"), 2, 2)).alias("fp")
    )
    staged = winnow_fingerprint_rows(d, "doc_id", "text", 2, 2, fp_name="fp")
    assert _sorted_rows(staged) == _sorted_rows(inline)


def test_shingle_rows_match_inline_column(spark):
    d = _docs(spark).filter(F.col("text").isNotNull())
    inline = d.select("doc_id", char_shingles_col(F.col("text"), 4).alias("sh"))
    staged = shingle_rows(d, "doc_id", "text", 4, out="sh")
    a = {r["doc_id"]: r["sh"] for r in inline.collect()}
    b = {r["doc_id"]: r["sh"] for r in staged.collect()}
    assert a == b


def test_minhash_signatures_match_inline_column(spark):
    d = _docs(spark)
    inline = d.filter(F.col("text").isNotNull()).select(
        F.col("doc_id"), minhash_signature_col(F.col("text"), 8, 5).alias("signature")
    )
    staged = minhash_signatures(d, "doc_id", "text", 8, 5)
    a = {r["doc_id"]: list(r["signature"]) for r in inline.collect()}
    b = {r["doc_id"]: list(r["signature"]) for r in staged.collect()}
    assert a == b
