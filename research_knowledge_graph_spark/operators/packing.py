"""Training-sequence packing — the "concat-and-chunk" shard layout step of
an LLM pretraining pipeline (the operation that turns a deduped, curated
document corpus into fixed-capacity training sequences; the reference stops
at chunking single documents, ``src/processing/text_processor.py`` analog
F5 — this is the corpus-level counterpart that decides which documents
land together in a training shard).

Semantics (deterministic, engine-portable):

- Every document is assigned to a **shard** by the portable 60-bit hash of
  its id modulo ``n_shards`` — the same shard assignment on any cluster
  size, any engine.
- Within a shard, documents are laid out in ``id_col`` order and
  concatenated; a document is assigned to the **pack** (fixed
  ``capacity``-token training sequence) its FIRST token lands in:
  ``pack_id = (cum_tokens_before_doc) div capacity``. This is the standard
  concat-and-chunk assignment — long documents may spill past a pack
  boundary into the next sequence; the stats below make that visible
  (``pack_tokens`` > ``capacity`` means the pack's opening docs overflow
  it).
- Token counts are whitespace tokens (:func:`...functions.textops.
  token_count_col`), the same count the t13 token-budget sampler and t18
  accounting use, so "tokens" means one thing across the pipeline.

Scale: ONE shuffle. The corpus is hash-partitioned by ``shard`` (set
``n_shards`` ≳ cluster cores at scale — each shard's running sum is an
external sort-based window over its slice, never a global sort); the
per-(shard, pack_id) rollup needs NO second exchange because hash(shard)
partitioning already clusters (shard, pack_id) — pinned by
tests/test_packing.py::test_single_shuffle. All arithmetic is exact
bigints; the pack division's dividend (tokens preceding the doc within its
shard) is non-negative, so Spark ``div`` (truncation) == DuckDB ``//``
(floor) bit-exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from research_knowledge_graph_spark.functions.hashing import portable_hash64
from research_knowledge_graph_spark.functions.textops import token_count_col


def pack_sequences(
    docs: DataFrame,
    capacity: int = 2048,
    n_shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-pack layout stats of the concat-and-chunk packing described in
    the module docstring: one row per (shard, pack_id) with
    (n_docs, pack_tokens, first_doc, last_doc). ``n_docs``/``pack_tokens``
    count the documents whose first token lands in the pack (and their
    full token mass — a pack whose opener overflows shows
    pack_tokens > capacity); first/last give the id range for lineage.
    """
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    t = docs.select(
        F.col(id_col).alias("doc_id"),
        (portable_hash64(id_col) % n_shards).cast("bigint").alias("shard"),
        token_count_col(text_col).cast("bigint").alias("tok"),
    ).filter(
        # a NULL id has no shard (hash(NULL)=NULL) and a NULL text has no
        # token count — left in, either would flow NULL through cum into
        # pack_id and emit a phantom (shard, NULL) pack row that silently
        # NULL-poisons downstream token totals. Such docs carry nothing
        # trainable (the dedup family drops them for the same reason).
        F.col("doc_id").isNotNull() & F.col("tok").isNotNull()
    )
    w = (
        # tok as tie-break: doc_id alone leaves duplicate-id rows in
        # engine order, making cum (hence the layout) partitioning-
        # dependent — against the module's determinism contract. Equal
        # (doc_id, tok) rows are interchangeable under the running sum.
        Window.partitionBy("shard")
        .orderBy("doc_id", "tok")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = t.withColumn("cum", F.sum("tok").over(w)).withColumn(
        "pack_id", F.expr(f"(cum - tok) div {int(capacity)}").cast("bigint")
    )
    return c.groupBy("shard", "pack_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("tok").cast("long").alias("pack_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )
