"""Incremental page ingestion via Structured Streaming.

The reference is strictly batch (sequential loop ``main.py:124-134``) and the
north rule asks for checkpoint-resumable *stages*, which the batch pipeline
provides via TableIO snapshots. This module adds the incremental variant a
continuously-crawled corpus needs: new page files land in a directory, a
``Trigger.AvailableNow`` stream drains them exactly-once (file-source +
checkpoint), runs the stateless extraction stages, and appends to the triple
store. Re-running after new files arrive processes ONLY the new files.

All stage-1/2 operators are stateless projections/explodes, so they run
unchanged on a streaming DataFrame — the benefit of keeping extraction as
pure expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from research_knowledge_graph_spark.operators.extraction import (
    extract_triples_heuristic,
)
from research_knowledge_graph_spark.operators.html_text import extract_text
from research_knowledge_graph_spark.operators.validation import validate_triples
from research_knowledge_graph_spark.sources.pages import PAGES_SCHEMA


def stream_pages(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source stream of page parquet files."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(input_dir)
    )


def run_incremental_ingest(
    spark: SparkSession, input_dir: str, output_dir: str, checkpoint_dir: str
) -> None:
    """Drain all currently-available files through extraction → validated
    triples, append to ``output_dir``. Exactly-once per file via the stream
    checkpoint; safe to re-run whenever new files arrive."""
    pages = stream_pages(spark, input_dir)
    docs = extract_text(pages).selectExpr(
        "url", "warc_ts", "extracted_text AS text", "lang"
    )
    triples = validate_triples(extract_triples_heuristic(docs))
    q = (
        triples.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
