"""Streaming windowed aggregation with watermarks.

The reference has no streaming surface; a continuously-crawled corpus needs
one. Event-time tumbling-window rollups over late-arriving data — the
standard Structured Streaming pattern: ``withWatermark`` bounds state,
``window()`` buckets event time, append-mode output finalizes a window when
the watermark passes it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(
    stream: DataFrame,
    ts_col: str = "warc_ts",
    key_col: str = "lang",
    window_len: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-(window, key) row counts with bounded state."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_len).alias("win"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "n",
        )
    )


def run_windowed_rollup(
    spark, input_dir: str, output_dir: str, checkpoint_dir: str,
    schema, ts_col: str = "warc_ts", key_col: str = "lang",
) -> None:
    """AvailableNow drain of a file stream into windowed counts (append
    mode: only watermark-finalized windows are emitted). The reader is
    the shared ``ingest.stream_pages`` (one home for the landing-dir
    makedirs guard + trigger sizing)."""
    from research_knowledge_graph_spark.streaming.ingest import stream_pages

    stream = stream_pages(spark, input_dir, schema=schema)
    agg = windowed_counts(stream, ts_col, key_col)
    q = (
        agg.writeStream.format("parquet")
        .outputMode("append")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
