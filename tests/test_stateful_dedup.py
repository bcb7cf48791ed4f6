"""Cross-batch stateful dedup: duplicates are suppressed WITHIN a drain and
ACROSS separate drains (state survives via the stream checkpoint)."""

from __future__ import annotations

from pyspark.sql import functions as F

from research_knowledge_graph_spark.sources.pages import PAGES_SCHEMA, synthesize_pages
from research_knowledge_graph_spark.streaming.stateful_dedup import run_streaming_dedup


def test_stateful_dedup_across_batches(spark, tmp_path):
    inp, out, ckpt = (str(tmp_path / d) for d in ["in", "out", "ck"])

    base = synthesize_pages(spark, 20).select("url", "warc_ts", "html", "text", "lang")
    base.write.mode("append").parquet(inp)
    run_streaming_dedup(spark, inp, out, ckpt, PAGES_SCHEMA)
    n1 = spark.read.parquet(out).count()
    assert n1 == 20  # all distinct texts emitted once

    # second drop: 10 duplicate texts (same content, new urls) + 5 new docs
    dups = (
        synthesize_pages(spark, 10)
        .select("url", "warc_ts", "html", "text", "lang")
        .withColumn("url", F.concat(F.col("url"), F.lit("?copy=1")))
    )
    fresh = synthesize_pages(spark, 30).filter(
        F.col("url").rlike("/(2[0-4])$")  # doc ids 20-24 → 5 new docs
    ).select("url", "warc_ts", "html", "text", "lang")
    dups.unionByName(fresh).write.mode("append").parquet(inp)

    run_streaming_dedup(spark, inp, out, ckpt, PAGES_SCHEMA)
    res = spark.read.parquet(out)
    assert res.count() == 25  # +5 new, duplicates suppressed by state
    assert res.select("fingerprint").distinct().count() == 25
