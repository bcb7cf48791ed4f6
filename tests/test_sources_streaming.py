"""Readers (S1-S4), multimodal plumbing, and incremental streaming ingest."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from research_knowledge_graph_spark.operators.multimodal import (
    extract_media_features,
    frame_sample_plan,
)
from research_knowledge_graph_spark.sources.pages import synthesize_pages
from research_knowledge_graph_spark.sources.readers import (
    assemble_docs_from_papers,
    read_binary_docs,
    read_papers_json,
    read_text_files,
)
from research_knowledge_graph_spark.streaming.ingest import run_incremental_ingest

PAPERS = [
    {"title": "T1", "abstract": "A1", "year": 2023, "text": "full text one"},
    {"title": "T2", "abstract": "A2", "year": 2024},
]


def test_read_papers_json_array(spark, tmp_path):
    p = tmp_path / "papers.json"
    p.write_text(json.dumps(PAPERS))
    df = read_papers_json(spark, str(p))
    assert df.count() == 2
    docs = assemble_docs_from_papers(df)
    texts = {r.title: r.doc_text for r in docs.collect()}
    assert texts["T1"] == "full text one"           # provided text wins
    assert texts["T2"] == "Title: T2\n\nAbstract: A2"  # assembled (F7)


def test_read_text_and_binary(spark, tmp_path):
    (tmp_path / "a.txt").write_text("hello world")
    (tmp_path / "b.bin").write_bytes(b"\x00\x01binary")
    t = read_text_files(spark, str(tmp_path / "*.txt"))
    assert t.count() == 1 and t.first().text == "hello world"
    b = read_binary_docs(spark, str(tmp_path), glob="*.bin")
    assert b.count() == 1 and bytes(b.first().content) == b"\x00\x01binary"


def test_media_features(spark):
    rows = [
        ("m1", "image", bytes(range(256)), {}),
        ("m2", "video", b"\x10" * 25_000, {}),
        ("m3", "audio", b"", {}),
    ]
    media = spark.createDataFrame(
        rows, "media_id string, media_type string, payload binary, meta map<string,string>"
    )
    feats = {r.media_id: r for r in extract_media_features(media).collect()}
    assert feats["m1"].n_bytes == 256
    assert abs(feats["m1"].byte_mean - 127.5) < 1e-6
    assert len(feats["m1"].feature) == 8
    assert feats["m3"].n_bytes == 0

    frames = frame_sample_plan(media, every_n=10).collect()
    assert {r.media_id for r in frames} == {"m2"}
    assert len(frames) == 3  # 25 fake frames sampled every 10 → idx 0,10,20


def test_incremental_ingest_exactly_once(spark, tmp_path):
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    synthesize_pages(spark, 10).write.mode("append").parquet(inp)
    run_incremental_ingest(spark, inp, out, ckpt)
    n1 = spark.read.parquet(out).count()
    assert n1 > 0

    # re-run with NO new files → nothing reprocessed
    run_incremental_ingest(spark, inp, out, ckpt)
    assert spark.read.parquet(out).count() == n1

    # add new files → only the new ones are processed
    synthesize_pages(spark, 30).filter(F.col("url").endswith("5")).write.mode(
        "append"
    ).parquet(inp)
    run_incremental_ingest(spark, inp, out, ckpt)
    n2 = spark.read.parquet(out).count()
    assert n2 > n1


def test_stream_interval_join_matches_batch(spark, tmp_path):
    """Watermarked stream-stream interval join (views ⨝ purchases on user
    within 60 min) emits exactly the batch join's rows."""
    from pyspark.sql import functions as F

    from research_knowledge_graph_spark.streaming.joins import stream_interval_join

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts", "event_id")
    others = ev.filter(F.col("event_type") != "view").select(
        "user_id", "ts", "event_id", "event_type"
    )
    vdir, odir = str(tmp_path / "v"), str(tmp_path / "o")
    views.write.parquet(vdir)
    others.write.parquet(odir)

    batch = stream_interval_join(
        spark.read.parquet(vdir), spark.read.parquet(odir), "user_id",
        within_minutes=60,
    )
    expected = {
        (r.user_id, r.event_id, r.r_event_id) for r in batch.collect()
    }
    assert expected  # non-trivial fixture

    vs = spark.readStream.schema(views.schema).parquet(vdir)
    os_ = spark.readStream.schema(others.schema).parquet(odir)
    out = str(tmp_path / "out")
    q = (
        stream_interval_join(vs, os_, "user_id", within_minutes=60)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.user_id, r.event_id, r.r_event_id)
        for r in spark.read.parquet(out).collect()
    }
    assert got == expected


def test_windowed_rollup_missing_landing_dir_drains_zero(spark, tmp_path):
    """First scheduled rollup before the producer's first drop: the
    landing dir doesn't exist yet — must drain zero files, not die with
    AnalysisException at stream start (the guard its ingest siblings
    always had, via the now-shared stream_pages reader)."""
    from research_knowledge_graph_spark.sources.pages import PAGES_SCHEMA
    from research_knowledge_graph_spark.streaming.aggregates import run_windowed_rollup

    inp, out, ckpt = (str(tmp_path / d) for d in ["never_written", "out", "ck"])
    run_windowed_rollup(spark, inp, out, ckpt, PAGES_SCHEMA)
    import os

    assert os.path.isdir(inp)  # created by the guard


def test_frame_sample_plan_zero_frame_and_null_payload(spark):
    """A sub-1KB (zero-frame) video and a NULL-payload video must emit NO
    frame rows — greatest(NULL, 0)=0 used to fabricate a frame 0 for
    both (Spark's greatest skips nulls)."""
    rows = [
        ("v1", "video", b"x" * 5000),  # 5 frames
        ("v2", "video", b"x" * 500),   # 0 frames
        ("v3", "video", None),         # no payload
    ]
    df = spark.createDataFrame(rows, "media_id string, media_type string, payload binary")
    out = frame_sample_plan(df, every_n=2)
    got = {(r.media_id, r.frame_idx) for r in out.collect()}
    assert got == {("v1", 0), ("v1", 2), ("v1", 4)}
