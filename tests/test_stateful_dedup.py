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


def test_stateful_dedup_bloom_bounded_state(spark, tmp_path):
    """Bloom state mode: same cross-batch dedup behavior, CONSTANT-size
    state — per-bucket state bytes do not grow with rows seen."""
    inp, out, ckpt = (str(tmp_path / d) for d in ["in_b", "out_b", "ck_b"])

    base = synthesize_pages(spark, 40).select("url", "warc_ts", "html", "text", "lang")
    base.write.mode("append").parquet(inp)
    run_streaming_dedup(spark, inp, out, ckpt, PAGES_SCHEMA, state_mode="bloom")
    assert spark.read.parquet(out).count() == 40

    # duplicates of the first 40 + 20 new docs
    dups = (
        synthesize_pages(spark, 40)
        .select("url", "warc_ts", "html", "text", "lang")
        .withColumn("url", F.concat(F.col("url"), F.lit("?copy=1")))
    )
    fresh = synthesize_pages(spark, 60).filter(
        F.col("url").rlike("/(4[0-9]|5[0-9])$")  # doc ids 40-59 → 20 new
    ).select("url", "warc_ts", "html", "text", "lang")
    dups.unionByName(fresh).write.mode("append").parquet(inp)
    run_streaming_dedup(spark, inp, out, ckpt, PAGES_SCHEMA, state_mode="bloom")
    res = spark.read.parquet(out)
    assert res.count() == 60
    assert res.select("fingerprint").distinct().count() == 60


def test_stateful_dedup_ttl_expires_idle_buckets(spark, tmp_path):
    """TTL path (round-2 verdict #4): a bucket idle past ``ttl_minutes``
    has its state dropped, so a duplicate arriving AFTER expiry is
    re-emitted (windowed dedup). Three drains with a real clock gap:

    1. doc A → emitted, bucket state armed with a 3 s processing-time TTL;
    2. (sleep past TTL) doc B in the OTHER bucket → batch runs, bucket A
       gets no data and has timed out → state removed;
    3. doc A again → no state left → re-emitted.

    Processing-time timeouts fire when a later batch RUNS after expiry —
    the callback needs a triggered batch where the group has no new data,
    hence doc B's separate bucket in drain 2."""
    import time

    from research_knowledge_graph_spark.functions.textops import fingerprint_col

    inp, out, ckpt = (str(tmp_path / d) for d in ["in_t", "out_t", "ck_t"])

    # pick two docs landing in DIFFERENT buckets at n_buckets=2
    cand = synthesize_pages(spark, 12).select("url", "warc_ts", "html", "text", "lang")
    bucketed = cand.withColumn(
        "bucket", F.pmod(fingerprint_col("text"), F.lit(2))
    ).collect()
    doc_a = next(r for r in bucketed if r.bucket == 0)
    doc_b = next(r for r in bucketed if r.bucket == 1)
    cols = ["url", "warc_ts", "html", "text", "lang"]

    def drain(row, url_suffix=""):
        df = spark.createDataFrame(
            [tuple(row[c] for c in cols)], PAGES_SCHEMA
        ).withColumn("url", F.concat(F.col("url"), F.lit(url_suffix)))
        df.write.mode("append").parquet(inp)
        run_streaming_dedup(
            spark, inp, out, ckpt, PAGES_SCHEMA, n_buckets=2, ttl_minutes=0.05
        )

    drain(doc_a)
    assert spark.read.parquet(out).count() == 1

    time.sleep(4)  # > 3 s TTL
    drain(doc_b)
    drain(doc_a, url_suffix="?recrawl=1")  # same text → same fingerprint

    res = spark.read.parquet(out).collect()
    assert len(res) == 3, res  # A emitted TWICE: state expired between
    a_fp = [r.fingerprint for r in res if r.url.startswith(doc_a.url)]
    assert len(a_fp) == 2 and a_fp[0] == a_fp[1]


def test_bloom_capacity_calibration():
    """bloom_capacity's closed form matches measured FP: filling a filter
    to its 1e-3-target capacity keeps the empirical false-positive rate at
    that order; doubling the fill pushes it well past (the warning zone)."""
    import numpy as np

    from research_knowledge_graph_spark.streaming.stateful_dedup import (
        _Bloom,
        bloom_capacity,
    )

    m, k = 1 << 20, 5  # 128 KiB keeps the test fast; formula is scale-free
    cap = bloom_capacity(m, k, 1e-3)
    assert 0 < cap < m
    rng = np.random.default_rng(11)
    b = _Bloom(None, m, k)
    b.add(rng.integers(0, 2**63, size=cap, dtype=np.int64).astype(np.uint64))
    probe = rng.integers(0, 2**63, size=200_000, dtype=np.int64).astype(np.uint64)
    fp_at_cap = float(b.contains(probe).mean())
    assert fp_at_cap <= 3e-3, fp_at_cap  # 3x slack for sampling noise

    b.add(rng.integers(0, 2**63, size=cap, dtype=np.int64).astype(np.uint64))
    fp_at_2cap = float(b.contains(probe).mean())
    assert fp_at_2cap > 3 * fp_at_cap, (fp_at_cap, fp_at_2cap)


def test_bloom_filter_constant_size_sublinear():
    """Direct pin of the state-size contract: the serialized bloom is the
    same byte count after 100 inserts and after 100,000 — sub-linear (flat)
    in rows, where the exact representation grows 8 bytes/row."""
    import numpy as np

    from research_knowledge_graph_spark.streaming.stateful_dedup import _Bloom

    m, k = 1 << 20, 5
    b = _Bloom(None, m, k)
    rng = np.random.default_rng(7)
    small = rng.integers(0, 2**63, size=100, dtype=np.int64).astype(np.uint64)
    b.add(small)
    size_small = len(b.tobytes())
    big = rng.integers(0, 2**63, size=100_000, dtype=np.int64).astype(np.uint64)
    b.add(big)
    size_big = len(b.tobytes())
    assert size_small == size_big == m // 8

    # membership works and FP rate is sane at this fill
    assert b.contains(big[:1000]).all()
    probe = rng.integers(0, 2**63, size=10_000, dtype=np.int64).astype(np.uint64)
    fp_rate = float(b.contains(probe).mean())
    assert fp_rate < 0.05, fp_rate
