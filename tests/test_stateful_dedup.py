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


def _drainer(spark, tmp_path, tag, **kw):
    inp, out, ckpt = (str(tmp_path / f"{d}_{tag}") for d in ["in", "out", "ck"])
    cols = ["url", "warc_ts", "html", "text", "lang"]

    def drain(rows, url_suffix=""):
        df = spark.createDataFrame(
            [tuple(r[c] for c in cols) for r in rows], PAGES_SCHEMA
        ).withColumn("url", F.concat(F.col("url"), F.lit(url_suffix)))
        df.write.mode("append").parquet(inp)
        run_streaming_dedup(spark, inp, out, ckpt, PAGES_SCHEMA, **kw)

    return drain, out


def _two_same_bucket_docs(spark, n_buckets=2):
    from research_knowledge_graph_spark.functions.textops import fingerprint_col

    cand = synthesize_pages(spark, 16).select(
        "url", "warc_ts", "html", "text", "lang"
    )
    bucketed = cand.withColumn(
        "bucket", F.pmod(fingerprint_col("text"), F.lit(n_buckets))
    ).collect()
    same = [r for r in bucketed if r.bucket == 0]
    return same[0], same[1]


def test_exact_per_entry_ttl_on_busy_bucket(spark, tmp_path):
    """The busy-stream TTL case the bucket-idle timeout structurally misses:
    the bucket receives data EVERY drain (so the group timeout keeps being
    re-armed and never fires), yet doc A's ENTRY must still expire once it
    goes unseen past the TTL — pruned per-entry at each invocation."""
    import time

    doc_a, doc_c = _two_same_bucket_docs(spark)
    drain, out = _drainer(
        spark, tmp_path, "busy", n_buckets=2, ttl_minutes=0.05
    )
    drain([doc_a])
    assert spark.read.parquet(out).count() == 1
    time.sleep(4)  # > 3 s TTL; A unseen since drain 1
    drain([doc_c])  # SAME bucket: keeps it busy, re-arms the group timeout
    drain([doc_a], url_suffix="?recrawl=1")
    res = spark.read.parquet(out).collect()
    assert len(res) == 3, res  # A re-emitted: entry pruned despite busy bucket


class _StubState:
    """Minimal GroupState stand-in for unit-driving the dedup callbacks."""

    def __init__(self, value=None):
        self._v = value
        self.hasTimedOut = False
        self.removed = False

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def remove(self):
        self._v, self.removed = None, True

    def setTimeoutDuration(self, ms):
        pass


def _pdf(fps):
    import pandas as pd

    return pd.DataFrame(
        {
            "url": [f"u{f}" for f in fps],
            "text": [f"t{f}" for f in fps],
            "fingerprint": fps,
            "bucket": [0] * len(fps),
        }
    )


def test_exact_sliding_ttl_refreshes_on_dup(monkeypatch):
    """Unit-level (stub state, controlled clock — the E2E drain overhead
    makes wall-clock TTLs flaky): dup observations refresh last-seen, so a
    doc re-seen more often than the TTL never re-emits; an entry unseen
    past the TTL is pruned even though the bucket stays busy."""
    import research_knowledge_graph_spark.streaming.stateful_dedup as sd

    clock = {"now": 1_000.0}
    monkeypatch.setattr(sd.time, "time", lambda: clock["now"])
    fn = sd._make_exact_dedup(ttl_ms=3_000)
    st = _StubState()
    assert len(list(fn((0,), iter([_pdf([7])]), st))) == 1  # first: emitted
    for _ in range(3):
        clock["now"] += 2.0  # each hop < ttl, cumulatively >> ttl
        out = list(fn((0,), iter([_pdf([7])]), st))
        assert out == []  # dup refreshed, never re-emitted
    # now let it age past the TTL while OTHER fingerprints keep the bucket busy
    clock["now"] += 4.0
    out = list(fn((0,), iter([_pdf([8])]), st))  # busy bucket, 7 pruned
    assert len(out) == 1
    out = list(fn((0,), iter([_pdf([7])]), st))
    assert len(out) == 1  # 7 re-emitted: entry expired despite busy bucket


def test_bloom_generational_ttl(monkeypatch):
    """Unit-level: a dup seen under ttl ago is never re-emitted; after two
    generation rotations (> 2*ttl unseen) the entry is forgotten."""
    import research_knowledge_graph_spark.streaming.stateful_dedup as sd

    clock = {"now": 1_000.0}
    monkeypatch.setattr(sd.time, "time", lambda: clock["now"])
    fn = sd._make_bloom_dedup(1 << 13, 5, ttl_ms=3_000)
    st = _StubState()
    assert len(list(fn((0,), iter([_pdf([7])]), st))) == 1
    clock["now"] += 2.0  # < ttl
    assert list(fn((0,), iter([_pdf([7])]), st)) == []
    clock["now"] += 3.5  # rotation 1: 7 moves to prev — still remembered
    assert len(list(fn((0,), iter([_pdf([8])]), st))) == 1
    assert list(fn((0,), iter([_pdf([7])]), st)) == []
    clock["now"] += 3.5  # rotation 2: 7's generation dropped
    assert len(list(fn((0,), iter([_pdf([9])]), st))) == 1
    assert len(list(fn((0,), iter([_pdf([7])]), st))) == 1  # forgotten


def test_null_text_rows_dropped_not_crashing(spark, tmp_path):
    inp, out, ckpt = (str(tmp_path / d) for d in ["in_n", "out_n", "ck_n"])
    good = synthesize_pages(spark, 5).select(
        "url", "warc_ts", "html", "text", "lang"
    )
    nulls = good.limit(2).withColumn(
        "url", F.concat(F.col("url"), F.lit("?null=1"))
    ).withColumn("text", F.lit(None).cast("string"))
    good.unionByName(nulls).write.mode("append").parquet(inp)
    run_streaming_dedup(spark, inp, out, ckpt, PAGES_SCHEMA)
    res = spark.read.parquet(out)
    assert res.count() == 5  # null-text rows dropped, query alive
    assert res.filter(F.col("fingerprint").isNull()).count() == 0


def test_state_mode_typo_raises(spark):
    import pytest

    from research_knowledge_graph_spark.streaming.stateful_dedup import (
        dedup_stream,
    )

    import os
    import tempfile

    d = tempfile.mkdtemp(prefix="dedup_typo_")
    try:
        stream = spark.readStream.schema(PAGES_SCHEMA).parquet(d)
        with pytest.raises(ValueError, match="state_mode"):
            dedup_stream(stream, state_mode="Bloom")
    finally:
        os.rmdir(d)


def test_bloom_handles_non_multiple_of_8_bits():
    import numpy as np

    from research_knowledge_graph_spark.streaming.stateful_dedup import _Bloom

    b = _Bloom(None, 100_001, 5)  # tail bits past the last full byte
    fps = np.arange(1, 5000, dtype=np.uint64) * np.uint64(2654435761)
    b.add(fps)  # would IndexError with the m//8 sizing
    assert b.contains(fps).all()
