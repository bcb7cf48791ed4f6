"""Custom stateful streaming operator: cross-batch exact dedup.

A continuously-ingested corpus must not re-emit documents whose fingerprint
was already seen in ANY earlier micro-batch. That is per-key state across
triggers — Structured Streaming's ``applyInPandasWithState``:

- stream is grouped by fingerprint bucket (bounded key cardinality —
  state scales with bucket count, not row count);
- each group's state remembers which fingerprints were already emitted;
- new rows whose fingerprint is in state are dropped; survivors are emitted
  and their fingerprints recorded.

Two state representations (``state_mode``):

- ``"exact"``: the sorted array of every seen fingerprint. Zero false
  positives, but state grows LINEARLY with distinct documents — fine for
  bounded backfills, a scale-killer for an unbounded 10¹²-doc stream.
- ``"bloom"``: a fixed-size per-bucket Bloom filter (``bloom_bits`` bits,
  ``bloom_k`` probes via double hashing of the 64-bit fingerprint). State
  is CONSTANT-size regardless of rows seen. Tradeoff: a false positive
  silently DROPS a new document (never re-emits a dup — dedup errs on the
  drop side). FP rate ≈ (1 - e^(-k·n/m))^k; the default 1 MiB/bucket,
  k=5 holds FP < 1e-3 up to ~485k fingerprints per bucket
  (:func:`bloom_capacity` — size ``n_buckets × bloom_bits`` to the corpus
  so every bucket stays under it). Because exceeding the design point
  silently degrades dedup into data loss, each bucket tracks
  ``n_inserted`` against the calibrated capacity and logs an executor-side
  warning the first time it crosses (the filter keeps working — FP just
  grows past target; re-shard with more buckets when the warning fires).

Expiry (``ttl_minutes``) works at TWO levels, because the group-level
processing-time timeout alone never fires on a busy stream (every trigger
touches every bucket and re-arms it):

- per ENTRY: exact mode tracks last-seen per fingerprint and prunes aged
  entries on every invocation (sliding — a re-observed dup refreshes);
  bloom mode rotates generations (current + previous filter; an entry is
  remembered ≥ ttl and ≤ 2·ttl, never re-emitting a dup seen under ttl
  ago) — both bound state lifetime on a CONTINUOUS stream;
- per BUCKET: a bucket idle for the whole TTL additionally has its state
  object dropped (the original timeout path — covers paused streams).

Tradeoff: a dup whose original arrived more than the TTL (2·ttl for bloom)
ago is re-emitted — dedup becomes windowed, the Kafka-Streams-style
retention compromise. Rows with NULL text are dropped at the source (no
content identity; the batch curation floor drops them too).

For production the state store itself should be RocksDB (spills to local
disk, incremental checkpoints): :func:`rocksdb_state_conf` returns the
session configs; ``run_streaming_dedup(use_rocksdb=True)`` applies them.

``dropDuplicates`` on a stream keeps per-row state with a watermark; this
operator demonstrates the *custom* stateful surface (arbitrary per-group
state logic, Arrow-batched) the reference lacks entirely.
"""

from __future__ import annotations

import logging
import time
import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from research_knowledge_graph_spark.functions.textops import fingerprint_col

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("fingerprint", T.LongType()),
    ]
)

# COMPATIBILITY NOTE (ADVICE r5): EXACT_STATE_SCHEMA gained ``last_seen``
# and BLOOM_STATE_SCHEMA gained ``bits_prev``/``gen_started`` in round 5.
# applyInPandasWithState persists state tuples in the stream checkpoint, so
# a dedup stream RESUMED from a checkpoint written before that change would
# unpack old (shorter) state tuples against the new schema and fail or
# misread state mid-lineage. Recreate dedup-stream checkpoints when
# upgrading across that boundary — the first drain reprocesses the landing
# files, and the downstream graph commit path is idempotent (anti-joined),
# so the rebuild is safe.
EXACT_STATE_SCHEMA = T.StructType(
    [
        T.StructField("seen", T.ArrayType(T.LongType())),
        # parallel last-seen (ms) per fingerprint — per-ENTRY TTL pruning;
        # the bucket-idle timeout alone never fires on a busy stream
        # (every trigger touches every bucket and re-arms it)
        T.StructField("last_seen", T.ArrayType(T.LongType())),
    ]
)

BLOOM_STATE_SCHEMA = T.StructType(
    [
        T.StructField("bits", T.BinaryType()),
        # previous generation (rotating-window TTL: an entry is remembered
        # for at least ttl and at most 2·ttl; NULL until first rotation)
        T.StructField("bits_prev", T.BinaryType()),
        T.StructField("n_inserted", T.LongType()),
        T.StructField("gen_started", T.LongType()),
    ]
)

class _Bloom:
    """Fixed-size Bloom filter over 64-bit fingerprints, vectorized with
    numpy. Double hashing: probe_i = (h1 + i·h2) mod m with h1/h2 derived
    from the fingerprint by two odd multipliers (Kirsch-Mitzenmacher)."""

    def __init__(self, bits: bytes | None, m_bits: int, k: int):
        self.m = m_bits
        self.k = k
        if bits is None:
            # (m+7)//8: probes are taken mod m, so a bit index in the
            # truncated tail of a non-multiple-of-8 m must still have a byte
            self.arr = np.zeros((m_bits + 7) // 8, dtype=np.uint8)
        else:
            self.arr = np.frombuffer(bits, dtype=np.uint8).copy()

    @staticmethod
    def _mix64(x: np.ndarray) -> np.ndarray:
        """splitmix64 finalizer — multiplicative probes alone leave the low
        bits unmixed, which ruins uniformity mod a power-of-two m."""
        x = x ^ (x >> np.uint64(30))
        x = x * np.uint64(0xBF58476D1CE4E5B9)
        x = x ^ (x >> np.uint64(27))
        x = x * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))

    def _probes(self, fps: np.ndarray) -> np.ndarray:
        h1 = self._mix64(fps)
        h2 = self._mix64(fps ^ np.uint64(0x9E3779B97F4A7C15)) | np.uint64(1)
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        return ((h1[None, :] + i * h2[None, :]) % np.uint64(self.m)).astype(np.int64)

    def contains(self, fps: np.ndarray) -> np.ndarray:
        idx = self._probes(fps)
        bits = (self.arr[idx >> 3] >> (idx & 7).astype(np.uint8)) & 1
        return bits.all(axis=0)

    def add(self, fps: np.ndarray) -> None:
        idx = self._probes(fps).ravel()
        np.bitwise_or.at(self.arr, idx >> 3, (1 << (idx & 7)).astype(np.uint8))

    def tobytes(self) -> bytes:
        return self.arr.tobytes()


def _make_exact_dedup(ttl_ms: int | None, out_cols: list[str] | None = None):
    out_cols = out_cols or ["url", "text", "fingerprint"]

    def _dedup_group_exact(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        now = int(time.time() * 1000)
        if state.exists:
            fps_st, ts_st = state.get
            seen = dict(zip(fps_st, ts_st))  # fp -> last-seen ms
        else:
            seen = {}
        if ttl_ms is not None and seen:
            # per-ENTRY expiry: the group-level ProcessingTimeTimeout only
            # fires when the whole bucket is idle for the TTL, which a busy
            # stream (every trigger touching every bucket) never is — so
            # prune aged entries HERE, on every invocation
            seen = {f: t for f, t in seen.items() if now - t <= ttl_ms}
        for pdf in batches:
            fresh = pdf[~pdf["fingerprint"].isin(seen)]
            # also dedup within the batch, first occurrence wins
            fresh = fresh.drop_duplicates(subset=["fingerprint"], keep="first")
            if ttl_ms is not None:
                # sliding TTL: a re-observed dup refreshes its entry (a doc
                # recrawled more often than the TTL stays deduped forever)
                dup_fps = pdf.loc[
                    pdf["fingerprint"].isin(seen), "fingerprint"
                ].unique()
                seen.update(dict.fromkeys((int(f) for f in dup_fps), now))
            if len(fresh):
                seen.update(
                    dict.fromkeys((int(f) for f in fresh["fingerprint"]), now)
                )
                yield fresh[out_cols]
        items = sorted(seen.items())
        state.update(([f for f, _ in items], [t for _, t in items]))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)

    return _dedup_group_exact


def bloom_capacity(m_bits: int, k: int, fp_target: float = 1e-3) -> int:
    """Max fingerprints a (m_bits, k) Bloom filter holds with
    FP = (1 - e^(-k·n/m))^k still ≤ ``fp_target``: solving for n gives
    n = -(m/k)·ln(1 - p^(1/k)). Default geometry (1 MiB, k=5) → ~485k."""
    return int(-(m_bits / k) * math.log(1.0 - fp_target ** (1.0 / k)))


def _make_bloom_dedup(
    m_bits: int, k: int, ttl_ms: int | None, out_cols: list[str] | None = None
):
    capacity = bloom_capacity(m_bits, k)
    out_cols = out_cols or ["url", "text", "fingerprint"]

    def _dedup_group_bloom(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        now = int(time.time() * 1000)
        if state.exists:
            bits, bits_prev, n_ins, gen_started = state.get
            bloom = _Bloom(bits, m_bits, k)
            prev = _Bloom(bits_prev, m_bits, k) if bits_prev is not None else None
        else:
            bloom, prev, n_ins, gen_started = _Bloom(None, m_bits, k), None, 0, now
        if ttl_ms is not None and now - gen_started > ttl_ms:
            # rotating-window TTL (a bit set can't be aged individually):
            # the current filter becomes the previous generation and a fresh
            # one starts — an entry is remembered ≥ ttl and ≤ 2·ttl, and a
            # dup seen under ttl ago is NEVER re-emitted
            prev, bloom = bloom, _Bloom(None, m_bits, k)
            n_ins, gen_started = 0, now
        n_at_entry = n_ins
        for pdf in batches:
            fps = pdf["fingerprint"].to_numpy().astype(np.uint64)
            seen_mask = bloom.contains(fps)
            if prev is not None:
                seen_mask = seen_mask | prev.contains(fps)
            fresh = pdf[~seen_mask]
            fresh = fresh.drop_duplicates(subset=["fingerprint"], keep="first")
            if len(fresh):
                bloom.add(fresh["fingerprint"].to_numpy().astype(np.uint64))
                n_ins += len(fresh)
                yield fresh[out_cols]
        if n_at_entry <= capacity < n_ins:  # log once, on first crossing
            logging.getLogger(__name__).warning(
                "bloom dedup bucket %s exceeded its FP design capacity "
                "(%d inserted > %d for FP<=1e-3 at m=%d,k=%d); false-positive "
                "drops now grow past target — re-shard with more buckets",
                key[0], n_ins, capacity, m_bits, k,
            )
        state.update(
            (
                bloom.tobytes(),
                prev.tobytes() if prev is not None else None,
                int(n_ins),
                int(gen_started),
            )
        )
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)

    return _dedup_group_bloom


def dedup_stream(
    stream: DataFrame,
    n_buckets: int = 64,
    state_mode: str = "exact",
    bloom_bits: int = 1 << 23,  # 1 MiB per bucket
    bloom_k: int = 5,
    ttl_minutes: float | None = None,
    fingerprint: Column | None = None,
    keep_all: bool = False,
) -> DataFrame:
    """stream(url, text, …) → first-seen rows only, across all triggers.

    Keys state by fingerprint bucket so the shuffle is uniform (fingerprints
    are uniform hashes — no skew). ``state_mode="bloom"`` bounds per-bucket
    state at ``bloom_bits/8`` bytes forever; ``ttl_minutes`` additionally
    expires idle buckets (see module docstring for both tradeoffs).

    ``fingerprint`` overrides WHAT counts as a duplicate (default: the
    normalized-text content fingerprint). Pass a 64-bit hash of the
    canonical URL (:func:`url_fingerprint_col`) for crawl-stream URL
    dedup: the same page re-crawled under a messy spelling is suppressed
    even when its content changed. Note the streaming semantic is
    FIRST-seen-wins (state can only remember, not retract an emitted
    row) — the batch twin ``operators/web.py::url_dedup`` is
    latest-crawl-wins; re-deduplicate in batch when recency matters.

    ``keep_all=True`` carries EVERY input column through (output schema =
    input schema + ``fingerprint``) instead of the classic
    ``(url, text, fingerprint)`` projection — required when the deduped
    stream feeds the pages-shaped pipeline (which needs ``html``/
    ``warc_ts``/``lang``). The null-FINGERPRINT drop is the invariant in
    every mode; what it means follows the key (content mode: NULL text
    carries nothing trainable; url mode: a schemeless url isn't
    fetchable — a NULL-text row with a valid url is KEPT there, its text
    may be extracted downstream)."""
    if state_mode not in ("exact", "bloom"):
        # a typo must not silently fall back to exact mode — on the
        # unbounded stream bloom was chosen for, that converts a
        # constant-memory operator into linear state growth with no error
        raise ValueError(f"state_mode must be 'exact' or 'bloom', got {state_mode!r}")
    fp_col = fingerprint if fingerprint is not None else fingerprint_col("text")
    if keep_all:
        for reserved in ("fingerprint", "bucket"):
            if reserved in stream.columns:
                raise ValueError(
                    f"keep_all=True adds a {reserved!r} column; rename the "
                    f"stream's existing {reserved!r} first"
                )
        projected = stream.withColumn("fingerprint", fp_col)
        out_cols = stream.columns + ["fingerprint"]
        out_schema = T.StructType(
            [stream.schema[c] for c in stream.columns]
            + [T.StructField("fingerprint", T.LongType())]
        )
    else:
        projected = stream.select("url", "text", fp_col.alias("fingerprint"))
        out_cols, out_schema = ["url", "text", "fingerprint"], OUTPUT_SCHEMA
    with_fp = (
        projected
        # a NULL fingerprint has no identity (content mode: md5(NULL)=NULL,
        # the row carries nothing trainable; url mode: schemeless url,
        # unfetchable) and would reach pandas as NaN and kill the query at
        # the int cast — drop such rows
        .filter(F.col("fingerprint").isNotNull())
        .withColumn("bucket", F.pmod(F.col("fingerprint"), F.lit(n_buckets)))
    )
    if ttl_minutes is not None:
        timeout = GroupStateTimeout.ProcessingTimeTimeout
        ttl_ms = int(ttl_minutes * 60_000)
    else:
        timeout = GroupStateTimeout.NoTimeout
        ttl_ms = None
    if state_mode == "bloom":
        fn, schema = (
            _make_bloom_dedup(bloom_bits, bloom_k, ttl_ms, out_cols),
            BLOOM_STATE_SCHEMA,
        )
    else:
        fn, schema = _make_exact_dedup(ttl_ms, out_cols), EXACT_STATE_SCHEMA
    return (
        with_fp.groupBy("bucket")
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=schema,
            outputMode="append",
            timeoutConf=timeout,
        )
    )


def rocksdb_state_conf() -> dict[str, str]:
    """Session configs putting streaming state in RocksDB: state spills to
    executor-local disk with incremental (changelog) checkpoints instead of
    living on the JVM heap — the right provider for dedup state that exceeds
    memory."""
    return {
        "spark.sql.streaming.stateStore.providerClass": (
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
        ),
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": "true",
    }


def _drain_with_timers(q, max_wait_sec: float = 300.0) -> None:
    """Drain an availableNow query whose state has PROCESSING-TIME timers
    armed. Spark (observed on 4.1, minimal repro in tests) never
    self-terminates such a query: once any group calls
    ``setTimeoutDuration``, the engine keeps scheduling empty micro-batches
    to evaluate timers — ``awaitTermination()`` spins forever even after
    all input AND all state are gone. So: watch progress, and stop once a
    committed batch reports zero input rows twice (data exhausted; one
    empty batch has already given due timers their chance to fire —
    not-yet-due timers persist in the checkpoint and fire during the next
    drain, which is exactly the TTL semantics the batch-drain caller
    wants)."""
    import time as _time

    deadline = _time.time() + max_wait_sec
    empty_batches: set[int] = set()
    drained = False
    while q.isActive and _time.time() < deadline:
        p = q.lastProgress
        if p is not None and p["numInputRows"] == 0:
            empty_batches.add(p["batchId"])
            if len(empty_batches) >= 2:
                drained = True
                break
        _time.sleep(0.2)
    drained = drained or not q.isActive
    q.stop()
    q.awaitTermination()
    if not drained:
        # fail LOUD: stopping mid-data would silently skip a suffix of the
        # input (the caller believes the drain completed)
        raise RuntimeError(
            f"streaming drain did not exhaust its input within {max_wait_sec}s "
            "(no two empty micro-batches observed); raise max_wait_sec or "
            "reduce the backlog per drain"
        )


def run_streaming_dedup(
    spark, input_dir: str, output_dir: str, checkpoint_dir: str, schema,
    state_mode: str = "exact", use_rocksdb: bool = False,
    n_buckets: int = 64, ttl_minutes: float | None = None,
    fingerprint: Column | None = None, keep_all: bool = False,
) -> None:
    if use_rocksdb:
        for k, v in rocksdb_state_conf().items():
            spark.conf.set(k, v)
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 16).parquet(input_dir)
    )
    q = (
        dedup_stream(stream, state_mode=state_mode, n_buckets=n_buckets,
                     ttl_minutes=ttl_minutes, fingerprint=fingerprint,
                     keep_all=keep_all)
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if ttl_minutes is None:
        q.awaitTermination()
    else:
        _drain_with_timers(q)
