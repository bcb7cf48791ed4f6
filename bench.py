"""Benchmark harness: headline queries + pipeline ingest throughput.

Runs the engine's headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and a full KG
pipeline ingest over a synthetic page corpus; prints ONE JSON line::

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": ..., "docs_per_sec": ...}

Noise discipline (round-3 verdict #4): ±25% total drift was observed on the
shared VM between identical-code runs. Defenses here:

- every query is timed ``$SPARK_GRAFT_BENCH_REPEATS`` (default 2) times and
  the MINIMUM is reported — min-of-N is the standard noisy-host estimator
  (contention only ever ADDS time, so the min is the least-contaminated
  sample);
- the process pins itself to a fixed CPU set (JVM + python workers inherit
  it) so the scheduler can't migrate the benchmark across a contended host
  mid-query;
- run metadata (repeats, estimator, pinned cpus, load average before/after)
  is embedded in the JSON so a contaminated run is *identifiable* instead
  of silently skewing round-over-round comparisons.

Scaling-efficiency evidence (local[N] vs local[4N]) is produced by
``scaling_bench.py`` (separate JVMs per parallelism level) and recorded in
BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# Workdirs (committed tables + stream landing dirs) live in /dev/shm when
# available, matching scaling_bench.py: the shared VM's disk serves other
# tenants, and same-day identical-code streaming runs swung 59 s ↔ 139 s
# with the disk-backed /tmp workdir. The bench measures the engine's
# compute + shuffle, not a neighbor's IO; tmpfs is the sandbox analog of
# the fast object store a production cluster commits through.
WORK_ROOT = "/dev/shm" if os.path.isdir("/dev/shm") else None
PIPELINE_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "20000"))
STREAM_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_STREAM_DOCS", "12000"))
STREAM_DROPS = int(os.environ.get("SPARK_GRAFT_BENCH_STREAM_DROPS", "3"))
STREAM_LARGE_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_STREAM_LARGE_DOCS", "60000"))
STREAM_LARGE_DROPS = int(os.environ.get("SPARK_GRAFT_BENCH_STREAM_LARGE_DROPS", "3"))
REPEATS = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2"))

# headline subset: covers scan-agg, join-topk, window, graph joins,
# blocking self-join, recursive chain, text ops, dedup hashes, vector top-k
BENCH_QUERIES = [
    "q01_pricing_summary",
    "q03_top_revenue",
    "q05_window_top3",
    "g03_two_hop",
    "g04_influence_topk",
    "g06_shared_entity_pairs",
    "g08_recursive_chain",
    "t01_normalize_labels",
    "t02_quality",
    "t04_exact_dedup",
    "t06_simhash",
    "e01_knn_bruteforce",
    "v01_hourly_rollup",
    "v03_sessionize",
]


def _pin_cpus() -> int:
    """Pin the benchmark (and everything it forks — the JVM, python
    workers) to a fixed CPU set: SPARK_GRAFT_CPUS worker threads + 4 for
    driver/GC, the same headroom rule scaling_bench uses. Returns the
    number of pinned CPUs (0 = pinning unavailable)."""
    try:
        n = min(os.cpu_count() or 1, int(os.environ.get("SPARK_GRAFT_CPUS", "32")) + 4)
        os.sched_setaffinity(0, set(range(n)))
        return n
    except (AttributeError, OSError):
        return 0


def _materialize(df) -> None:
    # noop sink: forces full computation of every output row/column —
    # a bare count() would let Catalyst prune projections (e.g. the
    # normalization expression in t01 would never run)
    df.write.format("noop").mode("overwrite").save()


def _bench_query(entry, qs, name, spark) -> float:
    """min-of-REPEATS wall time; shared memo caches (e.g. the co-usage
    pair graph g06/g18-g21 reuse) are cleared per repeat so every sample
    measures the full computation, comparable across rounds."""
    best = float("inf")
    for _ in range(REPEATS):
        cache = getattr(entry, "_COUSE_CACHE", {})
        for df in cache.values():
            df.unpersist()
        cache.clear()
        t0 = time.time()
        _materialize(qs[name](spark, SF_DIR))
        best = min(best, time.time() - t0)
    return round(best, 3)


def main() -> None:
    pinned = _pin_cpus()
    load0 = os.getloadavg()[0]

    import research_knowledge_graph_spark as rkg
    import __spark_entry__ as entry
    from pyspark.sql import functions as F
    from research_knowledge_graph_spark.plans.pipeline import run_pipeline
    from research_knowledge_graph_spark.sources.pages import (
        default_vocab_scale,
        synthesize_pages,
    )
    from research_knowledge_graph_spark.sources.table_io import TableIO
    from research_knowledge_graph_spark.streaming.ingest import (
        run_streaming_graph_ingest,
    )

    spark = rkg.get_spark(app_name="rkg_bench")
    qs = entry.queries()
    timings: dict[str, float] = {}

    # warm the JVM + parquet footers once
    spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).count()

    for name in BENCH_QUERIES:
        timings[name] = _bench_query(entry, qs, name, spark)
        print(f"# {name}: {timings[name]}s", file=sys.stderr)

    # pipeline ingest throughput (fresh workdir per repeat, best-of-N)
    pages = synthesize_pages(
        spark, PIPELINE_DOCS, vocab_scale=default_vocab_scale(PIPELINE_DOCS)
    )
    pipeline_sec = float("inf")
    for _ in range(REPEATS):
        workdir = tempfile.mkdtemp(prefix="rkg_bench_", dir=WORK_ROOT)
        try:
            t0 = time.time()
            # minimal checkpointing = the production-throughput configuration
            # (intermediates in executor cache; final tables still committed)
            res = run_pipeline(
                spark, pages, workdir, mode="heuristic", max_block_degree=200,
                checkpoint_level="minimal",
            )
            res.edges.count()
            pipeline_sec = min(pipeline_sec, time.time() - t0)
        finally:
            shutil.rmtree(workdir, ignore_errors=True)
    pipeline_sec = round(pipeline_sec, 3)
    timings["pipeline_ingest_20k_docs"] = pipeline_sec
    docs_per_sec = round(PIPELINE_DOCS / pipeline_sec, 1)
    print(f"# pipeline: {pipeline_sec}s ({docs_per_sec} docs/s)", file=sys.stderr)

    # streaming crawl→KG throughput (round-3 verdict #5): N file drops into
    # a landing dir, each drained through the foreachBatch incremental
    # pipeline — the continuous-ingest path, timed end to end (single run:
    # the path is dominated by the same incremental pipeline the batch
    # number repeats; a second full pass would double bench time for
    # little extra signal)
    def _stream_bench(n_docs, n_drops):
        sdir = tempfile.mkdtemp(prefix="rkg_bench_stream_", dir=WORK_ROOT)
        try:
            inp, graph, ckpt = (os.path.join(sdir, d) for d in ("in", "graph", "ck"))
            spages = synthesize_pages(
                spark, n_docs, vocab_scale=default_vocab_scale(n_docs)
            )
            drops = [
                spages.filter(F.pmod(F.xxhash64("url"), F.lit(n_drops)) == i)
                for i in range(n_drops)
            ]
            t0 = time.time()
            for d in drops:
                d.write.mode("append").parquet(inp)
                run_streaming_graph_ingest(spark, inp, graph, ckpt)
            TableIO(spark, graph).read("edges_all").count()
            return round(time.time() - t0, 3)
        finally:
            shutil.rmtree(sdir, ignore_errors=True)

    # stable keys (doc counts ride in "stream_docs"/"stream_large_docs",
    # not in the key name — changing the env vars must not silently rename
    # the metric and break round-over-round comparison)
    stream_sec = _stream_bench(STREAM_DOCS, STREAM_DROPS)
    timings["streaming_ingest"] = stream_sec
    stream_docs_per_sec = round(STREAM_DOCS / stream_sec, 1)
    print(f"# streaming: {stream_sec}s ({stream_docs_per_sec} docs/s)", file=sys.stderr)

    # second point on the drop-size amortization curve (round-4 verdict #9):
    # bigger drops amortize the per-drop streaming fixed cost toward the
    # batch-pipeline docs/s ceiling. 0 docs disables.
    stream_large_sec = stream_large_docs_per_sec = None
    if STREAM_LARGE_DOCS > 0:
        stream_large_sec = _stream_bench(STREAM_LARGE_DOCS, STREAM_LARGE_DROPS)
        timings["streaming_ingest_large"] = stream_large_sec
        stream_large_docs_per_sec = round(STREAM_LARGE_DOCS / stream_large_sec, 1)
        print(
            f"# streaming_large: {stream_large_sec}s "
            f"({stream_large_docs_per_sec} docs/s)",
            file=sys.stderr,
        )

    total = round(sum(timings.values()), 3)
    sf = 0.1 if "sf0.1" in SF_DIR else (0.01 if "sf0.01" in SF_DIR else SF_DIR)
    print(
        json.dumps(
            {
                "metric": "kg_engine_total_bench_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "docs_per_sec": docs_per_sec,
                "pipeline_docs": PIPELINE_DOCS,
                "stream_docs_per_sec": stream_docs_per_sec,
                "stream_docs": STREAM_DOCS,
                "stream_drops": STREAM_DROPS,
                "stream_large_docs_per_sec": stream_large_docs_per_sec,
                "stream_large_docs": STREAM_LARGE_DOCS,
                "stream_large_drops": STREAM_LARGE_DROPS,
                "run_meta": {
                    "repeats": REPEATS,
                    "estimator": "min",
                    # the streaming drains are timed once per run — their
                    # state (checkpoint dir, landing files) makes repeats
                    # non-independent; every other metric is min-of-REPEATS
                    "single_sample_metrics": [
                        "streaming_ingest",
                        "streaming_ingest_large",
                    ],
                    "pinned_cpus": pinned,
                    "load_1m_start": round(load0, 2),
                    "load_1m_end": round(os.getloadavg()[0], 2),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
