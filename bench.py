"""Benchmark harness: headline queries + pipeline ingest throughput.

Runs the engine's headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and a full KG
pipeline ingest over a synthetic page corpus; prints ONE JSON line::

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": ..., "docs_per_sec": ...}

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
PIPELINE_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "20000"))

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


def _materialize(df) -> None:
    # noop sink: forces full computation of every output row/column —
    # a bare count() would let Catalyst prune projections (e.g. the
    # normalization expression in t01 would never run)
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    import research_knowledge_graph_spark as rkg
    import __spark_entry__ as entry
    from research_knowledge_graph_spark.plans.pipeline import run_pipeline
    from research_knowledge_graph_spark.sources.pages import (
        default_vocab_scale,
        synthesize_pages,
    )

    spark = rkg.get_spark(app_name="rkg_bench")
    qs = entry.queries()
    timings: dict[str, float] = {}

    # warm the JVM + parquet footers once
    spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).count()

    for name in BENCH_QUERIES:
        t0 = time.time()
        _materialize(qs[name](spark, SF_DIR))
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {timings[name]}s", file=sys.stderr)

    # pipeline ingest throughput (fresh workdir per run)
    workdir = tempfile.mkdtemp(prefix="rkg_bench_")
    try:
        pages = synthesize_pages(
            spark, PIPELINE_DOCS, vocab_scale=default_vocab_scale(PIPELINE_DOCS)
        )
        t0 = time.time()
        # minimal checkpointing = the production-throughput configuration
        # (intermediates in executor cache; final tables still committed)
        res = run_pipeline(
            spark, pages, workdir, mode="heuristic", max_block_degree=200,
            checkpoint_level="minimal",
        )
        res.edges.count()
        pipeline_sec = round(time.time() - t0, 3)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    timings["pipeline_ingest_20k_docs"] = pipeline_sec
    docs_per_sec = round(PIPELINE_DOCS / pipeline_sec, 1)

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
            }
        )
    )


if __name__ == "__main__":
    main()
