"""Scaling-efficiency evidence: the same pipeline job at two CLUSTER SIZES —
N executors vs 4N executors — on identical input.

No real multi-machine cluster exists in this sandbox, so executors are
spawned as separate JVM processes via Spark's ``local-cluster[N, cores, mem]``
master (the standalone-mode test harness: one worker JVM per executor, real
shuffle/broadcast over the localhost network, the application code shipped
to executors via py-files exactly as ``spark-submit --py-files`` would).
This is materially closer to a multi-executor cluster than ``local[N]``
thread scaling, which bottlenecks on a single JVM's allocator/GC.

    efficiency = (docs/sec at 4N executors) / (4 × docs/sec at N executors)

Two measurement controls (both on by default):

- **CPU pinning** (``taskset``): each run is confined to ``execs*cores + 4``
  host CPUs (constant +4 = driver/OS allowance). Unpinned, the N=1 run's
  JVM worker threads (GC, shuffle, netty) opportunistically spread over all
  32 host CPUs — the small cluster silently gets big-cluster hardware, which
  inflates its throughput and understates efficiency. Pinning gives both
  sizes the same per-executor hardware, as a real cluster would.
- **minimal checkpointing** (``run_pipeline(checkpoint_level="minimal")``):
  intermediates live in the executor block-manager cache instead of being
  written through one shared tmpfs endpoint; stage writes through a single
  storage device are the non-scaling term on one host.

Usage: ``python scaling_bench.py [--docs 240000] [--n 1] [--cores 4]
[--repeats 3] [--checkpoint-level minimal] [--no-pin] [--update-baseline]``
— prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.abspath(__file__))

RUNNER = r"""
import json, os, shutil, sys, tempfile, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
spark = (
    SparkSession.builder.master("local-cluster[{execs},{cores},{mem}]")
    .appName("rkg_scaling_{execs}x{cores}")
    .config("spark.executor.memory", "{mem_g}g")
    .config("spark.driver.memory", "8g")
    .config("spark.sql.shuffle.partitions", str({execs} * {cores} * 2))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.autoBroadcastJoinThreshold", str(16 * 1024 * 1024))
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    .config("spark.sql.parquet.compression.codec", "zstd")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
spark.sparkContext.addPyFile({pkg_zip!r})  # ship the package to executors
from research_knowledge_graph_spark.plans.pipeline import run_pipeline

pages = spark.read.parquet({pages!r})
pages.count()  # warm input footers; excluded from timing
workdir = tempfile.mkdtemp(prefix="rkg_scale_", dir="/dev/shm" if os.path.isdir("/dev/shm") else None)
try:
    stage_timings = {{}}
    t0 = time.time()
    res = run_pipeline(spark, pages, workdir, mode="heuristic", max_block_degree=200,
                       checkpoint_level={ckpt_level!r}, timings=stage_timings)
    t_pipe = time.time()
    n_edges = res.edges.count()
    t1 = time.time()
    stage_timings["final_count"] = round(t1 - t_pipe, 2)
    elapsed = t1 - t0
finally:
    shutil.rmtree(workdir, ignore_errors=True)
print(json.dumps({{"executors": {execs}, "cores": {cores},
                   "elapsed_sec": round(elapsed, 2), "edges": n_edges,
                   "stages": stage_timings}}))
"""


def _make_pkg_zip() -> str:
    # ONE copy of the --py-files packaging step (shared with the literal
    # spark-submit path: spark_submit_app.py + tests/test_spark_submit.py)
    from package_pyfiles import build_pyfiles_zip

    return build_pyfiles_zip()


def run_at(
    execs: int, cores: int, mem_g: int, pages_path: str, pkg_zip: str,
    repeats: int, ckpt_level: str, pin: bool,
) -> dict:
    """Best-of-N runs: the sandbox VM shows ±25% run-to-run noise."""
    best = None
    for _ in range(repeats):
        code = RUNNER.format(
            repo=REPO, execs=execs, cores=cores, mem=mem_g * 1024, mem_g=mem_g,
            pages=pages_path, pkg_zip=pkg_zip, ckpt_level=ckpt_level,
        )
        cmd = [sys.executable, "-c", code]
        if pin:
            n_cpus = min(execs * cores + 4, os.cpu_count() or 32)
            cmd = ["taskset", "-c", f"0-{n_cpus - 1}"] + cmd
        out = subprocess.run(cmd, capture_output=True, text=True)
        if out.returncode != 0:
            # surface the inner Spark failure — check=True would swallow it
            sys.stderr.write(out.stdout[-4000:] + "\n" + out.stderr[-8000:] + "\n")
            raise RuntimeError(
                f"scaling run at {execs}x{cores} failed (exit {out.returncode}); "
                "stderr above"
            )
        r = json.loads(out.stdout.strip().splitlines()[-1])
        if best is None or r["elapsed_sec"] < best["elapsed_sec"]:
            best = r
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=240000)
    ap.add_argument("--n", type=int, default=1, help="small cluster size (executors)")
    ap.add_argument("--cores", type=int, default=4, help="cores per executor")
    ap.add_argument("--mem", type=int, default=6, help="GiB per executor")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--checkpoint-level", default="minimal", choices=["full", "minimal"])
    ap.add_argument("--no-pin", action="store_true", help="disable taskset CPU pinning")
    ap.add_argument("--update-baseline", action="store_true")
    args = ap.parse_args()

    pkg_zip = _make_pkg_zip()

    # generate input ONCE; both cluster sizes read the same bytes
    tmp_root = "/dev/shm" if os.path.isdir("/dev/shm") else None
    pages_dir = tempfile.mkdtemp(prefix="rkg_pages_", dir=tmp_root)
    pages_path = os.path.join(pages_dir, "pages")
    gen_code = (
        f"import sys; sys.path.insert(0, {REPO!r})\n"
        "import research_knowledge_graph_spark as rkg\n"
        "from research_knowledge_graph_spark.sources.pages import synthesize_pages, default_vocab_scale\n"
        "spark = rkg.get_spark(app_name='rkg_gen')\n"
        f"synthesize_pages(spark, {args.docs}, vocab_scale=default_vocab_scale({args.docs}))"
        f".write.mode('overwrite').parquet({pages_path!r})"
    )
    gen = subprocess.run([sys.executable, "-c", gen_code], capture_output=True, text=True)
    if gen.returncode != 0:
        # same stderr-surfacing pattern as run_at — check=True would hide it
        sys.stderr.write(gen.stdout[-4000:] + "\n" + gen.stderr[-8000:] + "\n")
        raise RuntimeError(f"pages generation failed (exit {gen.returncode}); stderr above")

    pin = not args.no_pin
    try:
        small = run_at(args.n, args.cores, args.mem, pages_path, pkg_zip,
                       args.repeats, args.checkpoint_level, pin)
        big = run_at(args.n * 4, args.cores, args.mem, pages_path, pkg_zip,
                     args.repeats, args.checkpoint_level, pin)
    finally:
        shutil.rmtree(pages_dir, ignore_errors=True)

    tp_small = args.docs / small["elapsed_sec"]
    tp_big = args.docs / big["elapsed_sec"]
    eff = tp_big / (4 * tp_small)
    # per-stage efficiency: speedup/4 per materialization boundary (taken
    # from each size's best run — stages within a run share one clock).
    # nodes/edges run on overlapped driver threads, so their wall times can
    # overlap; per-stage numbers localize WHERE scaling is lost, the
    # headline efficiency stays the end-to-end ratio.
    stage_table = {}
    for name in small.get("stages", {}):
        tn, t4 = small["stages"].get(name), big.get("stages", {}).get(name)
        # truthiness would DROP a 0.0-rounded stage — exactly the anomaly
        # (fast at one size, slow at the other) the table exists to show
        if tn is None or t4 is None:
            continue
        stage_table[name] = {
            "n_sec": tn, "4n_sec": t4,
            "efficiency": round(tn / t4 / 4, 3) if t4 > 0 else None,
        }
    result = {
        "metric": "pipeline_scaling_efficiency",
        "mode": (
            f"local-cluster, {args.cores} cores x {args.mem}g per executor, "
            f"package shipped via py-files, checkpoint_level={args.checkpoint_level}, "
            f"cpu_pinned={pin} (execs*cores+4 CPUs per run)"
        ),
        "docs": args.docs,
        "n_executors": args.n,
        "4n_executors": args.n * 4,
        "elapsed_n_sec": small["elapsed_sec"],
        "elapsed_4n_sec": big["elapsed_sec"],
        "docs_per_sec_n": round(tp_small, 1),
        "docs_per_sec_4n": round(tp_big, 1),
        "efficiency": round(eff, 3),
        "edges_n": small["edges"],
        "edges_4n": big["edges"],
        "identical_output": small["edges"] == big["edges"],
        "stages": stage_table,
    }
    print(json.dumps(result))

    if args.update_baseline:
        with open(os.path.join(REPO, "BENCH_SCALING.json"), "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
