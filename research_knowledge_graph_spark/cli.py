"""CLI — the reference's Typer surface (``src/main.py``: ingest / query /
visualize) rebuilt on argparse over the distributed pipeline.

    python -m research_knowledge_graph_spark.cli ingest --input pages.parquet --workdir /tmp/kg
    python -m research_knowledge_graph_spark.cli ingest --synthetic 10000 --workdir /tmp/kg
    python -m research_knowledge_graph_spark.cli query --workdir /tmp/kg --type influence
    python -m research_knowledge_graph_spark.cli visualize --workdir /tmp/kg --root <node_id> --out graph.html
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="rkg-spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_ing = sub.add_parser("ingest", help="run the KG-construction pipeline")
    p_ing.add_argument("--input", help="pages parquet path (url, warc_ts, html, text, lang)")
    p_ing.add_argument("--synthetic", type=int, help="generate N synthetic pages instead")
    p_ing.add_argument("--workdir", required=True)
    p_ing.add_argument("--mode", default="heuristic", choices=["heuristic", "fixture"])
    p_ing.add_argument("--canonicalize", default="exact", choices=["exact", "fuzzy"])
    p_ing.add_argument("--no-cross-link", action="store_true")

    p_inc = sub.add_parser(
        "ingest-batch",
        help="incrementally ingest one batch of new pages into an existing graph",
    )
    p_inc.add_argument("--input", help="pages parquet path for THIS batch")
    p_inc.add_argument("--synthetic", type=int, help="generate N synthetic pages instead")
    p_inc.add_argument("--workdir", required=True)
    p_inc.add_argument("--batch-id", required=True)
    p_inc.add_argument("--mode", default="heuristic", choices=["heuristic", "fixture"])
    p_inc.add_argument("--no-cross-link", action="store_true")

    p_str = sub.add_parser(
        "ingest-stream",
        help="drain newly-landed page files through the incremental pipeline "
        "(foreachBatch; exactly-once per file; re-run whenever files arrive)",
    )
    p_str.add_argument("--input-dir", required=True, help="directory page parquet files land in")
    p_str.add_argument("--workdir", required=True, help="graph directory (TableIO root)")
    p_str.add_argument("--checkpoint-dir", required=True, help="stream checkpoint location")
    p_str.add_argument("--mode", default="heuristic", choices=["heuristic", "fixture"])

    p_q = sub.add_parser("query", help="query the materialized graph")
    p_q.add_argument("--workdir", required=True)
    p_q.add_argument(
        "--type", required=True,
        choices=["counts", "influence", "neighbors", "similar", "bfs"],
    )
    p_q.add_argument("--node-id")
    p_q.add_argument("--k", type=int, default=20)

    p_v = sub.add_parser("visualize", help="render a bounded subgraph to HTML")
    p_v.add_argument("--workdir", required=True)
    p_v.add_argument("--root", required=True)
    p_v.add_argument("--out", default="graph.html")
    p_v.add_argument("--depth", type=int, default=2)

    args = ap.parse_args(argv)

    from research_knowledge_graph_spark.session import get_spark
    from research_knowledge_graph_spark.sources.table_io import TableIO

    spark = get_spark(app_name=f"rkg_cli_{args.cmd}")

    if args.cmd == "ingest":
        from research_knowledge_graph_spark.plans.pipeline import run_pipeline
        from research_knowledge_graph_spark.sources.pages import (
            default_vocab_scale,
            synthesize_pages,
        )

        if args.synthetic:
            pages = synthesize_pages(
                spark, args.synthetic, vocab_scale=default_vocab_scale(args.synthetic)
            )
        elif args.input:
            pages = spark.read.parquet(args.input)
        else:
            ap.error("ingest needs --input or --synthetic")
        res = run_pipeline(
            spark, pages, args.workdir, mode=args.mode,
            cross_link=not args.no_cross_link, canonicalize=args.canonicalize,
        )
        print(f"nodes={res.nodes.count()} edges={res.edges.count()}")
        res.lineage.orderBy("committed_at").show(truncate=False)
        return 0

    if args.cmd == "ingest-batch":
        from research_knowledge_graph_spark.plans.pipeline import (
            run_pipeline_incremental,
        )
        from research_knowledge_graph_spark.sources.pages import (
            default_vocab_scale,
            synthesize_pages,
        )

        if args.synthetic:
            pages = synthesize_pages(
                spark, args.synthetic, vocab_scale=default_vocab_scale(args.synthetic)
            )
        elif args.input:
            pages = spark.read.parquet(args.input)
        else:
            ap.error("ingest-batch needs --input or --synthetic")
        res = run_pipeline_incremental(
            spark, pages, args.workdir, args.batch_id, mode=args.mode,
            cross_link=not args.no_cross_link,
        )
        print(f"nodes={res.nodes.count()} edges={res.edges.count()}")
        return 0

    if args.cmd == "ingest-stream":
        from research_knowledge_graph_spark.streaming.ingest import (
            run_streaming_graph_ingest,
        )

        run_streaming_graph_ingest(
            spark, args.input_dir, args.workdir, args.checkpoint_dir, mode=args.mode
        )
        io = TableIO(spark, args.workdir)
        try:
            print(
                f"nodes={io.read('nodes').count()} edges={io.read('edges_all').count()}"
            )
        except FileNotFoundError:
            # nothing landed yet (and no prior batch ever committed) —
            # a clean zero summary, not a traceback
            print("nodes=0 edges=0 (no input files processed yet)")
        return 0

    io = TableIO(spark, args.workdir)
    nodes, edges = io.read("nodes"), io.read("edges_all")

    if args.cmd == "query":
        from research_knowledge_graph_spark.operators import graph_queries as G

        if args.type == "counts":
            nodes.groupBy("node_type").count().show()
            edges.groupBy("edge_type").count().show()
        elif args.type == "influence":
            G.influence_topk(
                nodes, edges, "concept", ["INTRODUCES", "USES_CONCEPT"], args.k
            ).show(args.k, truncate=False)
        elif args.type == "neighbors":
            G.neighbors_out(nodes, edges, from_node_id=args.node_id).show(50, truncate=False)
        elif args.type == "similar":
            G.similar_union(nodes, edges, args.node_id).show(50, truncate=False)
        elif args.type == "bfs":
            G.bfs_subgraph(nodes, edges, args.node_id, max_depth=2).show(50)
        return 0

    if args.cmd == "visualize":
        from research_knowledge_graph_spark.operators.visualize import (
            render_subgraph_html,
        )

        path = render_subgraph_html(nodes, edges, args.root, args.out, args.depth)
        print(f"wrote {path}")
        return 0
    return 1


if __name__ == "__main__":
    sys.exit(main())
