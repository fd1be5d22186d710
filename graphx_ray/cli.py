"""CLI entry points (SURVEY.md §3) — the ``ray job submit`` surface.

    python -m graphx_ray gen         --out DIR --convs N [--seed S]
    python -m graphx_ray build-graph --input DIR --out DIR [--zone-width S]
                                     [--delta S] [--parts P]
    python -m graphx_ray run-algo {pagerank|cc|lpa|triangles|sssp}
                                     --edges DIR --out DIR [--parts P]
                                     [--max-iter K] [--alpha A] [--tol T]
                                     [--checkpoint DIR] [--resume]
                                     [--salt-threshold S] [--landmarks v1,v2]

The same driver runs unchanged on any cluster size: parallelism comes from
``--parts`` (default: cluster CPUs) and Ray's scheduler; no code change
between N and 4N nodes (north_rule). Owns its Ray session (CLI only —
library code never calls ray.init).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="graphx_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("gen", help="deterministic synthetic transcripts")
    g.add_argument("--out", required=True)
    g.add_argument("--convs", type=int, required=True)
    g.add_argument("--seed", type=int, default=42)
    g.add_argument("--hours", type=int, default=168)

    b = sub.add_parser("build-graph", help="transcripts → vertices+edges")
    b.add_argument("--input", required=True)
    b.add_argument("--out", required=True)
    b.add_argument("--zone-width", type=int, default=3600)
    b.add_argument("--delta", type=int, default=900)
    b.add_argument("--parts", type=int, default=None)

    r = sub.add_parser("run-algo", help="iterative algorithms over an edge table")
    r.add_argument(
        "algo",
        choices=["pagerank", "pagerank-tol", "ppr", "cc", "lpa", "triangles",
                 "sssp", "bfs", "scc"],
    )
    r.add_argument("--edges", required=True)
    r.add_argument("--vertices", default=None)
    r.add_argument("--out", required=True)
    r.add_argument("--parts", type=int, default=None)
    r.add_argument("--max-iter", type=int, default=20)
    r.add_argument("--alpha", type=float, default=0.15)
    r.add_argument("--tol", type=float, default=None)
    r.add_argument("--checkpoint", default=None)
    r.add_argument("--resume", action="store_true")
    r.add_argument("--salt-threshold", type=int, default=None)
    r.add_argument("--landmarks", default=None, help="comma-separated vids (sssp)")
    r.add_argument("--source", type=int, default=None, help="source vid (ppr/bfs)")
    r.add_argument("--dtype", default="float64", choices=["float64", "float32"],
                   help="pagerank rank/message dtype (float32 = throughput mode)")

    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    import ray.data as rd

    from graphx_ray.context import ensure_hash_shuffle, quiet

    quiet()
    ensure_hash_shuffle()
    t0 = time.time()

    if args.cmd == "gen":
        from graphx_ray.sources.synth import write_transcripts

        write_transcripts(args.out, args.convs, seed=args.seed, n_hours=args.hours)
        print(json.dumps({"cmd": "gen", "out": args.out, "sec": round(time.time() - t0, 1)}))

    elif args.cmd == "build-graph":
        from graphx_ray.stages.derive import build_graph

        kw = {"num_partitions": args.parts} if args.parts else {}
        verts, edges = build_graph(
            rd.read_parquet(args.input),
            zone_width_s=args.zone_width,
            delta_s=args.delta,
            stage_dir=args.out,
            **kw,
        )
        edges.write_parquet(f"{args.out}/edges")
        verts.write_parquet(f"{args.out}/vertices")
        print(json.dumps({"cmd": "build-graph", "out": args.out, "sec": round(time.time() - t0, 1)}))

    else:
        from graphx_ray.pipelines.graph import Graph

        edges = rd.read_parquet(args.edges)
        verts = rd.read_parquet(args.vertices) if args.vertices else None
        g = Graph(
            edges, verts, num_parts=args.parts, salt_threshold=args.salt_threshold
        )
        try:
            if args.algo == "pagerank":
                res = g.pagerank(
                    alpha=args.alpha,
                    max_iter=args.max_iter,
                    tol=args.tol,
                    checkpoint_dir=args.checkpoint,
                    resume=args.resume,
                    output_path=args.out,
                    dtype=args.dtype,
                )
            elif args.algo == "pagerank-tol":
                res = g.pagerank_tol(
                    args.tol if args.tol is not None else 1e-6,
                    alpha=args.alpha,
                    output_path=args.out,
                )
            elif args.algo == "ppr":
                if args.source is None:
                    raise SystemExit("--source required for ppr")
                res = g.personalized_pagerank(
                    args.source, alpha=args.alpha, max_iter=args.max_iter,
                    output_path=args.out,
                )
            elif args.algo == "bfs":
                if args.source is None:
                    raise SystemExit("--source required for bfs")
                res = g.bfs(args.source, output_path=args.out)
            elif args.algo == "scc":
                res = g.strongly_connected_components(output_path=args.out)
            elif args.algo == "cc":
                res = g.connected_components(
                    checkpoint_dir=args.checkpoint, resume=args.resume, output_path=args.out
                )
            elif args.algo == "lpa":
                res = g.label_propagation(
                    max_iter=args.max_iter,
                    checkpoint_dir=args.checkpoint,
                    resume=args.resume,
                    output_path=args.out,
                )
            elif args.algo == "triangles":
                import pyarrow as pa
                import pyarrow.parquet as pq

                # triangle_count streams a Dataset now; one small arrow
                # collect is fine for the CLI's single-file output contract
                ds = g.triangle_count()
                tbl = pa.Table.from_pandas(ds.to_pandas(), preserve_index=False)
                pq.write_table(tbl, f"{args.out}.parquet") if not args.out.endswith(
                    ".parquet"
                ) else pq.write_table(tbl, args.out)
                res = tbl
            else:  # sssp
                lms = [int(x) for x in (args.landmarks or "").split(",") if x]
                res = g.shortest_paths(lms, max_iter=args.max_iter,
                                       output_path=args.out)
        finally:
            g.close()
        n = res.count() if hasattr(res, "count") and callable(res.count) else len(res)
        try:
            n = int(n)
        except TypeError:
            n = res.num_rows
        print(
            json.dumps(
                {"cmd": args.cmd, "algo": args.algo, "rows": n, "sec": round(time.time() - t0, 1)}
            )
        )

    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
