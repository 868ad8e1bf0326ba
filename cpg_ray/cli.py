"""CLI — the cpg-console / cpg-neo4j Application analog
(cpg-console/CpgConsole.kt:1-98 `:tr`/`:run`/`:export`;
cpg-neo4j/Application.kt:460-463 translate-then-push):

  python -m cpg_ray.cli translate --pages DIR --out DIR [--shards N] [--resume]
  python -m cpg_ray.cli gen --out DIR --n 10000 [--variant mixed]
  python -m cpg_ray.cli query --name q1_pricing_summary --sf-dir DIR
  python -m cpg_ray.cli stats --out DIR

Owns its Ray session (scripts own sessions; library code never does).
"""

from __future__ import annotations

import argparse
import json
import sys


def _session(num_cpus: int):
    import ray
    from ray.data import DataContext

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    DataContext.get_current().enable_progress_bars = False
    return ray


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="cpg_ray")
    p.add_argument("--num-cpus", type=int, default=8)
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("gen", help="generate a synthetic pages corpus")
    g.add_argument("--out", required=True)
    g.add_argument("--n", type=int, default=10000)
    g.add_argument("--variant", default="mixed")

    t = sub.add_parser("translate", help="pages → graph+triples (resumable)")
    t.add_argument("--pages", required=True)
    t.add_argument("--out", required=True)
    t.add_argument("--shards", type=int, default=8)
    t.add_argument("--shard-parallelism", type=int, default=2)
    t.add_argument("--resume", action="store_true")
    t.add_argument("--scale", type=int, default=1,
                   help="world scale used when the corpus was generated")

    i = sub.add_parser(
        "ingest", help="WARC archives → pages parquet (lang-filled), "
                       "ready for translate"
    )
    i.add_argument("--warc", required=True,
                   help="WARC file, directory, or glob (.warc / .warc.gz)")
    i.add_argument("--out", required=True)

    q = sub.add_parser("query", help="run a queries() entry")
    q.add_argument("--name", required=True)
    q.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    q.add_argument("--limit", type=int, default=20)

    s = sub.add_parser("stats", help="lineage/metrics of a translate run")
    s.add_argument("--out", required=True)

    c = sub.add_parser(
        "cypher", help="run an openCypher-subset string against a "
                       "translate output (console query analog)"
    )
    c.add_argument("--out", required=True, help="translate output dir")
    c.add_argument("--query", required=True)
    c.add_argument("--limit", type=int, default=20)

    k = sub.add_parser("check", help="run registered consumer checks "
                                     "over a translate output "
                                     "(console :run / RunPlugin analog)")
    k.add_argument("--out", required=True, help="translate output dir")
    k.add_argument("--plugins", default=None,
                   help="directory of third-party check modules, each "
                        "exposing register(registry); discovered at "
                        "runtime")

    x = sub.add_parser("export", help="export triples to csv/jsonl/"
                                      "N-Triples (Neo4jPlugin :export "
                                      "analog)")
    x.add_argument("--out", required=True, help="translate output dir")
    x.add_argument("--dest", required=True)
    x.add_argument("--fmt", choices=["csv", "json", "nt"], default="csv")

    args = p.parse_args(argv)
    ray = _session(args.num_cpus)
    try:
        if args.cmd == "gen":
            from cpg_ray.pagegen import cfg_for_variant, materialize_pages

            scale = max(1, args.n // 2000)
            cfg = cfg_for_variant(args.variant, scale=scale)
            path = materialize_pages(args.out, args.n, cfg, args.variant)
            print(json.dumps({"pages": args.n, "path": path, "scale": scale}))
        elif args.cmd == "translate":
            from cpg_ray.pagegen import cfg_for_variant, cfg_from_manifest
            from cpg_ray.pipelines.flagship import run_flagship

            # prefer the corpus's own manifest (dictionary scale MUST
            # match generation or linking silently degrades)
            cfg = cfg_from_manifest(args.pages)
            if cfg is None:
                print(
                    "WARNING: no world manifest in the pages dir (legacy "
                    f"cache?) — falling back to --scale {args.scale}; a "
                    "mismatched dictionary silently degrades linking",
                    file=sys.stderr,
                )
                cfg = cfg_for_variant("mixed", scale=args.scale)
            summary = run_flagship(
                args.pages, args.out, cfg, n_shards=args.shards,
                resume=args.resume,
                extract_concurrency=(1, max(2, args.num_cpus - 2)),
                shard_parallelism=args.shard_parallelism,
            )
            print(json.dumps(summary))
        elif args.cmd == "ingest":
            import glob as globmod
            import os
            import shutil

            import pyarrow.parquet as pq

            from cpg_ray.sources.warc import fill_lang, read_warc

            if any(c in args.warc for c in "*?["):
                src = sorted(globmod.glob(args.warc))
                if not src:
                    print(f"error: no WARC files match {args.warc!r}",
                          file=sys.stderr)
                    return 2
            else:
                src = args.warc
            # idempotent overwrite (same contract as translate's shard
            # writer): a retry must not append a second copy of every
            # page into the corpus
            if os.path.isdir(args.out):
                shutil.rmtree(args.out)
            fill_lang(read_warc(src)).write_parquet(args.out)
            rows = sum(
                pq.read_metadata(f).num_rows
                for f in globmod.glob(os.path.join(args.out, "*.parquet"))
            )
            print(json.dumps({"pages": rows, "out": args.out}))
        elif args.cmd == "query":
            sys.path.insert(0, ".")
            import __ray_entry__ as entry

            fn = entry.queries()[args.name]
            res = fn(args.sf_dir)
            if hasattr(res, "to_pandas"):
                res = res.to_pandas()
            print(res.head(args.limit).to_string())
        elif args.cmd == "cypher":
            import glob

            import ray.data as rd

            from cpg_ray.functions.cypher import run_cypher

            nodes = rd.read_parquet(sorted(glob.glob(
                f"{args.out}/graph/shard=*/kind=node/*.parquet"
            )))
            edges = rd.read_parquet(sorted(glob.glob(
                f"{args.out}/graph/shard=*/kind=edge/*.parquet"
            )))
            df = run_cypher(args.query, nodes, edges)
            print(df.head(args.limit).to_string())
        elif args.cmd == "stats":
            from cpg_ray.stages.materialize import read_lineage

            rows = read_lineage(args.out, "graph") + read_lineage(
                args.out, "triples"
            )
            for r in rows:
                print(json.dumps(r))
        elif args.cmd == "check":
            from cpg_ray.pipelines.checks import default_registry

            reg = default_registry()
            if args.plugins:
                loaded = reg.discover(args.plugins)
                print(f"discovered {len(loaded)} plugin module(s)",
                      file=sys.stderr)
            report = reg.run(args.out)
            for r in report.itertuples():
                print(json.dumps({"check": r.check, "ok": r.ok,
                                  "detail": r.detail,
                                  "source": r.source}))
            return 0 if report.ok.all() else 1
        elif args.cmd == "export":
            import glob

            import ray.data as rd

            files = sorted(
                glob.glob(f"{args.out}/triples/shard=*/*.parquet")
            )
            ds = rd.read_parquet(files)
            if args.fmt == "csv":
                ds.write_csv(args.dest)
                n = ds.count()
            elif args.fmt == "json":
                ds.write_json(args.dest)
                n = ds.count()
            else:  # N-Triples (W3C interchange; sources/rdf.py)
                from .sources.rdf import export_ntriples

                n = export_ntriples(ds, args.dest)["lines"]
            print(json.dumps({"exported_rows": n,
                              "dest": args.dest, "fmt": args.fmt}))
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
