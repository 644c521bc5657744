"""CLI entry point — the engine's ``main.py`` equivalent.

The reference is driven by ``python main.py`` over a declarative scraper
registry (reference: main.py:59-365).  Here:

    python -m legislation_scraper_ray.cli crawl --scale t2 --out /tmp/crawl
    python -m legislation_scraper_ray.cli crawl --corpus-dir DIR --resume
    python -m legislation_scraper_ray.cli consolidate --crawl-out /tmp/crawl \
        --corpus-dir DIR --out /tmp/final
    python -m legislation_scraper_ray.cli query q1_agg --sf-dir /root/testdata/sf0.01

This module owns its Ray session (guarded init + shutdown); library code never
calls ray.init.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="legislation_scraper_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("crawl", help="run the distributed crawl")
    c.add_argument("--scale", default=None, help="synthetic corpus scale (t1|t2|bench)")
    c.add_argument("--corpus-dir", default=None, help="existing corpus directory")
    c.add_argument("--out", default="/tmp/lsr_crawl")
    c.add_argument("--resume", action="store_true")
    c.add_argument("--recrawl", action="store_true",
                   help="incremental delta crawl: restore the seen set from "
                        "the completed crawl's checkpoint, seed fresh (fetch "
                        "only never-seen URLs, e.g. after adding --sources)")
    c.add_argument("--order", default="bfs", choices=["bfs", "strict"])
    c.add_argument("--seen-mode", default="cuckoo", choices=["cuckoo", "exact"])
    c.add_argument("--politeness", default="virtual", choices=["virtual", "sleep"])
    c.add_argument("--frontier-budget", type=int, default=None)
    c.add_argument("--host-affinity", action="store_true",
                   help="S6 sequential-protocol mode: one fetch unit per host")
    c.add_argument("--sources", default=None,
                   help="comma-separated registered source names (e.g. "
                        "synthetic,rest) crawled as one union frontier; each "
                        "uses its own generated corpus at --scale")
    c.add_argument("--num-cpus", type=int, default=8)

    k = sub.add_parser("consolidate", help="dedup + normalize crawl output")
    k.add_argument("--crawl-out", required=True)
    k.add_argument("--corpus-dir", required=True)
    k.add_argument("--out", required=True)
    k.add_argument("--num-cpus", type=int, default=8)

    q = sub.add_parser("query", help="run a registered query")
    q.add_argument("name")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    q.add_argument("--num-cpus", type=int, default=8)

    for s in (c, k, q):
        s.add_argument(
            "--address", default=None,
            help="Ray cluster address (default: $RAY_ADDRESS or a fresh "
                 "local session).  Under `ray job submit` leave unset — the "
                 "job runtime exports RAY_ADDRESS and the CLI joins the "
                 "cluster instead of nesting a local one.")

    args = p.parse_args(argv)

    import os

    import ray

    if not ray.is_initialized():
        address = args.address or os.environ.get("RAY_ADDRESS") or "local"
        kwargs = dict(
            address=address,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
        if address == "local":  # num_cpus is only valid when starting a session
            kwargs["num_cpus"] = args.num_cpus
        ray.init(**kwargs)
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    try:
        if args.cmd == "crawl":
            from .pipelines.crawl import CrawlConfig, run_crawl
            from .sources.corpus import generate

            corpus_dir = args.corpus_dir or generate(args.scale or "t1")
            cfg = CrawlConfig(
                order=args.order,
                seen_mode=args.seen_mode,
                politeness_mode=args.politeness,
                frontier_budget=args.frontier_budget,
                host_affinity=args.host_affinity,
            )
            sources = None
            if args.sources:
                from .sources.base import REGISTRY
                from .sources.corpus import (
                    generate_b64, generate_browser, generate_form, generate_rest,
                    generate_speculative,
                )

                scale = args.scale or "t1"
                dirs = {
                    "synthetic": lambda: generate(scale),
                    "rest": lambda: generate_rest(scale),
                    "form": lambda: generate_form(scale),
                    "paged": lambda: generate_speculative(scale),
                    "b64": lambda: generate_b64(scale),
                    "browser": lambda: generate_browser(scale),
                }
                sources = [REGISTRY[n](dirs[n]()) for n in args.sources.split(",")]
            res = run_crawl(corpus_dir, args.out, cfg, resume=args.resume,
                            sources=sources, recrawl=args.recrawl)
            print(json.dumps({k: v for k, v in res.__dict__.items() if k != "stats"},
                             default=str))
        elif args.cmd == "consolidate":
            from .pipelines.consolidate import consolidate

            ds = consolidate(args.crawl_out, args.corpus_dir, args.out)
            print(json.dumps({"rows": ds.count(), "out": args.out}))
        elif args.cmd == "query":
            from .pipelines.queries import QUERIES

            out = QUERIES[args.name](args.sf_dir)
            if hasattr(out, "to_pandas"):
                out = out.to_pandas()
            print(out.head(20).to_string())
            print(f"... {len(out)} rows")
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
