"""Interleaved A/B wall-clock adjudicator — the ONLY accepted evidence for
performance-regression or speedup claims on this multi-tenant box (CLAUDE.md
r4: identical 30 s runs vary 2-3x minute-to-minute from steal spikes, so
sequential before/after samples routinely "prove" regressions that do not
exist; r3-vs-r4's phantom crawl regression was adjudicated exactly this way).

Method: check the OLD ref out into a git worktree, then alternate
subprocess legs old/new/old/new on the same box — each leg a fresh
``ray.init`` session with ``cwd=<tree>`` so Ray workers import that tree's
package.  Steal spikes then hit both sides with equal probability, and the
paired per-round deltas (plus min-vs-min across the whole run) isolate the
engine's contribution.

Usage:
    python scripts/ab_bench.py --old HEAD~1 --target query:link_triangles
    python scripts/ab_bench.py --old <ref> --new <ref> --target query:ann_topk \
        --sf-dir /root/testdata/sf0.1 --pairs 3 --num-cpus 32
    python scripts/ab_bench.py --old <ref> --target bench --metric crawl

Targets:
    query:<name>  one QUERIES registry entry; per leg: one UNTIMED warm run
                  (worker spawn, page cache) then one timed run.
    bench         the tree's own ``python bench.py`` (~60 s/leg); --metric
                  picks a key out of its JSON line ("value", "crawl", or any
                  queries.* name).

Caveats: both trees share /tmp/graft_corpus fixtures — if the refs differ in
corpus.py/codec.py/hashing.py, delete the cache between legs yourself (the
harness will not, to keep legs cheap).  Worktrees live under
/tmp/ab_trees/<sanitized-ref> and are reused across invocations.
"""

from __future__ import annotations

import argparse
import json
import re
import statistics
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

QUERY_LEG = r"""
import json, sys, time
import ray
ray.init(address="local", num_cpus={num_cpus}, include_dashboard=False,
         logging_level="ERROR")
import ray.data
ray.data.DataContext.get_current().enable_progress_bars = False
from legislation_scraper_ray.pipelines.queries import QUERIES

def once():
    out = QUERIES[{name!r}]({sf!r})
    if hasattr(out, "to_pandas"):
        out = out.to_pandas()
    return len(out)

once()  # warm: cold worker spawn + page cache, untimed
t0 = time.perf_counter()
rows = once()
print("ABLEG " + json.dumps({{"wall": round(time.perf_counter() - t0, 3),
                              "rows": rows}}))
ray.shutdown()
"""


def _worktree(ref: str) -> Path:
    """Materialize (or reuse) a detached worktree for ``ref``."""
    safe = re.sub(r"[^A-Za-z0-9_.-]", "_", ref)
    sha = subprocess.run(["git", "rev-parse", ref], cwd=REPO, check=True,
                         capture_output=True, text=True).stdout.strip()
    tree = Path("/tmp/ab_trees") / f"{safe}_{sha[:12]}"
    if not (tree / "legislation_scraper_ray").exists():
        tree.parent.mkdir(parents=True, exist_ok=True)
        subprocess.run(["git", "worktree", "prune"], cwd=REPO, check=True)
        subprocess.run(["git", "worktree", "add", "--detach", str(tree), sha],
                       cwd=REPO, check=True)
    return tree


def _run_leg(tree: Path, args, env_extra: dict | None = None) -> dict:
    if args.target.startswith("query:"):
        code = QUERY_LEG.format(num_cpus=args.num_cpus,
                                name=args.target.split(":", 1)[1],
                                sf=args.sf_dir)
        cmd = [sys.executable, "-c", code]
    elif args.target == "bench":
        cmd = [sys.executable, "bench.py"]
    else:
        raise SystemExit(f"unknown target {args.target!r}")
    p = subprocess.run(cmd, cwd=tree, capture_output=True, text=True,
                       timeout=1800)
    if p.returncode != 0:
        print(p.stdout[-2000:], file=sys.stderr)
        print(p.stderr[-2000:], file=sys.stderr)
        raise SystemExit(f"leg failed in {tree} (rc={p.returncode})")
    for ln in reversed(p.stdout.splitlines()):
        if args.target == "bench" and ln.startswith("{"):
            d = json.loads(ln)
            wall = (d["value"] if args.metric == "value"
                    else d["queries"][args.metric])
            return {"wall": wall, "raw": d}
        if ln.startswith("ABLEG "):
            return json.loads(ln[len("ABLEG "):])
    raise SystemExit(f"leg in {tree} produced no result line")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--old", required=True, help="git ref for the A side")
    ap.add_argument("--new", default=None,
                    help="git ref for the B side (default: current tree as-is)")
    ap.add_argument("--target", required=True,
                    help="query:<name> or bench")
    ap.add_argument("--metric", default="crawl",
                    help="for --target bench: 'value', 'crawl', or a query key")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--pairs", type=int, default=3)
    ap.add_argument("--num-cpus", type=int, default=32)
    args = ap.parse_args()

    old_tree = _worktree(args.old)
    new_tree = _worktree(args.new) if args.new else REPO

    legs: dict[str, list[float]] = {"old": [], "new": []}
    rows: dict[str, int | None] = {}
    for i in range(args.pairs):
        for side, tree in (("old", old_tree), ("new", new_tree)):
            r = _run_leg(tree, args)
            legs[side].append(float(r["wall"]))
            rows.setdefault(side, r.get("rows"))
            print(f"pair {i + 1} {side:3s} ({tree.name}): {r['wall']:.3f} s",
                  flush=True)

    if rows.get("old") is not None and rows["old"] != rows["new"]:
        print(f"WARNING: row counts differ old={rows['old']} "
              f"new={rows['new']} — the comparison is not like-for-like")

    o, n = legs["old"], legs["new"]
    med_o, med_n = statistics.median(o), statistics.median(n)
    deltas = [b - a for a, b in zip(o, n)]  # paired: same-round box state
    verdict = "parity-within-noise"
    # call a real difference only when every paired round agrees on the sign
    # AND the medians differ by more than the larger side's own spread
    spread = max(max(o) - min(o), max(n) - min(n))
    if all(d < 0 for d in deltas) and (med_o - med_n) > spread / 2:
        verdict = "new-faster"
    elif all(d > 0 for d in deltas) and (med_n - med_o) > spread / 2:
        verdict = "new-slower"
    out = {
        "target": args.target,
        "old": {"ref": args.old, "samples": o, "median": round(med_o, 3),
                "min": round(min(o), 3)},
        "new": {"ref": args.new or "WORKTREE", "samples": n,
                "median": round(med_n, 3), "min": round(min(n), 3)},
        "paired_deltas": [round(d, 3) for d in deltas],
        "median_ratio_new_over_old": round(med_n / med_o, 3) if med_o else None,
        "verdict": verdict,
        "sf": args.sf_dir,
        "num_cpus": args.num_cpus,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
