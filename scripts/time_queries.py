"""Wall-time sweep of every queries() entry at a given sf_dir — the
find-the-outlier feedback loop behind bench tuning (run at sf0.1; anything
that stands out gets a ds.stats() look).

Usage: python scripts/time_queries.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = set(sys.argv[2:])
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    rows = []
    for name, fn in e.queries().items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            res = fn(sf_dir)
            # consume lazy results so the timing covers execution
            if isinstance(res, ray.data.Dataset):
                res = res.to_pandas()
            n = len(res)
            err = ""
        except Exception as ex:  # keep sweeping
            n, err = -1, f"{type(ex).__name__}: {ex}"
        dt = time.perf_counter() - t0
        rows.append((dt, name, n, err))
        print(f"{dt:7.2f}s  {name}  ({n} rows) {err}", flush=True)
    rows.sort(reverse=True)
    print("\nslowest 15:")
    for dt, name, n, err in rows[:15]:
        print(f"{dt:7.2f}s  {name}")
    ray.shutdown()


if __name__ == "__main__":
    main()
