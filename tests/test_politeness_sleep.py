import time

import pytest


def test_sleep_mode_paces_wall_clock(ray_session, t1_dir, tmp_path_factory):
    """politeness_mode='sleep': the crawl's wall time must respect the hosts'
    virtual schedule (per-host spacing enforced against the real clock)."""
    import json

    from legislation_scraper_ray.pipelines.crawl import CrawlConfig, run_crawl

    with open(f"{t1_dir}/manifest.json") as f:
        delays = json.load(f)["robots_delay_ms"]

    out = str(tmp_path_factory.mktemp("sleepmode"))
    t0 = time.monotonic()
    res = run_crawl(
        t1_dir, out,
        CrawlConfig(n_seen_shards=2, compute="tasks", checkpoint=False,
                    politeness_mode="sleep"),
    )
    wall = time.monotonic() - t0
    # expected makespan ≈ busiest host's fetch count × its delay
    import pyarrow.dataset as pads

    lin = pads.dataset(f"{out}/lineage", partitioning="hive").to_table().to_pandas()
    expected = max(
        len(g) * delays[h] / 1000.0 for h, g in lin.groupby("host")
    )
    assert wall >= expected * 0.8  # really slept (virtual mode finishes much faster)
    assert res.docs_written == 200
