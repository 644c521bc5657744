import pyarrow.dataset as pads
import pytest


def test_priority_budgeted_frontier(ray_session, t1_dir, tmp_path_factory):
    """Priority-frontier pop: with a per-generation budget the crawl takes more
    generations, fetches the highest-priority URLs first, and converges to the
    exact same final doc set."""
    from legislation_scraper_ray.oracle.simulator import simulate
    from legislation_scraper_ray.pipelines.crawl import CrawlConfig, run_crawl

    out = str(tmp_path_factory.mktemp("budget"))
    res = run_crawl(
        t1_dir, out,
        CrawlConfig(n_seen_shards=2, compute="tasks", checkpoint=False,
                    frontier_budget=50, max_generations=64),
    )
    assert res.generations > 3  # budget forces more, smaller generations
    for g in res.per_generation:
        assert g["frontier"] <= 50
    sim = simulate(t1_dir)
    docs = pads.dataset(f"{out}/docs", partitioning="hive").to_table().to_pandas()
    assert dict(zip(docs["url"], docs["caption"])) == sim.docs
    lin = pads.dataset(f"{out}/lineage", partitioning="hive").to_table().to_pandas()
    assert set(int(h) for h in lin["url_hash"]) == sim.seen_hashes
