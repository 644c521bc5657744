"""robots.txt path-Disallow enforcement: disallowed URLs are never fetched,
never enter the seen set, and the engine's final sets match the simulator
running the same rules — on both the pipelined fast path and strict order."""

import pyarrow.dataset as pads
import pytest

RULES = {"host0.legis.example": ("/doc/1990/lei/",)}


def _lineage(out):
    return pads.dataset(f"{out}/lineage", partitioning="hive").to_table().to_pandas()


def _docs(out):
    return pads.dataset(f"{out}/docs", partitioning="hive").to_table().to_pandas()


@pytest.fixture(scope="module")
def sim_blocked(t1_dir):
    from legislation_scraper_ray.oracle.simulator import simulate

    return simulate(t1_dir, robots_disallow=RULES)


def test_robots_strict_parity(ray_session, t1_dir, tmp_path_factory, sim_blocked):
    from legislation_scraper_ray.pipelines.crawl import CrawlConfig, run_crawl

    out = str(tmp_path_factory.mktemp("robots_strict"))
    cfg = CrawlConfig(
        n_seen_shards=2, seen_mode="exact", fetch_concurrency=2,
        order="strict", compute="tasks", checkpoint=False,
        robots_disallow=RULES,
    )
    res = run_crawl(t1_dir, out, cfg)
    sim = sim_blocked
    assert len(sim.robots_blocked) > 0  # the rule actually bites on t1
    lin = _lineage(out)
    engine_seen = set(int(h) for h in lin["url_hash"])
    assert engine_seen == sim.seen_hashes
    # no blocked URL was ever fetched: their hashes are absent from lineage
    from legislation_scraper_ray.functions.hashing import fnv1a64_bytes

    for u in sim.robots_blocked:
        assert fnv1a64_bytes(u.encode()) not in engine_seen
    docs = _docs(out)
    assert dict(zip(docs["url"], docs["caption"])) == sim.docs
    assert res.robots_blocked >= len(sim.robots_blocked)
    assert res.docs_written == len(sim.docs)


def test_robots_pipelined_sets_match_strict(ray_session, t1_dir, tmp_path_factory,
                                            sim_blocked):
    """The pipelined fast path enforces the same rules (final SETS equal)."""
    from legislation_scraper_ray.pipelines.crawl import CrawlConfig, run_crawl

    out = str(tmp_path_factory.mktemp("robots_fast"))
    cfg = CrawlConfig(
        n_seen_shards=2, seen_mode="exact", fetch_concurrency=2,
        checkpoint=False, robots_disallow=RULES,
    )
    res = run_crawl(t1_dir, out, cfg)
    sim = sim_blocked
    lin = _lineage(out)
    assert set(int(h) for h in lin["url_hash"]) == sim.seen_hashes
    docs = _docs(out)
    assert dict(zip(docs["url"], docs["caption"])) == sim.docs
    assert res.robots_blocked >= len(sim.robots_blocked)


def test_no_rules_unchanged(ray_session, t1_dir, tmp_path_factory):
    """robots_disallow=None leaves the crawl byte-identical to before."""
    from legislation_scraper_ray.pipelines.crawl import CrawlConfig, run_crawl

    out = str(tmp_path_factory.mktemp("robots_off"))
    res = run_crawl(t1_dir, out, CrawlConfig(
        n_seen_shards=2, fetch_concurrency=2, checkpoint=False))
    assert res.robots_blocked == 0
    assert res.docs_written == 200 and res.fetched_ok == 226


def test_rules_lifted_recrawl_fetches_blocked(ray_session, t1_dir, tmp_path_factory):
    """Blocked URLs never enter the seen set, so when the rule is lifted a
    delta recrawl seeded with those URLs ingests exactly the
    previously-disallowed docs (re-seeding is required — their parent
    listings ARE seen, so BFS alone cannot rediscover them)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from legislation_scraper_ray.oracle.simulator import simulate
    from legislation_scraper_ray.pipelines.crawl import CrawlConfig, run_crawl

    out = str(tmp_path_factory.mktemp("robots_lift"))
    first = run_crawl(t1_dir, out, CrawlConfig(
        n_seen_shards=2, seen_mode="exact", fetch_concurrency=2,
        robots_disallow=RULES))
    g = pq.read_table(f"{t1_dir}/web_graph.parquet")
    host, prefix = next(iter(RULES.items()))
    mask = pc.starts_with(g["url"], f"https://{host}{prefix[0]}")
    blocked_rows = g.filter(mask)
    n = blocked_rows.num_rows
    assert n > 0
    seeds = pa.table(
        {
            "url": blocked_rows["url"],
            "host": blocked_rows["host"],
            "year": blocked_rows["year"],
            "situation": blocked_rows["situation"],
            "type": blocked_rows["type"],
            "priority": pa.array(np.zeros(n, np.float32)),
        }
    )
    second = run_crawl(t1_dir, out, CrawlConfig(
        n_seen_shards=2, seen_mode="exact", fetch_concurrency=2,
    ), recrawl=True, frontier_override=seeds)
    assert second.robots_blocked == 0
    full = simulate(t1_dir)
    blocked = simulate(t1_dir, robots_disallow=RULES)
    # the delta ingest is exactly the doc set the rule had excluded
    assert second.docs_written == len(full.docs) - len(blocked.docs) > 0
    assert first.docs_written + second.docs_written == len(full.docs)
