"""BFS (at-scale) mode: same final sets as strict mode; skew/politeness/dedup
behavior; checkpoint-resume exactness."""

import numpy as np
import pyarrow.dataset as pads
import pytest


@pytest.fixture(scope="module")
def bfs_run(ray_session, t1_dir, tmp_path_factory):
    from legislation_scraper_ray.pipelines.crawl import CrawlConfig, run_crawl

    out = str(tmp_path_factory.mktemp("bfs"))
    cfg = CrawlConfig(n_seen_shards=2, fetch_concurrency=2)
    return run_crawl(t1_dir, out, cfg), out


def _docs(out):
    return pads.dataset(f"{out}/docs", partitioning="hive").to_table().to_pandas()


def _lineage(out):
    return pads.dataset(f"{out}/lineage", partitioning="hive").to_table().to_pandas()


def test_bfs_matches_simulator_sets(bfs_run, t1_dir):
    """BFS visits in different order but MUST converge to the same seen set and
    doc set (dedup is order-insensitive over a deterministic graph)."""
    from legislation_scraper_ray.oracle.simulator import simulate

    res, out = bfs_run
    sim = simulate(t1_dir)
    lin = _lineage(out)
    assert set(int(h) for h in lin["url_hash"]) == sim.seen_hashes
    docs = _docs(out)
    assert dict(zip(docs["url"], docs["caption"])) == sim.docs


def test_duplicate_links_dropped(bfs_run):
    res, out = bfs_run
    assert res.dedup_dropped > 0  # t1 plants ~20% cross-page duplicate links
    lin = _lineage(out)
    assert lin["url_hash"].nunique() == len(lin)  # no URL fetched twice


def test_politeness_spacing(bfs_run, t1_dir):
    """Per-host virtual start times must be spaced ≥ the host's robots delay."""
    import json

    with open(f"{t1_dir}/manifest.json") as f:
        delays = json.load(f)["robots_delay_ms"]
    res, out = bfs_run
    lin = _lineage(out)
    for host, grp in lin.groupby("host"):
        delay_s = delays[host] / 1000.0
        ts = np.sort(grp["scheduled_ts"].to_numpy())
        if len(ts) > 1 and delay_s > 0:
            assert np.diff(ts).min() >= delay_s - 1e-9, host


def test_cuckoo_mode_matches_exact(ray_session, t1_dir, tmp_path_factory):
    """At t1 scale the cuckoo filter should produce the identical seen set
    (FP probability ~1e-4 over ~230 URLs)."""
    from legislation_scraper_ray.pipelines.crawl import CrawlConfig, run_crawl

    out_c = str(tmp_path_factory.mktemp("cuckoo"))
    res_c = run_crawl(
        t1_dir, out_c,
        CrawlConfig(n_seen_shards=2, seen_mode="cuckoo", compute="tasks", checkpoint=False),
    )
    from legislation_scraper_ray.oracle.simulator import simulate

    sim = simulate(t1_dir)
    lin = _lineage(out_c)
    assert set(int(h) for h in lin["url_hash"]) == sim.seen_hashes


def test_resume_exactness(ray_session, t1_dir, tmp_path_factory):
    from legislation_scraper_ray.pipelines.crawl import CrawlConfig, run_crawl

    full = str(tmp_path_factory.mktemp("full"))
    part = str(tmp_path_factory.mktemp("part"))
    cfg = dict(n_seen_shards=2, compute="tasks")
    run_crawl(t1_dir, full, CrawlConfig(**cfg))
    run_crawl(t1_dir, part, CrawlConfig(**cfg, max_generations=1))
    run_crawl(t1_dir, part, CrawlConfig(**cfg), resume=True)
    a = _docs(full).sort_values("url_hash")[["url_hash", "caption", "phash"]].reset_index(drop=True)
    b = _docs(part).sort_values("url_hash")[["url_hash", "caption", "phash"]].reset_index(drop=True)
    assert a.equals(b)
    # no re-fetch of completed work: lineage url_hashes unique across the resumed run
    lin = _lineage(part)
    assert lin["url_hash"].nunique() == len(lin)


def test_pipelined_window_boundary_parity(ray_session, t1_dir, tmp_path_factory):
    """Multi-WINDOW pipelined crawl (pipeline_generations=2 over the 3-gen t1
    corpus → windows [0,1] and [2]): the window boundary re-materializes the
    frontier and accumulates counters per window; final doc/seen/error sets
    and counters must match the classic per-generation path exactly."""
    from legislation_scraper_ray.oracle.simulator import simulate
    from legislation_scraper_ray.pipelines.crawl import CrawlConfig, run_crawl

    out = str(tmp_path_factory.mktemp("pipew"))
    cfg = CrawlConfig(
        n_seen_shards=2, fetch_concurrency=2, checkpoint=False,
        pipeline_generations=2,
    )
    res = run_crawl(t1_dir, out, cfg)
    sim = simulate(t1_dir)
    lin = _lineage(out)
    assert set(int(h) for h in lin["url_hash"]) == sim.seen_hashes
    docs = _docs(out)
    assert dict(zip(docs["url"], docs["caption"])) == sim.docs
    assert res.generations == 3
    assert res.docs_written == len(sim.docs)
    # window attribution recorded per generation
    wins = {g["generation"]: tuple(g["window"]) for g in res.per_generation}
    assert wins[0] == (0, 1) and wins[2][0] == 2
