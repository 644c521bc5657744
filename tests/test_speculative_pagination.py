"""Speculative (grow-until-empty) pagination: listings reveal NO total — the
frontier must keep probing one page per wave until an empty page, so wave
fan-out is bounded by discovery, not by a count probe (reference:
espirito_santo.py:238-269, minas_gerais.py:222-252).  VERDICT r2 item 6: the
probe-loop shape was never exercised (all prior corpora publish complete
out-link sets after a count probe)."""

import json

import numpy as np
import pyarrow.dataset as pads
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def spec_dir():
    from legislation_scraper_ray.sources.corpus import generate_speculative

    return generate_speculative("t1")


def test_corpus_reveals_no_total(spec_dir):
    """Structural guard: no listing page links more than ONE other listing
    page (the next probe) — if page 1 fanned out to all pages, the probe loop
    would never be exercised."""
    g = pq.read_table(f"{spec_dir}/web_graph.parquet")
    kind_by_url = dict(zip(g["url"].to_pylist(), g["kind"].to_pylist()))
    chain_lens = []
    for url, kind, links in zip(
        g["url"].to_pylist(), g["kind"].to_pylist(), g["out_links"].to_pylist()
    ):
        if kind != "listing":
            continue
        listing_links = [u for u in links if kind_by_url.get(u) == "listing"]
        assert len(listing_links) <= 1, url
        chain_lens.append(len(links))
    assert min(chain_lens) == 0  # the empty terminal page exists


def test_bfs_probe_parity(ray_session, spec_dir, tmp_path_factory):
    """BFS crawl over the speculative corpus must converge to the simulator's
    exact seen/doc/error sets, and must have needed MORE generations than the
    probe-fanout corpus (one wave per probed page — discovery-bounded)."""
    from legislation_scraper_ray.oracle.simulator import simulate
    from legislation_scraper_ray.pipelines.crawl import CrawlConfig, run_crawl

    out = str(tmp_path_factory.mktemp("spec_bfs"))
    res = run_crawl(
        spec_dir, out,
        CrawlConfig(n_seen_shards=2, seen_mode="exact", compute="tasks", checkpoint=False),
    )
    sim = simulate(spec_dir)
    lin = pads.dataset(f"{out}/lineage", partitioning="hive").to_table().to_pandas()
    assert set(int(h) for h in lin["url_hash"]) == sim.seen_hashes
    docs = pads.dataset(f"{out}/docs", partitioning="hive").to_table().to_pandas()
    assert dict(zip(docs["url"], docs["caption"])) == sim.docs
    assert res.docs_written == len(sim.docs)
    # the t1 probe-fanout corpus crawls in 3 generations; the chain corpus
    # must probe one extra generation per page beyond page 1 (+ empty page)
    g = pq.read_table(f"{spec_dir}/web_graph.parquet")
    pages = [u for u, k in zip(g["url"].to_pylist(), g["kind"].to_pylist()) if k == "listing"]
    max_pages = max(
        int(u.split("pagina=")[1]) for u in pages
    )
    assert res.generations >= max_pages  # one probe wave per page
    assert res.generations > 3


def test_probe_parity_across_pipeline_windows(ray_session, spec_dir, tmp_path_factory):
    """A 2-generation pipeline window forces the deep probe chain to span
    MULTIPLE streaming windows — the window boundary (materialized leftover
    frontier → next window's first segment) must be lossless."""
    from legislation_scraper_ray.oracle.simulator import simulate
    from legislation_scraper_ray.pipelines.crawl import CrawlConfig, run_crawl

    out = str(tmp_path_factory.mktemp("spec_windows"))
    res = run_crawl(
        spec_dir, out,
        CrawlConfig(n_seen_shards=2, seen_mode="exact", compute="tasks",
                    checkpoint=False, pipeline_generations=2),
    )
    sim = simulate(spec_dir)
    assert res.generations > 2  # > one window
    lin = pads.dataset(f"{out}/lineage", partitioning="hive").to_table().to_pandas()
    assert set(int(h) for h in lin["url_hash"]) == sim.seen_hashes
    docs = pads.dataset(f"{out}/docs", partitioning="hive").to_table().to_pandas()
    assert dict(zip(docs["url"], docs["caption"])) == sim.docs


def test_strict_wave_order_parity(ray_session, spec_dir, tmp_path_factory):
    """Strict mode: the simulator's per-unit BFS waves (page k's docs + the
    next probe page together) must match engine generations monotonically."""
    from legislation_scraper_ray.functions.hashing import fnv1a64_bytes
    from legislation_scraper_ray.oracle.simulator import simulate
    from legislation_scraper_ray.pipelines.crawl import CrawlConfig, run_crawl

    out = str(tmp_path_factory.mktemp("spec_strict"))
    run_crawl(
        spec_dir, out,
        CrawlConfig(n_seen_shards=2, seen_mode="exact", fetch_concurrency=2,
                    order="strict", compute="tasks", checkpoint=False),
    )
    sim = simulate(spec_dir)
    lin = pads.dataset(f"{out}/lineage", partitioning="hive").to_table().to_pandas()
    eng_gen = dict(zip(lin["url_hash"].astype(np.uint64), lin["generation"]))
    waves: dict[int, list[int]] = {}
    for url, (wave, _status, _kind) in sim.fetched.items():
        h = fnv1a64_bytes(url.encode())
        assert h in eng_gen, url
        waves.setdefault(wave, []).append(eng_gen[h])
    ordered = sorted(waves)
    for w1, w2 in zip(ordered, ordered[1:]):
        assert max(waves[w1]) <= min(waves[w2]), (w1, w2)
