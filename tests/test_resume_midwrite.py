"""Kill-mid-generation resume: a partially-written docs/gen=k directory must
not produce duplicates after resume (write_parquet's default mode appends)."""

import glob
import os

import pyarrow.dataset as pads
import pytest


def test_resume_after_partial_generation_write(ray_session, t1_dir, tmp_path_factory):
    from legislation_scraper_ray.oracle.simulator import simulate
    from legislation_scraper_ray.pipelines.crawl import CrawlConfig, run_crawl

    out = str(tmp_path_factory.mktemp("midwrite"))
    cfg = dict(n_seen_shards=2, compute="tasks")
    # run only generation 0+1, checkpoint on
    run_crawl(t1_dir, out, CrawlConfig(**cfg, max_generations=2))
    # simulate a crash DURING generation 2's doc write on the resumed run:
    # plant a stray partial file where gen=2 output will go
    stray_dir = os.path.join(out, "docs", "gen=2", "year=1990", "type=lei", "situation=valid")
    os.makedirs(stray_dir, exist_ok=True)
    src = glob.glob(os.path.join(out, "docs", "gen=1", "**", "*.parquet"), recursive=True)[0]
    import shutil

    shutil.copy(src, os.path.join(stray_dir, "partial_from_crash.parquet"))

    run_crawl(t1_dir, out, CrawlConfig(**cfg), resume=True)
    docs = pads.dataset(os.path.join(out, "docs"), partitioning="hive").to_table().to_pandas()
    sim = simulate(t1_dir)
    assert docs["url_hash"].nunique() == len(docs) == len(sim.docs)  # no duplicates
    assert dict(zip(docs["url"], docs["caption"])) == sim.docs
