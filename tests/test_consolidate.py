import pyarrow.dataset as pads
import pytest


def test_consolidate(ray_session, t1_dir, tmp_path_factory):
    from legislation_scraper_ray.oracle.simulator import simulate
    from legislation_scraper_ray.pipelines.consolidate import consolidate
    from legislation_scraper_ray.pipelines.crawl import CrawlConfig, run_crawl

    crawl_out = str(tmp_path_factory.mktemp("crawl"))
    final_out = str(tmp_path_factory.mktemp("final"))
    run_crawl(t1_dir, crawl_out, CrawlConfig(n_seen_shards=2, compute="tasks", checkpoint=False))
    consolidate(crawl_out, t1_dir, final_out, n_parts=4)

    final = pads.dataset(final_out, partitioning="hive").to_table().to_pandas()
    sim = simulate(t1_dir)
    assert len(final) == len(sim.docs)  # dedup to the exact reference doc set
    assert final["url_hash"].nunique() == len(final)
    assert final["subjects"].map(len).ge(1).all()  # broadcast subject join applied
    assert final["caption"].str.len().gt(0).all()
    # partition layout mirrors the reference saver dir scheme
    assert {"year", "type", "situation"} <= set(final.columns)


def test_consolidate_resume_after_crash(ray_session, t1_dir, tmp_path_factory):
    """Kill-mid-consolidation resume: a crash after k shards (plus a stray
    partial file in the next shard's directory) must not lose or duplicate
    docs after resume — mirrors the crawl's test_resume_midwrite."""
    import glob
    import os
    import shutil

    from legislation_scraper_ray.oracle.simulator import simulate
    from legislation_scraper_ray.pipelines.consolidate import consolidate
    from legislation_scraper_ray.pipelines.crawl import CrawlConfig, run_crawl

    crawl_out = str(tmp_path_factory.mktemp("crawl_r"))
    final_out = str(tmp_path_factory.mktemp("final_r"))
    run_crawl(t1_dir, crawl_out, CrawlConfig(n_seen_shards=2, compute="tasks", checkpoint=False))

    with pytest.raises(RuntimeError, match="injected crash"):
        consolidate(crawl_out, t1_dir, final_out, n_parts=4, n_shards=4,
                    _fail_after_shards=2)
    # simulate a crash DURING the next shard's write: stray partial file
    done = glob.glob(os.path.join(final_out, "shard=*", "**", "*.parquet"), recursive=True)
    assert done, "first two shards should have written output"
    stray_dir = os.path.join(final_out, "shard=2", "year=1990", "type=lei", "situation=valid")
    os.makedirs(stray_dir, exist_ok=True)
    shutil.copy(done[0], os.path.join(stray_dir, "partial_from_crash.parquet"))

    consolidate(crawl_out, t1_dir, final_out, n_parts=4, n_shards=4, resume=True)
    final = pads.dataset(final_out, partitioning="hive").to_table().to_pandas()
    sim = simulate(t1_dir)
    assert len(final) == len(sim.docs)
    assert final["url_hash"].nunique() == len(final)  # no duplicates
    assert not os.path.exists(os.path.join(final_out, "_stage"))  # cleaned up


def test_consolidate_resume_noop(ray_session, t1_dir, tmp_path_factory):
    import os

    from legislation_scraper_ray.pipelines.consolidate import consolidate
    from legislation_scraper_ray.pipelines.crawl import CrawlConfig, run_crawl

    crawl_out = str(tmp_path_factory.mktemp("crawl_n"))
    final_out = str(tmp_path_factory.mktemp("final_n"))
    run_crawl(t1_dir, crawl_out, CrawlConfig(n_seen_shards=2, compute="tasks", checkpoint=False))
    a = consolidate(crawl_out, t1_dir, final_out, n_parts=4, n_shards=4).count()
    mtime = os.path.getmtime(os.path.join(final_out, "_manifest.json"))
    b = consolidate(crawl_out, t1_dir, final_out, n_parts=4, n_shards=4, resume=True).count()
    assert a == b
    assert os.path.getmtime(os.path.join(final_out, "_manifest.json")) == mtime  # no rework
