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
