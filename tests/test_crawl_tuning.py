"""Guards for the round-2 scheduling/tuning behaviors: the scoped executor
override in run_crawl and the small-frontier wave-spreading helper."""

import pyarrow as pa


def test_reservation_restored(ray_session, t1_dir):
    """run_crawl disables the executor's per-operator CPU reservation for the
    crawl and MUST restore the caller's setting afterwards (queries rely on
    the default policy)."""
    import ray.data as rd

    from legislation_scraper_ray.pipelines.crawl import CrawlConfig, run_crawl

    ctx = rd.DataContext.get_current()
    before = getattr(ctx, "op_resource_reservation_enabled", True)
    run_crawl(
        t1_dir,
        "/tmp/graft_tuning_crawl",
        CrawlConfig(n_seen_shards=2, fetch_concurrency=2, checkpoint=False,
                    max_generations=1, write_lineage=False),
    )
    assert getattr(ctx, "op_resource_reservation_enabled", True) == before


def test_small_frontier_batch():
    from legislation_scraper_ray.pipelines.crawl import CrawlConfig, _small_frontier_batch

    cfg = CrawlConfig(batch_size=8192, fetch_concurrency=16)
    # lazy-frontier sentinel and big frontiers keep the configured batch
    assert _small_frontier_batch(1, cfg) == 8192
    assert _small_frontier_batch(8192 * 16, cfg) == 8192
    # small frontiers spread over ~2 waves of the fetch width, floored at 64
    assert _small_frontier_batch(1280, cfg) == 64
    assert _small_frontier_batch(64_000, cfg) == 2000
    # the floor keeps degenerate frontiers from producing 1-row batches
    assert _small_frontier_batch(10, cfg) == 64
