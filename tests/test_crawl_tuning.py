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


def test_from_local_tables_matches_from_arrow_refs(ray_session):
    """from_local_tables builds the same MaterializedDataset from_arrow_refs
    would (schema, block count, rows, values) while doing ZERO remote work for
    metadata — this pins the internal-constructor dependency so a Ray upgrade
    that changes FromArrow/ExecutionPlan internals fails loudly here."""
    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data as rd

    from legislation_scraper_ray.pipelines.common import from_local_tables

    tbl = pa.table({
        "url": [f"http://h{i % 5}.example/p{i}" for i in range(1000)],
        "depth": pa.array(np.arange(1000, dtype=np.int32)),
    })
    bounds = np.linspace(0, 1000, 9).astype(int)
    slices = [tbl.slice(int(a), int(b - a)) for a, b in zip(bounds[:-1], bounds[1:])]

    mine = from_local_tables(slices)
    ref = rd.from_arrow_refs([ray.put(s) for s in slices])
    assert mine.schema().names == ref.schema().names
    assert mine.num_blocks() == ref.num_blocks() == 8
    assert mine.count() == ref.count() == 1000
    a = mine.to_pandas().sort_values("depth").reset_index(drop=True)
    b = ref.to_pandas().sort_values("depth").reset_index(drop=True)
    assert a.equals(b)
    # downstream transforms work off the locally built plan
    assert mine.map_batches(lambda t: t, batch_format="pyarrow").count() == 1000
