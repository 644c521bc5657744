"""t2-scale (sf0.01-like) end-to-end: error sink exercised, simulator parity
at 8 hosts × 10 years, cuckoo mode."""

import numpy as np
import pyarrow.dataset as pads
import pytest


@pytest.mark.slow
def test_t2_bfs_parity_and_errors(ray_session, t2_dir, tmp_path_factory):
    from legislation_scraper_ray.oracle.simulator import simulate
    from legislation_scraper_ray.pipelines.crawl import CrawlConfig, run_crawl

    out = str(tmp_path_factory.mktemp("t2"))
    res = run_crawl(
        t2_dir, out,
        CrawlConfig(n_seen_shards=4, seen_mode="cuckoo", compute="tasks", checkpoint=False),
    )
    sim = simulate(t2_dir)
    lin = pads.dataset(f"{out}/lineage", partitioning="hive").to_table().to_pandas()
    assert set(int(h) for h in lin["url_hash"]) == sim.seen_hashes
    assert res.errors == len(sim.errors) > 0  # hard_error rows flow to the error sink
    err = pads.dataset(f"{out}/errors", partitioning="hive").to_table().to_pandas()
    assert len(err) == res.errors
    assert (err["attempts"] == 5).all()  # exhausted retry budget (reference: 5 attempts)
    docs = pads.dataset(f"{out}/docs", partitioning="hive").to_table().to_pandas()
    assert dict(zip(docs["url"], docs["caption"])) == sim.docs
    assert docs["decode_ok"].all()


def test_metrics_records(ray_session, t2_dir, tmp_path_factory):
    """Per-(host, generation) metrics records reconcile with lineage."""
    import glob

    import pandas as pd
    import pyarrow.parquet as pq

    from legislation_scraper_ray.pipelines.crawl import CrawlConfig, run_crawl

    out = str(tmp_path_factory.mktemp("metrics"))
    res = run_crawl(
        t2_dir, out, CrawlConfig(n_seen_shards=2, compute="tasks", checkpoint=False)
    )
    mtr = pd.concat(
        [pq.read_table(f).to_pandas() for f in sorted(glob.glob(f"{out}/metrics/*.parquet"))]
    )
    lin = pads.dataset(f"{out}/lineage", partitioning="hive").to_table().to_pandas()
    assert mtr["n_fetched"].sum() == len(lin)
    assert mtr["n_errors"].sum() == res.errors
    agg = lin.groupby(["host", "generation"]).size()
    for _, row in mtr.iterrows():
        assert agg[(row["host"], row["generation"])] == row["n_fetched"]


def test_hot_host_skew_spreads_across_tasks(ray_session, t2_dir, tmp_path_factory):
    """Hot-host skew (north_rule): the t2 corpus allocates docs Zipf-skewed
    with one hot host.  The BFS fetch path deliberately does NOT partition by
    host — frontier order spreads a hot host's URLs uniformly across fetch
    batches — so no single task can become the hot-host straggler.  Each sink
    batch writes exactly one lineage part file, so per-file host composition
    IS the per-task composition."""
    import collections
    import glob

    import pyarrow.parquet as pq

    from legislation_scraper_ray.pipelines.crawl import CrawlConfig, run_crawl

    out = str(tmp_path_factory.mktemp("skew"))
    run_crawl(
        t2_dir, out,
        CrawlConfig(n_seen_shards=2, fetch_concurrency=4, compute="tasks",
                    checkpoint=False, batch_size=512),
    )
    per_file = collections.Counter()
    hot_total = collections.Counter()
    for f in glob.glob(f"{out}/lineage/gen=*/part-*.parquet"):
        hosts = pq.read_table(f, columns=["host"])["host"].to_pylist()
        c = collections.Counter(hosts)
        hot_total.update(c)
        for h, n in c.items():
            per_file[h] = max(per_file[h], n)
    hot = hot_total.most_common(1)[0][0]
    assert hot_total[hot] > 2 * sorted(hot_total.values())[len(hot_total) // 2]  # genuinely skewed corpus
    # the hot host's pages span many tasks: no task holds more than ~a batch's
    # worth, i.e. far less than the host's total
    assert per_file[hot] <= 512
    n_files_with_hot = sum(
        1 for f in glob.glob(f"{out}/lineage/gen=*/part-*.parquet")
        if hot in set(pq.read_table(f, columns=["host"])["host"].to_pylist())
    )
    assert n_files_with_hot >= hot_total[hot] // 512
