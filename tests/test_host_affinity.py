"""S6 sequential-protocol mode: per-host fetch-order monotonicity.

The reference's ViewState/JSF postback chains (espirito_santo.py:69-127,
maranhao.py:45-110) require every request to a host to happen strictly after
the previous one, on the same session.  ``host_affinity=True`` routes each
host's generation rows to ONE fetch unit that processes them in scheduled
order; lineage records (fetch_seq, fetch_pid) prove it."""

import numpy as np
import pyarrow.dataset as pads
import pytest


def test_host_affinity_order_and_parity(ray_session, t1_dir, tmp_path_factory):
    from legislation_scraper_ray.oracle.simulator import simulate
    from legislation_scraper_ray.pipelines.crawl import CrawlConfig, run_crawl

    out = str(tmp_path_factory.mktemp("affinity"))
    res = run_crawl(
        t1_dir, out,
        CrawlConfig(n_seen_shards=2, seen_mode="exact", host_affinity=True,
                    checkpoint=False),
    )
    sim = simulate(t1_dir)
    lin = pads.dataset(f"{out}/lineage", partitioning="hive").to_table().to_pandas()
    # affinity must not change the crawl's final sets
    assert set(int(h) for h in lin["url_hash"]) == sim.seen_hashes
    assert res.docs_written == len(sim.docs)

    for (host, gen), g in lin.groupby(["host", "generation"]):
        # every row of a host-generation was fetched by ONE unit (pid)…
        assert g["fetch_pid"].nunique() == 1, (host, gen)
        # …with a dense processing sequence…
        seqs = np.sort(g["fetch_seq"].to_numpy())
        assert (seqs == np.arange(len(g))).all(), (host, gen)
        # …strictly in scheduled (politeness) order
        ordered = g.sort_values("fetch_seq")["scheduled_ts"].to_numpy()
        assert (np.diff(ordered) >= 0).all(), (host, gen)
