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


def test_form_post_session_chain(ray_session, tmp_path_factory):
    """S6 END-TO-END (r3): the form-POST source's per-host postback token
    chain must never break — across batches, fetch units, or generations.
    Re-derives the expected chain from lineage order (generation, fetch_seq)
    and the protocol's mint rule, and compares against the ``post_token``
    each request actually presented."""
    from legislation_scraper_ray.functions.hashing import fnv1a64_bytes, splitmix64
    from legislation_scraper_ray.oracle.simulator import simulate
    from legislation_scraper_ray.pipelines.crawl import CrawlConfig, run_crawl
    from legislation_scraper_ray.sources.base import FormPostSource
    from legislation_scraper_ray.sources.corpus import generate_form

    form_dir = generate_form("t1")
    out = str(tmp_path_factory.mktemp("formpost"))
    res = run_crawl(
        None, out,
        CrawlConfig(n_seen_shards=2, seen_mode="exact", host_affinity=True,
                    checkpoint=False),
        sources=[FormPostSource(form_dir)],
    )
    sim = simulate(form_dir)
    assert res.docs_written == len(sim.docs)  # protocol mode changes no sets
    lin = pads.dataset(f"{out}/lineage", partitioning="hive").to_table().to_pandas()
    assert set(int(h) for h in lin["url_hash"]) == sim.seen_hashes
    assert lin["generation"].nunique() >= 3  # chain spans generations

    def mix(x):
        return int(splitmix64(np.array([x], np.uint64))[0])

    for host, g in lin.groupby("host"):
        g = g.sort_values(["generation", "fetch_seq"])
        tok = mix(fnv1a64_bytes(host.encode()))  # token_0 = seed
        for presented, uh in zip(
            g["post_token"].astype(np.uint64), g["url_hash"].astype(np.uint64)
        ):
            assert int(presented) == tok, host  # request i presented token_i
            tok = mix(tok ^ int(uh))  # server mints token_{i+1} from response i


def test_session_tokens_require_host_affinity(ray_session, tmp_path_factory):
    """The chain is sequential by protocol: without host-affinity the engine
    must refuse rather than silently interleave a host's requests."""
    from legislation_scraper_ray.pipelines.crawl import CrawlConfig, run_crawl
    from legislation_scraper_ray.sources.base import FormPostSource
    from legislation_scraper_ray.sources.corpus import generate_form

    out = str(tmp_path_factory.mktemp("form_noaff"))
    with pytest.raises(ValueError, match="host_affinity"):
        run_crawl(
            None, out,
            CrawlConfig(n_seen_shards=2, checkpoint=False),
            sources=[FormPostSource(generate_form("t1"))],
        )
