"""S3/T2 browser stand-in: scripted click-through pagination.

The reference's Selenium sources enumerate result pages that have NO URL by
driving a live DOM through 'próximo' clicks (parana.py:127-156), one browser
handle per worker (base/scraper.py:134-171).  The stand-in replays that as a
deterministic DOM-token state machine (state/browser.py): page p only renders
to a handle holding the exact click-chain token, so protocol violations fail
loudly, and lineage (pages_clicked, dom_token) lets tests re-derive every
chain."""

import numpy as np
import pyarrow.dataset as pads
import pyarrow.parquet as pq
import pytest


def test_scripted_browser_protocol(ray_session):
    """Unit protocol: correct drives replay the generator's token chain;
    out-of-order drives raise."""
    from legislation_scraper_ray.sources.corpus import generate_browser
    from legislation_scraper_ray.state.browser import (
        BrowserProtocolError, ScriptedBrowser, advance_dom, seed_dom,
    )

    d = generate_browser("t1")
    pages = pq.read_table(f"{d}/browser_pages.parquet")
    assert pages.num_rows > 0, "t1 must have at least one multi-page listing"
    b = ScriptedBrowser(pages)

    entry = pages["entry_url"][0].as_py()
    assert b.is_entry(entry)

    # clicking with no open page context is a protocol error
    with pytest.raises(BrowserProtocolError):
        ScriptedBrowser(pages).click_next()

    # a correct drive replays the stored chain exactly
    b.open(entry)
    dom = seed_dom(entry)
    n_clicks = 0
    while b.has_next():
        links = b.click_next()
        n_clicks += 1
        dom = advance_dom(dom, n_clicks + 1)
        assert b.dom_token == dom
        assert len(links) > 0
    assert n_clicks >= 1
    # past the last page there is no next button
    with pytest.raises(BrowserProtocolError):
        b.click_next()

    # re-open resets the page context (a tab holds one page at a time)
    b.open(entry)
    assert b.page == 1 and b.dom_token == seed_dom(entry)


def test_browser_pages_not_url_addressable():
    """The click-through pages must NOT exist in the web graph — that is the
    defining property of the browser protocol (a plain HTTP crawl cannot
    reach them)."""
    from legislation_scraper_ray.sources.corpus import generate_browser

    d = generate_browser("t1")
    graph_urls = set(pq.read_table(f"{d}/web_graph.parquet", columns=["url"])
                     ["url"].to_pylist())
    pages = pq.read_table(f"{d}/browser_pages.parquet")
    # entries ARE fetchable; their pages 2..P are not
    for e in set(pages["entry_url"].to_pylist()):
        assert e in graph_urls
        assert f"{e[:-1]}2" not in graph_urls or "pagina=2" not in graph_urls
    # no listing URL with pagina >= 2 anywhere in the graph
    assert not any("pagina=" in u and not u.endswith("pagina=1") for u in graph_urls
                   if "busca" in u)


def test_browser_crawl_parity_and_lineage(ray_session, tmp_path_factory):
    """End-to-end: crawl the browser corpus via BrowserSource and match the
    simulator's seen/doc/error sets exactly; lineage audit re-derives every
    entry's click chain from (pages_clicked, dom_token)."""
    from legislation_scraper_ray.oracle.simulator import simulate
    from legislation_scraper_ray.pipelines.crawl import CrawlConfig, run_crawl
    from legislation_scraper_ray.sources.base import BrowserSource
    from legislation_scraper_ray.sources.corpus import generate_browser
    from legislation_scraper_ray.state.browser import advance_dom, seed_dom

    d = generate_browser("t1")
    out = str(tmp_path_factory.mktemp("browser"))
    res = run_crawl(
        None, out,
        CrawlConfig(n_seen_shards=2, seen_mode="exact", checkpoint=False),
        sources=[BrowserSource(d)],
    )
    sim = simulate(d)
    assert len(sim.docs) > 0
    assert res.docs_written == len(sim.docs)
    assert res.errors == len(sim.errors)
    lin = pads.dataset(f"{out}/lineage", partitioning="hive").to_table().to_pandas()
    assert set(int(h) for h in lin["url_hash"]) == sim.seen_hashes

    # every fetched doc row exists in the docs sink with decode_ok
    docs = pads.dataset(f"{out}/docs", partitioning="hive").to_table().to_pandas()
    assert len(docs) == len(sim.docs)
    assert docs["decode_ok"].all()

    # click-chain audit: each OK entry listing clicked through its full
    # pagination, and its final dom_token replays the scripted chain
    pages = pq.read_table(f"{d}/browser_pages.parquet").to_pandas()
    n_pages_by_entry = pages.groupby("entry_url").size()
    from legislation_scraper_ray.functions.hashing import hash64

    entry_hash = {int(h): e for e, h in zip(
        n_pages_by_entry.index,
        hash64(list(n_pages_by_entry.index)).astype(np.int64).astype(object))}
    listings = lin[(lin["kind"] == "listing") & (lin["status"] == "ok")]
    n_audited = 0
    for uh, pc_, dt in zip(listings["url_hash"].astype(np.uint64).astype(object),
                           listings["pages_clicked"], listings["dom_token"]):
        e = entry_hash.get(int(np.int64(np.uint64(uh))))
        if e is None:
            assert pc_ == 0  # single-page entry: nothing to click
            continue
        want = int(n_pages_by_entry[e])
        assert pc_ == want, e
        dom = seed_dom(e)
        for p in range(2, want + 2):
            dom = advance_dom(dom, p)
        assert int(np.uint64(dt)) == dom, e
        n_audited += 1
    assert n_audited > 0


def test_browser_union_with_synthetic(ray_session, t1_dir, tmp_path_factory):
    """Union crawl: the browser source coexists with the plain synthetic
    source — non-browser rows pass the BrowserExpand stage untouched and both
    corpora's docs land with their source tags."""
    from legislation_scraper_ray.oracle.simulator import simulate
    from legislation_scraper_ray.pipelines.crawl import CrawlConfig, run_crawl
    from legislation_scraper_ray.sources.base import BrowserSource, SyntheticCorpusSource
    from legislation_scraper_ray.sources.corpus import generate_browser

    d = generate_browser("t1")
    out = str(tmp_path_factory.mktemp("browser_union"))
    res = run_crawl(
        None, out,
        CrawlConfig(n_seen_shards=2, seen_mode="exact", checkpoint=False),
        sources=[SyntheticCorpusSource(t1_dir), BrowserSource(d)],
    )
    want = len(simulate(t1_dir).docs) + len(simulate(d).docs)
    assert res.docs_written == want
    docs = pads.dataset(f"{out}/docs", partitioning="hive").to_table(
        columns=["source"]).to_pandas()
    assert set(docs["source"].unique()) == {"synthetic", "browser"}
