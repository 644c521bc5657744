"""Incremental recrawl (delta ingest): restore the seen set from a completed
crawl's checkpoint, seed a fresh frontier, fetch ONLY never-seen URLs.

Covers: (1) idempotence — recrawling an unchanged corpus fetches nothing and
appends nothing; (2) incremental source addition — recrawling after
registering a second source appends exactly that source's documents, and the
combined output equals a from-scratch union crawl's."""

import pyarrow.dataset as pads
import pytest


def _docs(out):
    return pads.dataset(f"{out}/docs", partitioning="hive").to_table().to_pandas()


def _cfg():
    from legislation_scraper_ray.pipelines.crawl import CrawlConfig

    return CrawlConfig(n_seen_shards=2, seen_mode="exact", compute="tasks", checkpoint=True)


def test_recrawl_unchanged_is_noop(ray_session, t1_dir, tmp_path_factory):
    from legislation_scraper_ray.pipelines.crawl import run_crawl

    out = str(tmp_path_factory.mktemp("recrawl_noop"))
    first = run_crawl(t1_dir, out, _cfg())
    assert first.docs_written > 0
    before = _docs(out)

    again = run_crawl(t1_dir, out, _cfg(), recrawl=True)
    assert again.fetched_ok == 0
    assert again.docs_written == 0
    after = _docs(out)
    assert len(after) == len(before)
    assert set(after["url"]) == set(before["url"])


def test_recrawl_new_source_appends_delta(ray_session, t1_dir, tmp_path_factory):
    from legislation_scraper_ray.oracle.simulator import simulate
    from legislation_scraper_ray.pipelines.crawl import run_crawl
    from legislation_scraper_ray.sources.base import RestApiSource, SyntheticCorpusSource
    from legislation_scraper_ray.sources.corpus import generate_rest

    t1r_dir = generate_rest("t1")
    out = str(tmp_path_factory.mktemp("recrawl_delta"))
    first = run_crawl(None, out, _cfg(), sources=[SyntheticCorpusSource(t1_dir)])
    sim_a, sim_b = simulate(t1_dir), simulate(t1r_dir)
    assert first.docs_written == len(sim_a.docs)

    delta = run_crawl(
        None, out, _cfg(), recrawl=True,
        sources=[SyntheticCorpusSource(t1_dir), RestApiSource(t1r_dir)],
    )
    # only the new source's pages were fetched
    assert delta.docs_written == len(sim_b.docs)
    docs = _docs(out)
    assert dict(zip(docs["url"], docs["caption"])) == {**sim_a.docs, **sim_b.docs}
    assert set(docs[docs["source"] == "rest"]["url"]) == set(sim_b.docs)
    # no duplicates across the two runs
    assert docs["url"].is_unique

    # a third, unchanged recrawl is a no-op (checkpoint chained through)
    third = run_crawl(
        None, out, _cfg(), recrawl=True,
        sources=[SyntheticCorpusSource(t1_dir), RestApiSource(t1r_dir)],
    )
    assert third.docs_written == 0


def test_recrawl_requires_checkpoint(ray_session, t1_dir, tmp_path_factory):
    from legislation_scraper_ray.pipelines.crawl import run_crawl

    out = str(tmp_path_factory.mktemp("recrawl_nockpt"))
    with pytest.raises(ValueError, match="checkpoint"):
        run_crawl(t1_dir, out, _cfg(), recrawl=True)


def test_recrawl_refuses_midcrawl_checkpoint(ray_session, t1_dir, tmp_path_factory):
    """ADVICE r2: recrawling an INTERRUPTED crawl would restore a seen set
    whose pending-frontier pages were marked by their parents but never
    fetched — silent data loss.  The engine must refuse until the crawl is
    resumed to completion."""
    from legislation_scraper_ray.pipelines.crawl import CrawlConfig, run_crawl

    out = str(tmp_path_factory.mktemp("recrawl_midcrawl"))
    base = dict(n_seen_shards=2, seen_mode="exact", compute="tasks", checkpoint=True)
    run_crawl(t1_dir, out, CrawlConfig(**base, max_generations=1))  # interrupted
    with pytest.raises(ValueError, match="mid-crawl"):
        run_crawl(t1_dir, out, _cfg(), recrawl=True)
    # resume to completion → recrawl accepted (and a no-op on unchanged corpus)
    run_crawl(t1_dir, out, CrawlConfig(**base), resume=True)
    again = run_crawl(t1_dir, out, _cfg(), recrawl=True)
    assert again.docs_written == 0


def test_checkpoint_seen_mode_mismatch(ray_session, t1_dir, tmp_path_factory):
    """ADVICE r2: the manifest records seen_mode; restoring an 'exact' snapshot
    into a 'cuckoo' session (or vice versa) must fail with a clear diagnostic,
    on both the resume and recrawl branches."""
    from legislation_scraper_ray.pipelines.crawl import CrawlConfig, run_crawl

    out = str(tmp_path_factory.mktemp("seen_mode_mismatch"))
    base = dict(n_seen_shards=2, compute="tasks", checkpoint=True)
    run_crawl(t1_dir, out, CrawlConfig(**base, seen_mode="exact", max_generations=1))
    with pytest.raises(ValueError, match="seen_mode"):
        run_crawl(t1_dir, out, CrawlConfig(**base, seen_mode="cuckoo"), resume=True)
    run_crawl(t1_dir, out, CrawlConfig(**base, seen_mode="exact"), resume=True)
    with pytest.raises(ValueError, match="seen_mode"):
        run_crawl(t1_dir, out, CrawlConfig(**base, seen_mode="cuckoo"), recrawl=True)
