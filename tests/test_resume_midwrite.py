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


def test_writer_failure_blocks_checkpoint_and_resume_replays(
    ray_session, t1_dir, tmp_path_factory, monkeypatch
):
    """Chaos injection (VERDICT r2 item 9): a doc-write failure inside the
    bounded async writer must (a) surface as the crawl's own failure — the
    pre-checkpoint ``writer.join()`` re-raises, (b) leave the checkpoint
    pointing BEFORE the failed generation (its durability promise is 'docs <
    checkpointed gen are durable'), and (c) replay exactly on resume: full doc
    set, zero duplicates."""
    import json

    import legislation_scraper_ray.pipelines.crawl as crawl_mod
    from legislation_scraper_ray.oracle.simulator import simulate
    from legislation_scraper_ray.pipelines.crawl import CrawlConfig, run_crawl

    out = str(tmp_path_factory.mktemp("chaos_writer"))
    cfg = dict(n_seen_shards=2, compute="tasks")

    orig = crawl_mod._build_doc_sink

    def failing(fetched, cfg_, parse_doc_fn, out_dir, gen):
        docs, docs_dir = orig(fetched, cfg_, parse_doc_fn, out_dir, gen)
        if gen == 1:

            def boom(t):
                raise RuntimeError("injected writer failure")

            docs = docs.map_batches(boom, batch_format="pyarrow")
        return docs, docs_dir

    monkeypatch.setattr(crawl_mod, "_build_doc_sink", failing)
    with pytest.raises(Exception, match="injected writer failure"):
        run_crawl(t1_dir, out, CrawlConfig(**cfg))

    # the checkpoint must still promise at most generation 1 (gen-1 docs were
    # NOT durable when it was written) and must not be marked final
    with open(os.path.join(out, "checkpoint", "manifest.json")) as f:
        state = json.load(f)
    assert state["next_generation"] <= 1
    assert not state.get("final")

    # resume with the failure removed: exact replay, no duplicates
    monkeypatch.setattr(crawl_mod, "_build_doc_sink", orig)
    run_crawl(t1_dir, out, CrawlConfig(**cfg), resume=True)
    docs = pads.dataset(os.path.join(out, "docs"), partitioning="hive").to_table().to_pandas()
    sim = simulate(t1_dir)
    assert docs["url_hash"].nunique() == len(docs) == len(sim.docs)
    assert dict(zip(docs["url"], docs["caption"])) == sim.docs
