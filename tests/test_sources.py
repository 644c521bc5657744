import pyarrow as pa
import pytest


def test_source_protocol(t1_dir):
    from legislation_scraper_ray.sources.base import REGISTRY, Source, SyntheticCorpusSource

    src = REGISTRY["synthetic"](t1_dir)
    assert isinstance(src, Source)
    seeds = src.seeds()
    assert {"url", "host", "year", "situation", "type", "priority", "depth"} <= set(
        seeds.schema.names
    )
    assert seeds.num_rows == 16  # 2 hosts × 2 years × 2 sits × 2 types
    pol = src.politeness()
    assert len(pol) == 2 and all(v >= 0 for v in pol.values())


def test_register_custom_source():
    from legislation_scraper_ray.sources.base import REGISTRY, register

    class Dummy:
        name = "dummy"

        def seeds(self):
            return pa.table({"url": pa.array(["https://d/x"])})

        def parse_listing(self, batch):
            return batch

        def parse_doc(self, batch):
            return batch

        def politeness(self):
            return {}

    register("dummy", Dummy)
    assert REGISTRY["dummy"]().seeds().num_rows == 1
    del REGISTRY["dummy"]


def test_jsonl_roundtrip(ray_session, tmp_path):
    import ray.data as rd

    from legislation_scraper_ray.sources.jsonl import read_jsonl, write_csv, write_jsonl

    ds = rd.from_items([{"a": i, "b": f"s{i}"} for i in range(100)])
    jdir = str(tmp_path / "jsonl")
    write_jsonl(ds, jdir)
    back = read_jsonl(jdir)
    assert back.count() == 100
    assert sorted(r["a"] for r in back.take_all()) == list(range(100))
    write_csv(ds, str(tmp_path / "csv"))


def test_ocr_branch(ray_session, t1_dir, tmp_path_factory):
    """OCR-fallback branch (M8 analog): captions shorter than the threshold are
    routed through the heavy path and flagged (base/scraper.py:344 semantics)."""
    import pyarrow.dataset as pads

    from legislation_scraper_ray.pipelines.crawl import CrawlConfig, run_crawl

    out = str(tmp_path_factory.mktemp("ocr"))
    run_crawl(
        t1_dir, out,
        CrawlConfig(n_seen_shards=2, compute="tasks", checkpoint=False, ocr_threshold=10_000),
    )
    docs = pads.dataset(f"{out}/docs", partitioning="hive").to_table().to_pandas()
    assert docs["ocr_used"].all()  # threshold above every caption length
    out2 = str(tmp_path_factory.mktemp("noocr"))
    run_crawl(
        t1_dir, out2,
        CrawlConfig(n_seen_shards=2, compute="tasks", checkpoint=False, ocr_threshold=0),
    )
    docs2 = pads.dataset(f"{out2}/docs", partitioning="hive").to_table().to_pandas()
    assert not docs2["ocr_used"].any()


@pytest.fixture(scope="module")
def t1r_dir():
    from legislation_scraper_ray.sources.corpus import generate_rest

    return generate_rest("t1")


def test_rest_source_crawl_parity(ray_session, t1r_dir, tmp_path_factory):
    """REST-shaped source alone: parse_listing must resolve relative links and
    parse_doc must recover situation from the URL, or nothing past gen 0 is
    fetched / docs land in an 'unknown' partition."""
    import numpy as np
    import pyarrow.dataset as pads

    from legislation_scraper_ray.oracle.simulator import simulate
    from legislation_scraper_ray.pipelines.crawl import CrawlConfig, run_crawl
    from legislation_scraper_ray.sources.base import RestApiSource

    out = str(tmp_path_factory.mktemp("rest"))
    res = run_crawl(
        None, out,
        CrawlConfig(n_seen_shards=2, seen_mode="exact", compute="tasks", checkpoint=False),
        sources=[RestApiSource(t1r_dir)],
    )
    sim = simulate(t1r_dir)
    lin = pads.dataset(f"{out}/lineage", partitioning="hive").to_table().to_pandas()
    assert set(int(h) for h in lin["url_hash"]) == sim.seen_hashes
    docs = pads.dataset(f"{out}/docs", partitioning="hive").to_table().to_pandas()
    assert dict(zip(docs["url"], docs["caption"])) == sim.docs
    # parse_doc recovered the situation from the URL path
    assert set(docs["situation"].astype(str).unique()) <= {"valid", "revoked"}
    assert res.docs_written == len(sim.docs)
    eng_err = set(lin[lin["status"] == "error"]["url_hash"].astype(np.uint64).tolist())
    from legislation_scraper_ray.functions.hashing import fnv1a64_bytes

    assert eng_err == {fnv1a64_bytes(u.encode()) for u in sim.errors}


def test_two_source_union_crawl(ray_session, t1_dir, t1r_dir, tmp_path_factory):
    """Union frontier over both registered sources with per-source parse
    dispatch: final seen/doc/error sets equal the union of the two per-source
    simulators, and each host's rows carry its own source label."""
    import numpy as np
    import pyarrow.dataset as pads

    from legislation_scraper_ray.functions.hashing import fnv1a64_bytes
    from legislation_scraper_ray.oracle.simulator import simulate
    from legislation_scraper_ray.pipelines.crawl import CrawlConfig, run_crawl
    from legislation_scraper_ray.sources.base import RestApiSource, SyntheticCorpusSource

    out = str(tmp_path_factory.mktemp("union2"))
    res = run_crawl(
        None, out,
        CrawlConfig(n_seen_shards=2, seen_mode="exact", compute="tasks", checkpoint=False),
        sources=[SyntheticCorpusSource(t1_dir), RestApiSource(t1r_dir)],
    )
    sim_a, sim_b = simulate(t1_dir), simulate(t1r_dir)
    lin = pads.dataset(f"{out}/lineage", partitioning="hive").to_table().to_pandas()
    assert set(int(h) for h in lin["url_hash"]) == sim_a.seen_hashes | sim_b.seen_hashes
    docs = pads.dataset(f"{out}/docs", partitioning="hive").to_table().to_pandas()
    assert dict(zip(docs["url"], docs["caption"])) == {**sim_a.docs, **sim_b.docs}
    # per-source split: rest hosts are api*, synthetic hosts are host*
    assert (docs[docs["source"] == "rest"]["host"].str.startswith("api")).all()
    assert (docs[docs["source"] == "synthetic"]["host"].str.startswith("host")).all()
    assert set(docs["source"].unique()) == {"synthetic", "rest"}
    eng_err = set(lin[lin["status"] == "error"]["url_hash"].astype(np.uint64).tolist())
    sim_err = {fnv1a64_bytes(u.encode()) for u in sim_a.errors + sim_b.errors}
    assert eng_err == sim_err
    assert res.docs_written == len(sim_a.docs) + len(sim_b.docs)


def test_extras_map_column(ray_session, t1_dir, t1r_dir, tmp_path_factory):
    """Dynamic per-source extras: sources may attach a map<string,string> of
    source-specific fields; the engine null-fills it for sources that don't."""
    import pyarrow.dataset as pads

    from legislation_scraper_ray.pipelines.crawl import CrawlConfig, run_crawl
    from legislation_scraper_ray.sources.base import RestApiSource, SyntheticCorpusSource

    out = str(tmp_path_factory.mktemp("extras"))
    run_crawl(
        None, out,
        CrawlConfig(n_seen_shards=2, seen_mode="exact", compute="tasks", checkpoint=False),
        sources=[SyntheticCorpusSource(t1_dir), RestApiSource(t1r_dir)],
    )
    docs = pads.dataset(f"{out}/docs", partitioning="hive").to_table().to_pandas()
    rest = docs[docs["source"] == "rest"]
    syn = docs[docs["source"] == "synthetic"]
    assert len(rest) and len(syn)
    assert syn["extras"].isna().all()  # no extras declared → nulls
    for ex, url in zip(rest["extras"], rest["url"]):
        d = dict(ex)
        assert d["raw_situation"] == "unknown"
        assert url.endswith("/" + d["item_id"])
