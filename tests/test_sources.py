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
