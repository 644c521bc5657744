"""base64-in-JSON payload decode (VERDICT r2 item 8): doc payloads arrive as
``{"doc": {"conteudo": "<base64>"}}`` bodies (alagoas.py:104-107 analog); the
fetch stage unwraps before the fused decode, and the decode invariants
(pixel checksum / phash / PSNR vs RAW-image ground truth) prove the unwrap
end-to-end."""

import json

import numpy as np
import pyarrow.dataset as pads
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def b64_dir():
    from legislation_scraper_ray.sources.corpus import generate_b64

    return generate_b64("t1")


def test_corpus_is_wrapped(b64_dir):
    c = pq.read_table(f"{b64_dir}/corpus.parquet", columns=["bytes"])
    first = c["bytes"][0].as_py()
    body = json.loads(first)
    assert "conteudo" in body["doc"]
    g = pq.read_table(f"{b64_dir}/web_graph.parquet", columns=["kind", "payload_encoding"])
    enc = dict(zip(g["kind"].to_pylist(), g["payload_encoding"].to_pylist()))
    assert enc["doc"] == "b64json" and enc["listing"] is None


def test_b64_crawl_decode_invariants(ray_session, b64_dir, tmp_path_factory):
    """Decode ran on the UNWRAPPED payload: checksum + phash equality and the
    PSNR rule hold for every doc, and sets match the simulator."""
    from legislation_scraper_ray.oracle.simulator import simulate
    from legislation_scraper_ray.pipelines.crawl import CrawlConfig, run_crawl

    out = str(tmp_path_factory.mktemp("b64crawl"))
    res = run_crawl(
        b64_dir, out,
        CrawlConfig(n_seen_shards=2, seen_mode="exact", compute="tasks", checkpoint=False),
    )
    sim = simulate(b64_dir)
    docs = pads.dataset(f"{out}/docs", partitioning="hive").to_table().to_pandas()
    assert dict(zip(docs["url"], docs["caption"])) == sim.docs
    assert res.docs_written == len(sim.docs) > 0
    assert docs["decode_ok"].all()
    assert (docs["phash"] == docs["phash_decoded"]).all()
    lossy = docs[docs["fmt"] == "jpeg"]
    assert (lossy["psnr_db"] >= 40.0).all()
    assert np.isinf(docs[docs["fmt"] == "png"]["psnr_db"]).all()


def test_b64_keep_payloads_emits_unwrapped(ray_session, b64_dir, tmp_path_factory):
    """With keep_payloads the doc sink must carry the DECODED binary (the
    reference's saver writes the unwrapped payload, not the JSON body)."""
    from legislation_scraper_ray.pipelines.crawl import CrawlConfig, run_crawl
    from legislation_scraper_ray.sources.codec import decode_image

    out = str(tmp_path_factory.mktemp("b64keep"))
    run_crawl(
        b64_dir, out,
        CrawlConfig(n_seen_shards=2, compute="tasks", checkpoint=False,
                    keep_payloads=True),
    )
    docs = pads.dataset(f"{out}/docs", partitioning="hive").to_table().to_pandas()
    truth = pq.read_table(
        f"{b64_dir}/corpus.parquet", columns=["image_id", "dec_sum"]
    ).to_pandas().set_index("image_id")["dec_sum"]
    sample = docs.head(20)
    for _, r in sample.iterrows():
        assert not r["bytes"].startswith(b"{")  # unwrapped, not the JSON body
        px = decode_image(r["bytes"], r["fmt"])
        assert int(px.astype(np.uint64).sum()) == int(truth[r["image_id"]])


def test_b64_union_crawl_with_plain_source(ray_session, b64_dir, tmp_path_factory):
    """Union frontier mixing an encoded and a plain source: per-row encoding
    dispatch must not disturb the plain source's payloads (graph schemas are
    promoted on concat)."""
    from legislation_scraper_ray.oracle.simulator import simulate
    from legislation_scraper_ray.pipelines.crawl import CrawlConfig, run_crawl
    from legislation_scraper_ray.sources.base import Base64JsonSource, SyntheticCorpusSource
    from legislation_scraper_ray.sources.corpus import generate

    t1 = generate("t1")
    out = str(tmp_path_factory.mktemp("b64union"))
    res = run_crawl(
        None, out,
        CrawlConfig(n_seen_shards=2, seen_mode="exact", compute="tasks", checkpoint=False),
        sources=[SyntheticCorpusSource(t1), Base64JsonSource(b64_dir)],
    )
    sim_a, sim_b = simulate(t1), simulate(b64_dir)
    docs = pads.dataset(f"{out}/docs", partitioning="hive").to_table().to_pandas()
    assert dict(zip(docs["url"], docs["caption"])) == {**sim_a.docs, **sim_b.docs}
    assert docs["decode_ok"].all()
    assert res.docs_written == len(sim_a.docs) + len(sim_b.docs)
