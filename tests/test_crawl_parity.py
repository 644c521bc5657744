"""End-to-end crawl parity vs the single-threaded reference-semantics simulator.

north_rule invariants: identical final URL-seen set and crawl ordering under
the same seed list; per-row decoded-pixel fidelity (PSNR ≥ 40 dB for lossy) and
exact caption equality.
"""

import numpy as np
import pyarrow.dataset as pads
import pytest


@pytest.fixture(scope="module")
def strict_run(ray_session, t1_dir, tmp_path_factory):
    from legislation_scraper_ray.pipelines.crawl import CrawlConfig, run_crawl

    out = str(tmp_path_factory.mktemp("strict"))
    cfg = CrawlConfig(
        n_seen_shards=2,
        seen_mode="exact",
        fetch_concurrency=2,
        order="strict",
        compute="tasks",
        checkpoint=False,
    )
    return run_crawl(t1_dir, out, cfg), out


@pytest.fixture(scope="module")
def sim(t1_dir):
    from legislation_scraper_ray.oracle.simulator import simulate

    return simulate(t1_dir)


def _lineage(out):
    return pads.dataset(f"{out}/lineage", partitioning="hive").to_table().to_pandas()


def _docs(out):
    return pads.dataset(f"{out}/docs", partitioning="hive").to_table().to_pandas()


def test_seen_set_identical(strict_run, sim):
    res, out = strict_run
    lin = _lineage(out)
    engine_seen = set(int(h) for h in lin["url_hash"])
    assert engine_seen == sim.seen_hashes


def test_doc_set_and_captions_identical(strict_run, sim):
    res, out = strict_run
    docs = _docs(out)
    assert len(docs) == len(sim.docs)
    eng = dict(zip(docs["url"], docs["caption"]))
    assert eng == sim.docs  # exact caption equality, per-row


def test_decode_invariants(strict_run):
    res, out = strict_run
    docs = _docs(out)
    assert docs["decode_ok"].all()  # pixel checksum + phash + PSNR≥40dB verified in-stage
    assert (docs["phash"] == docs["phash_decoded"]).all()
    lossy = docs[docs["fmt"] == "jpeg"]
    assert (lossy["psnr_db"] >= 40.0).all()
    lossless = docs[docs["fmt"] == "png"]
    assert np.isinf(lossless["psnr_db"]).all()


def test_error_sets_match(strict_run, sim):
    res, out = strict_run
    lin = _lineage(out)
    eng_errors = set(lin[lin["status"] == "error"]["url_hash"].astype(np.uint64).tolist())
    from legislation_scraper_ray.functions.hashing import fnv1a64_bytes

    sim_errors = {fnv1a64_bytes(u.encode()) for u in sim.errors}
    assert eng_errors == sim_errors


def test_crawl_order_parity(strict_run, sim):
    """Strict-mode ordering invariant (SURVEY.md §7 'Hard parts'): the
    simulator's wave order is strict-between-waves, unordered-within.  For any
    two URLs u1, u2 with sim_wave(u1) < sim_wave(u2), the engine must not fetch
    u2 in an earlier generation than u1."""
    res, out = strict_run
    lin = _lineage(out)
    eng_gen = dict(zip(lin["url_hash"].astype(np.uint64), lin["generation"]))
    from legislation_scraper_ray.functions.hashing import fnv1a64_bytes

    waves: dict[int, list[int]] = {}
    for url, (wave, _status, _kind) in sim.fetched.items():
        h = fnv1a64_bytes(url.encode())
        assert h in eng_gen, f"simulator fetched {url} but engine has no lineage"
        waves.setdefault(wave, []).append(eng_gen[h])
    ordered = sorted(waves)
    for w1, w2 in zip(ordered, ordered[1:]):
        assert max(waves[w1]) <= min(waves[w2]), (
            f"wave {w1} (max gen {max(waves[w1])}) overlaps wave {w2} "
            f"(min gen {min(waves[w2])})"
        )


def test_counters_consistent(strict_run, sim):
    res, out = strict_run
    assert res.fetched_ok + res.errors == len(sim.fetched)
    assert res.docs_written == len(sim.docs)
    assert res.seen_total == len(sim.seen_hashes)
