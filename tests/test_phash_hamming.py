"""Banded phash Hamming near-dup: the 4×16-bit pigeonhole candidate
generation must recover EXACTLY the brute-force all-pairs popcount result at
distance ≤ 3 (≤3 differing bits leave at least one band untouched, so recall
is provably 1.0 — this test pins it, plus precision via the verify pass)."""

import numpy as np
import pyarrow.parquet as pq


def _brute_pairs(corpus_dir: str, max_dist: int):
    from legislation_scraper_ray.functions.dedup import hamming64

    t = pq.read_table(f"{corpus_dir}/corpus.parquet", columns=["image_id", "phash"])
    ids = np.asarray(t["image_id"].to_pylist(), dtype=object)
    h = t["phash"].to_numpy().view(np.uint64)
    order = np.argsort(ids, kind="stable")
    ids, h = ids[order], h[order]
    ii, jj = np.triu_indices(len(ids), k=1)
    d = hamming64(h[ii], h[jj]).astype(np.int64)
    keep = d <= max_dist
    return sorted(zip(ids[ii[keep]], ids[jj[keep]], d[keep]))


def test_phash_hamming_matches_bruteforce(ray_session):
    from legislation_scraper_ray.pipelines.queries import phash_hamming_pairs
    from legislation_scraper_ray.sources.corpus import generate

    corpus_dir = generate("t1")
    got = (phash_hamming_pairs("/root/testdata/sf0.001", max_dist=3)
           .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True))
    want = _brute_pairs(corpus_dir, 3)
    assert len(got) == len(want)
    assert len(want) > 0, "t1 corpus must contain at least one near-dup pair"
    got_t = list(zip(got["id_a"], got["id_b"], got["hamming"].astype(int)))
    assert got_t == [(a, b, int(d)) for a, b, d in want]
    # canonical ordering: id_a < id_b everywhere, no self-pairs
    assert (got["id_a"] < got["id_b"]).all()
