"""image_caption_conflicts: near-dup images with differing captions must
match an all-pairs brute force (popcount + caption-hash compare) exactly."""

import numpy as np
import pyarrow.parquet as pq


def _brute(corpus_dir: str, max_dist: int = 3):
    from legislation_scraper_ray.functions.hashing import hash64

    t = pq.read_table(f"{corpus_dir}/corpus.parquet",
                      columns=["image_id", "phash", "caption"])
    h = t["phash"].to_numpy().view(np.uint64)
    ids = t["image_id"].to_pylist()
    caps = hash64(t["caption"]).view(np.int64)
    out = {}
    for i in range(len(h)):
        for j in range(i + 1, len(h)):
            d = bin(int(h[i] ^ h[j])).count("1")
            if d <= max_dist and caps[i] != caps[j]:
                a, b = sorted((ids[i], ids[j]))
                ca, cb = (caps[i], caps[j]) if a == ids[i] else (caps[j], caps[i])
                out[(a, b)] = (d, int(ca), int(cb))
    return out


def test_matches_brute_force(ray_session):
    from legislation_scraper_ray.pipelines.queries import image_caption_conflicts
    from legislation_scraper_ray.sources.corpus import generate

    corpus_dir = generate("t1")
    got = image_caption_conflicts("/root/testdata/sf0.001").to_pandas()
    want = _brute(corpus_dir)
    assert len(want) > 0, "fixture must plant at least one conflict"
    assert len(got) == len(want)
    for row in got.itertuples():
        assert (row.id_a, row.id_b) in want
        d, ca, cb = want[(row.id_a, row.id_b)]
        assert (row.hamming, row.cap_a, row.cap_b) == (d, ca, cb)
