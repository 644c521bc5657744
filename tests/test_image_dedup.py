"""Image-payload dedup by perceptual hash, verified against the corpus
generator's planted dup_of ground truth (FIXTURES.md F1)."""

import numpy as np
import pyarrow.parquet as pq
import pytest


def test_image_dup_by_phash_matches_planted(ray_session):
    from legislation_scraper_ray.pipelines.queries import image_dup_by_phash
    from legislation_scraper_ray.sources.corpus import generate

    t2 = generate("t2")
    out = image_dup_by_phash("/root/testdata/sf0.01")  # maps to the t2 corpus
    c = pq.read_table(f"{t2}/corpus.parquet")
    dup_of = c["dup_of"].to_numpy()
    phash = c["phash"].to_numpy()
    ids = np.asarray(c["image_id"].to_pylist())
    # ground truth: phashes with >= 2 images — derived from planted dups
    # (dup rows share pixels with their source ⇒ identical phash)
    uniq, counts = np.unique(phash, return_counts=True)
    expect = {int(p): int(n) for p, n in zip(uniq, counts) if n >= 2}
    got = {int(p): int(n) for p, n in zip(out["phash"], out["n_copies"])}
    assert got == expect
    assert len(expect) > 0  # t2 plants dup_image_frac=2% -> dups exist
    # every planted dup pair shares a reported phash
    planted = np.nonzero(dup_of >= 0)[0]
    for i in planted:
        assert int(phash[i]) in got
    # first_image_id is the lexicographic min of the group
    sub = dict(zip(out["phash"].astype(np.int64), out["first_image_id"]))
    for p, n in expect.items():
        grp = ids[phash == p]
        assert sub[p] == min(grp)
