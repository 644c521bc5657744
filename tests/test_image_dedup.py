"""Image-payload dedup by perceptual hash, verified against the corpus
generator's planted dup_of ground truth (FIXTURES.md F1)."""

import numpy as np
import pyarrow.parquet as pq
import pytest


def test_image_dup_by_phash_matches_planted(ray_session):
    from legislation_scraper_ray.pipelines.queries import image_dup_by_phash
    from legislation_scraper_ray.sources.corpus import generate

    t2 = generate("t2")
    out = image_dup_by_phash("/root/testdata/sf0.01").to_pandas()  # t2 corpus
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


def test_aspect_bucket_stats_vs_pandas(ray_session):
    """Aspect bucketing == pandas brute force on the same corpus parquet."""
    import pandas as pd

    from legislation_scraper_ray.pipelines.queries import (
        ASPECT_LADDER, aspect_bucket_stats,
    )
    from legislation_scraper_ray.sources.corpus import generate

    t2 = generate("t2")
    got = aspect_bucket_stats("/root/testdata/sf0.01").set_index("bucket")
    df = pq.read_table(f"{t2}/corpus.parquet", columns=["w", "h"]).to_pandas()
    ratios = np.log(np.array([a / b for a, b in ASPECT_LADDER]))
    names = [f"{a}:{b}" for a, b in ASPECT_LADDER]
    idx = np.abs(
        np.log(df["w"].to_numpy() / df["h"].to_numpy())[:, None] - ratios[None, :]
    ).argmin(axis=1)
    df["bucket"] = [names[i] for i in idx]
    df["small"] = (np.minimum(df["w"], df["h"]) < 32).astype(int)
    want = df.groupby("bucket").agg(
        n=("bucket", "size"), n_small=("small", "sum"),
        mean_w=("w", "mean"), mean_h=("h", "mean"),
    )
    assert int(got["n"].sum()) == len(df)
    assert set(got.index) == set(want.index)
    for b in want.index:
        assert got.loc[b, "n"] == want.loc[b, "n"]
        assert got.loc[b, "n_small"] == want.loc[b, "n_small"]
        assert abs(got.loc[b, "mean_w"] - want.loc[b, "mean_w"]) < 0.01
        assert abs(got.loc[b, "mean_h"] - want.loc[b, "mean_h"]) < 0.01


def test_image_dup_clusters_union_find(ray_session):
    """Clusters == union-find over the same Hamming pairs; every planted
    duplicate lands in the same cluster as its source image."""
    from legislation_scraper_ray.pipelines.queries import (
        image_dup_clusters, phash_hamming_pairs,
    )
    from legislation_scraper_ray.sources.corpus import generate

    got = image_dup_clusters("/root/testdata/sf0.01", max_dist=3)
    pairs = phash_hamming_pairs("/root/testdata/sf0.01", max_dist=3).to_pandas()

    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["id_a"], pairs["id_b"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    want = {}
    for node in parent:
        want.setdefault(find(node), set()).add(node)
    got_clusters = {frozenset(g["image_id"]) for _, g in got.groupby("cluster_id")}
    assert got_clusters == {frozenset(s) for s in want.values()}
    # cluster_id is the lexicographic min member; sizes consistent
    for cid, g in got.groupby("cluster_id"):
        assert cid == min(g["image_id"])
        assert (g["cluster_size"] == len(g)).all()
    # planted exact dups (identical pixels -> hamming 0) share a cluster
    t2 = generate("t2")
    c = pq.read_table(f"{t2}/corpus.parquet", columns=["image_id", "dup_of"]).to_pandas()
    ids = c["image_id"].to_numpy()
    by_id = got.set_index("image_id")["cluster_id"]
    planted = c[c["dup_of"] >= 0]
    assert len(planted) > 0
    for img, src_idx in zip(planted["image_id"], planted["dup_of"]):
        src = ids[int(src_idx)]
        assert by_id[img] == by_id[src]


def test_image_training_prep_pandas_replay(ray_session):
    """Composed image flagship == a pandas replay of gate -> phash dedup ->
    aspect bucket -> FNV shard -> manifest, at a gate that drops rows."""
    import pandas as pd

    from legislation_scraper_ray.functions.hashing import hash64
    from legislation_scraper_ray.pipelines.queries import (
        ASPECT_LADDER, image_training_prep,
    )
    from legislation_scraper_ray.sources.corpus import generate

    t2 = generate("t2")
    got = image_training_prep("/root/testdata/sf0.01", psnr_min=46.2)
    df = pq.read_table(
        f"{t2}/corpus.parquet",
        columns=["image_id", "w", "h", "phash", "psnr_db", "caption"],
    ).to_pandas()
    n0 = len(df)
    df = df[
        (df["psnr_db"] >= 46.2)
        & (np.minimum(df["w"], df["h"]) >= 32)
        & (df["caption"].str.split(" ").str.len() >= 2)
    ]
    assert len(df) < n0  # the gate actually drops rows at this threshold
    df = df.sort_values(["phash", "image_id"]).drop_duplicates("phash", keep="first")
    ratios = np.log(np.array([a / b for a, b in ASPECT_LADDER]))
    names = [f"{a}:{b}" for a, b in ASPECT_LADDER]
    idx = np.abs(
        np.log(df["w"].to_numpy() / df["h"].to_numpy())[:, None] - ratios[None, :]
    ).argmin(axis=1)
    df = df.assign(
        bucket=[names[i] for i in idx],
        shard=(hash64(df["image_id"].tolist()) % np.uint64(8)).astype(np.int64),
    )
    want = (
        df.groupby(["bucket", "shard"])
        .agg(n=("image_id", "size"), mean_w=("w", "mean"), mean_h=("h", "mean"))
        .reset_index()
    )
    got_i = got.set_index(["bucket", "shard"]).sort_index()
    want_i = want.set_index(["bucket", "shard"]).sort_index()
    assert list(got_i.index) == list(want_i.index)
    assert (got_i["n"].to_numpy() == want_i["n"].to_numpy()).all()
    assert np.allclose(got_i["mean_w"], want_i["mean_w"], atol=0.01)
    assert np.allclose(got_i["mean_h"], want_i["mean_h"], atol=0.01)
    assert int(got["n"].sum()) == len(df)


def test_image_dup_clusters_distributed_branch(ray_session):
    """driver_max=0 forces the _img_clusters_distributed cutover (hash64
    nodes through _cc_labels + partitioned min-string relabel); output must
    be row-identical to the driver-side label-propagation branch."""
    import pandas as pd
    from legislation_scraper_ray.pipelines.queries import image_dup_clusters

    drv = (image_dup_clusters("/root/testdata/sf0.01", max_dist=3)
           .sort_values("image_id", ignore_index=True))
    dist = image_dup_clusters("/root/testdata/sf0.01", max_dist=3, driver_max=0)
    assert hasattr(dist, "to_pandas")  # lazy Dataset, nothing driver-collected
    dist = dist.to_pandas().sort_values("image_id", ignore_index=True)
    pd.testing.assert_frame_equal(drv, dist)
