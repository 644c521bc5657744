"""HITS ground truth: the distributed iterated half-step implementation must
match a dense numpy mutual power iteration (same init, same L2-normalization
points, same iteration count) on the t1 corpus graph."""

import numpy as np
import pyarrow.compute as pc
import pyarrow.parquet as pq


def _dense_hits(corpus_dir: str, n_iter: int):
    from legislation_scraper_ray.functions.hashing import hash64

    t = pq.read_table(f"{corpus_dir}/web_graph.parquet",
                      columns=["url", "out_links"])
    src_h = hash64(t["url"].combine_chunks())
    links = t["out_links"].combine_chunks()
    flat = hash64(pc.list_flatten(links))
    parents = pc.list_parent_indices(links).to_numpy(zero_copy_only=False)

    node_ids = np.unique(np.concatenate([src_h, flat]))
    idx = {h: i for i, h in enumerate(node_ids)}
    src_i = np.array([idx[h] for h in src_h[parents]])
    dst_i = np.array([idx[h] for h in flat])
    keep = src_i != dst_i
    pairs = np.unique(np.stack([src_i[keep], dst_i[keep]], axis=1), axis=0)
    si, di = pairs[:, 0], pairs[:, 1]
    n = len(node_ids)

    def l2norm(v):
        nn = np.sqrt((v * v).sum())
        return v / nn if nn > 0 else np.zeros_like(v)

    h = np.ones(n)
    a = np.zeros(n)
    for _ in range(n_iter):
        a = np.zeros(n)
        np.add.at(a, di, h[si])
        a = l2norm(a)
        h = np.zeros(n)
        np.add.at(h, si, a[di])
        h = l2norm(h)
    return node_ids, h, a


def test_hits_matches_dense(ray_session):
    from legislation_scraper_ray.pipelines.queries import hits_pages
    from legislation_scraper_ray.sources.corpus import generate

    corpus_dir = generate("t1")
    got = hits_pages("/root/testdata/sf0.001", n_iter=6, round_to=None)
    node_ids, h, a = _dense_hits(corpus_dir, n_iter=6)
    assert len(got) == len(node_ids)
    # unit L2 mass on both scores
    assert abs((got["hub"] ** 2).sum() - 1.0) < 1e-9
    assert abs((got["authority"] ** 2).sum() - 1.0) < 1e-9
    nodes_u = got["node"].astype("int64").to_numpy().view(np.uint64)
    got_h = dict(zip(nodes_u, got["hub"]))
    got_a = dict(zip(nodes_u, got["authority"]))
    want_h = dict(zip(node_ids, h))
    want_a = dict(zip(node_ids, a))
    assert max(abs(got_h[k] - want_h[k]) for k in node_ids) < 1e-12
    assert max(abs(got_a[k] - want_a[k]) for k in node_ids) < 1e-12
    # listing pages fan out to many docs: the top hub must have out-links,
    # and the top authority must be linked-to (sanity of the mutual ranking)
    top_hub = got.iloc[0]
    assert top_hub["hub"] > 0
