"""PageRank ground truth: the distributed iterative-join implementation must
match a dense numpy power iteration (same damping, same dangling handling,
same iteration count) on the t1 corpus graph."""

import numpy as np
import pyarrow.compute as pc
import pyarrow.parquet as pq


def _dense_pagerank(corpus_dir: str, n_iter: int, d: float):
    from legislation_scraper_ray.functions.hashing import hash64

    t = pq.read_table(f"{corpus_dir}/web_graph.parquet",
                      columns=["url", "out_links"])
    src_h = hash64(t["url"].combine_chunks())
    links = t["out_links"].combine_chunks()
    flat = hash64(pc.list_flatten(links))
    parents = pc.list_parent_indices(links).to_numpy(zero_copy_only=False)
    outdeg = pc.list_value_length(links).to_numpy(zero_copy_only=False).astype(np.int64)

    node_ids = np.unique(np.concatenate([src_h, flat]))
    idx = {h: i for i, h in enumerate(node_ids)}
    n = len(node_ids)
    r = np.full(n, 1.0 / n)
    src_i = np.array([idx[h] for h in src_h[parents]])
    dst_i = np.array([idx[h] for h in flat])
    w = 1.0 / outdeg[parents]
    has_out = np.zeros(n, dtype=bool)
    has_out[np.array([idx[h] for h in src_h[outdeg > 0]])] = True
    for _ in range(n_iter):
        contrib = np.zeros(n)
        np.add.at(contrib, dst_i, w * r[src_i])
        dangling = r[~has_out].sum()
        r = (1.0 - d) / n + d * (contrib + dangling / n)
    return node_ids, r


def test_pagerank_matches_dense(ray_session):
    from legislation_scraper_ray.pipelines.queries import pagerank_pages
    from legislation_scraper_ray.sources.corpus import generate

    corpus_dir = generate("t1")
    got = pagerank_pages("/root/testdata/sf0.001", n_iter=8, round_to=None)
    node_ids, r = _dense_pagerank(corpus_dir, n_iter=8, d=0.85)
    assert len(got) == len(node_ids)
    assert abs(got["rank"].sum() - 1.0) < 1e-9          # probability mass conserved
    want = dict(zip(node_ids, r))
    got_map = dict(zip(got["node"].astype("int64").to_numpy().view(np.uint64), got["rank"]))
    diffs = [abs(got_map[h] - want[h]) for h in node_ids]
    assert max(diffs) < 1e-12
    # seeds link INTO listings which link into docs: listing/doc pages must
    # outrank the unlinked-to seeds
    top_url = got.iloc[0]["url"]
    assert top_url is not None
