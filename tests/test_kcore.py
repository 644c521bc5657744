"""k_core_pages: the distributed peel must equal a brute-force numpy peel
over the same distinct undirected edge set, survive multi-round peels
(chains peel one node per round), and fail LOUDLY past max_rounds."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest


def _brute_core(corpus_dir: str, k: int):
    """Synchronous peel on distinct undirected hash-edges: {node: core_deg}."""
    from legislation_scraper_ray.functions.hashing import hash64

    t = pq.read_table(f"{corpus_dir}/web_graph.parquet",
                      columns=["url", "out_links"])
    links = t["out_links"].combine_chunks()
    parents = pc.list_parent_indices(links).to_numpy(zero_copy_only=False)
    src = hash64(t["url"])[parents].view(np.int64)
    dst = hash64(pc.list_flatten(links)).view(np.int64)
    keep = src != dst
    lo = np.minimum(src[keep], dst[keep])
    hi = np.maximum(src[keep], dst[keep])
    e = np.unique(np.stack([lo, hi], 1), axis=0)
    all_nodes = np.unique(np.concatenate(
        [hash64(t["url"]).view(np.int64), e.ravel()]))
    idx = {n: i for i, n in enumerate(all_nodes)}
    a = np.searchsorted(all_nodes, e[:, 0])
    b = np.searchsorted(all_nodes, e[:, 1])
    alive = np.ones(len(all_nodes), bool)
    d = np.zeros(len(all_nodes), np.int64)
    np.add.at(d, a, 1)
    np.add.at(d, b, 1)
    while True:
        die = alive & (d < k)
        if not die.any():
            break
        m0 = die[a] & alive[b]
        m1 = die[b] & alive[a]
        np.add.at(d, b[m0], -1)
        np.add.at(d, a[m1], -1)
        alive[die] = False
    return {int(all_nodes[i]): int(d[i]) for i in np.flatnonzero(alive)}


def test_matches_brute_peel(ray_session):
    from legislation_scraper_ray.pipelines.queries import k_core_pages
    from legislation_scraper_ray.sources.corpus import generate

    corpus_dir = generate("t1")
    got = k_core_pages("/root/testdata/sf0.001", k=2).to_pandas()
    want = _brute_core(corpus_dir, k=2)
    assert len(want) > 0, "t1 graph should have a non-empty 2-core"
    assert dict(zip(got["node"], got["core_degree"])) == want
    # every core member has degree >= k inside the core
    assert (got["core_degree"] >= 2).all()


def test_empty_core(ray_session):
    from legislation_scraper_ray.pipelines.queries import k_core_pages

    got = k_core_pages("/root/testdata/sf0.001", k=99).to_pandas()
    assert len(got) == 0


def _tadpole(tail: int):
    """Triangle 0-1-2 plus a path 2-3-...-(2+tail): with k=2 the tail peels
    exactly one node per round from its free end, so rounds = tail length —
    the case that exposes silent max_rounds truncation."""
    import ray.data as rd

    edges = [(0, 1), (1, 2), (0, 2)]
    edges += [(2 + i, 3 + i) for i in range(tail)]
    y = [a for a, b in edges] + [b for a, b in edges]
    n = [b for a, b in edges] + [a for a, b in edges]
    adj = rd.from_arrow(pa.table({"y": pa.array(y, pa.int64()),
                                  "n": pa.array(n, pa.int64())}))
    nodes = rd.from_arrow(pa.table(
        {"node": pa.array(sorted({*y, *n}), pa.int64())}))
    return adj, nodes


def test_tadpole_multiround(ray_session):
    from legislation_scraper_ray.pipelines.queries import _kcore_alive

    adj, nodes = _tadpole(tail=10)
    got = (_kcore_alive(adj, nodes, k=2, max_rounds=16).to_pandas()
           .sort_values("node", ignore_index=True))
    pd.testing.assert_frame_equal(
        got, pd.DataFrame({"node": pd.Series([0, 1, 2], dtype="int64"),
                           "core_degree": pd.Series([2, 2, 2], dtype="int64")}))


def test_max_rounds_raises(ray_session):
    from legislation_scraper_ray.pipelines.queries import _kcore_alive

    adj, nodes = _tadpole(tail=10)
    with pytest.raises(RuntimeError, match="did not converge"):
        _kcore_alive(adj, nodes, k=2, max_rounds=3)
