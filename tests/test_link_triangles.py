"""Triangle-count ground truth: the distributed degree-oriented wedge-match
implementation must agree with a brute-force all-triangle enumeration over
the t1 corpus link graph, and the vectorized run-pair kernel must equal
itertools.combinations per run."""

from itertools import combinations

import numpy as np
import pyarrow.compute as pc
import pyarrow.parquet as pq


def _brute_triangles(corpus_dir: str) -> dict[str, int]:
    t = pq.read_table(f"{corpus_dir}/web_graph.parquet",
                      columns=["url", "out_links"])
    urls = t["url"].to_pylist()
    links = t["out_links"].combine_chunks()
    parents = pc.list_parent_indices(links).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(links).to_pylist()
    edges = set()
    for p, dst in zip(parents, flat):
        src = urls[p]
        if src != dst:
            edges.add((min(src, dst), max(src, dst)))
    adj: dict[str, set] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    counts: dict[str, int] = {}
    for a, b in edges:
        # third vertex above both (c > b > a) so each triangle counts once
        for c in adj[a] & adj[b]:
            if c > b:
                for v in (a, b, c):
                    counts[v] = counts.get(v, 0) + 1
    return counts


def test_run_pairs_matches_combinations():
    from legislation_scraper_ray.pipelines.queries import _run_pairs

    rng = np.random.default_rng(7)
    counts = rng.integers(0, 6, size=40)
    i_idx, j_idx = _run_pairs(counts.astype(np.int64))
    starts = np.cumsum(counts) - counts
    want = []
    for s, c in zip(starts, counts):
        want.extend(combinations(range(s, s + c), 2))
    got = list(zip(i_idx.tolist(), j_idx.tolist()))
    assert got == want


def test_link_triangles_matches_brute_force(ray_session):
    from legislation_scraper_ray.pipelines.queries import link_triangles
    from legislation_scraper_ray.sources.corpus import generate

    corpus_dir = generate("t1")
    want = _brute_triangles(corpus_dir)
    got = link_triangles("/root/testdata/sf0.001")
    assert len(want) > 0  # non-vacuous: t1 has triangles (18 at last count)
    assert got["n_triangles"].sum() == 3 * (sum(want.values()) // 3)
    got_map = dict(zip(got["url"], got["n_triangles"]))
    assert got_map == want
    assert (got["n_triangles"] > 0).all()
    # output ordering contract: n desc, then url asc
    key = list(zip(-got["n_triangles"], got["url"]))
    assert key == sorted(key)
