"""Adamic–Adar link prediction: distributed wedge pipeline vs a dense
Python brute force on the t1 graph, plus the float-margin guards that make
the 9-dp rounded conformance hash trustworthy."""

from collections import defaultdict

import math

import numpy as np
import pyarrow.compute as pc
import pyarrow.parquet as pq


def _brute(corpus_dir: str, max_deg: int = 512):
    t = pq.read_table(f"{corpus_dir}/web_graph.parquet",
                      columns=["url", "out_links"])
    urls = t["url"].to_pylist()
    links = t["out_links"].to_pylist()
    edges = set()
    for u, ls in zip(urls, links):
        for d in ls or []:
            if d != u:
                edges.add((min(u, d), max(u, d)))
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    scores = defaultdict(float)
    common = defaultdict(int)
    for y, ns in adj.items():
        if len(ns) > max_deg:
            continue
        ns = sorted(ns)
        w = 1.0 / math.log(len(ns)) if len(ns) >= 2 else 0.0
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                pair = (min(ns[i], ns[j]), max(ns[i], ns[j]))
                scores[pair] += w
                common[pair] += 1
    return {p: (common[p], s) for p, s in scores.items()
            if p not in edges}


def test_matches_brute_force(ray_session):
    from legislation_scraper_ray.pipelines.queries import adamic_adar_links
    from legislation_scraper_ray.sources.corpus import generate

    corpus_dir = generate("t1")
    got = adamic_adar_links("/root/testdata/sf0.001", k=50, round_to=None)
    want = _brute(corpus_dir)
    assert len(got) == min(50, len(want))
    for row in got.itertuples():
        pair = (row.url_a, row.url_b)
        assert pair in want, pair
        n, s = want[pair]
        assert row.n_common == n
        assert abs(row.score - s) < 1e-9
    # the engine's top-k really is the global top-k of the brute scores
    kth = sorted((s for _, s in want.values()), reverse=True)[len(got) - 1]
    assert got["score"].min() >= kth - 1e-9


def test_float_margins(ray_session):
    """Scores must sit far from both failure boundaries: the 9-dp rounding
    edge (cross-engine sums diverge by ~ulps) and the k-th/k+1-th cutoff."""
    from legislation_scraper_ray.sources.corpus import generate

    corpus_dir = generate("t1")
    want = _brute(corpus_dir)
    s = np.sort(np.array([v for _, v in want.values()]))[::-1]
    # distance to nearest 0.5e-9 rounding boundary
    frac = np.abs((s * 1e9) % 1.0 - 0.5)
    assert frac.min() > 1e-4  # ≥ 1e-13 absolute vs ~1e-15 divergence
    if len(s) > 50:
        gap = s[49] - s[50]
        # an exact tie is safe (identical term multisets → bit-equal sums,
        # and the hash tie-break is mirrored in the oracle); a NEAR-tie
        # within float-divergence reach would be flippable
        assert gap == 0.0 or gap > 1e-12
