"""link_components: the distributed min-label fixpoint must equal an exact
union-find over the same undirected edge list, converge via the changed==0
early exit, and size every component correctly."""

import numpy as np
import pyarrow.compute as pc
import pyarrow.parquet as pq


def _union_find(corpus_dir: str):
    from legislation_scraper_ray.functions.cluster import union_find_components
    from legislation_scraper_ray.functions.hashing import hash64
    import pandas as pd

    t = pq.read_table(f"{corpus_dir}/web_graph.parquet",
                      columns=["url", "out_links"])
    links = t["out_links"].combine_chunks()
    parents = pc.list_parent_indices(links).to_numpy(zero_copy_only=False)
    src = hash64(t["url"])[parents].view(np.int64)
    dst = hash64(pc.list_flatten(links)).view(np.int64)
    keep = src != dst
    pairs = pd.DataFrame({"doc_a": src[keep], "doc_b": dst[keep]})
    comp = union_find_components(pairs)
    # isolated pages (no edges at all) are their own component
    for n in hash64(t["url"]).view(np.int64):
        comp.setdefault(int(n), int(n))
    return comp


def test_matches_union_find(ray_session):
    from legislation_scraper_ray.pipelines.queries import link_components
    from legislation_scraper_ray.sources.corpus import generate

    corpus_dir = generate("t1")
    got = link_components("/root/testdata/sf0.001").to_pandas()
    want = _union_find(corpus_dir)
    assert len(got) == len(want)
    got_map = dict(zip(got["node"], got["component_id"]))
    assert got_map == want
    # sizes consistent with the label multiset
    sizes = got.groupby("component_id").size()
    for row in got.itertuples():
        assert row.component_size == sizes[row.component_id]
    # every page url resolved
    assert got["url"].notna().all()


def test_early_exit_rounds(ray_session):
    """A generous max_rounds must not change the result (the loop exits on
    the converged round, not the budget)."""
    from legislation_scraper_ray.pipelines.queries import link_components

    a = (link_components("/root/testdata/sf0.001", max_rounds=32)
         .to_pandas().sort_values("node", ignore_index=True))
    b = (link_components("/root/testdata/sf0.001", max_rounds=6)
         .to_pandas().sort_values("node", ignore_index=True))
    import pandas as pd
    pd.testing.assert_frame_equal(a, b)
