import numpy as np
import pandas as pd
import pyarrow as pa

from legislation_scraper_ray.functions.cluster import label_propagation, union_find_components


def test_label_propagation_matches_union_find():
    rng = np.random.default_rng(0)
    # random sparse graph with several components
    edges = pd.DataFrame({
        "doc_a": rng.integers(0, 300, 200), "doc_b": rng.integers(0, 300, 200)})
    edges = edges[edges.doc_a != edges.doc_b]
    uf = union_find_components(edges)
    lp = label_propagation(pa.Table.from_pandas(edges)).to_pandas()
    got = dict(zip(lp["doc_id"].astype(int), lp["cluster_id"].astype(int)))
    assert got == uf


def test_chain_component():
    # a long chain needs multiple propagation rounds
    edges = pa.table({"doc_a": pa.array(list(range(0, 50)), pa.int64()),
                      "doc_b": pa.array(list(range(1, 51)), pa.int64())})
    lp = label_propagation(edges).to_pandas()
    assert (lp["cluster_id"] == 0).all()


def test_dup_clusters_query(ray_session):
    from legislation_scraper_ray.pipelines.queries import dup_clusters, minhash_dup_pairs

    clusters = dup_clusters("/root/testdata/sf0.001")
    pairs = minhash_dup_pairs("/root/testdata/sf0.001")
    if hasattr(pairs, "to_pandas"):
        pairs = pairs.to_pandas()
    uf = union_find_components(pairs)
    got = dict(zip(clusters["doc_id"].astype(int), clusters["cluster_id"].astype(int)))
    assert got == uf
    assert (clusters["cluster_size"] >= 2).all()  # every clustered doc has a partner


def test_distributed_branch_matches_driver_kernel(ray_session):
    """Force dup_clusters' big-pair-graph branch (_clusters_distributed /
    _cc_labels) on the same pair set and require byte-identical output to
    the driver-side label kernel — including a long chain (multi-round
    propagation) and an isolated-pair component."""
    import numpy as np
    import ray.data as rd

    from legislation_scraper_ray.pipelines.queries import _clusters_distributed

    chain = pd.DataFrame({"doc_a": np.arange(0, 60, dtype=np.int64),
                          "doc_b": np.arange(1, 61, dtype=np.int64)})
    extra = pd.DataFrame({"doc_a": np.array([100, 200, 201], dtype=np.int64),
                          "doc_b": np.array([101, 201, 202], dtype=np.int64)})
    pairs = pd.concat([chain, extra], ignore_index=True)

    got = (_clusters_distributed(rd.from_pandas(pairs))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))

    lp = label_propagation(
        pa.Table.from_pandas(pairs), max_rounds=128).to_pandas()
    sizes = lp.groupby("cluster_id")["doc_id"].transform("size")
    lp["cluster_size"] = sizes.astype("int64")
    want = lp.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["doc_id", "cluster_id", "cluster_size"]],
        want[["doc_id", "cluster_id", "cluster_size"]], check_dtype=False)
