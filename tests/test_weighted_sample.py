"""weighted_sample_docs: A-ES weighted sampling without replacement must
match a dense numpy replay exactly, sit far from the cross-engine float
boundary (numpy log vs DuckDB ln, ≤1 ulp), and actually weight by token
mass."""

import numpy as np
import pyarrow.compute as pc
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"
K = 50


def _dense_keys():
    from legislation_scraper_ray.functions.hashing import splitmix64

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    ids = t["doc_id"].to_numpy().astype(np.uint64)
    w = pc.list_value_length(pc.split_pattern(t["text"], " ")) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    u = ((splitmix64(ids) >> np.uint64(11)) + np.uint64(1)) \
        .astype(np.float64) * 2.0 ** -53
    return ids.view(np.int64), w, np.log(u) / w


def test_matches_dense_replay(ray_session):
    from legislation_scraper_ray.pipelines.analytics import weighted_sample_docs

    got = weighted_sample_docs(SF, k=K)
    ids, w, key = _dense_keys()
    order = np.lexsort((ids, -key))[:K]
    assert got["doc_id"].tolist() == ids[order].tolist()
    assert got["w"].tolist() == w[order].tolist()
    np.testing.assert_allclose(got["skey"].to_numpy(), np.round(key[order], 9),
                               rtol=0, atol=1e-12)


def test_selection_boundary_margin():
    """The k-th/k+1-th key gap must dwarf the ≤1-ulp ln() divergence between
    numpy and DuckDB — otherwise conformance would be float-flippable."""
    _, _, key = _dense_keys()
    s = np.sort(key)[::-1]
    gap = s[K - 1] - s[K]
    assert gap > 1e-9 * max(abs(s[K - 1]), abs(s[K]))


def test_weights_matter():
    """Sampling ∝ token mass: the sampled docs' mean token count must exceed
    the corpus mean (k=50 of 500 docs; a uniform sample would match it)."""
    ids, w, key = _dense_keys()
    order = np.lexsort((ids, -key))[:K]
    assert w[order].mean() > w.mean()


def test_grouped_matches_dense_replay(ray_session):
    import pandas as pd

    from legislation_scraper_ray.pipelines.analytics import weighted_sample_by_lang

    got = (weighted_sample_by_lang(SF, k=20).to_pandas()
           .sort_values(["lang", "skey", "doc_id"],
                        ascending=[True, False, True], ignore_index=True))
    ids, w, key = _dense_keys()
    lang = pq.read_table(f"{SF}/documents.parquet", columns=["lang"]) \
        ["lang"].to_pylist()
    df = pd.DataFrame({"lang": lang, "doc_id": ids, "w": w, "key": key})
    want = (df.sort_values(["lang", "key", "doc_id"],
                           ascending=[True, False, True])
            .groupby("lang").head(20).reset_index(drop=True))
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["w"].tolist() == want["w"].tolist()
    np.testing.assert_allclose(got["skey"].to_numpy(),
                               np.round(want["key"].to_numpy(), 9),
                               rtol=0, atol=1e-12)


def test_grouped_boundary_margins():
    import pandas as pd

    ids, w, key = _dense_keys()
    lang = pq.read_table(f"{SF}/documents.parquet", columns=["lang"]) \
        ["lang"].to_pylist()
    df = pd.DataFrame({"lang": lang, "key": key})
    for _, g in df.groupby("lang"):
        s = np.sort(g["key"].to_numpy())[::-1]
        if len(s) > 20:
            gap = s[19] - s[20]
            assert gap > 1e-9 * max(abs(s[19]), abs(s[20]))
