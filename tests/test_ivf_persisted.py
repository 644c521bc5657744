"""Persisted IVF index: full-probe == exact brute force, partition-pruned
probe reads only its cells, store reuse across calls."""

import glob
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _embeddings(tmp_path, n=600, dim=16, seed=7):
    rng = np.random.default_rng(seed)
    v = rng.standard_normal((n, dim))
    tbl = pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array(list(v.astype(float)), pa.list_(pa.float64())),
    })
    pq.write_table(tbl, tmp_path / "embeddings.parquet")
    return tbl


def test_full_probe_matches_brute_force_and_store_reuse(ray_session, tmp_path):
    _embeddings(tmp_path)
    from legislation_scraper_ray.pipelines.queries import ann_topk, ann_topk_ivf_persisted

    exact = ann_topk(str(tmp_path)).reset_index(drop=True)
    # probing EVERY cell must reproduce the exact result; the
    # self-certifying recall column must then read exactly 1.0
    full = ann_topk_ivf_persisted(str(tmp_path), n_probe=10**6).reset_index(drop=True)
    assert (full["recall_at_k"] == 1.0).all()
    pd.testing.assert_frame_equal(
        exact.sort_values("rank").reset_index(drop=True),
        full.drop(columns=["recall_at_k"]).sort_values("rank").reset_index(drop=True),
    )
    from legislation_scraper_ray.pipelines.queries import (
        _fingerprinted_store, _ivf_store_params,
    )

    store, ready, _ = _fingerprinted_store(f"{tmp_path}/embeddings.parquet",
                                           "/tmp/graft_ivf",
                                           params=_ivf_store_params(4096))
    assert ready
    marker = os.path.join(store, "_complete")
    m0 = os.path.getmtime(marker)
    # default narrow probe: self-retrieval at rank 1 (query = vec 0), and the
    # store is reused, not rebuilt
    narrow = ann_topk_ivf_persisted(str(tmp_path), n_probe=2)
    top = narrow.sort_values("rank").iloc[0]
    assert top["vec_id"] == 0 and abs(top["cos_sim"] - 1.0) < 1e-6
    assert os.path.getmtime(marker) == m0
    # the index is genuinely cell-partitioned on disk
    cells = glob.glob(os.path.join(store, "cells", "cell=*"))
    assert len(cells) >= 4


def test_narrow_probe_is_subset_scan(ray_session, tmp_path):
    """A 1-cell probe scores only vectors assigned to that cell — every
    returned neighbor must belong to the probed cell's partition."""
    _embeddings(tmp_path, seed=8)
    from legislation_scraper_ray.pipelines.queries import ann_topk_ivf_persisted

    out = ann_topk_ivf_persisted(str(tmp_path), n_probe=1)
    from legislation_scraper_ray.pipelines.queries import (
        _fingerprinted_store, _ivf_store_params,
    )

    store, _, _ = _fingerprinted_store(f"{tmp_path}/embeddings.parquet",
                                       "/tmp/graft_ivf",
                                       params=_ivf_store_params(4096))
    # members of all cells, keyed by cell dir
    import pyarrow.dataset as pads

    members = set()
    # the query's single probed cell is whichever cell contains vec 0's
    # nearest centroid; recover it as the one whose members superset the out
    for d in glob.glob(os.path.join(store, "cells", "cell=*")):
        ids = set(pads.dataset(d).to_table(columns=["vec_id"])["vec_id"].to_pylist())
        if set(out["vec_id"]).issubset(ids):
            members = ids
            break
    assert members, "returned neighbors are not contained in any single cell"


def test_store_key_includes_build_params(tmp_path):
    """ADVICE r3: the store fingerprint must fold in build parameters and a
    code-version salt, so a different train_sample (or edited builder code)
    can never silently reuse a stale index."""
    import pyarrow as pa
    import pyarrow.parquet as pq_

    from legislation_scraper_ray.pipelines.queries import (
        _fingerprinted_store, _ivf_store_params, _minhash_store_params,
    )

    pq_.write_table(pa.table({"x": [1]}), tmp_path / "embeddings.parquet")
    src = f"{tmp_path}/embeddings.parquet"
    s_a, _, _ = _fingerprinted_store(src, "/tmp/graft_ivf",
                                     params=_ivf_store_params(4096))
    s_b, _, _ = _fingerprinted_store(src, "/tmp/graft_ivf",
                                     params=_ivf_store_params(2048))
    s_c, _, _ = _fingerprinted_store(src, "/tmp/graft_ivf",
                                     params=_ivf_store_params(4096))
    assert s_a != s_b      # parameter change → new store
    assert s_a == s_c      # same config → same store (reuse still works)
    assert "code=" in _minhash_store_params()
