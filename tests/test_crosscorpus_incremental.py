"""Persisted-base-signature incremental cross-corpus dedup: identical output
to the symmetric operator, the store is reused while the corpus fingerprint
holds, and a changed corpus rebuilds it."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _docs(tmp_path, planted, n=200, seed=11):
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(80)]
    texts = [" ".join(rng.choice(vocab, 30)) for _ in range(n)]
    for new, base in planted.items():
        texts[new] = texts[base]
    tbl = pa.table({"doc_id": pa.array(range(n), pa.int64()), "text": pa.array(texts)})
    pq.write_table(tbl, tmp_path / "documents.parquet")


def _sorted(df):
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_incremental_matches_symmetric_and_reuses_store(ray_session, tmp_path):
    planted = {151: 18, 163: 42, 187: 88}
    _docs(tmp_path, planted)
    from legislation_scraper_ray.pipelines.queries import (
        crosscorpus_dup_pairs,
        crosscorpus_dup_pairs_incremental,
    )

    from legislation_scraper_ray.pipelines.queries import (
        _fingerprinted_store, _minhash_store_params,
    )

    sym = _sorted(crosscorpus_dup_pairs(str(tmp_path)))
    inc = _sorted(crosscorpus_dup_pairs_incremental(str(tmp_path)))
    pd.testing.assert_frame_equal(sym, inc)
    assert dict(zip(inc["new_doc"], inc["base_doc"])) == planted

    store, ready, _ = _fingerprinted_store(
        f"{tmp_path}/documents.parquet", "/tmp/graft_minhash_base",
        params=_minhash_store_params())
    assert ready  # the first run published the content-addressed store
    marker = os.path.join(store, "_complete")
    m0 = os.path.getmtime(marker)
    # second run: store must be REUSED (marker untouched), result unchanged
    inc2 = _sorted(crosscorpus_dup_pairs_incremental(str(tmp_path)))
    pd.testing.assert_frame_equal(inc, inc2)
    assert os.path.getmtime(marker) == m0

    # corpus change (different planted copies) → new fingerprint → NEW store
    # (the old one is never mutated); results follow the NEW corpus
    planted2 = {101: 2, 199: 44}
    _docs(tmp_path, planted2, seed=12)
    inc3 = crosscorpus_dup_pairs_incremental(str(tmp_path))
    assert dict(zip(inc3["new_doc"], inc3["base_doc"])) == planted2
    store2, ready2, _ = _fingerprinted_store(
        f"{tmp_path}/documents.parquet", "/tmp/graft_minhash_base",
        params=_minhash_store_params())
    assert ready2 and store2 != store
    assert os.path.getmtime(marker) == m0  # old store untouched
