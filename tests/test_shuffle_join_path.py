"""The shuffle-join branch of ``_pairs_join_payload`` — the 100-TB scale path
of minhash/jaccard/embedding dedup — must produce output identical to the
broadcast fast path (VERDICT r2 item 2: the branch was dead code under test).

Forcing is via ``broadcast_pairs_max=0`` (directly, or through
``$GRAFT_BROADCAST_PAIRS_MAX`` for the end-to-end query functions — the same
knob lets the DuckDB oracle suite exercise the branch)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _planted_docs(n=300, n_dup=40, seed=5):
    """High-dup word-salad corpus: ``n_dup`` docs are exact copies of earlier
    docs (so the candidate pair set is well above toy size)."""
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(60)]
    texts = [" ".join(rng.choice(vocab, 30)) for _ in range(n)]
    for i in range(n_dup):
        texts[n - n_dup + i] = texts[i]
    return pa.table({"doc_id": pa.array(range(n), pa.int64()), "text": pa.array(texts)})


def _planted_embeddings(n=400, n_dup=30, dim=16, seed=9):
    rng = np.random.default_rng(seed)
    v = rng.standard_normal((n, dim))
    v[n - n_dup:] = v[:n_dup] + rng.standard_normal((n_dup, dim)) * 1e-4
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(list(v.astype(float)), pa.list_(pa.float64())),
        }
    )


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_pairs_join_payload_branches_identical(ray_session):
    """Same candidate set + payload table through BOTH branches → identical
    paired output (the broadcast plan is the ground truth; the shuffle plan is
    the at-scale one)."""
    import ray.data as rd

    from legislation_scraper_ray.pipelines.queries import _pairs_join_payload

    rng = np.random.default_rng(2)
    ids = np.arange(120, dtype=np.int64)
    a = rng.choice(ids, 200)
    b = rng.choice(ids, 200)
    keep = a != b
    cands = rd.from_arrow(
        pa.table({"doc_a": pa.array(np.minimum(a, b)[keep]),
                  "doc_b": pa.array(np.maximum(a, b)[keep])})
    )
    payload = rd.from_arrow(
        pa.table({"doc_id": pa.array(ids), "text": pa.array([f"payload {i}" for i in ids])})
    )
    outs = []
    for cap in (10**9, 0):  # broadcast plan, then forced shuffle-join plan
        paired = _pairs_join_payload(cands, payload, "doc_id", "text",
                                     broadcast_pairs_max=cap)
        outs.append(_sorted(paired.to_pandas()))
    assert len(outs[0]) > 50
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_minhash_dedup_shuffle_branch_identical(ray_session, tmp_path, monkeypatch):
    tbl = _planted_docs()
    pq.write_table(tbl, tmp_path / "documents.parquet")
    from legislation_scraper_ray.pipelines.queries import minhash_dup_pairs

    base = _sorted(minhash_dup_pairs(str(tmp_path)))
    assert len(base) >= 40  # the planted exact dups all verify at J≥0.95
    monkeypatch.setenv("GRAFT_BROADCAST_PAIRS_MAX", "0")
    forced = _sorted(minhash_dup_pairs(str(tmp_path)))
    pd.testing.assert_frame_equal(base, forced)


def test_embedding_dedup_shuffle_branch_identical(ray_session, tmp_path, monkeypatch):
    tbl = _planted_embeddings()
    pq.write_table(tbl, tmp_path / "embeddings.parquet")
    from legislation_scraper_ray.pipelines.queries import embedding_dup_pairs

    base = _sorted(embedding_dup_pairs(str(tmp_path)))
    assert len(base) >= 30  # every planted near-identical vector pair found
    monkeypatch.setenv("GRAFT_BROADCAST_PAIRS_MAX", "0")
    forced = _sorted(embedding_dup_pairs(str(tmp_path)))
    pd.testing.assert_frame_equal(base, forced)
