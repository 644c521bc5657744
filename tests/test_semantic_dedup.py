"""Planted-duplicate recall for the semantic-dedup and cross-corpus-dedup
operators.  The driver corpus at sf0.01 has no embedding near-dups (the
semantic_dedup oracle passes with an all-zero flag column), so these tests
pin the non-vacuous behavior: every planted duplicate is flagged/paired and
nothing else is."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _planted_embeddings(n=400, n_dup=30, dim=16, seed=9):
    """Tail vectors n-n_dup..n-1 are near-copies (cos > 0.999) of vectors
    0..n_dup-1; the random remainder stays far below the 0.99 threshold."""
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


def test_semantic_dedup_flags_planted_tail(ray_session, tmp_path):
    n, n_dup = 400, 30
    pq.write_table(_planted_embeddings(n, n_dup), tmp_path / "embeddings.parquet")
    from legislation_scraper_ray.pipelines.queries import semantic_dedup

    out = semantic_dedup(str(tmp_path)).to_pandas().sort_values("vec_id")
    assert len(out) == n
    flags = out.set_index("vec_id")["is_dup"]
    # SemDeDup keeps the lowest-id representative: originals 0, copies 1
    assert (flags.loc[: n_dup - 1] == 0).all()
    assert (flags.loc[n - n_dup:] == 1).all()
    assert int(flags.sum()) == n_dup


def test_semantic_dedup_no_dups_all_kept(ray_session, tmp_path):
    tbl = _planted_embeddings(n=100, n_dup=0)
    pq.write_table(tbl, tmp_path / "embeddings.parquet")
    from legislation_scraper_ray.pipelines.queries import semantic_dedup

    out = semantic_dedup(str(tmp_path)).to_pandas()
    assert len(out) == 100 and int(out["is_dup"].sum()) == 0


def test_semantic_dedup_large_clique_and_nonmin_partner(ray_session, tmp_path):
    """Exercises both flag passes of the bucket-local kernel: a 150-vector
    homogeneous clique (pass 1: everyone matches the run-min vector), plus a
    vector OUTSIDE threshold of its bucket's min but INSIDE threshold of a
    higher (non-min) lower-id member — only the any-lower fallback (pass 2)
    can flag it."""
    rng = np.random.default_rng(3)
    dim, n_rand, n_clique = 16, 100, 150
    rand = rng.standard_normal((n_rand, dim))
    clique = rand[0] + rng.standard_normal((n_clique, dim)) * 1e-4
    # co-planar chain: u0 at 0°, u1 at 5°, v at 10° (cos 10° ≈ 0.985 < 0.99,
    # cos 5° ≈ 0.996 ≥ 0.99) — v's only qualifying lower partner is u1
    e1, e2 = np.zeros(dim), np.zeros(dim)
    e1[0] = 1.0
    e2[1] = 1.0
    ang = np.deg2rad([0.0, 5.0, 10.0])
    chain = np.stack([np.cos(a) * e1 + np.sin(a) * e2 for a in ang])
    v = np.vstack([rand, clique, chain])
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    n = len(v)
    tbl = pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array(list(v.astype(float)), pa.list_(pa.float64())),
    })
    pq.write_table(tbl, tmp_path / "embeddings.parquet")
    from legislation_scraper_ray.pipelines.queries import semantic_dedup

    flags = (semantic_dedup(str(tmp_path)).to_pandas()
             .set_index("vec_id")["is_dup"].sort_index())
    assert len(flags) == n
    # the whole clique (copies of vec 0) is flagged; vec 0 survives
    assert flags.loc[0] == 0
    assert (flags.loc[n_rand : n_rand + n_clique - 1] == 1).all()
    u0, u1, vv = n_rand + n_clique, n_rand + n_clique + 1, n_rand + n_clique + 2
    assert flags.loc[u0] == 0      # chain head has no lower partner
    assert flags.loc[u1] == 1      # 5° from u0 → pass 1
    assert flags.loc[vv] == 1      # 10° from u0, 5° from u1 → pass 2 only
    # brute-force cross-check of the full flag vector
    sims = v @ v.T
    expect = np.array([bool((sims[i, :i] >= 0.99).any()) for i in range(n)])
    assert (flags.to_numpy().astype(bool) == expect).all()


def test_crosscorpus_pairs_planted_copies(ray_session, tmp_path):
    """Odd (new-snapshot) docs copying an even (base) doc are reported as
    (new, base) pairs at J=1.0; same-side exact copies are NOT reported."""
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(80)]
    n = 200
    texts = [" ".join(rng.choice(vocab, 30)) for _ in range(n)]
    planted = {151: 18, 163: 42, 187: 88}  # odd new_doc -> even base_doc
    for new, base in planted.items():
        texts[new] = texts[base]
    texts[196] = texts[100]  # even-even copy: must not appear
    texts[199] = texts[175]  # odd-odd copy: must not appear
    tbl = pa.table({"doc_id": pa.array(range(n), pa.int64()), "text": pa.array(texts)})
    pq.write_table(tbl, tmp_path / "documents.parquet")
    from legislation_scraper_ray.pipelines.queries import crosscorpus_dup_pairs

    out = crosscorpus_dup_pairs(str(tmp_path))
    got = dict(zip(out["new_doc"], out["base_doc"]))
    assert got == planted
    assert (out["jaccard"] == 1.0).all()
    pd.testing.assert_index_equal(out.columns, pd.Index(["new_doc", "base_doc", "jaccard"]))


def test_semantic_dedup_near_threshold_boundary(ray_session, tmp_path):
    """Recall at the THRESHOLD boundary (the vacuity ADVICE flagged: the
    driver corpus has no near-dups, so its oracle pass proves nothing about
    recall).  Plant 20 pairs JUST ABOVE threshold (7.5°, cos ≈ 0.99144) and
    20 JUST BELOW (9.5°, cos ≈ 0.98629): every above-pair must be flagged
    (at 8 bands the per-pair analytic miss probability is ≤ ~1e-3 — 20
    independent pairs all passing pins band recall), and no below-pair may
    be."""
    rng = np.random.default_rng(17)
    dim, n_pairs = 16, 20

    def rotate(u, theta):
        r = rng.standard_normal(len(u))
        r -= (r @ u) * u
        r /= np.linalg.norm(r)
        return np.cos(theta) * u + np.sin(theta) * r

    base = rng.standard_normal((2 * n_pairs, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    above = np.stack([rotate(base[i], np.deg2rad(7.5)) for i in range(n_pairs)])
    below = np.stack([rotate(base[n_pairs + i], np.deg2rad(9.5))
                      for i in range(n_pairs)])
    sea = rng.standard_normal((200, dim))
    sea /= np.linalg.norm(sea, axis=1, keepdims=True)
    v = np.vstack([base, above, below, sea])
    n = len(v)
    cos_above = (base[:n_pairs] * above).sum(axis=1)
    cos_below = (base[n_pairs:] * below).sum(axis=1)
    assert (cos_above >= 0.99).all() and (cos_below < 0.99).all()
    tbl = pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array(list(v.astype(float)), pa.list_(pa.float64())),
    })
    pq.write_table(tbl, tmp_path / "embeddings.parquet")
    from legislation_scraper_ray.pipelines.queries import semantic_dedup

    flags = (semantic_dedup(str(tmp_path)).to_pandas()
             .set_index("vec_id")["is_dup"].sort_index())
    # exact brute-force ground truth over the whole planted table
    sims = v @ v.T
    expect = np.array([bool((sims[i, :i] >= 0.99).any()) for i in range(n)])
    # above-threshold partners (ids 2n_pairs..3n_pairs-1) are all flagged
    assert (flags.to_numpy().astype(bool) == expect).all()
    assert (flags.loc[2 * n_pairs : 3 * n_pairs - 1] == 1).all()
    # below-threshold partners must NOT be flagged by their planted base
    # (expect[] already encodes any accidental sea collisions)
    assert expect[2 * n_pairs : 3 * n_pairs].all()
