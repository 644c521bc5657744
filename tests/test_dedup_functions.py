"""Dedup-family correctness on planted duplicates (brute-force ground truth)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from legislation_scraper_ray.functions.dedup import (
    hamming64,
    jaccard_shingles,
    mine_bucket_pairs,
    minhash_signatures,
    simhash64,
)


def _docs_with_dups(n=200, seed=0):
    """Word-salad docs; plant exact dups and near-dups (1-word edits)."""
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(50)]
    texts = [" ".join(rng.choice(vocab, 40)) for i in range(n)]
    texts[10] = texts[0]  # exact dup
    t = texts[1].split()
    t[5] = "CHANGED"  # near dup (1 of 40 words)
    texts[11] = " ".join(t)
    texts[12] = texts[2]  # exact dup
    return pa.table({"doc_id": pa.array(range(n), pa.int64()), "text": pa.array(texts)})


def _brute_force_pairs(tbl, threshold):
    texts = tbl["text"].to_pylist()
    n = len(texts)
    pairs = set()
    shingles = [frozenset(zip(t.split()[:-2], t.split()[1:-1], t.split()[2:])) for t in texts]
    for i in range(n):
        for j in range(i + 1, n):
            inter = len(shingles[i] & shingles[j])
            union = len(shingles[i] | shingles[j])
            if union and inter / union >= threshold:
                pairs.add((i, j))
    return pairs


def test_minhash_lsh_finds_all_near_dups():
    tbl = _docs_with_dups()
    truth = _brute_force_pairs(tbl, 0.85)
    assert len(truth) >= 3  # the planted dups
    sigs = minhash_signatures(tbl).to_pandas()
    found = set(
        map(tuple, mine_bucket_pairs(sigs)[["doc_a", "doc_b"]].itertuples(index=False))
    )
    # LSH candidates must contain every true pair (recall 1 at J≥0.85 with
    # 32 bands × 4 rows: miss prob (1-0.85^4)^32 ≈ 3e-8)
    assert truth <= found
    # verification step kills false candidates
    texts = tbl["text"].to_pylist()
    verified = {
        (a, b)
        for a, b in found
        if jaccard_shingles([texts[a]], [texts[b]])[0] >= 0.85
    }
    assert verified == truth


def test_simhash_detects_exact_and_near():
    tbl = _docs_with_dups()
    out = simhash64(tbl)
    sh = out["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
    assert sh[0] == sh[10]  # exact dup → identical simhash
    assert hamming64(sh[1:2], sh[11:12])[0] <= 8  # 1-word edit → close
    rng_pairs = hamming64(sh[0:1], sh[50:51])[0]
    assert rng_pairs > 8  # unrelated docs are far


def test_jaccard_shingles_bounds():
    assert jaccard_shingles(["a b c d"], ["a b c d"])[0] == 1.0
    assert jaccard_shingles(["a b c d"], ["x y z w"])[0] == 0.0
    j = jaccard_shingles(["a b c d e f"], ["a b c d e CHANGED"])[0]
    assert 0.3 < j < 0.9


def test_adaptive_bits_scales_with_corpus():
    from legislation_scraper_ray.functions.dedup import adaptive_bits

    small, big = adaptive_bits(2_000), adaptive_bits(20_000)
    assert big > small
    assert adaptive_bits(10**10) == 24  # clamped ceiling


def test_banded_lsh_bucket_population_bounded_at_10x():
    """Candidate volume must stay ~O(n) when the corpus grows 10× (the r1
    fixed-64-bucket layout went quadratic)."""
    from legislation_scraper_ray.functions.dedup import adaptive_bits, hyperplane_bands

    rng = np.random.default_rng(7)
    per_vec = {}
    for n in (2_000, 20_000):
        v = rng.standard_normal((n, 64))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        b = hyperplane_bands(v, n_bands=8, n_bits=adaptive_bits(n))
        cand_pairs = 0
        for band in range(8):
            _, counts = np.unique(b[:, band], return_counts=True)
            cand_pairs += int((counts * (counts - 1) // 2).sum())
        per_vec[n] = cand_pairs / n
        assert cand_pairs < 16 * n  # O(1) candidates per vector
    # growing the corpus 10× must NOT grow the per-vector candidate load
    assert per_vec[20_000] <= per_vec[2_000] * 1.5


def test_banded_lsh_finds_planted_near_dups():
    from legislation_scraper_ray.functions.dedup import adaptive_bits, hyperplane_bands

    rng = np.random.default_rng(11)
    base = rng.standard_normal((500, 64))
    dup = base[:20] + rng.standard_normal((20, 64)) * 0.004  # cos ≈ 0.9999
    v = np.vstack([base, dup])
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    b = hyperplane_bands(v, n_bands=8, n_bits=adaptive_bits(len(v)))
    share = (b[:20] == b[500:]).any(axis=1)  # planted pair collides in ≥1 band
    assert share.all()


def test_pack_unpack_matrix_roundtrip():
    from legislation_scraper_ray.functions.ann import pack_matrix, unpack_matrix

    rng = np.random.default_rng(3)
    m = rng.standard_normal((17, 8)).astype(np.float32)
    col = pack_matrix(m)
    back = unpack_matrix(pa.chunked_array([col]))
    np.testing.assert_array_equal(back.astype(np.float32), m)
    # sliced column (non-zero offset) must unpack the right rows
    back2 = unpack_matrix(col.slice(5, 7))
    np.testing.assert_array_equal(back2.astype(np.float32), m[5:12])


def test_prefix_filter_exact_jaccard_join(tmp_path):
    """End-to-end exact similarity join (inverted index + AllPairs prefix
    filter) must equal brute-force Jaccard ≥ 0.8 on planted near-dups."""
    import pyarrow.parquet as pq

    from legislation_scraper_ray.pipelines.queries import jaccard_dup_pairs

    tbl = _docs_with_dups(n=120, seed=3)
    # plant a 0.8-ish near-dup: 2-word edit of doc 3
    t = tbl["text"].to_pylist()
    w = t[3].split()
    w[7], w[20] = "EDIT1", "EDIT2"
    t[13] = " ".join(w)
    tbl = pa.table({"doc_id": pa.array(range(len(t)), pa.int64()), "text": pa.array(t)})
    pq.write_table(tbl, tmp_path / "documents.parquet")

    truth = _brute_force_pairs(tbl, 0.8)
    assert len(truth) >= 3
    out = jaccard_dup_pairs(str(tmp_path), threshold=0.8)
    found = set(map(tuple, out[["doc_a", "doc_b"]].itertuples(index=False)))
    assert found == truth
    # jaccard values are the exact string-shingle values
    texts = tbl["text"].to_pylist()
    for _, r in out.iterrows():
        expect = jaccard_shingles([texts[int(r.doc_a)]], [texts[int(r.doc_b)]])[0]
        assert abs(r.jaccard - expect) < 1e-3


def test_prefix_filter_shrinks_index():
    """The prefix filter must index ≤ (1-t)·|A|+1 shingles per doc and keep
    every true pair reachable (completeness is covered end-to-end above)."""
    import pandas as pd

    from legislation_scraper_ray.functions.dedup import prefix_filter_rows, shingle_rows

    tbl = _docs_with_dups(n=100, seed=1)
    sh = shingle_rows(tbl).to_pandas()
    df_counts = sh.groupby("sh_hash").size().rename("df").reset_index()
    merged = sh.merge(df_counts, on="sh_hash")
    pref = prefix_filter_rows(merged, threshold=0.8)
    per_doc = pref.groupby("doc_id").size()
    n_sh = sh.groupby("doc_id")["n_sh"].first()
    limit = (n_sh - np.ceil(0.8 * n_sh) + 1).astype(int)
    assert (per_doc <= limit.loc[per_doc.index]).all()
    assert len(pref) < 0.45 * len(sh)  # ~t of the index is gone
