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
