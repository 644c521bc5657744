"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Semantics anchor for exact dedup: the reference's
``drop_duplicates(subset=["document_url"])`` (src/datasets/build_dataset.py:204)
— first-wins by key.  The near-dup family is the standard large-corpus
extension (not in the reference; required engine capability).

Scale design:
- exact dedup: content-hash in a vectorized ``map_batches`` →
  ``groupby(hash)`` (8-byte shuffle keys, never the payload strings) →
  first-wins inside ``map_groups``.
- MinHash: per-batch vectorized signatures (token-trigram shingles →
  segmented ``minimum.reduceat`` over 128 universal-hash permutations), exploded to
  (band, band_hash, doc_id) rows — the LSH bucket join is a ``groupby`` on a
  16-byte key; candidate verification runs inside each bucket group only.
- SimHash: 64-bit sign-aggregated token hashes; banding on 4×16-bit chunks
  turns Hamming-≤3 search into the same bucket-groupby shape.
- embedding near-dup: random-hyperplane LSH buckets → within-bucket numpy
  brute force.  Exact verification is always numpy inside small groups.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .hashing import hash64
from .text import _flat_tokens, _trigram_hashes, segmented_min, segmented_sum

MERSENNE_P = np.uint64((1 << 61) - 1)
N_PERM = 128
LSH_BANDS = 32  # 32 bands × 4 rows


def _perm_params(n_perm: int = N_PERM, seed: int = 42):
    # multiply-shift family over Z/2^64: odd multiplier => bijection, so the
    # per-permutation min is a valid MinHash-style sketch.  (A `% MERSENNE_P`
    # after a 64-bit-wrapped product is NOT a Carter-Wegman hash anyway, and
    # the uint64 division was ~half the signature stage's CPU.)
    rng = np.random.default_rng(seed)
    a = rng.integers(1, np.iinfo(np.uint64).max, size=n_perm, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, np.iinfo(np.uint64).max, size=n_perm, dtype=np.uint64)
    return a, b


def add_content_hash(batch: pa.Table, text_col: str = "text", out: str = "content_hash") -> pa.Table:
    return batch.append_column(out, pa.array(hash64(batch[text_col]), pa.uint64()))


def first_wins(group: pd.DataFrame, order_col: str) -> pd.DataFrame:
    """Reference first-wins semantics: keep the row with the smallest order key."""
    return group.nsmallest(1, order_col)


def minhash_signatures(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """→ (doc_id, band, band_hash) rows: LSH-banded MinHash signatures.

    Vectorized: word hashes → trigram shingle hashes → for each permutation
    ``(a·x + b) mod p`` → per-doc min via segmented ``minimum.reduceat``
    (ufunc ``.at`` is a per-element dispatch loop — measured 30+ s per 4k-doc
    batch; the reduceat form is ~100× faster).

    Constraint: docs with < 3 tokens have no 3-gram shingles and are EXCLUDED
    from the candidate set (they'd need an equality branch to dedupe; the
    exact-Jaccard oracle only shingles >=3-token docs, and exact dedup already
    catches identical short docs)."""
    texts = batch[text_col]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    flat, parents, counts = _flat_tokens(texts)
    short = counts < 3
    if short.any():
        keep = ~short
        batch = batch.filter(pa.array(keep))
        keep_tok = keep[parents]
        flat = flat.filter(pa.array(keep_tok)) if len(flat) else flat
        # re-map parent indices onto the compacted doc axis
        new_idx = np.cumsum(keep) - 1
        parents = new_idx[parents[keep_tok]]
        counts = counts[keep]
    n = batch.num_rows
    wh = hash64(flat)
    sh, sp = _trigram_hashes(wh, parents)
    if len(sh) == 0:
        sh, sp = wh, parents
    a, b = _perm_params()
    sig = np.full((n, N_PERM), np.iinfo(np.uint64).max, dtype=np.uint64)
    # (S, P) permuted hashes, reduced per doc with a segmented reduceat
    # (``sp`` is nondecreasing — Arrow list-flatten order).  Chunk over
    # permutations to bound the (S, step) temporary.
    step = 16
    for lo in range(0, N_PERM, step):
        ph = sh[:, None] * a[None, lo : lo + step] + b[None, lo : lo + step]
        sig[:, lo : lo + step] = segmented_min(
            ph, sp, n, np.iinfo(np.uint64).max
        )
    rows_per_band = N_PERM // LSH_BANDS
    band_hash = np.empty((n, LSH_BANDS), dtype=np.uint64)
    mix = np.uint64(0x9E3779B97F4A7C15)
    for bidx in range(LSH_BANDS):
        seg = sig[:, bidx * rows_per_band : (bidx + 1) * rows_per_band]
        h = np.full(n, np.uint64(0xCBF29CE484222325), dtype=np.uint64)
        for r in range(rows_per_band):
            h = (h ^ seg[:, r]) * mix
        band_hash[:, bidx] = h
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "doc_id": pa.array(np.repeat(ids, LSH_BANDS)),
            "band": pa.array(np.tile(np.arange(LSH_BANDS, dtype=np.int32), n), pa.int32()),
            "band_hash": pa.array(band_hash.reshape(-1), pa.uint64()),
        }
    )


def mine_bucket_pairs(part_df: pd.DataFrame) -> pd.DataFrame:
    """Vectorized candidate-pair mining over one coarse hash partition of
    (doc_id, band, band_hash) rows: lexsort by (band, band_hash), find runs of
    equal bucket keys via np.diff, generate pairs only for the (rare) runs of
    length ≥ 2.  No per-bucket task, no per-bucket pandas group."""
    if not len(part_df):
        return pd.DataFrame({"doc_a": pd.Series(dtype="int64"), "doc_b": pd.Series(dtype="int64")})
    band = part_df["band"].to_numpy()
    bh = part_df["band_hash"].to_numpy(dtype=np.uint64)
    ids = part_df["doc_id"].to_numpy()
    order = np.lexsort((ids, bh, band))
    band, bh, ids = band[order], bh[order], ids[order]
    new_run = np.empty(len(band), dtype=bool)
    new_run[0] = True
    new_run[1:] = (band[1:] != band[:-1]) | (bh[1:] != bh[:-1])
    run_starts = np.nonzero(new_run)[0]
    run_ends = np.append(run_starts[1:], len(band))
    lens = run_ends - run_starts
    multi = lens >= 2  # Python loop touches only the rare multi-member buckets
    out_a, out_b = [], []
    for s, e in zip(run_starts[multi], run_ends[multi]):
        uniq = np.unique(ids[s:e])
        if len(uniq) < 2:
            continue
        ii, jj = np.triu_indices(len(uniq), k=1)
        out_a.append(uniq[ii])
        out_b.append(uniq[jj])
    if not out_a:
        return pd.DataFrame({"doc_a": pd.Series(dtype="int64"), "doc_b": pd.Series(dtype="int64")})
    df = pd.DataFrame(
        {"doc_a": np.concatenate(out_a).astype("int64"),
         "doc_b": np.concatenate(out_b).astype("int64")}
    )
    return df.drop_duplicates(["doc_a", "doc_b"])


def shingle_rows(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """→ (doc_id, sh_hash, n_sh) DISTINCT token-trigram shingle rows per doc.

    The inverted-index representation for the EXACT n-gram-Jaccard similarity
    join: ``sh_hash`` is the 64-bit trigram-mix hash (same kernel as MinHash
    signatures), ``n_sh`` the doc's distinct-shingle count (the |A| term of
    J = |A∩B| / (|A|+|B|-|A∩B|)).  Docs with < 3 tokens have no trigrams and
    emit no rows — the same exclusion as the MinHash path and the SQL oracle.
    Fully vectorized: flatten → hash → trigram mix → lexsort-dedup → bincount."""
    texts = batch[text_col]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    flat, parents, _counts = _flat_tokens(texts)
    wh = hash64(flat)
    sh, sp = _trigram_hashes(wh, parents)
    if len(sh) == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "sh_hash": pa.array([], pa.int64()),
                         "n_sh": pa.array([], pa.int64())})
    order = np.lexsort((sh, sp))
    sh, sp = sh[order], sp[order]
    new = np.empty(len(sh), dtype=bool)
    new[0] = True
    new[1:] = (sp[1:] != sp[:-1]) | (sh[1:] != sh[:-1])
    sh, sp = sh[new], sp[new]
    n_sh = np.bincount(sp, minlength=batch.num_rows)
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    # int64 bit-reinterpretation of the uint64 hash: Ray's hash aggregate and
    # Acero joins handle int64 keys natively (uint64 > 2^63 falls back to
    # pickled-object columns); any consistent total order works for the
    # prefix filter, so the signed view is fine.
    return pa.table(
        {
            "doc_id": pa.array(ids[sp], pa.int64()),
            "sh_hash": pa.array(sh.view(np.int64), pa.int64()),
            "n_sh": pa.array(n_sh[sp], pa.int64()),
        }
    )


def prefix_filter_rows(part_df: pd.DataFrame, threshold: float) -> pd.DataFrame:
    """AllPairs prefix filter (Bayardo/Ma/Srikant, WWW'07): order each doc's
    shingles by the GLOBAL (df, sh_hash) total order and keep only the first
    ``|A| - ceil(t·|A|) + 1``.  Any pair with Jaccard ≥ t must share a shingle
    in both prefixes, so indexing only prefixes preserves exact completeness
    while shrinking the inverted index by ~t — and rare-first ordering makes
    the surviving posting lists short (hot shingles fall out of prefixes).

    Runs inside one doc_id hash partition (two-level grouped apply): vectorized
    sort + cumcount, no per-doc task."""
    if not len(part_df):
        return part_df[["doc_id", "sh_hash"]]
    d = part_df.sort_values(["doc_id", "df", "sh_hash"], kind="mergesort")
    pos = d.groupby("doc_id", sort=False).cumcount().to_numpy()
    n = d["n_sh"].to_numpy()
    prefix_len = n - np.ceil(threshold * n).astype(np.int64) + 1
    return d.loc[pos < prefix_len, ["doc_id", "sh_hash"]]


def bucket_candidate_pairs(group: pd.DataFrame) -> pd.DataFrame:
    """Within one LSH bucket: emit all candidate (doc_a < doc_b) pairs."""
    ids = np.sort(group["doc_id"].unique())
    if len(ids) < 2:
        return pd.DataFrame(
            {"doc_a": pd.Series(dtype="int64"), "doc_b": pd.Series(dtype="int64")}
        )
    ii, jj = np.triu_indices(len(ids), k=1)
    return pd.DataFrame(
        {"doc_a": ids[ii].astype("int64"), "doc_b": ids[jj].astype("int64")}
    )


def jaccard_shingles(texts_a: list[str], texts_b: list[str], k: int = 3) -> np.ndarray:
    """Exact token-k-gram Jaccard for aligned text pairs (verification step —
    runs only on LSH candidates, never all pairs)."""
    out = np.empty(len(texts_a))
    for i, (ta, tb) in enumerate(zip(texts_a, texts_b)):
        sa = _shingle_set(ta, k)
        sb = _shingle_set(tb, k)
        u = len(sa | sb)
        out[i] = (len(sa & sb) / u) if u else 1.0
    return out


def _shingle_set(text: str, k: int) -> set:
    toks = text.split(" ")
    if len(toks) < k:
        return set(toks)
    return {tuple(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def simhash64(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """64-bit SimHash over word hashes (sign-aggregated bit votes), plus 4
    16-bit band columns for Hamming-≤3 bucketing (by pigeonhole, any pair with
    Hamming distance ≤ 3 shares at least one of 4 bands)."""
    texts = batch[text_col]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n = batch.num_rows
    flat, parents, counts = _flat_tokens(texts)
    wh = hash64(flat)
    # majority bit vote per doc, 16 bit-columns at a time so the (S, chunk)
    # temporaries stay small-integer and cache-resident (decode-stage law);
    # with 0/1 sums, sign(Σ±1) > 0  ⇔  2·Σbits > n_tokens.
    sh = np.zeros(n, dtype=np.uint64)
    for lo in range(0, 64, 16):
        shifts = np.arange(lo, lo + 16, dtype=np.uint64)[None, :]
        chunk = ((wh[:, None] >> shifts) & np.uint64(1)).astype(np.int32)
        s = segmented_sum(chunk, parents, n)
        simbits = 2 * s.astype(np.int64) > counts[:, None]
        for r in range(16):
            sh |= simbits[:, r].astype(np.uint64) << np.uint64(lo + r)
    out = batch.append_column("simhash", pa.array(sh, pa.uint64()))
    for bidx in range(4):
        band = (sh >> np.uint64(16 * bidx)) & np.uint64(0xFFFF)
        out = out.append_column(f"simhash_band{bidx}", pa.array(band.astype(np.int32), pa.int32()))
    return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = a ^ b
    cnt = np.zeros(len(x), dtype=np.int64)
    while True:
        nz = x != 0
        if not nz.any():
            break
        cnt[nz] += 1
        x = x & (x - np.uint64(1))
    return cnt


def hyperplane_bucket(vectors: np.ndarray, n_bits: int = 12, seed: int = 42) -> np.ndarray:
    """Random-hyperplane LSH bucket ids for unit-normalized vectors."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((vectors.shape[1], n_bits)).astype(vectors.dtype)
    bits = (vectors @ planes) > 0
    return (bits * (1 << np.arange(n_bits))).sum(axis=1).astype(np.int64)


def adaptive_bits(n_vectors: int, target_bucket: float = 2.0, lo: int = 8, hi: int = 24) -> int:
    """Scale the hyperplane count to the corpus so expected bucket population
    stays ~``target_bucket`` (buckets = 2^bits grows with n).  For near-dup
    MINING the target must be O(1): candidate generation is all-pairs within a
    bucket, so expected candidates ≈ n·target·bands/2 — a large target (or r1's
    FIXED 64 buckets) makes candidate count quadratic in the corpus.  True
    near-dups still collide because banding (``hyperplane_bands``) gives each
    pair ``n_bands`` independent chances at ~0.98^bits per-band probability."""
    return int(np.clip(np.ceil(np.log2(max(n_vectors, 1) / target_bucket)), lo, hi))


def hyperplane_bands(vectors: np.ndarray, n_bands: int = 8, n_bits: int = 8,
                     seed: int = 42) -> np.ndarray:
    """(n, n_bands) int64 bucket ids — ``n_bands`` independent hyperplane sets
    in ONE matmul.  Banding recovers the recall a single deeper code loses:
    P(pair in no band) = (1 - p^bits)^bands with p = 1 - θ/π; at cos ≥ 0.99
    (θ ≈ 0.065 rad, p ≈ 0.979) and 8 bands × 16 bits the miss rate is < 1e-4,
    and near-identical dups (cos → 1) are missed with probability → 0."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((vectors.shape[1], n_bands * n_bits)).astype(vectors.dtype)
    bits = (vectors @ planes) > 0  # (n, bands*bits)
    bits = bits.reshape(len(vectors), n_bands, n_bits)
    return (bits * (1 << np.arange(n_bits))).sum(axis=2).astype(np.int64)
