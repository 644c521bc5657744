"""Approximate-nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k — the query matrix is broadcast once
(``ray.put``), each batch does one numpy matmul against it, per-batch top-k
partials are merged in a final tiny reduction (classic top-k aggregation: no
full sort of the corpus, no driver-side loop over rows).

Scale path: LSH-bucketed search (random hyperplanes, multi-probe) — the corpus
is bucketed once via ``groupby(bucket)``; a query only scans its probe buckets.
"""

from __future__ import annotations


import numpy as np
import pandas as pd
import pyarrow as pa

from .dedup import hyperplane_bucket


def _as_matrix(col) -> np.ndarray:
    """list<float> Arrow column → (n, d) float64 matrix (vectorized flatten)."""
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = pc.list_flatten(col).to_numpy(zero_copy_only=False).astype(np.float64)
    lengths = pc.list_value_length(col).to_numpy(zero_copy_only=False)
    d = int(lengths[0])
    assert (lengths == d).all(), "ragged embedding column"
    return flat.reshape(-1, d)


def normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)


def pack_matrix(m: np.ndarray) -> pa.Array:
    """(n, d) float matrix → fixed-size-binary Arrow column (d·4 bytes/row).

    Acero hash joins reject list-typed non-key fields; a fixed-width binary
    blob joins fine and round-trips the float32 source losslessly.  Zero-copy
    on both sides (one contiguous buffer, no per-row Python)."""
    n, d = m.shape
    m32 = np.ascontiguousarray(m, dtype=np.float32)
    return pa.FixedSizeBinaryArray.from_buffers(
        pa.binary(d * 4), n, [None, pa.py_buffer(m32.tobytes())]
    )


def unpack_matrix(col) -> np.ndarray:
    """Inverse of ``pack_matrix``: fixed-size-binary column → (n, d) float64."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    d = col.type.byte_width // 4
    flat = np.frombuffer(col.buffers()[1], dtype=np.float32)
    flat = flat[col.offset * d : (col.offset + len(col)) * d]
    return flat.reshape(len(col), d).astype(np.float64)


def pack_matrix_f64(m: np.ndarray) -> pa.Array:
    """(n, d) float64 matrix → FixedSizeList<double> column (zero-copy buffer).

    Unlike ``pack_matrix`` (float32 binary), this preserves float64 exactly —
    required wherever similarities are tie-ranked at 12 dp against a float64
    oracle (a float32 round-trip of normalized vectors perturbs cosines at
    ~1e-8 and flips near-tie ranks)."""
    return pa.FixedSizeListArray.from_arrays(
        pa.array(m.reshape(-1), type=pa.float64()), m.shape[1]
    )


def unpack_matrix_f64(col) -> np.ndarray:
    """Inverse of ``pack_matrix_f64``: FixedSizeList<double> → (n, d) float64."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    d = col.type.list_size
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
    return flat.reshape(-1, d)


class BruteForceTopK:
    """map_batches stage: per-batch cosine top-k partials vs broadcast queries.

    Emits (query_id, vec_id, cos_sim) for each batch's local top-k; a final
    ``groupby(query_id)`` + per-group top-k merge yields the exact answer."""

    def __init__(self, query_ref, k: int = 10, id_col: str = "vec_id", vec_col: str = "embedding"):
        import ray

        q = ray.get(query_ref) if not isinstance(query_ref, tuple) else query_ref
        self.q_ids, self.q = q  # (m,), (m, d) unit-normalized
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = normalize(_as_matrix(batch[self.vec_col]))
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        sims = self.q @ vecs.T  # (m, n)
        k = min(self.k, sims.shape[1])
        top = np.argpartition(-sims, kth=k - 1, axis=1)[:, :k]
        m = sims.shape[0]
        rows_q = np.repeat(self.q_ids, k)
        rows_v = ids[top.reshape(-1)]
        rows_s = np.take_along_axis(sims, top, axis=1).reshape(-1)
        return pa.table(
            {
                "query_id": pa.array(rows_q),
                "vec_id": pa.array(rows_v),
                "cos_sim": pa.array(rows_s, pa.float64()),
            }
        )


def merge_topk(group: pd.DataFrame, k: int = 10) -> pd.DataFrame:
    """Final per-query merge of batch-local top-k partials (deterministic
    tiebreak on vec_id)."""
    g = group.sort_values(["cos_sim", "vec_id"], ascending=[False, True]).head(k)
    g = g.reset_index(drop=True)
    g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
    return g


def kmeans_centroids(sample: np.ndarray, n_centroids: int, iters: int = 10,
                     seed: int = 42) -> np.ndarray:
    """Spherical k-means on a BOUNDED sample → (c, d) unit centroids.

    The IVF training step: runs driver-side on a few thousand sampled vectors
    (training cost is O(sample), independent of corpus size — the standard
    IVF recipe).  Cosine assignment == dot product on unit vectors; centroids
    are re-normalized each Lloyd iteration.  Empty cells respawn on the
    farthest-assigned vector (k-means++-style repair, deterministic)."""
    rng = np.random.default_rng(seed)
    x = normalize(np.asarray(sample, dtype=np.float64))
    n = len(x)
    c = min(n_centroids, n)
    cent = x[rng.choice(n, size=c, replace=False)].copy()
    for _ in range(iters):
        sims = x @ cent.T  # (n, c)
        assign = sims.argmax(axis=1)
        best = sims.max(axis=1)
        for j in range(c):
            m = assign == j
            if m.any():
                cent[j] = x[m].sum(axis=0)
            else:
                cent[j] = x[best.argmin()]  # respawn on the worst-covered point
        cent = normalize(cent)
    return cent


class IVFTopK:
    """map_batches stage: IVF-probed cosine top-k partials.

    Actor-pool state in ``__init__`` (centroids + probe set fetched from the
    object store ONCE per actor): per batch, assign vectors to their nearest
    centroid (one matmul), keep only vectors whose cell is probed, brute-force
    the survivors against the query, emit per-batch partial top-k.  Fraction
    of the corpus scanned ≈ n_probe / n_centroids."""

    def __init__(self, state_ref, k: int = 10, id_col: str = "vec_id",
                 vec_col: str = "embedding"):
        import ray

        st = ray.get(state_ref) if not isinstance(state_ref, tuple) else state_ref
        self.q_ids, self.q, self.centroids, probe = st
        self.probe_mask = np.zeros(len(self.centroids), dtype=bool)
        self.probe_mask[probe] = True
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = normalize(_as_matrix(batch[self.vec_col]))
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        cell = (vecs @ self.centroids.T).argmax(axis=1)
        keep = self.probe_mask[cell]
        empty = pa.table({"query_id": pa.array([], pa.int64()),
                          "vec_id": pa.array([], pa.int64()),
                          "cos_sim": pa.array([], pa.float64())})
        if not keep.any():
            return empty
        vecs, ids = vecs[keep], ids[keep]
        sims = self.q @ vecs.T
        k = min(self.k, sims.shape[1])
        top = np.argpartition(-sims, kth=k - 1, axis=1)[:, :k]
        return pa.table(
            {
                "query_id": pa.array(np.repeat(self.q_ids, k)),
                "vec_id": pa.array(ids[top.reshape(-1)]),
                "cos_sim": pa.array(np.take_along_axis(sims, top, axis=1).reshape(-1), pa.float64()),
            }
        )


def _kmeans_l2(sample: np.ndarray, n_codes: int, iters: int = 10, seed: int = 7) -> np.ndarray:
    """Plain (Euclidean) Lloyd k-means on a bounded sample → (c, d) centroids.
    Deterministic (seeded init, argmin tiebreak = lowest index, empty-cluster
    respawn on the worst-covered point) — the PQ codebook trainer."""
    rng = np.random.default_rng(seed)
    x = np.asarray(sample, dtype=np.float64)
    n = len(x)
    c = min(n_codes, n)
    cent = x[rng.choice(n, size=c, replace=False)].copy()
    for _ in range(iters):
        # squared distance via |x|² − 2x·c + |c|²  (|x|² constant per row)
        d2 = -2.0 * (x @ cent.T) + (cent * cent).sum(axis=1)[None, :]
        assign = d2.argmin(axis=1)
        worst = d2.min(axis=1).argmax()
        for j in range(c):
            m = assign == j
            cent[j] = x[m].mean(axis=0) if m.any() else x[worst]
    return cent


def pq_train(sample: np.ndarray, m_sub: int = 8, n_codes: int = 16,
             iters: int = 10, seed: int = 7) -> np.ndarray:
    """Product-quantization codebooks: split the unit-normalized vector into
    ``m_sub`` contiguous subspaces, k-means each independently on the bounded
    training sample.  Returns (m_sub, n_codes, d/m_sub) float64.  Training is
    O(sample), independent of corpus size — the standard IVF-PQ recipe."""
    x = normalize(np.asarray(sample, dtype=np.float64))
    d = x.shape[1]
    assert d % m_sub == 0, "embedding dim must divide into subspaces"
    d_sub = d // m_sub
    books = np.empty((m_sub, n_codes, d_sub), np.float64)
    for s in range(m_sub):
        books[s] = _kmeans_l2(x[:, s * d_sub : (s + 1) * d_sub], n_codes, iters, seed + s)
    return books


def pq_encode_matrix(vecs_unit: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, d) unit vectors → (n, m_sub) uint8 codes (nearest codebook entry
    per subspace, matmul distance trick — no n×codes×d temporaries)."""
    m_sub, _n_codes, d_sub = books.shape
    codes = np.empty((len(vecs_unit), m_sub), np.uint8)
    for s in range(m_sub):
        sub = vecs_unit[:, s * d_sub : (s + 1) * d_sub]
        b = books[s]
        d2 = -2.0 * (sub @ b.T) + (b * b).sum(axis=1)[None, :]
        codes[:, s] = d2.argmin(axis=1).astype(np.uint8)
    return codes


class PQEncode:
    """map_batches stage: build the COMPRESSED index — (vec_id, cell, codes).

    Actor state (``__init__``, once per actor): IVF centroids + PQ codebooks
    from the object store.  Per batch: one matmul assigns the IVF cell, m_sub
    small matmuls encode the vector to ``m_sub`` uint8 codes packed as a
    fixed-size-binary blob — 8 bytes/vector vs d·4 for the raw float32
    embedding (32× at d=64).  At 100 TB this is the stage an offline indexing
    job ends with ``write_parquet``; queries then scan ONLY the code table."""

    def __init__(self, state_ref, id_col: str = "vec_id", vec_col: str = "embedding"):
        import ray

        st = ray.get(state_ref) if not isinstance(state_ref, tuple) else state_ref
        self.centroids, self.books = st
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = normalize(_as_matrix(batch[self.vec_col]))
        cell = (vecs @ self.centroids.T).argmax(axis=1).astype(np.int32)
        codes = pq_encode_matrix(vecs, self.books)
        m_sub = codes.shape[1]
        codes_col = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(m_sub), len(codes),
            [None, pa.py_buffer(np.ascontiguousarray(codes).tobytes())],
        )
        return pa.table(
            {
                "vec_id": batch[self.id_col],
                "cell": pa.array(cell, pa.int32()),
                "codes": codes_col,
            }
        )


class PQScan:
    """map_batches stage: ADC (asymmetric distance computation) scan over the
    compressed index.  Actor state: per-query lookup tables LUT[q, s, c] =
    q_sub·codebook[s][c] (so ADC score = Σ_s LUT[q, s, code_s] ≈ cos(q, x))
    plus the probed-cell mask.  Per batch: drop unprobed cells, gather-sum the
    LUT over the uint8 code matrix — no float embeddings are ever read."""

    def __init__(self, state_ref, k: int = 10):
        import ray

        st = ray.get(state_ref) if not isinstance(state_ref, tuple) else state_ref
        self.q_ids, self.lut, self.probe_mask = st  # (m,), (m, m_sub, n_codes), (cells,)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "cos_sim": pa.array([], pa.float64()),
            }
        )
        cell = batch["cell"].to_numpy(zero_copy_only=False)
        keep = self.probe_mask[cell]
        if not keep.any():
            return empty
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)[keep]
        codes_col = batch["codes"]
        if isinstance(codes_col, pa.ChunkedArray):
            codes_col = codes_col.combine_chunks()
        m_sub = codes_col.type.byte_width
        flat = np.frombuffer(codes_col.buffers()[1], dtype=np.uint8)
        codes = flat[codes_col.offset * m_sub : (codes_col.offset + len(codes_col)) * m_sub]
        codes = codes.reshape(len(codes_col), m_sub)[keep]
        sub_idx = np.arange(m_sub)[None, :]
        out_q, out_v, out_s = [], [], []
        for qi in range(len(self.q_ids)):
            scores = self.lut[qi][sub_idx, codes].sum(axis=1)
            k = min(self.k, len(scores))
            top = np.argpartition(-scores, kth=k - 1)[:k]
            out_q.append(np.full(k, self.q_ids[qi], np.int64))
            out_v.append(ids[top])
            out_s.append(scores[top])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "vec_id": pa.array(np.concatenate(out_v)),
                "cos_sim": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )


def pq_lut(q_unit: np.ndarray, books: np.ndarray) -> np.ndarray:
    """Per-query ADC lookup tables: (m, d) unit queries × (m_sub, n_codes,
    d_sub) codebooks → (m, m_sub, n_codes) float64."""
    m_sub, n_codes, d_sub = books.shape
    m = q_unit.shape[0]
    lut = np.empty((m, m_sub, n_codes), np.float64)
    for s in range(m_sub):
        lut[:, s, :] = q_unit[:, s * d_sub : (s + 1) * d_sub] @ books[s].T
    return lut


def add_lsh_bucket(batch: pa.Table, vec_col: str = "embedding", n_bits: int = 8) -> pa.Table:
    vecs = normalize(_as_matrix(batch[vec_col]))
    return batch.append_column(
        "lsh_bucket", pa.array(hyperplane_bucket(vecs, n_bits), pa.int64())
    )


def query_probe_buckets(q: np.ndarray, n_bits: int = 8, n_probe: int = 8, seed: int = 42) -> np.ndarray:
    """Multi-probe LSH: enumerate bucket perturbations (bit-flip subsets of
    the lowest-margin hyperplanes) ranked by total flipped margin, take the
    ``n_probe`` cheapest — standard multi-probe, not just Hamming-1."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((q.shape[0], n_bits))
    proj = q @ planes
    base = int(((proj > 0) * (1 << np.arange(n_bits))).sum())
    margins = np.abs(proj)
    # enumerate subsets of the m lowest-margin bits (bounded blow-up)
    m = min(n_bits, 12)
    order = np.argsort(margins)[:m]
    sub_costs = []
    for mask in range(1 << m):
        flip = 0
        cost = 0.0
        for j in range(m):
            if mask >> j & 1:
                flip ^= 1 << int(order[j])
                cost += margins[order[j]]
        sub_costs.append((cost, base ^ flip))
    sub_costs.sort()
    return np.array([b for _, b in sub_costs[:n_probe]], dtype=np.int64)
