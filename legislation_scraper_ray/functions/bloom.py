"""Vectorized Bloom filter over int64/uint64 keys — the broadcast semi-join
prefilter primitive.

At 100 TB a semi-join's build side can be too large to broadcast as an exact
key set, but a Bloom bitmap is CONSTANT-size (m bits regardless of key count):
build it distributed (one partial bitmap per batch, OR-merged — OR is
associative/commutative, so partials merge in any order or tree shape),
broadcast once with ``ray.put``, and prefilter the probe side inside
``map_batches``.  False positives pass the prefilter and are eliminated by the
exact hash-partitioned join that follows; false negatives are impossible, so
the composed operator is exact.

Hashing: double hashing (Kirsch–Mitzenmacher 2006) from two splitmix64 mixes —
probe i uses (h1 + i*h2) mod m, which preserves the classic FP bound with only
two hash evaluations per key.
"""

from __future__ import annotations

import numpy as np

from .hashing import splitmix64

_SALT = np.uint64(0x9E3779B97F4A7C15)


def _probes(keys: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(n, k) bit indices for each key."""
    ks = np.asarray(keys).astype(np.uint64, copy=False)
    h1 = splitmix64(ks)
    h2 = splitmix64(ks ^ _SALT) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)[None, :]
    return ((h1[:, None] + i * h2[:, None]) % np.uint64(m_bits)).astype(np.int64)


def bloom_build(keys: np.ndarray, m_bits: int = 1 << 20, k: int = 4) -> np.ndarray:
    """Bitmap (uint8, m_bits/8 bytes) with all probe bits of ``keys`` set.
    Vectorized: sorted bit-indices + bitwise_or.reduceat per byte segment —
    no per-key Python and no ufunc.at scatter."""
    bitmap = np.zeros(m_bits // 8, dtype=np.uint8)
    if len(keys) == 0:
        return bitmap
    idx = _probes(keys, m_bits, k).reshape(-1)
    byte, bit = idx >> 3, (idx & 7).astype(np.uint8)
    order = np.argsort(byte, kind="stable")
    byte, bit = byte[order], bit[order]
    vals = np.left_shift(np.uint8(1), bit, dtype=np.uint8)
    starts = np.flatnonzero(np.r_[True, byte[1:] != byte[:-1]])
    merged = np.bitwise_or.reduceat(vals, starts)
    bitmap[byte[starts]] = merged
    return bitmap


def bloom_merge(bitmaps, m_bits: int = 1 << 20) -> np.ndarray:
    """OR-merge partial bitmaps (any order — OR is associative).  An empty
    iterable merges to the empty-set bitmap (all zeros at ``m_bits``)."""
    out = None
    for b in bitmaps:
        arr = np.frombuffer(b, dtype=np.uint8) if isinstance(b, (bytes, bytearray)) else b
        out = arr.copy() if out is None else np.bitwise_or(out, arr)
    return out if out is not None else np.zeros(m_bits // 8, dtype=np.uint8)


def bloom_contains(bitmap: np.ndarray, keys: np.ndarray, k: int = 4) -> np.ndarray:
    """Membership mask: True iff ALL k probe bits are set (never a false
    negative; false-positive rate ≈ (1 - e^{-kn/m})^k)."""
    m_bits = len(bitmap) * 8
    if len(keys) == 0:
        return np.zeros(0, dtype=bool)
    idx = _probes(keys, m_bits, k)
    bits = (bitmap[idx >> 3] >> (idx & 7).astype(np.uint8)) & 1
    return bits.all(axis=1)
