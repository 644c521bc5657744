"""Stable, vectorized 64-bit hashing + URL canonicalization.

The canonical-URL hash is the engine's universal partition key (SURVEY.md §7
"Shuffles and their keys"): seen-set shard routing, exact dedup, and frontier
bucketing all key on ``url_hash = fnv1a64(canonical_url)``.

The reference has no hashing at all — its dedup key is the raw ``document_url``
string (reference: src/datasets/build_dataset.py:204
``drop_duplicates(subset=["document_url"])``) and its "partitioning" is a
directory path built from sanitized values (src/database/saver.py:104-132).
Hashing the canonical URL gives the same membership semantics with an 8-byte
shuffle key instead of a string.

xxhash is not installed in this environment, so we implement FNV-1a 64
vectorized in numpy (column-sweep over a padded byte matrix).  It is exact,
endian-independent and stable across processes/versions — a requirement for
checkpoint-resume (seen-set snapshots must hash identically after restart).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

FNV_OFFSET = np.uint64(0xCBF29CE484222325)
FNV_PRIME = np.uint64(0x100000001B3)

_ERR = np.seterr(over="ignore")  # uint64 wrap-around is the point


def fnv1a64_bytes(data: bytes) -> int:
    """Scalar reference implementation (used by tests to validate the vectorized path)."""
    h = int(FNV_OFFSET)
    for b in data:
        h = ((h ^ b) * int(FNV_PRIME)) & 0xFFFFFFFFFFFFFFFF
    # mix in the length so zero-padding in the vectorized path cannot collide
    h = ((h ^ len(data)) * int(FNV_PRIME)) & 0xFFFFFFFFFFFFFFFF
    return h


def _padded_byte_matrix(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(n, L) uint8 matrix + per-row byte lengths, zero-copy from Arrow buffers."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type):
        arr = arr.cast(pa.string() if pa.types.is_large_string(arr.type) else pa.binary())
    buffers = arr.buffers()
    offsets = np.frombuffer(buffers[1], dtype=np.int32)[arr.offset : arr.offset + len(arr) + 1]
    data = np.frombuffer(buffers[2], dtype=np.uint8) if buffers[2] is not None else np.empty(0, np.uint8)
    starts = offsets[:-1].astype(np.int64)
    lengths = (offsets[1:] - offsets[:-1]).astype(np.int64)
    n = len(arr)
    max_len = int(lengths.max()) if n else 0
    if max_len == 0:
        return np.zeros((n, 0), dtype=np.uint8), lengths
    idx = starts[:, None] + np.arange(max_len, dtype=np.int64)[None, :]
    mask = np.arange(max_len, dtype=np.int64)[None, :] < lengths[:, None]
    mat = np.where(mask, data[np.clip(idx, 0, max(len(data) - 1, 0))], 0).astype(np.uint8)
    return mat, lengths


def hash64(values: pa.Array | pa.ChunkedArray | list[str] | np.ndarray) -> np.ndarray:
    """Vectorized FNV-1a 64 over a string/binary Arrow array → uint64 ndarray.

    One elementwise numpy op per byte *column* (L ≈ max string length sweeps over
    all n rows at once), not per row — no Python loop over rows.
    """
    if not isinstance(values, (pa.Array, pa.ChunkedArray)):
        values = pa.array(values, type=pa.string())
    mat, lengths = _padded_byte_matrix(values)
    n, max_len = mat.shape
    h = np.full(n, FNV_OFFSET, dtype=np.uint64)
    cols = np.arange(max_len, dtype=np.int64)
    for j in range(max_len):
        c = mat[:, j].astype(np.uint64)
        active = cols[j] < lengths
        hx = (h ^ c) * FNV_PRIME
        h = np.where(active, hx, h)
    h = (h ^ lengths.astype(np.uint64)) * FNV_PRIME
    return h


#: second FNV offset basis (splitmix64-mixed default basis) — gives a second
#: hash family whose per-byte state evolution diverges from the default one,
#: so a cross-text collision must hold under BOTH bases (≈128-bit key).
FNV_OFFSET_B = np.uint64(0x9E3779B97F4A7C15) ^ FNV_OFFSET


def hash64_pair(values: pa.Array | pa.ChunkedArray | list[str] | np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Two independent vectorized FNV-1a 64 hashes in ONE byte-column sweep.

    Exact-dedup keys at 10^10-row scale cannot rest on a single 64-bit
    non-cryptographic hash (birthday collisions misattribute first-wins keep
    flags); a (h1, h2) 128-bit composite drops the collision odds to ~1e-19
    while costing one extra multiply per byte column, not a second matrix
    build."""
    if not isinstance(values, (pa.Array, pa.ChunkedArray)):
        values = pa.array(values, type=pa.string())
    mat, lengths = _padded_byte_matrix(values)
    n, max_len = mat.shape
    h1 = np.full(n, FNV_OFFSET, dtype=np.uint64)
    h2 = np.full(n, FNV_OFFSET_B, dtype=np.uint64)
    for j in range(max_len):
        c = mat[:, j].astype(np.uint64)
        active = j < lengths
        h1 = np.where(active, (h1 ^ c) * FNV_PRIME, h1)
        h2 = np.where(active, (h2 ^ c) * FNV_PRIME, h2)
    ln = lengths.astype(np.uint64)
    return (h1 ^ ln) * FNV_PRIME, (h2 ^ ln) * FNV_PRIME


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constants) — the engine's
    integer-key mixer.  Used for deterministic sampling (sample_docs_hash /
    stratified_sample_docs), HLL register derivation, and mirrored bit-exactly
    in SQL by ``analytics._splitmix64_ctes`` so DuckDB oracles can recompute
    the same sample.  Same finalizer as CuckooFilter._mix64."""
    x = np.asarray(x).astype(np.uint64, copy=True)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def canonicalize_urls(urls: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Canonical URL form: lowercase scheme+host, strip default port, strip
    trailing slash on path, drop fragments, keep query (order preserved —
    the synthetic sources emit stable query order).

    Reference analog: urljoin absolute-ization + quote handling
    (src/scraper/federal_legislation/scrape.py:178,
    src/scraper/state_legislation/alagoas.py:96-99).  Pure Arrow compute —
    no per-row Python.
    """
    import pyarrow.compute as pc

    s = values_to_chunked(urls).combine_chunks()
    # drop fragment
    s = pc.replace_substring_regex(s, r"#.*$", "")
    # lowercase the scheme://host prefix only (case-insensitive match), keep path case
    parts = _as_array(pc.extract_regex(s, r"^(?i)(?P<pre>https?://[^/]+)(?P<rest>.*)$"))
    pre = pc.utf8_lower(parts.field("pre"))
    rest = parts.field("rest")
    s = pc.if_else(pc.is_valid(parts), pc.binary_join_element_wise(pre, rest, ""), s)
    # strip the default port for the matching scheme only (http://h:443/x is a
    # DISTINCT url from http://h/x and must keep its port)
    s = pc.replace_substring_regex(s, r"^(http://[^/:]*):80(/|$)", r"\1\2")
    s = pc.replace_substring_regex(s, r"^(https://[^/:]*):443(/|$)", r"\1\2")
    # strip trailing slash (but not the bare-root slash)
    s = pc.replace_substring_regex(s, r"^(https?://[^/]+/.+?)/+$", r"\1")
    return s


def values_to_chunked(v):
    if isinstance(v, pa.ChunkedArray):
        return v
    if isinstance(v, pa.Array):
        return pa.chunked_array([v])
    return pa.chunked_array([pa.array(v, type=pa.string())])


def extract_hosts(urls: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized host extraction via Arrow regex."""
    import pyarrow.compute as pc

    parts = _as_array(
        pc.extract_regex(values_to_chunked(urls).combine_chunks(), r"^https?://(?P<host>[^/]+)")
    )
    host = parts.field("host")
    # struct-level nulls don't propagate to child fields — mask them explicitly
    return pc.if_else(pc.is_valid(parts), host, pa.scalar(None, pa.string()))


def _as_array(x):
    return x.combine_chunks() if isinstance(x, pa.ChunkedArray) else x
