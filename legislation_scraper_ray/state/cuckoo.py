"""Cuckoo filter — the approximate URL-seen-set membership structure.

The reference has NO online seen set: its dedup semantics are post-hoc exact
dedup by document_url (reference: src/datasets/build_dataset.py:204).  At a
10^10-URL frontier an exact set costs ≥ 80 GB cluster-wide (8 B/url); a cuckoo
filter with 16-bit fingerprints and 4-slot buckets costs ~2.4 B/url (~24 GB)
with an FP rate ≈ 2·b / 2^f ≈ 0.012 % and **zero false negatives** — a false
positive drops a URL that was never fetched, a false negative refetches, so the
asymmetry is the right one for crawling (cf. PAPERS.md, learned cuckoo filter,
SIGMOD 2023).

Two membership modes are exposed by the shard actors (state/seen.py):

- ``exact``  — numpy-set semantics, used for reference-parity tests (the
  URL-seen set must match the reference's exact-dedup semantics bit-for-bit);
- ``cuckoo`` — this filter, the at-scale path benchmarked for dedup ops/sec.

All batch operations are vectorized numpy; the only per-item Python loop is the
insertion/eviction chain for *novel* keys (amortized O(1), bounded kicks).
"""

from __future__ import annotations

import io

import numpy as np

_MIX = np.uint64(0x9E3779B97F4A7C15)  # splitmix64-ish odd multiplier for fp→bucket hashing


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p


class CuckooFilter:
    """(2,4)-cuckoo filter over uint64 keys with 16-bit fingerprints."""

    MAX_KICKS = 500

    def __init__(self, capacity: int, seed: int = 42):
        # target load ≤ ~0.84 ⇒ buckets = pow2(capacity / (4 * 0.84))
        self.n_buckets = max(_next_pow2(int(capacity / (4 * 0.84)) + 1), 8)
        self.mask = np.uint64(self.n_buckets - 1)
        self.table = np.zeros((self.n_buckets, 4), dtype=np.uint16)
        self.count = 0
        self.rng = np.random.default_rng(seed)
        # fingerprints displaced by a failed eviction chain: (bucket, fp) pairs
        # (standard cuckoo stash — guarantees zero false negatives at overload)
        self.stash: list[tuple[int, int]] = []

    @staticmethod
    def _mix64(x: np.ndarray) -> np.ndarray:
        """splitmix64 finalizer — makes fp/bucket derivation robust to
        arbitrary key distributions (e.g. small sequential integers whose high
        48 bits are all zero)."""
        x = x.astype(np.uint64, copy=True)
        x ^= x >> np.uint64(30)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
        return x

    # ---- key → (fingerprint, bucket1, bucket2), all vectorized ----
    def _derive(self, keys: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        m = self._mix64(np.asarray(keys))
        fp = ((m >> np.uint64(48)) % np.uint64(65535) + np.uint64(1)).astype(np.uint16)
        i1 = (m & self.mask).astype(np.uint64)
        i2 = (i1 ^ ((fp.astype(np.uint64) * _MIX) & self.mask)).astype(np.uint64)
        return fp, i1, i2

    def _alt(self, fp: np.uint16, i: int) -> int:
        return int((np.uint64(i) ^ ((np.uint64(fp) * _MIX) & self.mask)) & self.mask)

    def contains_batch(self, keys: np.ndarray) -> np.ndarray:
        fp, i1, i2 = self._derive(keys)
        hit = (self.table[i1] == fp[:, None]).any(axis=1) | (
            self.table[i2] == fp[:, None]
        ).any(axis=1)
        for si, sfp in self.stash:
            hit |= (fp == np.uint16(sfp)) & ((i1 == np.uint64(si)) | (i2 == np.uint64(si)))
        return hit

    def add_batch(self, keys: np.ndarray) -> np.ndarray:
        """Insert all keys; return ``was_present`` mask (True = already a member,
        including earlier duplicates *within this batch* — matches exact-set
        semantics for intra-batch dups)."""
        keys = np.asarray(keys, dtype=np.uint64)
        uniq, first_idx, inverse = np.unique(keys, return_index=True, return_inverse=True)
        present_uniq = self.contains_batch(uniq)
        novel = np.nonzero(~present_uniq)[0]
        fp, i1, i2 = self._derive(uniq)
        for j in novel:
            self._insert_one(int(fp[j]), int(i1[j]), int(i2[j]), int(uniq[j]))
        # expand back: a key is "new" only at its first occurrence in the batch
        # (fancy indexing keeps first_idx ↔ present_uniq aligned in uniq order)
        was_present = np.ones(len(keys), dtype=bool)
        was_present[first_idx] = present_uniq
        return was_present

    def _insert_one(self, fp: int, i1: int, i2: int, key: int) -> None:
        for i in (i1, i2):
            row = self.table[i]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                self.count += 1
                return
        # evict — if the chain exceeds MAX_KICKS, the fingerprint left in hand
        # (which belongs to some *other*, previously stored key) goes to the
        # stash together with the bucket it was displaced from, so membership
        # never produces a false negative even at overload.
        i = i1 if self.rng.integers(2) else i2
        cur = np.uint16(fp)
        for _ in range(self.MAX_KICKS):
            slot = int(self.rng.integers(4))
            cur, self.table[i, slot] = self.table[i, slot], cur
            prev_bucket = i
            i = self._alt(cur, i)
            row = self.table[i]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = cur
                self.count += 1
                return
        self.stash.append((int(prev_bucket), int(cur)))
        self.count += 1

    @property
    def load_factor(self) -> float:
        return self.count / (self.n_buckets * 4)

    # ---- snapshot/restore for checkpoint-resume (north_rule) ----
    def serialize(self) -> bytes:
        # full PCG64 generator state ('state' AND 'inc' — shards are seeded
        # 42+i, so restoring only 'state' onto a default_rng(42) would resume
        # with a different random stream than the one snapshotted, making a
        # resumed run's eviction/stash layout diverge from an uninterrupted one)
        st = self.rng.bit_generator.state
        buf = io.BytesIO()
        np.savez_compressed(
            buf,
            table=self.table,
            count=np.int64(self.count),
            stash=np.array(self.stash or np.empty((0, 2)), dtype=np.uint64).reshape(-1, 2),
            rng_state=np.frombuffer(st["state"]["state"].to_bytes(16, "little"), np.uint8),
            rng_inc=np.frombuffer(st["state"]["inc"].to_bytes(16, "little"), np.uint8),
            rng_extra=np.array([st["has_uint32"], st["uinteger"]], dtype=np.uint64),
        )
        return buf.getvalue()

    @classmethod
    def deserialize(cls, data: bytes) -> "CuckooFilter":
        z = np.load(io.BytesIO(data))
        obj = cls.__new__(cls)
        obj.table = z["table"].copy()
        obj.n_buckets = obj.table.shape[0]
        obj.mask = np.uint64(obj.n_buckets - 1)
        obj.count = int(z["count"])
        obj.stash = [(int(a), int(b)) for a, b in z["stash"]]
        obj.rng = np.random.default_rng(0)
        st = obj.rng.bit_generator.state
        st["state"]["state"] = int.from_bytes(z["rng_state"].tobytes(), "little")
        st["state"]["inc"] = int.from_bytes(z["rng_inc"].tobytes(), "little")
        st["has_uint32"], st["uinteger"] = (int(x) for x in z["rng_extra"])
        obj.rng.bit_generator.state = st
        return obj


class ExactSet:
    """Exact uint64 membership set with the same batch API as CuckooFilter.

    Used by parity tests and as the exact-dedup semantics anchor
    (reference: drop_duplicates(subset=["document_url"]),
    src/datasets/build_dataset.py:204)."""

    def __init__(self, capacity: int = 0, seed: int = 0):
        self._set: set[int] = set()

    def contains_batch(self, keys: np.ndarray) -> np.ndarray:
        s = self._set
        return np.fromiter((int(k) in s for k in keys), dtype=bool, count=len(keys))

    def add_batch(self, keys: np.ndarray) -> np.ndarray:
        """Vectorized set semantics matching CuckooFilter.add_batch: a key is
        'new' only at its first occurrence within the batch."""
        keys = np.asarray(keys, dtype=np.uint64)
        uniq, first_idx = np.unique(keys, return_index=True)
        present_uniq = self.contains_batch(uniq)
        self._set.update(int(k) for k in uniq[~present_uniq])
        was_present = np.ones(len(keys), dtype=bool)
        was_present[first_idx] = present_uniq
        return was_present

    @property
    def count(self) -> int:
        return len(self._set)

    @property
    def load_factor(self) -> float:
        return 0.0

    def serialize(self) -> bytes:
        buf = io.BytesIO()
        np.save(buf, np.array(sorted(self._set), dtype=np.uint64))
        return buf.getvalue()

    @classmethod
    def deserialize(cls, data: bytes) -> "ExactSet":
        obj = cls()
        obj._set = set(int(x) for x in np.load(io.BytesIO(data)))
        return obj
