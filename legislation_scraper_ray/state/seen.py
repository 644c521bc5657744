"""Sharded URL-seen set: actor pool holding cuckoo-filter (or exact) shards.

Each URL is owned by exactly one shard, routed by ``url_hash % n_shards``
(SURVEY.md §7 shuffle table: "seen-set routing").  The shards are plain Ray
actors — this is one of the few places the Dataset API genuinely can't express
the semantics (a shared mutable membership index), per the engine design rules.

The *stage* that consults the shards is still a ``map_batches`` callable
(:class:`SeenFilter`): inside ``__call__`` each Arrow batch's hashes are
grouped by owning shard, one ``check_and_add`` RPC is fired per shard (in
parallel), and the batch is filtered by the combined novelty mask.  Payload
columns never travel to the shard actors — only the 8-byte hashes.

Snapshot/restore: shards serialize before each crawl generation so a resumed
run replays ``check_and_add`` idempotently (SURVEY.md §7 "Hard parts":
snapshot-consistent with frontier checkpoints).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from .cuckoo import CuckooFilter, ExactSet


@ray.remote(num_cpus=0)
class SeenShard:
    # num_cpus=0: the shards are bursty RPC servers; reserving fractional CPUs
    # steals whole task slots from the fetch pool (4 shards × 0.25 = 1 slot →
    # a 16-task generation at num_cpus=16 runs in TWO waves instead of one,
    # measured as gen-1 scaling efficiency 0.65 vs gen-2's 1.0)
    """One membership shard. mode: 'cuckoo' (approximate, at-scale) | 'exact' (parity)."""

    def __init__(self, capacity: int, mode: str = "cuckoo", seed: int = 42):
        cls = CuckooFilter if mode == "cuckoo" else ExactSet
        self.filt = cls(capacity, seed)
        self.mode = mode
        self.capacity = capacity
        self.ops = 0

    def check_and_add(self, hashes: np.ndarray) -> np.ndarray:
        """Batched membership test + insert → ``was_present`` bool mask."""
        self.ops += len(hashes)
        return self.filt.add_batch(hashes)

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        return self.filt.contains_batch(hashes)

    def stats(self) -> dict:
        return {
            "mode": self.mode,
            "count": self.filt.count,
            "load_factor": self.filt.load_factor,
            "ops": self.ops,
        }

    def snapshot(self) -> bytes:
        return self.filt.serialize()

    def restore(self, data: bytes) -> None:
        cls = CuckooFilter if self.mode == "cuckoo" else ExactSet
        self.filt = cls.deserialize(data)


class ShardedSeenSet:
    """Driver-side handle over the shard actor pool."""

    def __init__(self, n_shards: int = 8, capacity_per_shard: int = 1 << 20, mode: str = "cuckoo"):
        self.n_shards = n_shards
        self.mode = mode
        self.shards = [
            SeenShard.remote(capacity_per_shard, mode, seed=42 + i) for i in range(n_shards)
        ]

    def check_and_add(self, hashes: np.ndarray) -> np.ndarray:
        """Route hashes to owning shards, return combined ``was_present`` mask
        in input order."""
        hashes = np.asarray(hashes, dtype=np.uint64)
        owner = (hashes % np.uint64(self.n_shards)).astype(np.int64)
        order = np.argsort(owner, kind="stable")
        sorted_owner = owner[order]
        bounds = np.searchsorted(sorted_owner, np.arange(self.n_shards + 1))
        refs, spans = [], []
        for s in range(self.n_shards):
            lo, hi = bounds[s], bounds[s + 1]
            if hi > lo:
                refs.append(self.shards[s].check_and_add.remote(hashes[order[lo:hi]]))
                spans.append((lo, hi))
        out = np.empty(len(hashes), dtype=bool)
        for ref, (lo, hi) in zip(refs, spans):
            out[order[lo:hi]] = ray.get(ref)
        return out

    def stats(self) -> list[dict]:
        return ray.get([s.stats.remote() for s in self.shards])

    def total_ops(self) -> int:
        return sum(st["ops"] for st in self.stats())

    def snapshot(self) -> list[bytes]:
        return ray.get([s.snapshot.remote() for s in self.shards])

    def restore(self, blobs: list[bytes]) -> None:
        ray.get([s.restore.remote(b) for s, b in zip(self.shards, blobs)])

    def shutdown(self) -> None:
        for s in self.shards:
            ray.kill(s)
        self.shards = []


class SeenFilter:
    """``map_batches`` stage: drop rows whose ``url_hash`` was already seen.

    Runs on workers (actor pool), so frontier blocks never funnel through the
    driver; each batch makes at most ``n_shards`` small RPCs carrying hashes
    only."""

    def __init__(self, shard_handles: list, n_shards: int, hash_col: str = "url_hash"):
        self.shards = shard_handles
        self.n_shards = n_shards
        self.hash_col = hash_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        hashes = batch[self.hash_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        owner = (hashes % np.uint64(self.n_shards)).astype(np.int64)
        order = np.argsort(owner, kind="stable")
        sorted_owner = owner[order]
        bounds = np.searchsorted(sorted_owner, np.arange(self.n_shards + 1))
        refs, spans = [], []
        for s in range(self.n_shards):
            lo, hi = bounds[s], bounds[s + 1]
            if hi > lo:
                refs.append(self.shards[s].check_and_add.remote(hashes[order[lo:hi]]))
                spans.append((lo, hi))
        seen = np.empty(len(hashes), dtype=bool)
        for ref, (lo, hi) in zip(refs, spans):
            seen[order[lo:hi]] = ray.get(ref)
        return batch.filter(pa.array(~seen))
