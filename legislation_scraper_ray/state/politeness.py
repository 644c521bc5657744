"""Per-host politeness: token buckets + robots-delay cache.

Reference analog: hardcoded pacing sleeps and 429/503 backoff
(src/scraper/base/scraper.py:246-249 — sleep 5 s on soft errors;
src/scraper/state_legislation/parana.py:457-459,572-574,626-628 — 5 s sleeps
serializing every Paraná request).  The engine replaces blanket sleeps with a
per-host token bucket honoring each host's ``robots_delay_ms``, held in fetch
actors — one bucket per host, hosts hash-routed to an owning actor so bucket
state is never shared.

The bucket takes an explicit clock so tests are deterministic and the sandbox
bench can run in *virtual time* (no real sleeping — the scheduler computes each
fetch's earliest-start time and records it in lineage; parity tests then assert
per-host spacing ≥ the robots delay).  ``sleep`` mode does real waiting for
live-crawl use.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field


@dataclass
class TokenBucket:
    """Classic token bucket: ``rate`` tokens/sec, capacity ``burst``."""

    rate: float
    burst: float = 1.0
    tokens: float = field(default=None)  # type: ignore[assignment]
    last: float = 0.0

    def __post_init__(self):
        if self.tokens is None:
            self.tokens = self.burst

    def try_acquire(self, now: float, n: float = 1.0) -> bool:
        self._refill(now)
        if self.tokens >= n:
            self.tokens -= n
            return True
        return False

    def next_available(self, now: float, n: float = 1.0) -> float:
        """Earliest time at which ``n`` tokens will be available."""
        self._refill(now)
        if self.tokens >= n:
            return now
        return now + (n - self.tokens) / self.rate

    def _refill(self, now: float) -> None:
        if now > self.last:
            self.tokens = min(self.burst, self.tokens + (now - self.last) * self.rate)
            self.last = now


class HostPoliteness:
    """Virtual-time politeness scheduler for a set of hosts.

    ``schedule(host)`` returns the fetch's assigned virtual start time and
    advances that host's clock; per-host starts are spaced ≥ delay_ms apart —
    the invariant the politeness tests assert from lineage records."""

    def __init__(self, delays_ms: dict[str, int], mode: str = "virtual"):
        self.delays = {h: max(d, 0) / 1000.0 for h, d in delays_ms.items()}
        self.next_free: dict[str, float] = {}
        self.mode = mode
        self.t0 = time.monotonic()

    def schedule(self, host: str) -> float:
        delay = self.delays.get(host, 0.0)
        now = time.monotonic() - self.t0 if self.mode == "sleep" else self.next_free.get(host, 0.0)
        start = max(self.next_free.get(host, 0.0), now)
        self.next_free[host] = start + delay
        if self.mode == "sleep" and delay > 0:
            wait = start - (time.monotonic() - self.t0)
            if wait > 0:
                time.sleep(wait)
        return start


class PolitenessSlotShard:
    """Slot-reservation shard actor (r2): owns the virtual clocks of the hosts
    that hash-route to it and hands out dense, delay-spaced slot ranges.

    Replaces the r1 ``groupby(host).map_groups(schedule)`` scheduler — an
    all-to-all shuffle per generation whose ~4 s fixed cost did not scale and
    whose parallelism was capped at the host count.  Reservation is a tiny
    (hosts × 8 bytes) RPC per batch, the same shard-actor pattern as the
    URL-seen set, and shards by host hash exactly like a multi-node deployment
    would.  Per-host slot ``i`` (0-based, dense across batches/generations) is
    ``clock0 + delay × (i + 1)`` — identical spacing to the r1 scheduler; the
    spacing invariant (consecutive per-host starts ≥ delay apart) is what the
    politeness parity tests assert from lineage."""

    def __init__(self, delays_ms: dict[str, int], clocks: dict[str, float] | None = None):
        # r5 scale audit: each shard receives ONLY its owned hosts' delays
        # and clocks (1/n_shards of the host universe) — at 10^8 hosts the
        # full dict is ~15-20 GB and must never be replicated per shard or
        # mirrored on the driver (see crawl.py _make_slot_shards /
        # _save_checkpoint).
        self.delays = {h: max(d, 0) / 1000.0 for h, d in delays_ms.items()}
        self.next_free = dict(clocks or {})

    def reserve(self, hosts: list[str], counts: list[int]) -> list[tuple[float, float]]:
        """For each (host, n) request, return (first slot time, delay); the
        caller expands slots ``start + delay*arange(n)`` — we advance the
        clock past all n.  Returning the delay keeps the global host→delay
        dict OUT of every SlotAssigner task (the shards are its only
        holders)."""
        out = []
        for h, n in zip(hosts, counts):
            d = self.delays.get(h, 0.0)
            t0 = self.next_free.get(h, 0.0)
            start = t0 + d
            out.append((start, d))
            self.next_free[h] = t0 + d * n
        return out

    def clocks(self) -> dict[str, float]:
        """Checkpoint dump of this shard's host clocks (the authoritative
        copy — ``next_free`` advances exactly like the lineage-derived
        last-slot value, so no driver mirror is needed)."""
        return dict(self.next_free)


def host_shard_of(host: str, n_shards: int) -> int:
    import zlib

    return zlib.crc32(host.encode()) % n_shards


class SlotAssigner:
    """map_batches stage: assign ``scheduled_ts`` to every frontier row by
    reserving per-host slot ranges from the sharded politeness actors.  Fully
    vectorized expansion: per-host in-batch ranks via unique/argsort, one
    reserve RPC per (shard) per batch."""

    def __init__(self, shards, n_shards: int):
        self.shards = shards
        self.n_shards = n_shards

    def __call__(self, batch):
        import numpy as np
        import pyarrow as pa
        import ray

        n = batch.num_rows
        if n == 0:
            return batch.append_column("scheduled_ts", pa.array([], pa.float64()))
        hosts = np.asarray(batch["host"].to_pylist(), dtype=object)
        uniq, inv, counts = np.unique(hosts, return_inverse=True, return_counts=True)
        # in-batch per-host rank (0..count-1) in row order
        order = np.argsort(inv, kind="stable")
        rank_sorted = np.arange(n) - np.repeat(np.cumsum(counts) - counts, counts)
        rank = np.empty(n, dtype=np.int64)
        rank[order] = rank_sorted
        # route unique hosts to their owning shard, one RPC per shard
        shard_of = np.fromiter(
            (host_shard_of(h, self.n_shards) for h in uniq), np.int64, count=len(uniq)
        )
        starts = np.empty(len(uniq), dtype=np.float64)
        delays = np.empty(len(uniq), dtype=np.float64)
        futs, idxs = [], []
        for s in np.unique(shard_of):
            sel = np.nonzero(shard_of == s)[0]
            futs.append(
                self.shards[s].reserve.remote(
                    [str(uniq[j]) for j in sel], [int(counts[j]) for j in sel]
                )
            )
            idxs.append(sel)
        for sel, res in zip(idxs, ray.get(futs)):
            starts[sel] = [r[0] for r in res]
            delays[sel] = [r[1] for r in res]
        ts = starts[inv] + delays[inv] * rank
        return batch.append_column("scheduled_ts", pa.array(ts, pa.float64()))
