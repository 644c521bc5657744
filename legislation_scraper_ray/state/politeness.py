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
