"""Per-host session/token state for stateful form-POST protocols (S6 + T1/T4).

Reference analog: the JSF/ViewState postback chains — every request to a host
must present the token minted by that host's PREVIOUS response, on one live
session (reference: src/scraper/state_legislation/espirito_santo.py:69-127,
src/scraper/state_legislation/maranhao.py:45-110).  In the hermetic sandbox
the "server" mints tokens deterministically:

    token_0      = splitmix64(fnv1a64(host))
    token_{i+1}  = splitmix64(token_i XOR url_hash_i)

and request *i* must present ``token_i``.  The chain is inherently sequential
per host — which is exactly why this mode requires ``host_affinity=True`` (one
fetch unit per host per generation, rows in scheduled order).  The shard
actors below carry each host's tail token ACROSS generations — the same
shard-actor pattern as the URL-seen set and the politeness clocks, sharded by
``host_shard_of`` so a multi-node deployment splits hosts the same way.

A lineage ``post_token`` column records the token presented with every
request, so tests (and production audits) can re-derive the chain from
lineage order and prove it never broke across batches or generations.
"""

from __future__ import annotations

import numpy as np

from ..functions.hashing import fnv1a64_bytes, splitmix64


def seed_token(host: str) -> int:
    """token_0 for a host the engine has never talked to."""
    return int(splitmix64(np.array([fnv1a64_bytes(host.encode())], np.uint64))[0])


def advance_chain(token0: int, url_hashes: np.ndarray) -> tuple[np.ndarray, int]:
    """Presented-token sequence for an ORDERED per-host request run, plus the
    tail token to persist.  Sequential by protocol (each token depends on the
    previous response) — a real postback chain serializes on the network the
    same way, so the Python loop is not a hot path by construction."""
    n = len(url_hashes)
    toks = np.empty(n, dtype=np.uint64)
    t = np.uint64(token0)
    for i in range(n):
        toks[i] = t
        t = splitmix64(np.array([t ^ np.uint64(url_hashes[i])], np.uint64))[0]
    return toks, int(t)


class SessionTokenShard:
    """Owns the tail tokens of the hosts that hash-route to it.  Wrapped in
    ``ray.remote(num_cpus=0)`` by the crawl (bursty RPC server — reserving CPU
    would steal fetch slots, same rationale as SeenShard)."""

    def __init__(self, tokens: dict[str, int] | None = None):
        self.tokens: dict[str, int] = dict(tokens or {})

    def get(self, host: str) -> int:
        return self.tokens.get(host, seed_token(host))

    def put(self, host: str, token: int) -> None:
        self.tokens[host] = token

    def snapshot(self) -> dict[str, int]:
        return dict(self.tokens)
