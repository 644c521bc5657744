"""KLL quantile sketch — mergeable, bounded-memory quantiles for UNBOUNDED
value domains (VERDICT r2 item 7).

The exact quantile operators (analytics.value_quantiles_by_type,
value_rank_in_type) ship (group, distinct-value) frequency tables and assume
bounded value cardinality; the bottom-k sample (value_quantiles_sample) is the
O(1/√k) sampling path.  This module adds the deterministic compactor-stack
sketch of Karnin–Lang–Liberty ("Optimal Quantile Approximation in Streams",
FOCS 2016, arXiv:1603.05346): items at level h carry weight 2^h; a full level
sorts its buffer and promotes every other element, alternating the kept parity
per level so the rank error stays mean-zero and the whole structure is
DETERMINISTIC — same input (in any batch split) → same estimates across runs
and cluster sizes, no RNG.

Guarantees (paper, §3; constants for c = 2/3):
- space: O(k · log log n) items total (level capacities shrink geometrically);
- rank error: |est_rank − true_rank| ≤ ε·n with ε ≈ 2.3/k w.h.p. for the
  randomized sketch; the deterministic-parity variant observed here stays well
  inside 4/k, which is the bound ``eps()`` reports and tests assert.
- MERGEABLE: merging level-wise and re-compacting preserves the bound — the
  property that makes it a per-batch combiner + tiny groupby shuffle in Ray.

Serialization is two flat numpy arrays (level, value) — Arrow-friendly rows so
partial sketches travel the shuffle as plain columns.
"""

from __future__ import annotations

import numpy as np


class KLL:
    """Deterministic KLL compactor stack over float64 values."""

    def __init__(self, k: int = 256):
        self.k = max(8, int(k))
        self.compactors: list[list[float]] = [[]]
        self.parity: list[int] = [0]
        self.n = 0

    # ---- sizing ----

    def _cap(self, h: int) -> int:
        """Level capacity: k·(2/3)^(depth-1-h), floored at 2 — top (newest)
        levels keep the most items (they carry the heaviest weights)."""
        depth = len(self.compactors)
        return max(int(np.ceil(self.k * (2.0 / 3.0) ** (depth - 1 - h))), 2)

    def _size(self) -> int:
        return sum(len(c) for c in self.compactors)

    def _maxsize(self) -> int:
        return sum(self._cap(h) for h in range(len(self.compactors)))

    # ---- updates ----

    def update_many(self, values) -> None:
        vals = np.asarray(values, dtype=np.float64)
        vals = vals[~np.isnan(vals)]
        if not len(vals):
            return
        self.compactors[0].extend(vals.tolist())
        self.n += len(vals)
        self._compress()

    def _compress(self) -> None:
        while self._size() > self._maxsize():
            for h in range(len(self.compactors)):
                if len(self.compactors[h]) >= self._cap(h):
                    if h + 1 == len(self.compactors):
                        self.compactors.append([])
                        self.parity.append(0)
                    buf = sorted(self.compactors[h])
                    off = self.parity[h]
                    self.parity[h] ^= 1  # alternate kept parity → mean-zero error
                    self.compactors[h + 1].extend(buf[off::2])
                    self.compactors[h] = []
                    break
            else:  # no level at capacity (can happen right after a merge)
                break

    # ---- merge / serialize ----

    def merge(self, other: "KLL") -> "KLL":
        for h, buf in enumerate(other.compactors):
            while h >= len(self.compactors):
                self.compactors.append([])
                self.parity.append(0)
            self.compactors[h].extend(buf)
        self.n += other.n
        self._compress()
        return self

    def items(self) -> tuple[np.ndarray, np.ndarray]:
        """(level, value) flat arrays — the Arrow-row wire format."""
        levels, values = [], []
        for h, buf in enumerate(self.compactors):
            levels.extend([h] * len(buf))
            values.extend(buf)
        return np.asarray(levels, dtype=np.int32), np.asarray(values, dtype=np.float64)

    @classmethod
    def from_items(cls, levels, values, n: int, k: int = 256) -> "KLL":
        """Rebuild from wire rows: load items AT their levels, then compact —
        the standard KLL merge, so the error bound composes."""
        sk = cls(k)
        levels = np.asarray(levels, dtype=np.int64)
        values = np.asarray(values, dtype=np.float64)
        top = int(levels.max()) + 1 if len(levels) else 1
        while len(sk.compactors) < top:
            sk.compactors.append([])
            sk.parity.append(0)
        for h in range(top):
            sel = values[levels == h]
            if len(sel):
                sk.compactors[h].extend(sel.tolist())
        sk.n = int(n)
        sk._compress()
        return sk

    # ---- queries ----

    def eps(self) -> float:
        """Reported rank-error bound (fraction of n) — conservative for the
        deterministic-parity variant (see module docstring)."""
        return 4.0 / self.k

    def quantile(self, q: float) -> float:
        levels, values = self.items()
        if not len(values):
            return float("nan")
        weights = (1 << levels.astype(np.int64)).astype(np.float64)
        order = np.argsort(values, kind="stable")
        v = values[order]
        cw = np.cumsum(weights[order])
        target = q * cw[-1]
        i = int(np.searchsorted(cw, target, side="left"))
        return float(v[min(i, len(v) - 1)])

    def rank(self, x: float) -> float:
        """Estimated rank (count of items ≤ x), in item units."""
        levels, values = self.items()
        if not len(values):
            return 0.0
        weights = (1 << levels.astype(np.int64)).astype(np.float64)
        return float(weights[values <= x].sum())
