"""Connected components over a duplicate-pair graph → cluster ids.

The dedup pipeline's last mile: MinHash/SimHash emit verified duplicate PAIRS;
grouping them into clusters (choose one canonical doc per component) needs
connected components.  Implementation: iterative min-label propagation —

    labels ← node_id
    repeat: every edge pushes min(label_a, label_b) to both ends; converged
    when no label changes.  Rounds needed = graph diameter (near-dup clusters
    are small and dense, so 2–4 rounds in practice).

Scale shape: the node set is only the docs that appear in candidate pairs —
by construction a small fraction of the corpus — so labels are broadcast
(``ray.put`` once per round) while the edge list streams through
``map_batches``.  A corpus-sized label table would instead use the
groupby-join form of the same iteration (documented in the Ray guide's
near-dup recipe).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def union_find_components(pairs: pd.DataFrame, a: str = "doc_a", b: str = "doc_b") -> dict[int, int]:
    """Exact driver-side union-find (test oracle + small-graph fast path):
    node → min node id of its component."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in zip(pairs[a].astype(int), pairs[b].astype(int)):
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    return {n: find(n) for n in list(parent)}


def label_propagation(
    edges: pa.Table, max_rounds: int = 16, a: str = "doc_a", b: str = "doc_b"
) -> pa.Table:
    """Vectorized min-label propagation (numpy kernel; the per-round map over
    edge batches is what distributes via map_batches when the edge list is a
    Dataset).  Returns (doc_id, cluster_id)."""
    ea = edges[a].to_numpy(zero_copy_only=False).astype(np.int64)
    eb = edges[b].to_numpy(zero_copy_only=False).astype(np.int64)
    nodes = np.unique(np.concatenate([ea, eb]))
    idx = {int(n): i for i, n in enumerate(nodes)}
    ia = np.array([idx[int(x)] for x in ea], dtype=np.int64)
    ib = np.array([idx[int(x)] for x in eb], dtype=np.int64)
    labels = nodes.copy()
    for _ in range(max_rounds):
        new = labels.copy()
        # push min label across every edge in both directions (vectorized)
        np.minimum.at(new, ia, labels[ib])
        np.minimum.at(new, ib, labels[ia])
        # pointer jumping (path doubling): follow my label's label — turns
        # O(diameter) rounds into O(log diameter)
        pos = np.searchsorted(nodes, new)
        new = np.minimum(new, new[pos])
        if (new == labels).all():
            break
        labels = new
    return pa.table(
        {"doc_id": pa.array(nodes, pa.int64()), "cluster_id": pa.array(labels, pa.int64())}
    )
