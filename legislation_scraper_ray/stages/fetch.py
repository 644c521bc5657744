"""Fetch stage: stateful actor pool doing keyed lookups into the synthetic web.

Reference analog: the retrying HTTP fetcher (S1,
src/scraper/base/scraper.py:203-257 — 5 attempts, 5 s sleep, soft-error
detection by body text and 429/503 status) and the session-stateful fetcher
(S2, :120,129-132).  In this hermetic sandbox "the web" is the broadcast
``web_graph`` + ``corpus`` tables: a fetch is a hash-map lookup, failures are
driven by the graph's ``fail_mode`` column, and retry/backoff cost is accounted
in *virtual time* so the scheduler semantics are real without wall-clock
sleeps.

Broadcast pattern: the graph/corpus tables are ``ray.put`` once by the driver;
every actor ``ray.get``s them in ``__init__`` (zero-copy shared-memory read —
NOT re-shipped per batch) and builds its url→row index once.  At real scale the
lookup side would be live HTTP; everything downstream is unchanged.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

RETRY_SLEEP_S = 5.0  # mirrors the reference's 5 s retry sleep (base/scraper.py:213,242-249)
MAX_ATTEMPTS = 5  # mirrors the reference's 5-attempt budget


OUT_SCHEMA_EXTRA = [
    ("status", pa.string()),  # ok | error
    ("attempts", pa.int32()),
    ("kind", pa.string()),  # listing | doc
    ("out_links", pa.list_(pa.string())),
    ("image_id", pa.string()),
    ("bytes", pa.binary()),
    ("w", pa.int32()),
    ("h", pa.int32()),
    ("fmt", pa.string()),
    ("caption", pa.string()),
    ("phash", pa.int64()),
    ("dec_sum", pa.uint64()),
    ("psnr_db", pa.float64()),
    ("doc_year", pa.int32()),
    ("doc_situation", pa.string()),
    ("doc_type", pa.string()),
    ("subject_ids", pa.list_(pa.int32())),
]


class FetchActor:
    """map_batches callable class → one actor per pool slot.

    ``__init__`` (once per actor): materialize the broadcast web/corpus index.
    ``__call__`` (per batch): vectorized URL→row lookup, retry simulation,
    payload attach."""

    def __init__(self, graph_ref, corpus_ref):
        graph: pa.Table = ray.get(graph_ref)
        corpus: pa.Table = ray.get(corpus_ref)
        self.graph = graph
        self.corpus = corpus
        urls = graph["url"].to_pylist()
        self.url_index: dict[str, int] = {u: i for i, u in enumerate(urls)}
        img_ids = corpus["image_id"].to_pylist()
        self.img_index: dict[str, int] = {u: i for i, u in enumerate(img_ids)}
        self.fail_mode = graph["fail_mode"].to_pylist()
        self.graph_image = graph["image_id"].to_pylist()
        self.fetched = 0

    def _attempts_for(self, idx: int, url_hash: int) -> tuple[int, str]:
        """Simulated retry loop (semantics of base/scraper.py:213-257): soft
        failures succeed after a deterministic 1–3 extra attempts; hard errors
        exhaust the budget → error record."""
        mode = self.fail_mode[idx]
        if mode is None:
            return 1, "ok"
        if mode == "hard_error":
            return MAX_ATTEMPTS, "error"
        return 1 + (url_hash % 3 + 1), "ok"  # 2–4 attempts then success

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return _empty_out(batch)
        urls = batch["url"].to_pylist()
        hashes = batch["url_hash"].to_numpy(zero_copy_only=False)
        statuses = np.empty(n, dtype=object)
        attempts = np.zeros(n, dtype=np.int32)
        gidx = np.full(n, -1, dtype=np.int64)
        for i, u in enumerate(urls):
            j = self.url_index.get(u, -1)
            gidx[i] = j
            if j < 0:
                statuses[i] = "error"  # 404: URL not in the web
                attempts[i] = 1
            else:
                a, s = self._attempts_for(j, int(hashes[i]))
                attempts[i] = a
                statuses[i] = s
        ok = (statuses == "ok") & (gidx >= 0)
        # graph-side columns via vectorized take (null row for misses/errors)
        take_idx = pa.array([int(j) if m else None for j, m in zip(gidx, ok)], pa.int64())
        g = self.graph.take(take_idx)
        # corpus payload for doc rows
        cidx = [
            self.img_index.get(im, None) if m else None
            for im, m in zip(g["image_id"].to_pylist(), ok)
        ]
        c = self.corpus.take(pa.array(cidx, pa.int64()))
        self.fetched += int(ok.sum())
        cols = {name: batch[name] for name in batch.schema.names}
        cols.update(
            {
                "status": pa.array(statuses.tolist(), pa.string()),
                "attempts": pa.array(attempts, pa.int32()),
                "kind": g["kind"],
                "out_links": g["out_links"],
                "image_id": g["image_id"],
                "bytes": c["bytes"],
                "w": c["w"],
                "h": c["h"],
                "fmt": c["fmt"],
                "caption": c["caption"],
                "phash": c["phash"],
                "dec_sum": c["dec_sum"],
                "psnr_db": c["psnr_db"],
                "doc_year": g["year"],
                "doc_situation": g["situation"],
                "doc_type": g["type"],
                "subject_ids": g["subject_ids"],
            }
        )
        return pa.table(cols)


def _empty_out(batch: pa.Table) -> pa.Table:
    cols = {name: batch[name] for name in batch.schema.names}
    for name, typ in OUT_SCHEMA_EXTRA:
        cols[name] = pa.array([], typ)
    return pa.table(cols)
