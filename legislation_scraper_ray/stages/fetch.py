"""Fetch stage: stateful actor pool doing keyed lookups into the synthetic web.

Reference analog: the retrying HTTP fetcher (S1,
src/scraper/base/scraper.py:203-257 — 5 attempts, 5 s sleep, soft-error
detection by body text and 429/503 status) and the session-stateful fetcher
(S2, :120,129-132).  In this hermetic sandbox "the web" is the broadcast
``web_graph`` + ``corpus`` tables: a fetch is a keyed lookup, failures are
driven by the graph's ``fail_mode`` column, and retry/backoff cost is
simulated deterministically so the scheduler semantics are real without
wall-clock sleeps.

Broadcast + lookup design (scale-conscious):

- ``prepare_web`` runs ONCE on the driver: hash every graph URL, sort the
  table by ``url_hash``, precompute ``image_idx`` (corpus row ordinal) and
  ``fail_code``.  The sorted table is ``ray.put`` once.
- each actor ``ray.get``s it in ``__init__`` — a zero-copy shared-memory view,
  NOT re-shipped per batch — and keeps only numpy views; there is no per-actor
  Python index build (a dict of 10^10 URLs would never fit; a sorted-hash
  binary search shards naturally).
- ``__call__`` is fully vectorized: np.searchsorted URL→row, vectorized retry
  accounting, one Arrow ``take`` for graph columns and one for corpus payloads.

At real scale the lookup side is live HTTP; everything downstream is unchanged.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..functions.hashing import hash64

RETRY_SLEEP_S = 5.0  # mirrors the reference's 5 s retry sleep (base/scraper.py:213,242-249)
MAX_ATTEMPTS = 5  # mirrors the reference's 5-attempt budget

FAIL_NONE, FAIL_SOFT, FAIL_HARD = 0, 1, 2


def unwrap_b64json(buf) -> bytes:
    """base64-in-JSON payload decode: the reference's API-shaped sources
    deliver binaries as ``{"doc": {"conteudo": "<base64>"}}`` bodies and
    decode them in the response handler (alagoas.py:104-107,
    rio_de_janeiro.py:136-141).  Rows marked ``payload_encoding='b64json'``
    in the web graph are unwrapped here, BEFORE the fused decode — so the
    decode-stage invariants (checksum / phash / PSNR vs raw-image ground
    truth) verify the unwrap end-to-end.  json/binascii are C-backed; the
    base64 copy is inherent to the wire format, not an engine copy."""
    import binascii
    import json as _json

    return binascii.a2b_base64(_json.loads(bytes(buf))["doc"]["conteudo"])

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


def prepare_web_cached(corpus_dir: str, graph: pa.Table, corpus: pa.Table) -> pa.Table:
    """prepare_web with an on-disk cache next to the corpus (the prep is
    deterministic per corpus; re-deriving it is ~10 s of serial driver time
    that would otherwise be charged to every crawl)."""
    import os

    import pyarrow.parquet as pq

    path = os.path.join(corpus_dir, "prepared_web.parquet")
    if os.path.exists(path):
        return pq.read_table(path)
    g = prepare_web(graph, corpus)
    try:
        pq.write_table(g, path)
    except OSError:
        pass  # read-only corpus dir: fall through uncached
    return g


def prepare_web(graph: pa.Table, corpus: pa.Table) -> pa.Table:
    """Driver-side one-time prep: url_hash sort key + corpus ordinal + fail code.

    Fully vectorized (r2): ``pc.index_in`` maps image_id → corpus ordinal and
    fail_mode → code — the r1 Python dict/list comprehensions were
    row-at-a-time over the largest table in the system."""
    hashes = hash64(graph["url"])
    idx = pc.index_in(graph["image_id"], value_set=corpus["image_id"])
    image_idx = pc.fill_null(idx.cast(pa.int64()), -1)
    fm = graph["fail_mode"]
    fail_code = pc.if_else(
        pc.is_null(fm),
        pa.scalar(FAIL_NONE, pa.int8()),
        pc.if_else(pc.equal(fm, "hard_error"),
                   pa.scalar(FAIL_HARD, pa.int8()), pa.scalar(FAIL_SOFT, pa.int8())),
    )
    g = graph.append_column("url_hash", pa.array(hashes, pa.uint64()))
    g = g.append_column("image_idx", image_idx)
    g = g.append_column("fail_code", fail_code)
    return g.sort_by("url_hash")


class FetchActor:
    """map_batches callable class → one actor per pool slot.

    ``__init__`` (once per actor): zero-copy views over the broadcast tables.
    ``__call__`` (per batch): vectorized hash lookup, retry simulation,
    payload attach."""

    def __init__(
        self,
        graph_ref,
        corpus_ref,
        politeness_mode: str = "virtual",
        t0: float = 0.0,
        decode: bool = False,
        ocr_threshold: int = 0,
        keep_payloads: bool = True,
    ):
        self.graph: pa.Table = ray.get(graph_ref)
        self.corpus: pa.Table = ray.get(corpus_ref)
        self.g_hashes = self.graph["url_hash"].to_numpy()
        self.g_fail = self.graph["fail_code"].to_numpy()
        self.g_image_idx = self.graph["image_idx"].to_numpy()
        self.politeness_mode = politeness_mode
        self.t0 = t0  # crawl epoch (time.time()) for sleep-mode pacing
        self.fetched = 0
        self.decode = decode
        self.ocr_threshold = ocr_threshold
        self.keep_payloads = keep_payloads
        # decode reads blobs as zero-copy views over the plasma-resident
        # corpus; the payload column is ONLY materialized into output blocks
        # when keep_payloads asks for it.  Copying every blob through
        # take→block→plasma→decode-read (~45 KB/row) was the single largest
        # share of crawl memory traffic — and this box's effective DRAM
        # bandwidth, not CPU, is what caps fetch+decode scaling.
        self.corpus_small = self.corpus.drop_columns(["bytes"])
        # graphs without encoded payloads skip the unwrap path entirely
        self.has_enc = "payload_encoding" in self.graph.schema.names
        if decode:
            from .decode import ChunkedBlobs

            self.blobs = ChunkedBlobs(self.corpus["bytes"])

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return _empty_out(batch, self.keep_payloads, self.decode)
        if self.politeness_mode == "sleep" and "scheduled_ts" in batch.schema.names:
            # live-crawl pacing: wait until this batch's latest assigned start
            # time (virtual schedule ↔ wall clock, batch granularity)
            import time as _time

            target = pc.max(batch["scheduled_ts"]).as_py() or 0.0
            wait = self.t0 + target - _time.time()
            if wait > 0:
                _time.sleep(min(wait, 60.0))
        h = batch["url_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        pos = np.searchsorted(self.g_hashes, h)
        pos_c = np.minimum(pos, len(self.g_hashes) - 1)
        found = self.g_hashes[pos_c] == h
        fail = np.where(found, self.g_fail[pos_c], FAIL_NONE)
        # retry simulation (semantics of base/scraper.py:213-257): soft failures
        # succeed after a deterministic 1–3 extra attempts; hard errors exhaust
        # the budget; unknown URLs are immediate 404s.
        attempts = np.ones(n, dtype=np.int32)
        attempts[fail == FAIL_SOFT] = 2 + (h[fail == FAIL_SOFT] % 3).astype(np.int32)
        attempts[fail == FAIL_HARD] = MAX_ATTEMPTS
        ok = found & (fail != FAIL_HARD)
        status = np.where(ok, "ok", "error")

        take_graph = pa.array(np.where(ok, pos_c, -1), pa.int64())
        take_graph = pc.if_else(pc.not_equal(take_graph, -1), take_graph, pa.scalar(None, pa.int64()))
        g = self.graph.take(take_graph)
        img_idx = np.where(ok, self.g_image_idx[pos_c], -1)
        take_corpus = pa.array(img_idx, pa.int64())
        take_corpus = pc.if_else(
            pc.not_equal(take_corpus, -1), take_corpus, pa.scalar(None, pa.int64())
        )
        c = self.corpus_small.take(take_corpus)
        self.fetched += int(ok.sum())
        cols = {name: batch[name] for name in batch.schema.names}
        cols.update(
            {
                "status": pa.array(status.tolist(), pa.string()),
                "attempts": pa.array(attempts, pa.int32()),
                "kind": g["kind"],
                "out_links": g["out_links"],
                "image_id": g["image_id"],
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
        enc = g["payload_encoding"].to_pylist() if self.has_enc else None
        if self.keep_payloads:
            payload_col = self.corpus.select(["bytes"]).take(take_corpus)["bytes"]
            if enc is not None and any(e == "b64json" for e in enc):
                # emit the DECODED payload (the reference's saver writes the
                # unwrapped binary, not the JSON body) — per-row cost only on
                # encoded rows of encoded corpora
                vals = payload_col.to_pylist()
                vals = [
                    unwrap_b64json(v) if (e == "b64json" and v is not None) else v
                    for v, e in zip(vals, enc)
                ]
                payload_col = pa.array(vals, pa.binary())
            cols["bytes"] = payload_col
        if self.decode:
            from .decode import decode_compute

            blob_views = [
                self.blobs.get(int(j)) if j >= 0 else None for j in img_idx
            ]
            if enc is not None:
                blob_views = [
                    unwrap_b64json(v) if (e == "b64json" and v is not None) else v
                    for v, e in zip(blob_views, enc)
                ]
            dec = decode_compute(
                blob_views,
                c["fmt"].to_pylist(),
                c["dec_sum"].to_pylist(),
                c["phash"].to_pylist(),
                c["psnr_db"].to_pylist(),
                c["caption"].to_pylist(),
                self.ocr_threshold,
            )
            dec.pop("_n_decoded")
            cols.update(dec)
        return pa.table(cols)


DECODE_SCHEMA_EXTRA = [
    ("decode_ok", pa.bool_()),
    ("phash_decoded", pa.int64()),
    ("ocr_used", pa.bool_()),
    ("feat_mean_rgb", pa.list_(pa.float32(), 22)),
]


def _empty_out(batch: pa.Table, keep_payloads: bool = True, decode: bool = False) -> pa.Table:
    cols = {name: batch[name] for name in batch.schema.names}
    for name, typ in OUT_SCHEMA_EXTRA:
        if name == "bytes" and not keep_payloads:
            continue
        cols[name] = pa.array([], typ)
    if decode:
        for name, typ in DECODE_SCHEMA_EXTRA:
            cols[name] = pa.array([], typ)
    return pa.table(cols)
