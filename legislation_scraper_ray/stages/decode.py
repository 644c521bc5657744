"""Decode / caption-extract stage: stateful actor pool over binary payloads.

Reference analog: the HTML/PDF → markdown converter + rasterizer + conditional
OCR chain (M6–M8, src/scraper/base/scraper.py:312-429): a CPU-bound per-row
decode with handles (MarkItDown, LLM client) loaded once.  Here the payload is
an image (input_hint): decode ``bytes`` per ``fmt``, verify the per-row
invariant — decoded pixels match ground truth (checksum equality; PSNR ≥ 40 dB
for lossy formats) — recompute ``phash`` from the decoded pixels, and pass the
caption through for exact-equality verification.

Decoding is per-row by nature (variable-size binary blobs); throughput comes
from the actor pool (``concurrency=N``) and from batches sized so
``batch_size × avg_blob`` stays well under the worker heap (wide-binary-rows
rule, SURVEY.md §7 "Hard parts").
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sources.codec import decode_image, phash64


class DecodeActor:
    """map_batches callable: decode + verify + caption extract.

    OCR-fallback analog (M8): rows whose caption is shorter than
    ``ocr_threshold`` chars are routed through the (stubbed) heavy path —
    mirrors "if extracted text ≤ 200 chars → rasterize + LLM"
    (base/scraper.py:344).  The stub is deterministic (marks the row), keeping
    the branching plumbing real without a model in the container."""

    def __init__(self, ocr_threshold: int = 0):
        self.ocr_threshold = ocr_threshold
        self.decoded = 0

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        blobs = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        want_sum = batch["dec_sum"].to_numpy(zero_copy_only=False)
        want_phash = batch["phash"].to_numpy(zero_copy_only=False)
        psnr_db = batch["psnr_db"].to_numpy(zero_copy_only=False)
        captions = batch["caption"].to_pylist()
        ok = np.zeros(n, dtype=bool)
        rephash = np.zeros(n, dtype=np.int64)
        ocr_used = np.zeros(n, dtype=bool)
        for i in range(n):
            if blobs[i] is None:
                continue
            px = decode_image(blobs[i], fmts[i])
            ph = phash64(px)
            rephash[i] = ph
            ok[i] = (
                int(px.astype(np.uint64).sum()) == int(want_sum[i])
                and ph == int(want_phash[i])
                and (fmts[i] == "png" or psnr_db[i] >= 40.0)
            )
            if captions[i] is not None and len(captions[i]) <= self.ocr_threshold:
                ocr_used[i] = True  # deterministic stand-in for the LLM/OCR branch
        self.decoded += n
        batch = batch.append_column("decode_ok", pa.array(ok))
        batch = batch.append_column("phash_decoded", pa.array(rephash, pa.int64()))
        batch = batch.append_column("ocr_used", pa.array(ocr_used))
        return batch
