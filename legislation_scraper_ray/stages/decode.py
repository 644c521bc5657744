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
        """Handles mixed batches: rows without a payload (listings, errors)
        pass through with null decode columns."""
        n = batch.num_rows
        blobs = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        # to_pylist (exact Python ints), NOT to_numpy: null-bearing uint64/int64
        # columns convert to float64 in numpy, silently corrupting values > 2^53
        want_sum = batch["dec_sum"].to_pylist()
        want_phash = batch["phash"].to_pylist()
        psnr_db = batch["psnr_db"].to_pylist()
        captions = batch["caption"].to_pylist()
        ok = np.zeros(n, dtype=bool)
        rephash = np.zeros(n, dtype=np.int64)
        ocr_used = np.zeros(n, dtype=bool)
        # image feature vector: mean RGB (3) + std RGB (3) + 16-bin gray
        # histogram — the deterministic stand-in for a CNN embedding
        feat = np.zeros((n, 22), dtype=np.float32)
        has_payload = np.zeros(n, dtype=bool)
        for i in range(n):
            if blobs[i] is None:
                continue
            has_payload[i] = True
            px = decode_image(blobs[i], fmts[i])
            # one float64 gray is shared by phash + histogram; mean/std come
            # from two channel reductions (sum, sum-of-squares) instead of the
            # four passes + np.histogram/linspace overhead of the naive form
            f = px.astype(np.float64)
            gray = f.mean(axis=2)
            ph = phash64(px, gray=gray)
            rephash[i] = ph
            npix = px.shape[0] * px.shape[1]
            s1 = f.sum(axis=(0, 1))
            s2 = (f * f).sum(axis=(0, 1))
            mean = s1 / npix
            feat[i, :3] = mean
            feat[i, 3:6] = np.sqrt(np.maximum(s2 / npix - mean * mean, 0.0))
            bucket = np.minimum((gray * (1.0 / 16.0)).astype(np.int64), 15)
            feat[i, 6:] = np.bincount(bucket.ravel(), minlength=16) / max(npix, 1)
            ok[i] = (
                int(s1.sum()) == int(want_sum[i])  # exact: integer-valued sums < 2^53
                and ph == int(want_phash[i])
                and (fmts[i] == "png" or psnr_db[i] >= 40.0)
            )
            if captions[i] is not None and len(captions[i]) <= self.ocr_threshold:
                ocr_used[i] = True  # deterministic stand-in for the LLM/OCR branch
        self.decoded += int(has_payload.sum())
        batch = batch.append_column("decode_ok", _masked(ok, has_payload))
        batch = batch.append_column("phash_decoded", _masked(rephash, has_payload))
        batch = batch.append_column("ocr_used", _masked(ocr_used, has_payload))
        batch = batch.append_column(
            "feat_mean_rgb",
            pa.FixedSizeListArray.from_arrays(pa.array(feat.reshape(-1)), 22),
        )
        return batch


def _masked(values: np.ndarray, valid: np.ndarray) -> pa.Array:
    return pa.array(values, mask=~valid)
