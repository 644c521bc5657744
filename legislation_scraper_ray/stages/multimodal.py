"""Multimodal payload stages: resize, frame-sample, feature-extract.

Binary media flows through the engine as opaque ``bytes`` columns with typed
metadata (``fmt``, ``w``, ``h``) — the input_hint's image layout generalized.
Each operation is an actor-pool ``map_batches`` stage (codec state loaded once
per actor).  The container ships no real media libraries, so per the task
instructions the codec internals are the deterministic in-repo implementations
(sources/codec.py) and anything beyond them raises ``NotImplementedError`` —
the Ray-side plumbing (schemas, batch sizing, actor signatures, output layout)
is real and tested.

Reference analog: the PDF rasterizer + page-image pipeline
(src/scraper/base/scraper.py:312-338) — per-row binary decode with library
handles held in instance state.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sources.codec import decode_image, encode_image


def _resize_nearest(px: np.ndarray, target: tuple[int, int]) -> np.ndarray:
    """Deterministic nearest-neighbor resize (stand-in for PIL/Lanczos — the
    real kernel swaps in when an image library is available)."""
    th, tw = target
    h, w, _ = px.shape
    yi = (np.arange(th) * h // th).clip(0, h - 1)
    xi = (np.arange(tw) * w // tw).clip(0, w - 1)
    return px[yi[:, None], xi[None, :], :]


class ResizeActor:
    """Resize every payload to ``target`` (h, w); re-encode in the same format."""

    def __init__(self, target: tuple[int, int] = (64, 64)):
        self.target = tuple(target)

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        out_b, out_w, out_h = [], [], []
        for blob, fmt in zip(blobs, fmts):
            if blob is None:
                out_b.append(None)
                out_w.append(None)
                out_h.append(None)
                continue
            px = _resize_nearest(decode_image(blob, fmt), self.target)
            out_b.append(encode_image(px, fmt))
            out_h.append(px.shape[0])
            out_w.append(px.shape[1])
        cols = {n: batch[n] for n in batch.schema.names if n not in ("bytes", "w", "h")}
        cols["bytes"] = pa.array(out_b, pa.binary())
        cols["w"] = pa.array(out_w, pa.int32())
        cols["h"] = pa.array(out_h, pa.int32())
        return pa.table(cols)


class FrameSampleActor:
    """Video frame-sampling stub: the engine treats video as an opaque binary
    column; without a real demuxer in the container this stage only validates
    plumbing and raises for actual video payloads."""

    def __init__(self, every_n: int = 30):
        self.every_n = every_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        fmts = set(f for f in batch["fmt"].to_pylist() if f is not None)
        video = fmts & {"mp4", "webm", "mkv"}
        if video:
            raise NotImplementedError(
                f"video demuxing for {sorted(video)} requires pyav/ffmpeg — not in this "
                "container; plug a real demuxer into FrameSampleActor when available"
            )
        return batch


class FeatureActor:
    """Image feature extraction: mean/std RGB + 8-bin grayscale histogram
    (deterministic stand-in for a CNN embedding; the batched-model-inference
    plumbing — actor pool, batch sizing — is exactly what a real model uses)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        feats = np.zeros((batch.num_rows, 14), dtype=np.float32)
        for i, (blob, fmt) in enumerate(zip(blobs, fmts)):
            if blob is None:
                continue
            px = decode_image(blob, fmt).astype(np.float32)
            feats[i, :3] = px.mean(axis=(0, 1))
            feats[i, 3:6] = px.std(axis=(0, 1))
            gray = px.mean(axis=2)
            hist, _ = np.histogram(gray, bins=8, range=(0, 256))
            feats[i, 6:14] = hist / max(gray.size, 1)
        return batch.append_column(
            "image_features",
            pa.FixedSizeListArray.from_arrays(pa.array(feats.reshape(-1)), 14),
        )
