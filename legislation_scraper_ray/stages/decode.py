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

# 256-entry LUT for exact per-channel sum-of-squares (uint16: 255² = 65025)
_SQ_LUT = np.arange(256, dtype=np.uint16) ** 2


def _binary_views(col: pa.ChunkedArray | pa.Array) -> list:
    """Per-row zero-copy memoryviews over an Arrow binary column's data
    buffers (None for null rows).  ``to_pylist()`` materializes a Python
    ``bytes`` copy of every blob (~15 KB/row here), which alone is a large
    share of the decode stage's memory traffic; zlib/struct/np.frombuffer all
    accept memoryviews directly."""
    views: list = []
    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    for ch in chunks:
        n = len(ch)
        if n == 0:
            continue
        dt = np.int64 if pa.types.is_large_binary(ch.type) else np.int32
        bufs = ch.buffers()
        offs = np.frombuffer(
            bufs[1], dtype=dt, count=n + 1, offset=ch.offset * np.dtype(dt).itemsize
        )
        # cast to unsigned: pa.Buffer exposes format 'b' (signed), under which
        # memoryview == bytes comparisons mis-compare any byte ≥ 0x80
        mv = memoryview(bufs[2]).cast("B") if bufs[2] is not None else None
        if ch.null_count == 0:
            views.extend(mv[offs[i] : offs[i + 1]] for i in range(n))
        else:
            import pyarrow.compute as pc

            valid = pc.is_valid(ch).to_numpy(zero_copy_only=False)
            views.extend(
                mv[offs[i] : offs[i + 1]] if valid[i] else None for i in range(n)
            )
    return views


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
        blobs = _binary_views(batch["bytes"])
        cols = decode_compute(
            blobs,
            batch["fmt"].to_pylist(),
            # to_pylist (exact Python ints), NOT to_numpy: null-bearing
            # uint64/int64 columns convert to float64 in numpy, silently
            # corrupting values > 2^53
            batch["dec_sum"].to_pylist(),
            batch["phash"].to_pylist(),
            batch["psnr_db"].to_pylist(),
            batch["caption"].to_pylist(),
            self.ocr_threshold,
        )
        self.decoded += int(cols.pop("_n_decoded"))
        for name, arr in cols.items():
            batch = batch.append_column(name, arr)
        return batch


def decode_compute(
    blobs: list,
    fmts: list,
    want_sum: list,
    want_phash: list,
    psnr_db: list,
    captions: list,
    ocr_threshold: int = 0,
) -> dict[str, pa.Array]:
    """Decode + verify + feature-extract over per-row blob views (None =
    no payload → null decode columns).  Returns the four decode output
    columns plus a ``_n_decoded`` counter.

    All image math is integer and chunk-segmented.  Two measured failure
    modes shaped this:
      1. float64 per-row temporaries (astype + mean + f*f) moved ~900 KB/row;
         with ~30 decode tasks in flight the DRAM bus saturates — 10–15×
         per-row CPU inflation vs single-thread.
      2. per-row numpy reductions with dtype upcast cost ~86 µs/call in
         dispatch overhead (4 calls/row dominated the profile).
    So: decode rows into a small flat uint8 buffer (~128k pixels, stays
    cache-resident) and run ONE segmented reduceat per reduction across the
    whole chunk — integer dtypes, amortized dispatch."""
    n = len(blobs)
    ok = np.zeros(n, dtype=bool)
    rephash = np.zeros(n, dtype=np.int64)
    ocr_used = np.zeros(n, dtype=bool)
    # image feature vector: mean RGB (3) + std RGB (3) + 16-bin gray
    # histogram — the deterministic stand-in for a CNN embedding
    feat = np.zeros((n, 22), dtype=np.float32)
    has_payload = np.zeros(n, dtype=bool)
    idxs = [i for i in range(n) if blobs[i] is not None]
    pos = 0
    while pos < len(idxs):
        chunk, px_list, sizes, tot = [], [], [], 0
        while pos < len(idxs) and (not chunk or tot < 131_072):
            i = idxs[pos]
            px = decode_image(blobs[i], fmts[i])
            chunk.append(i)
            px_list.append(px)
            sizes.append(px.shape[0] * px.shape[1])
            tot += sizes[-1]
            pos += 1
        k = len(chunk)
        flat = np.concatenate([p.reshape(-1, 3) for p in px_list], axis=0)
        npix = np.asarray(sizes, dtype=np.int64)
        offs = np.concatenate([[0], np.cumsum(npix[:-1])]).astype(np.intp)
        s1 = np.add.reduceat(flat, offs, axis=0, dtype=np.int64)  # (k, 3)
        s2 = np.add.reduceat(_SQ_LUT[flat], offs, axis=0, dtype=np.int64)
        # per-pixel channel sum (≤765): shared by phash + gray histogram
        gray3 = flat.sum(axis=1, dtype=np.int32)
        mean = s1 / npix[:, None]
        rows = np.asarray(chunk)
        feat[rows, :3] = mean
        feat[rows, 3:6] = np.sqrt(np.maximum(s2 / npix[:, None] - mean * mean, 0.0))
        # bucket b = floor(gray_mean/16) = floor(gray3/48): the old float
        # form rounded gray3/3 to nearest then scaled by the exact
        # power-of-two 1/16, which never crosses a bucket boundary, so
        # integer //48 yields identical buckets (and identical features).
        # One combined bincount: bucket + 16×segment-id.
        seg = np.repeat(np.arange(k, dtype=np.int32) * 16, npix)
        code = np.minimum(gray3 // 48, 15) + seg
        feat[rows, 6:] = (
            np.bincount(code, minlength=16 * k).reshape(k, 16) / npix[:, None]
        )
        s1_tot = s1.sum(axis=1)
        for j in range(k):
            i = chunk[j]
            h_px, w_px, _ = px_list[j].shape
            ph = phash64(
                px_list[j], gray3=gray3[offs[j] : offs[j] + sizes[j]].reshape(h_px, w_px)
            )
            rephash[i] = ph
            ok[i] = (
                int(s1_tot[j]) == int(want_sum[i])  # exact integer sums
                and ph == int(want_phash[i])
                and (fmts[i] == "png" or psnr_db[i] >= 40.0)
            )
            if captions[i] is not None and len(captions[i]) <= ocr_threshold:
                ocr_used[i] = True  # deterministic stand-in for the OCR branch
    has_payload[idxs] = True
    return {
        "decode_ok": _masked(ok, has_payload),
        "phash_decoded": _masked(rephash, has_payload),
        "ocr_used": _masked(ocr_used, has_payload),
        "feat_mean_rgb": pa.FixedSizeListArray.from_arrays(
            pa.array(feat.reshape(-1)), 22
        ),
        "_n_decoded": int(has_payload.sum()),
    }


class ChunkedBlobs:
    """Random-access zero-copy blob views over a (possibly chunked) Arrow
    binary column — built ONCE per actor over the plasma-resident corpus so a
    fetch-fused decode can read payload bytes without ever copying them into
    an output block (the copy chain block-write → plasma → block-read was the
    dominant share of crawl memory traffic)."""

    def __init__(self, col: pa.ChunkedArray | pa.Array):
        chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
        self._offs, self._mvs, starts = [], [], [0]
        for ch in chunks:
            dt = np.int64 if pa.types.is_large_binary(ch.type) else np.int32
            bufs = ch.buffers()
            self._offs.append(
                np.frombuffer(
                    bufs[1], dtype=dt, count=len(ch) + 1,
                    offset=ch.offset * np.dtype(dt).itemsize,
                )
            )
            self._mvs.append(
                memoryview(bufs[2]).cast("B") if bufs[2] is not None else None
            )
            starts.append(starts[-1] + len(ch))
        self._starts = np.asarray(starts[:-1], dtype=np.int64)

    def get(self, i: int):
        c = int(np.searchsorted(self._starts, i, side="right")) - 1
        local = i - int(self._starts[c])
        offs = self._offs[c]
        return self._mvs[c][offs[local] : offs[local + 1]]


def _masked(values: np.ndarray, valid: np.ndarray) -> pa.Array:
    return pa.array(values, mask=~valid)
