"""Audio payload stages: decode + windowed feature extraction.

Audio flows through the engine exactly like images: an opaque ``bytes``
column with typed metadata, processed by actor-pool ``map_batches`` stages
(config/state in ``__init__``, per-batch work in ``__call__``).  The decode
is the in-repo WAV PCM16 codec (sources/wav.py) — real RIFF bytes, not a
fake — and the features are the deterministic stand-ins for a batched audio
model (the plumbing — actor pool, batch sizing, fixed-size-list output — is
exactly what a real model stage uses).

Per-row temporaries follow the decode-stage law (CLAUDE.md): int16 sample
views, int64 ``reduceat`` accumulation, no full-clip float64 intermediates.

Reference analog: the converter layer of
/root/reference/src/scraper/base/scraper.py:312-338 (binary download →
per-row library decode with handles held in instance state), applied to an
audio column.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sources.wav import decode_wav

_FEAT_NAMES = ("duration_ms", "rms", "zcr", "peak")


class AudioFeatureActor:
    """Per-clip duration / RMS / zero-crossing rate / peak over WAV payloads.

    RMS accumulates ``int16² → int64`` (exact — a clip would need >2^31
    samples to overflow) and normalizes by full scale once per clip; ZCR
    counts sign changes on the int16 view directly.  Channels are averaged
    AFTER per-channel reduction, so no mono-mix buffer is materialized."""

    def __init__(self, bytes_col: str = "bytes"):
        self.bytes_col = bytes_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch[self.bytes_col]
        if isinstance(blobs, pa.ChunkedArray):
            blobs = blobs.combine_chunks()
        feats = np.full((batch.num_rows, len(_FEAT_NAMES)), np.nan, dtype=np.float64)
        for i in range(batch.num_rows):
            if not blobs[i].is_valid:
                continue
            samples, sr = decode_wav(blobs[i].as_buffer())
            n = samples.shape[0]
            if n == 0:
                feats[i] = (0.0, 0.0, 0.0, 0.0)
                continue
            s64 = samples.astype(np.int64)
            sq = np.einsum("ij,ij->j", s64, s64)  # per-channel Σx², int64
            rms = float(np.mean(np.sqrt(sq / n)) / 32767.0)
            signs = samples < 0
            zc = np.count_nonzero(signs[1:] != signs[:-1], axis=0)
            zcr = float(np.mean(zc) / max(n - 1, 1))
            peak = float(np.max(np.abs(s64)) / 32767.0)
            feats[i] = (n * 1000.0 / sr, rms, zcr, peak)
        out = batch
        for j, name in enumerate(_FEAT_NAMES):
            out = out.append_column(name, pa.array(feats[:, j], pa.float64()))
        return out


class AudioResampleActor:
    """Nearest-neighbor resample to ``target_rate`` (stand-in for a polyphase
    resampler — swaps out when an audio library is available); re-encodes
    PCM16 WAV in place, preserving channel count."""

    def __init__(self, target_rate: int = 8000, bytes_col: str = "bytes"):
        self.target_rate = int(target_rate)
        self.bytes_col = bytes_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..sources.wav import encode_wav

        blobs = batch[self.bytes_col]
        if isinstance(blobs, pa.ChunkedArray):
            blobs = blobs.combine_chunks()
        out_blobs: list[bytes | None] = []
        for i in range(batch.num_rows):
            if not blobs[i].is_valid:
                out_blobs.append(None)
                continue
            samples, sr = decode_wav(blobs[i].as_buffer())
            n_out = max(int(round(samples.shape[0] * self.target_rate / sr)), 1)
            idx = (np.arange(n_out) * sr // self.target_rate).clip(0, samples.shape[0] - 1)
            out_blobs.append(encode_wav(samples[idx], self.target_rate))
        cols = {n: batch[n] for n in batch.schema.names if n != self.bytes_col}
        cols[self.bytes_col] = pa.array(out_blobs, pa.binary())
        return pa.table(cols)
