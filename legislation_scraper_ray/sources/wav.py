"""Minimal RIFF/WAVE PCM16 codec, pure numpy.

The container ships no audio libraries, so per the task instructions the
codec is the deterministic in-repo implementation — but unlike the image
codec's synthetic format, WAV is simple enough to implement faithfully from
the public RIFF spec, so the binary payloads flowing through the engine are
REAL .wav files any external tool could read.  Anything beyond PCM16 (float
PCM, ADPCM, compressed codecs) raises ``NotImplementedError``; a real decoder
(soundfile/pyav) slots in behind the same two functions.

Reference analog: the binary-download → converter layer
(/root/reference/src/scraper/base/scraper.py:312-338) applied to an audio
payload column instead of PDF page images.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """``samples``: (n,) or (n, ch) — float in [-1, 1] or int16 — → WAV bytes."""
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.dtype != np.int16:
        samples = np.clip(np.round(samples * 32767.0), -32768, 32767).astype(np.int16)
    ch = samples.shape[1]
    data = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    fmt = b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, ch, sample_rate, sample_rate * ch * 2, ch * 2, 16
    )
    return hdr + fmt + b"data" + struct.pack("<I", len(data)) + data


def decode_wav(blob: bytes | memoryview) -> tuple[np.ndarray, int]:
    """WAV bytes → ((n, ch) int16 samples, sample_rate).

    Walks RIFF chunks (tolerates extra chunks like LIST/fact); only
    format-tag 1 (integer PCM) at 16 bits is supported — anything else is a
    clearly-marked decoder gap, not silently wrong audio."""
    blob = memoryview(blob)
    if bytes(blob[:4]) != b"RIFF" or bytes(blob[8:12]) != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, sr, ch, data = 12, None, None, None
    while pos + 8 <= len(blob):
        cid = bytes(blob[pos : pos + 4])
        size = struct.unpack("<I", blob[pos + 4 : pos + 8])[0]
        body = blob[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt_tag, ch, sr, _brate, _balign, bits = struct.unpack("<HHIIHH", body[:16])
            if fmt_tag != 1 or bits != 16:
                raise NotImplementedError(
                    f"WAV fmt_tag={fmt_tag} bits={bits}: only PCM16 is implemented "
                    "in-container; plug soundfile/pyav here for other encodings"
                )
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if sr is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    n = len(data) // (2 * ch)
    samples = np.frombuffer(data[: n * 2 * ch], dtype="<i2").reshape(n, ch)
    return samples, sr
