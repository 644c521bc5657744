"""Minimal deterministic image codecs + fidelity metrics.

The BASELINE.json input_hint requires an image+caption corpus with a
``bytes:binary`` payload column and a per-row invariant of decoded-pixel
allclose (PSNR ≥ 40 dB for lossy formats).  PIL / imageio are NOT installed in
this container, so per the task instructions the *codec internals* are
self-contained deterministic implementations while all the Ray-side plumbing
(binary Arrow columns, actor-pool decode stages, batch sizing) is real:

- ``png``  — a real, spec-conformant minimal PNG writer/reader (8-bit RGB,
  filter type 0, zlib/DEFLATE).  Lossless: decode == source pixels exactly.
- ``jpeg`` — a STAND-IN lossy codec (documented stub for libjpeg): pixels are
  quantized to step Q=4 and DEFLATE-compressed under a ``FJPG`` magic header.
  Quantization noise has MSE ≈ Q²/12 ≈ 1.33 → PSNR ≈ 48.8 dB, so the
  PSNR ≥ 40 dB invariant is exercised with real math on real decoded pixels.

Reference analog: the PDF → page-image rasterizer and OCR path
(src/scraper/base/scraper.py:312-379) is the reference's binary-payload decode
stage; here the decode stage validates pixels and extracts the caption.
"""

from __future__ import annotations

import struct
import zlib
from functools import lru_cache

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"
FJPG_MAGIC = b"FJPG"
JPEG_QUANT_STEP = 4


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """8-bit RGB (h, w, 3) → PNG bytes (color type 2, filter 0 per scanline)."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.empty((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 0] = 0  # filter type 0 (None)
    raw[:, 1:] = pixels.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), 6)
    return PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → (h, w, 3) uint8.  Supports filters 0–2 (all this codec emits
    is 0; 1/2 kept for robustness)."""
    assert data[:8] == PNG_SIG, "not a PNG"
    pos, w = 8, None
    idat_parts: list = []  # kept as buffer views (zero-copy for the 1-chunk case)
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", payload[:10])
            assert depth == 8 and ctype == 2, "codec only handles 8-bit RGB"
        elif tag == b"IDAT":
            idat_parts.append(payload)
        elif tag == b"IEND":
            break
        pos += 12 + length
    idat = idat_parts[0] if len(idat_parts) == 1 else b"".join(bytes(p) for p in idat_parts)
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8).reshape(h, 1 + w * 3)
    filters = raw[:, 0]
    out = raw[:, 1:].copy()
    if (filters == 0).all():
        return out.reshape(h, w, 3)
    for y in range(h):  # cold path; never taken for self-encoded images
        f = filters[y]
        if f == 0:
            continue
        row = out[y].astype(np.int32)
        if f == 2 and y > 0:
            row += out[y - 1]
        elif f == 1:
            for x in range(3, len(row)):
                row[x] += row[x - 3]
        out[y] = (row % 256).astype(np.uint8)
    return out.reshape(h, w, 3)


def encode_fake_jpeg(pixels: np.ndarray, step: int = JPEG_QUANT_STEP) -> bytes:
    """Deterministic lossy stand-in for JPEG (see module docstring)."""
    h, w, c = pixels.shape
    q = (pixels.astype(np.int32) // step * step + step // 2).clip(0, 255).astype(np.uint8)
    header = FJPG_MAGIC + struct.pack(">IIB", w, h, step)
    return header + zlib.compress(q.tobytes(), 6)


def decode_fake_jpeg(data: bytes) -> np.ndarray:
    assert data[:4] == FJPG_MAGIC, "not an FJPG payload"
    w, h, _step = struct.unpack(">IIB", data[4:13])
    return np.frombuffer(zlib.decompress(data[13:]), dtype=np.uint8).reshape(h, w, 3)


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "png":
        return decode_png(data)
    if fmt == "jpeg":
        return decode_fake_jpeg(data)
    raise NotImplementedError(
        f"format {fmt!r}: real decoders (libjpeg/libwebp) are not available in this "
        "container — extend decode_image when they are"
    )


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return encode_png(pixels)
    if fmt == "jpeg":
        return encode_fake_jpeg(pixels)
    raise NotImplementedError(f"format {fmt!r}")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images (inf if equal)."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


def phash64(pixels: np.ndarray, gray3: np.ndarray | None = None) -> int:
    """Deterministic 64-bit perceptual-style hash: grayscale → 8×8 mean-pool →
    above-mean bitmap → int64 (two's complement).  Identical pixels ⇒ identical
    phash, so planted duplicate images share phash (FIXTURES.md F1).

    All intermediate math is INTEGER (``gray3`` = per-pixel channel sum,
    ≤ 765): a float64 gray plane would be 8 bytes/px × several temporaries,
    which blows the per-core cache and saturates DRAM bandwidth when ~30
    decode tasks run concurrently (measured 10×+ per-row CPU inflation).  The
    pooled cell means divide by 3×area at the end, so the bit pattern is
    identical whether the gray plane is the channel mean or the channel sum.

    ``gray3`` lets callers that already computed the int32 channel sum skip
    recomputing it (must equal ``pixels.sum(axis=2, dtype=int32)``)."""
    if gray3 is None:
        gray3 = pixels.sum(axis=2, dtype=np.int32)
    h, w = gray3.shape
    ys, xs, areas3 = _pool_geometry(h, w)
    # block sums via two reduceats (fully vectorized 8×8 mean-pool); the row
    # pass stays int32 (≤ 765×h), the tiny 8×w intermediate goes int64 so the
    # column pass cannot overflow on huge images
    row_sums = np.add.reduceat(gray3, ys, axis=0).astype(np.int64)
    cells = np.add.reduceat(row_sums, xs, axis=1)
    cells = cells / areas3
    if cells.shape != (8, 8):  # tiny images: pad by repeating edge cells
        cells = np.pad(
            cells, ((0, 8 - cells.shape[0]), (0, 8 - cells.shape[1])), mode="edge"
        )
    bits = (cells > cells.mean()).flatten()
    v = int(np.packbits(bits.astype(np.uint8)).view(">u8")[0])
    return v - (1 << 64) if v >= (1 << 63) else v


@lru_cache(maxsize=8192)
def _pool_geometry(h: int, w: int):
    """Cached 8×8 mean-pool geometry for an (h, w) image: the linspace/unique
    per call was ~120 µs/row — more than the pooling itself — and image
    dimensions repeat heavily across a corpus."""
    ys = np.unique(np.linspace(0, h, 9).astype(int)[:8])
    xs = np.unique(np.linspace(0, w, 9).astype(int)[:8])
    ye = np.append(ys[1:], h)
    xe = np.append(xs[1:], w)
    areas3 = 3.0 * ((ye - ys)[:, None] * (xe - xs)[None, :])
    return ys, xs, areas3
