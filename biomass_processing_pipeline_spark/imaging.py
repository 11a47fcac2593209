"""Deterministic image codecs + perceptual hash (no PIL in this sandbox).

The reference decodes GeoTIFF blob bytes to numpy arrays
(``/root/reference/src/core/blob_manager_v3.py:351-374``; hand-rolled TIFF
header parse ``:1211-1299``). This container has no imaging libraries, so
per the driver contract the *codec* is a clearly-specified deterministic
stand-in while the Spark-side plumbing (binary column, Arrow-batched decode
inside pandas UDFs, schema, batch shape) is real:

- ``raw``  : magic ``RW01`` + (h, w, c) uint16 header + C-order uint8 pixels
- ``png``  : magic ``PZ01`` + header + zlib(pixels)      (lossless)
- ``jpeg`` : magic ``JQ01`` + header + quant step q + zlib(pixels // q)
             (lossy; uniform quantization with q=4 gives PSNR ~47 dB > 40 dB,
             matching the input_hint's PSNR>=40 dB invariant for lossy fmts)

If PIL becomes available, ``_HAVE_PIL`` flips and real PNG/JPEG codecs can
be slotted in behind the same ``encode_image``/``decode_image`` API.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

try:  # pragma: no cover - not present in this sandbox
    import PIL  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False

_HDR = struct.Struct("<4sHHH")
JPEG_Q = 4


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    """Encode an (h, w, c) uint8 array. fmt in {raw, png, jpeg}."""
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, c = pixels.shape
    body = np.ascontiguousarray(pixels, dtype=np.uint8).tobytes()
    if fmt == "raw":
        return _HDR.pack(b"RW01", h, w, c) + body
    if fmt == "png":
        return _HDR.pack(b"PZ01", h, w, c) + zlib.compress(body, 6)
    if fmt == "jpeg":
        q = (np.ascontiguousarray(pixels, dtype=np.uint8) // JPEG_Q).tobytes()
        return _HDR.pack(b"JQ01", h, w, c) + bytes([JPEG_Q]) + zlib.compress(q, 6)
    raise ValueError(f"unknown fmt {fmt!r}")


def decode_image(blob: bytes) -> np.ndarray:
    """Decode bytes -> (h, w, c) uint8 array. Raises on corrupt magic."""
    magic, h, w, c = _HDR.unpack_from(blob, 0)
    off = _HDR.size
    if magic == b"RW01":
        buf = np.frombuffer(blob, dtype=np.uint8, count=h * w * c, offset=off)
    elif magic == b"PZ01":
        buf = np.frombuffer(zlib.decompress(blob[off:]), dtype=np.uint8)
    elif magic == b"JQ01":
        q = blob[off]
        quantized = np.frombuffer(zlib.decompress(blob[off + 1 :]), dtype=np.uint8)
        # dequantize to bin centers, clipped to uint8 range
        buf = np.minimum(quantized.astype(np.int32) * q + q // 2, 255).astype(np.uint8)
    else:
        raise ValueError(f"bad image magic {magic!r}")
    return buf.reshape(h, w, c)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 arrays."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0 * 255.0 / mse))


def phash64(pixels: np.ndarray) -> int:
    """64-bit average-hash: gray -> 8x8 block means -> threshold at mean.

    Pure function of the decoded pixels; serves as the decode-integrity
    oracle (FIXTURES.md §1). Returned as signed int64 (Spark LongType).
    """
    if pixels.ndim == 3:
        gray = pixels.mean(axis=2)
    else:
        gray = pixels.astype(np.float64)
    h, w = gray.shape
    # block-mean downsample to 8x8 (h, w are multiples of 8 in fixtures;
    # trailing remainder pixels are cropped otherwise)
    bh, bw = h // 8, w // 8
    g = gray[: bh * 8, : bw * 8].reshape(8, bh, 8, bw).mean(axis=(1, 3))
    bits = (g > g.mean()).ravel()
    out = 0
    for i, b in enumerate(bits):
        if b:
            out |= 1 << i
    # reinterpret as signed 64-bit for LongType
    return out - (1 << 64) if out >= (1 << 63) else out
