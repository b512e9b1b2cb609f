"""Dependency-free image codec for the multimodal decode path.

The container has no PIL/ffmpeg, so the general codec stays a
documented plug point (``operators/multimodal.py``) — but two trivial
uncompressed formats are decodable with nothing beyond numpy, which
lets the decode -> feature / decode -> resize pipelines run against
REAL pixel bytes instead of a hash-seeded fake:

- BMP, 24-bit uncompressed (BITMAPINFOHEADER, BI_RGB): the format the
  reference's scanned-page fixtures could trivially be converted to;
  handles 4-byte row padding and both bottom-up (height > 0) and
  top-down (height < 0) row orders.
- PPM (P6, maxval 255): the classic interchange format.

``decode_image`` dispatches on magic bytes and raises
``UnsupportedImageError`` for anything else — the exact spot a real
codec (PIL) plugs in with the same ndarray contract.
"""

from __future__ import annotations

import struct

import numpy as np


class UnsupportedImageError(NotImplementedError):
    """Raised for formats the dependency-free codec cannot decode —
    plug a real codec (PIL/ffmpeg) in at ``decode_image``."""


def decode_image(content: bytes) -> np.ndarray:
    """bytes -> (H, W, 3) uint8 RGB array. BMP/PPM only (see module
    docstring); anything else raises UnsupportedImageError."""
    if content[:2] == b"BM":
        return decode_bmp(content)
    if content[:2] == b"P6":
        return decode_ppm(content)
    raise UnsupportedImageError(
        "only uncompressed 24-bit BMP and P6 PPM decode without PIL/ffmpeg"
    )


def decode_bmp(content: bytes) -> np.ndarray:
    if content[:2] != b"BM" or len(content) < 54:
        raise UnsupportedImageError("not a BMP file")
    (data_off,) = struct.unpack_from("<I", content, 10)
    (hdr_size, width, height, _planes, bpp, compression) = struct.unpack_from(
        "<IiihHI", content, 14
    )
    if hdr_size < 40 or bpp != 24 or compression != 0:
        raise UnsupportedImageError(
            f"only 24-bit BI_RGB BMP supported (bpp={bpp}, compression={compression})"
        )
    bottom_up = height > 0
    height = abs(height)
    stride = (width * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    need = data_off + stride * height
    if len(content) < need:
        raise UnsupportedImageError("truncated BMP pixel data")
    rows = np.frombuffer(content, dtype=np.uint8, count=stride * height, offset=data_off)
    px = rows.reshape(height, stride)[:, : width * 3].reshape(height, width, 3)
    if bottom_up:
        px = px[::-1]
    return px[:, :, ::-1].copy()  # BGR -> RGB


def encode_bmp(rgb: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> 24-bit bottom-up BI_RGB BMP bytes
    (the test-fixture twin of ``decode_bmp``)."""
    h, w, c = rgb.shape
    assert c == 3 and rgb.dtype == np.uint8
    stride = (w * 3 + 3) & ~3
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, : w * 3] = rgb[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    data = body.tobytes()
    off = 14 + 40
    header = b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
    dib = struct.pack("<IiihHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return header + dib + data


def decode_ppm(content: bytes) -> np.ndarray:
    if content[:2] != b"P6":
        raise UnsupportedImageError("not a P6 PPM file")
    # header = magic, width, height, maxval as whitespace-separated
    # tokens ('#' comments run to end of line), then ONE whitespace
    # byte, then raw RGB
    tokens: list[int] = []
    i = 2
    n = len(content)
    while len(tokens) < 3 and i < n:
        ch = content[i : i + 1]
        if ch == b"#":
            while i < n and content[i : i + 1] != b"\n":
                i += 1
        elif ch.isspace():
            i += 1
        else:
            j = i
            while j < n and not content[j : j + 1].isspace():
                j += 1
            tokens.append(int(content[i:j]))
            i = j
    if len(tokens) < 3:
        raise UnsupportedImageError("truncated PPM header")
    w, h, maxval = tokens
    if maxval != 255:
        raise UnsupportedImageError("only maxval=255 PPM supported")
    i += 1  # the single whitespace after maxval
    if n < i + w * h * 3:
        raise UnsupportedImageError("truncated PPM pixel data")
    return (
        np.frombuffer(content, dtype=np.uint8, count=w * h * 3, offset=i)
        .reshape(h, w, 3)
        .copy()
    )


def image_feature(rgb: np.ndarray, dim: int) -> np.ndarray:
    """Real pixel feature: per-channel means + a 4x4 average-pool
    luminance grid, tiled/truncated to ``dim`` and unit-normed — the
    same output contract as the stub feature, computed from decoded
    pixels (deterministic, resolution-invariant for solid colors)."""
    px = rgb.astype(np.float64) / 255.0
    means = px.mean(axis=(0, 1))  # (3,)
    lum = px @ np.array([0.299, 0.587, 0.114])
    h, w = lum.shape
    ys = (np.arange(4 + 1) * h) // 4
    xs = (np.arange(4 + 1) * w) // 4
    grid = np.array(
        [
            lum[ys[r] : max(ys[r + 1], ys[r] + 1), xs[c] : max(xs[c + 1], xs[c] + 1)].mean()
            for r in range(4)
            for c in range(4)
        ]
    )
    base = np.concatenate([means, grid])  # 19 dims
    reps = dim // len(base) + 1
    v = np.tile(base, reps)[:dim].astype(np.float32)
    nrm = float(np.linalg.norm(v))
    return v / nrm if nrm > 0 else v


def resize_nearest(rgb: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize, the PIL-free resample kernel."""
    h, w, _ = rgb.shape
    ys = (np.arange(height) * h) // height
    xs = (np.arange(width) * w) // width
    return rgb[ys][:, xs]
