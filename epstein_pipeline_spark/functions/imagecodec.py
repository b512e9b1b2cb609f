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
- PNG, 8-bit depth, non-interlaced, color types 0/2/3/4/6 (grayscale,
  RGB, palette, gray+alpha, RGBA): DEFLATE is stdlib ``zlib``, so the
  only codec work is chunk walking, per-scanline unfiltering
  (None/Sub/Up/Average/Paeth), and channel normalization to RGB —
  the format the bulk of real web images that aren't JPEG arrive in.

``decode_image`` dispatches on magic bytes and raises
``UnsupportedImageError`` for anything else — the exact spot a real
codec (PIL, for JPEG's Huffman+DCT) plugs in with the same ndarray
contract.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


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
    if content[:8] == _PNG_MAGIC:
        return decode_png(content)
    raise UnsupportedImageError(
        "only 24-bit BMP, P6 PPM and 8-bit PNG decode without PIL/ffmpeg"
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


def decode_png(content: bytes) -> np.ndarray:
    """8-bit non-interlaced PNG -> (H, W, 3) uint8 RGB. Alpha channels
    are composited over white (the web-thumbnail convention); palette
    images are expanded through PLTE. Interlaced (Adam7) and 16-bit
    images raise — the PIL plug point covers them."""
    if content[:8] != _PNG_MAGIC:
        raise UnsupportedImageError("not a PNG file")
    pos = 8
    n = len(content)
    width = height = depth = ctype = interlace = None
    plte = None
    idat = bytearray()
    while pos + 8 <= n:
        (length,) = struct.unpack_from(">I", content, pos)
        tag = content[pos + 4 : pos + 8]
        data = content[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            width, height, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif tag == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        pos += 12 + length  # length + tag + crc
    if width is None:
        raise UnsupportedImageError("PNG missing IHDR")
    if depth != 8:
        raise UnsupportedImageError(f"only 8-bit PNG supported (depth={depth})")
    if interlace != 0:
        raise UnsupportedImageError("Adam7-interlaced PNG not supported")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if channels is None:
        raise UnsupportedImageError(f"unknown PNG color type {ctype}")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise UnsupportedImageError(f"corrupt PNG IDAT stream: {e}") from e
    stride = width * channels
    if len(raw) < height * (stride + 1):
        raise UnsupportedImageError("truncated PNG pixel data")
    lines = np.frombuffer(raw, dtype=np.uint8, count=height * (stride + 1)).reshape(
        height, stride + 1
    )
    filters, scan = lines[:, 0], lines[:, 1:]
    # unfilter: Up-only images vectorize (common for synthetic rows);
    # otherwise the per-scanline loop honors the sequential dependency
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    bpp = channels  # depth 8: filter unit == one pixel's channels
    for y in range(height):
        f = filters[y]
        row = scan[y].astype(np.int32)
        if f == 0:  # None
            cur = row
        elif f == 2:  # Up
            cur = row + prev
        else:
            cur = np.empty(stride, dtype=np.int32)
            pr = prev.astype(np.int32)
            for x in range(stride):
                a = cur[x - bpp] & 0xFF if x >= bpp else 0
                b = pr[x]
                c = pr[x - bpp] if x >= bpp else 0
                if f == 1:  # Sub
                    pred = a
                elif f == 3:  # Average
                    pred = (a + b) >> 1
                elif f == 4:  # Paeth
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                else:
                    raise UnsupportedImageError(f"bad PNG filter byte {f}")
                cur[x] = row[x] + pred
        prev = (cur & 0xFF).astype(np.uint8)
        out[y] = prev
    px = out.reshape(height, width, channels)
    if ctype == 2:
        return px.copy()
    if ctype == 0:
        return np.repeat(px, 3, axis=2)
    if ctype == 3:
        if plte is None:
            raise UnsupportedImageError("palette PNG missing PLTE")
        idx = px[:, :, 0]
        # malformed files may index past the PLTE table; the module
        # contract is UnsupportedImageError, never a bare IndexError
        if idx.size and int(idx.max()) >= len(plte):
            raise UnsupportedImageError(
                f"palette index {int(idx.max())} out of range "
                f"(PLTE has {len(plte)} entries)"
            )
        return plte[idx]
    # alpha types: composite over white
    rgb = px[:, :, :3] if ctype == 6 else np.repeat(px[:, :, :1], 3, axis=2)
    alpha = px[:, :, -1:].astype(np.float64) / 255.0
    return (rgb.astype(np.float64) * alpha + 255.0 * (1.0 - alpha)).round().astype(np.uint8)


def encode_png(rgb: np.ndarray, filter_type: int = 0) -> bytes:
    """(H, W, 3) uint8 RGB -> 8-bit RGB PNG bytes (test-fixture twin
    of ``decode_png``). ``filter_type`` applies one filter to every
    scanline so the unfilter paths are individually exercisable."""
    h, w, c = rgb.shape
    assert c == 3 and rgb.dtype == np.uint8 and filter_type in (0, 1, 2, 3, 4)
    img = rgb.astype(np.int32)
    raw = bytearray()
    prev = np.zeros((w, 3), dtype=np.int32)
    for y in range(h):
        row = img[y]
        if filter_type == 0:
            enc = row
        else:
            a = np.zeros((w, 3), dtype=np.int32)
            a[1:] = row[:-1]
            b = prev
            cdiag = np.zeros((w, 3), dtype=np.int32)
            cdiag[1:] = prev[:-1]
            if filter_type == 1:
                pred = a
            elif filter_type == 2:
                pred = b
            elif filter_type == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - cdiag
                pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - cdiag)
                pred = np.where(
                    (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, cdiag)
                )
            enc = row - pred
        raw.append(filter_type)
        raw += (enc & 0xFF).astype(np.uint8).tobytes()
        prev = row

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
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
