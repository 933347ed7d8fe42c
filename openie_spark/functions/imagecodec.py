"""Pure-stdlib image codecs: 24-bit uncompressed BMP and binary PPM (P6).

The container ships no image libraries (no PIL/opencv), but these two
formats are fully specified public formats decodable with nothing beyond
`struct` and numpy — so the multimodal decode path (multimodal.py) can be
REAL end-to-end for them instead of a stub: header parse, pixel decode,
nearest-neighbor resize, and histogram features all compute from actual
pixels.  Unknown formats still fall back to the clearly-marked stubs.

Formats (public specs):
  - PPM P6 (Netpbm): ``P6<ws>width<ws>height<ws>maxval<single-ws>`` then
    raw RGB rows top-down.  Comments (``#`` to EOL) allowed in the header.
  - BMP (Windows BITMAPINFOHEADER): 14-byte file header ('BM', size,
    pixel-data offset) + 40-byte DIB (width, height, planes, bpp,
    compression), 24 bpp BI_RGB only; rows bottom-up (top-down when
    height < 0), BGR byte order, stride padded to 4 bytes.

All functions work on/return raw top-down RGB byte buffers (h*w*3).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# PPM (P6)
# ---------------------------------------------------------------------------


def encode_ppm(width: int, height: int, rgb: bytes) -> bytes:
    if len(rgb) != width * height * 3:
        raise ValueError(f"encode_ppm: need {width * height * 3} bytes, got {len(rgb)}")
    return b"P6\n%d %d\n255\n" % (width, height) + rgb


def _ppm_header_tokens(data: bytes, n: int, start: int) -> tuple[list[int], int]:
    """Read n whitespace-separated ints, skipping '#' comments."""
    vals: list[int] = []
    i = start
    while len(vals) < n and i < len(data):
        c = data[i : i + 1]
        if c == b"#":
            while i < len(data) and data[i : i + 1] != b"\n":
                i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < len(data) and not data[j : j + 1].isspace():
                j += 1
            vals.append(int(data[i:j]))
            i = j
    return vals, i


def decode_ppm(data: bytes) -> tuple[int, int, bytes] | None:
    if data[:2] != b"P6":
        return None
    try:
        (w, h, maxval), i = _ppm_header_tokens(data, 3, 2)
    except ValueError:
        return None
    if maxval != 255 or w <= 0 or h <= 0:
        return None
    i += 1  # exactly one whitespace byte separates header and raster
    rgb = data[i : i + w * h * 3]
    if len(rgb) != w * h * 3:
        return None
    return w, h, bytes(rgb)


# ---------------------------------------------------------------------------
# BMP (24 bpp BI_RGB, BITMAPINFOHEADER)
# ---------------------------------------------------------------------------


def encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    if len(rgb) != width * height * 3:
        raise ValueError(f"encode_bmp: need {width * height * 3} bytes, got {len(rgb)}")
    stride = (3 * width + 3) & ~3
    img = np.frombuffer(rgb, np.uint8).reshape(height, width, 3)
    rows = np.zeros((height, stride), np.uint8)
    rows[:, : 3 * width] = img[::-1, :, ::-1].reshape(height, 3 * width)  # bottom-up BGR
    pixel_data = rows.tobytes()
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(pixel_data), 0, 0, off)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixel_data), 2835, 2835, 0, 0
    )
    return header + dib + pixel_data


def decode_bmp(data: bytes) -> tuple[int, int, bytes] | None:
    if data[:2] != b"BM" or len(data) < 54:
        return None
    (off,) = struct.unpack_from("<I", data, 10)
    dib_size, w, h = struct.unpack_from("<Iii", data, 14)
    if dib_size < 40:  # BITMAPCOREHEADER not supported
        return None
    planes, bpp, compression = struct.unpack_from("<HHI", data, 26)
    if planes != 1 or bpp != 24 or compression != 0 or w <= 0 or h == 0:
        return None
    top_down = h < 0
    h = abs(h)
    stride = (3 * w + 3) & ~3
    if len(data) < off + stride * h:
        return None
    rows = np.frombuffer(data, np.uint8, count=stride * h, offset=off).reshape(
        h, stride
    )
    img = rows[:, : 3 * w].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    if not top_down:
        img = img[::-1]
    return w, h, img.tobytes()


# ---------------------------------------------------------------------------
# sniff / resize / features
# ---------------------------------------------------------------------------


def decode_image(data: bytes) -> tuple[int, int, bytes] | None:
    """Sniff-and-decode: (width, height, top-down RGB) or None if the
    payload is not a supported format."""
    if data[:2] == b"P6":
        return decode_ppm(data)
    if data[:2] == b"BM":
        return decode_bmp(data)
    return None


def resize_nearest(
    width: int, height: int, rgb: bytes, max_side: int
) -> tuple[int, int, bytes]:
    """Aspect-preserving nearest-neighbor downscale (never upscales)."""
    scale = min(1.0, max_side / max(width, height))
    tw, th = max(1, int(width * scale)), max(1, int(height * scale))
    img = np.frombuffer(rgb, np.uint8).reshape(height, width, 3)
    ys = np.arange(th) * height // th
    xs = np.arange(tw) * width // tw
    return tw, th, img[ys][:, xs].tobytes()


def rgb_features(width: int, height: int, rgb: bytes, dim: int = 16) -> list[float]:
    """Deterministic real pixel features: [mean R, mean G, mean B,
    aspect w/(w+h), then a (dim-4)-bin normalized luminance histogram].
    Matches the shape/dtype contract of the stub feature vector."""
    img = np.frombuffer(rgb, np.uint8).reshape(-1, 3).astype(np.float64)
    means = img.mean(axis=0) / 255.0
    lum = img @ np.array([0.299, 0.587, 0.114])
    hist, _ = np.histogram(lum, bins=dim - 4, range=(0.0, 255.0))
    hist = hist / max(1, len(lum))
    out = [means[0], means[1], means[2], width / (width + height), *hist]
    return [float(round(float(x), 6)) for x in out]
