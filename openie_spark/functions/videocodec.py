"""Pure-stdlib YUV4MPEG2 (.y4m) video codec + deterministic frame features.

Same discipline as functions/{image,audio}codec.py: YUV4MPEG2 is the
public uncompressed video interchange format (mjpegtools / ffmpeg
standard) — an ASCII stream header ``YUV4MPEG2 W<w> H<h> F<num>:<den>
...`` followed by ``FRAME``-delimited raw YCbCr planes — so a real video
container can be parsed, frame-seeked and feature-extracted with zero
codec dependencies.  Only the C444 (no chroma subsampling) layout is
emitted and accepted; anything else returns None and the caller falls
back to its labeled stub, exactly like decode_image / decode_wav on an
unsupported payload.

Determinism contract: encode/decode round-trip bit-exactly;
``y_features`` computes from exact uint8 luma values in float64 before
the final float32-bound rounding, and the single-process oracle twin
(fixtures/gen_media_twin.py) replays the identical kernels.
"""

from __future__ import annotations

import numpy as np

_MAGIC = b"YUV4MPEG2"


def encode_y4m(
    width: int, height: int, fps_num: int, fps_den: int, frames: list[bytes]
) -> bytes:
    """frames: per-frame C444 planar payloads (Y plane then Cb then Cr,
    each width*height bytes) → a YUV4MPEG2 stream."""
    plane = width * height
    header = f"YUV4MPEG2 W{width} H{height} F{fps_num}:{fps_den} Ip A1:1 C444\n"
    out = [header.encode("ascii")]
    for f in frames:
        if len(f) != 3 * plane:
            raise ValueError(f"frame must be 3*{plane} bytes (C444 planar)")
        out.append(b"FRAME\n")
        out.append(f)
    return b"".join(out)


def decode_y4m(
    data: bytes,
) -> tuple[int, int, int, int, list[bytes]] | None:
    """bytes → (width, height, fps_num, fps_den, frames) or None when the
    payload is not a C444 YUV4MPEG2 stream."""
    if not data.startswith(_MAGIC + b" "):
        return None
    nl = data.find(b"\n")
    if nl < 0:
        return None
    width = height = fps_num = fps_den = None
    colorspace = "C420jpeg"  # the format's default when no C tag is present
    try:
        for tag in data[len(_MAGIC) + 1 : nl].decode("ascii").split(" "):
            if not tag:
                continue
            if tag[0] == "W":
                width = int(tag[1:])
            elif tag[0] == "H":
                height = int(tag[1:])
            elif tag[0] == "F":
                num, den = tag[1:].split(":")
                fps_num, fps_den = int(num), int(den)
            elif tag[0] == "C":
                colorspace = tag
    except (ValueError, UnicodeDecodeError):
        return None
    if not width or not height or not fps_num or not fps_den:
        return None
    if colorspace != "C444":
        return None  # subsampled layouts: caller falls back to the stub
    plane = width * height
    frames: list[bytes] = []
    pos = nl + 1
    while pos < len(data):
        fnl = data.find(b"\n", pos)
        if fnl < 0 or data[pos : pos + 5] != b"FRAME":
            return None
        pos = fnl + 1
        frame = data[pos : pos + 3 * plane]
        if len(frame) < 3 * plane:
            return None  # truncated frame
        frames.append(frame)
        pos += 3 * plane
    if not frames:
        return None
    return width, height, fps_num, fps_den, frames


def y4m_duration_ms(fps_num: int, fps_den: int, n_frames: int) -> int:
    """Exact integer duration: frames * 1000 * den // num."""
    return n_frames * 1000 * fps_den // fps_num


def frame_at_ms(fps_num: int, fps_den: int, n_frames: int, ts_ms: int) -> int:
    """Index of the frame on screen at ``ts_ms`` (clamped to the stream)."""
    return min(n_frames - 1, ts_ms * fps_num // (1000 * fps_den))


def y_features(width: int, height: int, frame: bytes, dim: int = 16) -> list[float]:
    """Deterministic real per-frame features from the luma plane:
    [mean Y, aspect w/(w+h), then a (dim-2)-bin normalized luminance
    histogram] — the video analogue of rgb_features, same shape/dtype
    contract as the stub vector."""
    y = np.frombuffer(frame[: width * height], np.uint8).astype(np.float64)
    hist, _ = np.histogram(y, bins=dim - 2, range=(0.0, 255.0))
    out = [y.mean() / 255.0, width / (width + height), *(hist / max(1, len(y)))]
    return [float(round(float(x), 6)) for x in out]
