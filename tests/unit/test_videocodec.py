"""y4m codec (functions/videocodec.py): round-trip bit-exactness, header
tag parsing, unsupported-layout refusal, frame seek, feature determinism."""

from __future__ import annotations

import numpy as np

from openie_spark.functions.videocodec import (
    decode_y4m,
    encode_y4m,
    frame_at_ms,
    y4m_duration_ms,
    y_features,
)


def _frames(w, h, n, seed=3):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, 3 * w * h, dtype=np.uint8).tobytes() for _ in range(n)]


def test_round_trip():
    frames = _frames(12, 9, 5)
    w, h, num, den, got = decode_y4m(encode_y4m(12, 9, 4, 1, frames))
    assert (w, h, num, den) == (12, 9, 4, 1)
    assert got == frames
    assert y4m_duration_ms(num, den, len(got)) == 5 * 1000 // 4


def test_refusals():
    assert decode_y4m(b"") is None
    assert decode_y4m(b"not a stream") is None
    # subsampled colorspace refused (caller falls back to the stub)
    buf = encode_y4m(4, 4, 2, 1, _frames(4, 4, 1)).replace(b"C444", b"C420")
    assert decode_y4m(buf) is None
    # truncated last frame
    assert decode_y4m(encode_y4m(4, 4, 2, 1, _frames(4, 4, 2))[:-5]) is None
    # zero frames
    assert decode_y4m(b"YUV4MPEG2 W4 H4 F2:1 Ip A1:1 C444\n") is None
    # garbage header numbers
    assert decode_y4m(b"YUV4MPEG2 Wx H4 F2:1 C444\nFRAME\n" + b"\x00" * 48) is None


def test_frame_seek():
    # 4 fps -> frame k covers [250k, 250(k+1)) ms
    assert frame_at_ms(4, 1, 8, 0) == 0
    assert frame_at_ms(4, 1, 8, 249) == 0
    assert frame_at_ms(4, 1, 8, 250) == 1
    assert frame_at_ms(4, 1, 8, 1999) == 7
    assert frame_at_ms(4, 1, 8, 99999) == 7  # clamped


def test_features_shape_and_determinism():
    (f,) = _frames(10, 7, 1)
    v1, v2 = y_features(10, 7, f, 16), y_features(10, 7, bytes(f), 16)
    assert v1 == v2 and len(v1) == 16
    flat = bytes([128]) * (3 * 4 * 4)
    v = y_features(4, 4, flat, 16)
    assert v[0] == round(128 / 255.0, 6) and sum(v[2:]) == 1.0


def test_synth_video_is_real_y4m(spark):
    from openie_spark.operators.multimodal import synth_media_bytes

    vid = decode_y4m(synth_media_bytes("video", "s3://bucket/v-clip-7"))
    assert vid is not None
    w, h, num, den, frames = vid
    assert num in (2, 4, 8) and den == 1 and 3 <= len(frames) <= 10
    assert all(len(f) == 3 * w * h for f in frames)
