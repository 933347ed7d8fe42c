"""Baseline JPEG codec (functions/jpegcodec.py): round-trip error bounds,
hand-computable flat blocks, marker/unsupported-flavor refusals, and the
decode_image dispatch."""

from __future__ import annotations

import numpy as np

from openie_spark.functions.jpegcodec import decode_jpeg, encode_jpeg


def _rt(w, h, rgb: bytes):
    out = decode_jpeg(encode_jpeg(w, h, rgb))
    assert out is not None
    dw, dh, drgb = out
    assert (dw, dh) == (w, h)
    return np.frombuffer(drgb, np.uint8).astype(np.int64), np.frombuffer(
        rgb, np.uint8
    ).astype(np.int64)


def test_flat_gray_block_near_exact():
    # flat 8x8 gray: DC-only in every component; quantization error is
    # sub-unit, so the decoded image must match within 1 LSB everywhere
    rgb = bytes([128]) * (8 * 8 * 3)
    got, want = _rt(8, 8, rgb)
    assert np.abs(got - want).max() <= 1


def test_flat_color_image_non_multiple_of_8():
    # edge-replicated padding must not bleed error into the crop
    rgb = bytes([40, 200, 90]) * (13 * 11)
    got, want = _rt(13, 11, rgb)
    assert np.abs(got - want).max() <= 2


def test_smooth_gradient_small_error():
    w, h = 24, 16
    img = np.zeros((h, w, 3), np.uint8)
    for y in range(h):
        for x in range(w):
            img[y, x] = (x * 8, y * 12, 100)
    got, want = _rt(w, h, img.tobytes())
    assert np.abs(got - want).max() <= 12
    assert np.abs(got - want).mean() <= 3.0


def test_random_noise_bounded_error_and_determinism():
    rng = np.random.default_rng(5)
    rgb = rng.integers(0, 256, 31 * 17 * 3, dtype=np.uint8).tobytes()
    buf1, buf2 = encode_jpeg(31, 17, rgb), encode_jpeg(31, 17, rgb)
    assert buf1 == buf2  # bit-deterministic encode
    got, want = _rt(31, 17, rgb)
    # worst-case bound from the mild quant tables (see module docstring)
    assert np.abs(got - want).max() <= 60
    assert np.abs(got - want).mean() <= 12.0


def test_dc_prediction_across_blocks():
    # two horizontally adjacent flat blocks with different levels: the
    # second block's DC is coded as a diff — both must survive
    img = np.zeros((8, 16, 3), np.uint8)
    img[:, :8] = 50
    img[:, 8:] = 200
    got, want = _rt(16, 8, img.tobytes())
    assert np.abs(got - want).max() <= 1


def test_refusals():
    assert decode_jpeg(b"") is None
    assert decode_jpeg(b"\x00\x01") is None
    buf = encode_jpeg(8, 8, bytes(8 * 8 * 3))
    # progressive SOF2 refused
    assert decode_jpeg(buf.replace(b"\xff\xc0", b"\xff\xc2", 1)) is None
    # truncated entropy data refused
    assert decode_jpeg(buf[: len(buf) // 2]) is None
    # subsampled SOF refused: patch luma sampling factor 0x11 -> 0x22
    sof = buf.find(b"\xff\xc0")
    patched = bytearray(buf)
    patched[sof + 11] = 0x22  # component 1 h/v factors
    assert decode_jpeg(bytes(patched)) is None


def test_decode_image_dispatch():
    from openie_spark.functions.imagecodec import decode_image

    rgb = bytes([10, 20, 30]) * (8 * 8)
    out = decode_image(encode_jpeg(8, 8, rgb))
    assert out is not None and out[:2] == (8, 8)
