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


def test_zrl_long_zero_run_round_trip():
    # Build pixels from a synthetic spectrum whose only AC energy sits late
    # in zigzag order (index 35), forcing the encoder through ZRL (run>15)
    # and the decoder through the k+=16 path.
    from openie_spark.functions import jpegcodec as J

    coef = np.zeros(64)
    zz_idx = int(J._ZIGZAG[35])
    coef.reshape(64)[zz_idx] = 400.0  # well above the quant step there
    block = np.clip(J._idct(coef.reshape(8, 8)) + 128.0, 0, 255)
    img = np.repeat(
        np.floor(block + 0.5).astype(np.uint8)[:, :, None], 3, axis=-1
    )
    buf = encode_jpeg(8, 8, img.tobytes())
    # the stream must actually contain a ZRL symbol: re-encode the luma
    # block by hand and check the quantized spectrum shape we engineered
    q = J._quantize(J._fdct(block - 128.0)).reshape(64)[J._ZIGZAG]
    nz = np.nonzero(q[1:])[0] + 1
    assert len(nz) >= 1 and nz[0] >= 17  # >15 zeros before first AC nonzero
    out = decode_jpeg(buf)
    assert out is not None
    got = np.frombuffer(out[2], np.uint8).astype(np.int64)
    want = img.astype(np.int64).ravel()
    assert np.abs(got - want).max() <= 40  # late-spectrum quant is coarser


def test_grayscale_single_component_decode():
    # Our encoder always writes 3 components; craft a minimal 1-component
    # baseline stream by hand from the module's own tables to exercise the
    # decoder's ncomp==1 branch (Y replicated to RGB).
    import struct as _struct

    from openie_spark.functions import jpegcodec as J

    level = 77
    block = np.full((8, 8), float(level)) - 128.0
    zz = J._quantize(J._fdct(block)).reshape(64)[J._ZIGZAG]
    w = J._BitWriter()
    size = J._size_cat(int(zz[0]))
    code, length = J._DC_ENC[size]
    w.write(code, length)
    if size:
        v = int(zz[0])
        w.write(v if v >= 0 else v + (1 << size) - 1, size)
    code, length = J._AC_ENC[0x00]  # flat block: EOB immediately
    w.write(code, length)
    entropy = w.flush()
    qzz = bytes(int(J._QTABLE.reshape(64)[z]) for z in J._ZIGZAG)
    buf = b"".join(
        [
            b"\xff\xd8",
            _struct.pack(">HH", 0xFFDB, 67) + b"\x00" + qzz,
            _struct.pack(">HHBHHB", 0xFFC0, 11, 8, 8, 8, 1)
            + bytes([1, 0x11, 0]),
            J._dht_segment(0, 0, J._DC_BITS, J._DC_SYMBOLS),
            J._dht_segment(1, 0, J._AC_BITS, J._AC_SYMBOLS),
            _struct.pack(">HHB", 0xFFDA, 8, 1) + bytes([1, 0x00, 0, 63, 0]),
            entropy,
            b"\xff\xd9",
        ]
    )
    out = decode_jpeg(buf)
    assert out is not None
    dw, dh, rgb = out
    assert (dw, dh) == (8, 8)
    px = np.frombuffer(rgb, np.uint8).reshape(8, 8, 3)
    assert np.abs(px.astype(np.int64) - level).max() <= 1
    assert (px[..., 0] == px[..., 1]).all() and (px[..., 0] == px[..., 2]).all()


def test_refusals_dri_and_16bit_dqt():
    import struct as _struct

    buf = encode_jpeg(8, 8, bytes([60, 70, 80]) * 64)
    # splice a DRI segment just before SOS -> refused
    sos = buf.find(b"\xff\xda")
    dri = _struct.pack(">HHH", 0xFFDD, 4, 8)
    assert decode_jpeg(buf[:sos] + dri + buf[sos:]) is None
    # 16-bit DQT precision nibble -> refused
    dqt = buf.find(b"\xff\xdb")
    patched = bytearray(buf)
    patched[dqt + 4] |= 0x10
    assert decode_jpeg(bytes(patched)) is None
