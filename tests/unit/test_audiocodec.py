"""WAV codec (functions/audiocodec.py): round-trip bit-exactness, chunk
walking, unsupported-format refusal, and feature determinism."""

from __future__ import annotations

import struct

import numpy as np

from openie_spark.functions.audiocodec import (
    decode_wav,
    encode_wav,
    pcm_features,
    wav_duration_ms,
)


def test_round_trip_mono():
    rng = np.random.default_rng(7)
    samples = rng.integers(-32768, 32768, 12345, dtype=np.int16)
    rate, ch, got = decode_wav(encode_wav(16000, samples))
    assert (rate, ch) == (16000, 1)
    assert np.array_equal(got, samples)
    assert wav_duration_ms(rate, ch, got) == 12345 * 1000 // 16000


def test_round_trip_stereo_and_odd_data_padding():
    rng = np.random.default_rng(8)
    # odd FRAME count and interleaved stereo; data chunk of odd byte size
    # cannot occur at 16-bit, so also check an extra unknown chunk instead
    samples = rng.integers(-2000, 2000, 2 * 501, dtype=np.int16)
    buf = encode_wav(8000, samples, n_channels=2)
    rate, ch, got = decode_wav(buf)
    assert (rate, ch) == (8000, 2)
    assert np.array_equal(got, samples)
    assert wav_duration_ms(rate, ch, got) == 501 * 1000 // 8000


def test_unknown_chunks_are_skipped():
    samples = np.arange(100, dtype=np.int16)
    buf = encode_wav(8000, samples)
    # splice a LIST chunk (odd size -> exercises word-alignment padding)
    extra = struct.pack("<4sI", b"LIST", 3) + b"abc\x00"
    spliced = bytearray(buf[:12] + extra + buf[12:])
    spliced[4:8] = struct.pack("<I", len(spliced) - 8)
    rate, ch, got = decode_wav(bytes(spliced))
    assert (rate, ch) == (8000, 1)
    assert np.array_equal(got, samples)


def test_refuses_non_wav_and_non_pcm16():
    assert decode_wav(b"") is None
    assert decode_wav(b"not a wav at all") is None
    assert decode_wav(b"RIFF\x00\x00\x00\x00JUNK") is None
    # non-spec sample width / compressed fmt refused (caller falls back
    # to the stub); 8-bit is now a SUPPORTED width (see the widened-WAV
    # tests below), so the refusal pin uses 12-bit instead
    buf = bytearray(encode_wav(8000, np.arange(10, dtype=np.int16)))
    buf[34] = 12  # bits-per-sample field
    assert decode_wav(bytes(buf)) is None
    buf = bytearray(encode_wav(8000, np.arange(10, dtype=np.int16)))
    buf[20] = 2  # audio_format = ADPCM
    assert decode_wav(bytes(buf)) is None
    # truncated data chunk
    assert decode_wav(encode_wav(8000, np.arange(10, dtype=np.int16))[:-4]) is None


def test_features_shape_and_determinism():
    rng = np.random.default_rng(9)
    samples = rng.integers(-32768, 32768, 4000, dtype=np.int16)
    f1 = pcm_features(samples, 1, 16)
    f2 = pcm_features(samples.copy(), 1, 16)
    assert f1 == f2 and len(f1) == 16
    assert all(0.0 <= x <= 1.0 for x in f1)
    assert pcm_features(np.array([], dtype=np.int16), 1, 16) == [0.0] * 16
    # silence -> zero energy everywhere but well-defined
    assert pcm_features(np.zeros(100, dtype=np.int16), 1, 16) == [0.0] * 16


def test_synth_audio_is_real_wav(spark):
    from openie_spark.operators.multimodal import synth_media_bytes

    buf = synth_media_bytes("audio", "s3://bucket/a-clip-42")
    wav = decode_wav(buf)
    assert wav is not None
    rate, ch, samples = wav
    assert rate in (8000, 16000) and ch == 1 and len(samples) > 0
    # video stays the labeled stub (no pure-stdlib codec)
    assert decode_wav(synth_media_bytes("video", "s3://bucket/v-1")) is None


# ---------------------------------------------------------------------------
# Widened WAV decode (round 5): PCM 8/24/32-bit, IEEE float32, and
# WAVE_FORMAT_EXTENSIBLE — all rendered to the int16 contract.  Streams
# are built by a test-local writer so every expectation is constructed.
# ---------------------------------------------------------------------------


def _wav(fmt, channels, rate, bits, data, extensible=False) -> bytes:
    import struct

    if extensible:
        sub = (
            struct.pack("<H", fmt)
            + b"\x00\x00"
            + b"\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"
        )
        fchunk = (
            struct.pack("<4sIHHIIHH", b"fmt ", 40, 0xFFFE, channels, rate, 0, 0, bits)
            + struct.pack("<HHI", 22, bits, 0)
            + sub
        )
    else:
        fchunk = struct.pack("<4sIHHIIHH", b"fmt ", 16, fmt, channels, rate, 0, 0, bits)
    body = (
        b"WAVE"
        + fchunk
        + struct.pack("<4sI", b"data", len(data))
        + data
        + (b"\x00" if len(data) % 2 else b"")
    )
    return struct.pack("<4sI", b"RIFF", len(body)) + body


def test_wav_pcm8_recentered_and_widened():
    r = decode_wav(_wav(1, 1, 8000, 8, bytes([0, 128, 255, 200])))
    assert r is not None
    assert list(r[2]) == [(-128) << 8, 0, 127 << 8, 72 << 8]


def test_wav_pcm24_and_pcm32_high_16_bits():
    import struct

    vals = [0x123456, 0xFFFF00, 0x800000, 0x7FFFFF]
    data24 = b"".join(struct.pack("<I", v)[:3] for v in vals)
    r = decode_wav(_wav(1, 1, 8000, 24, data24))
    exp = [(v >> 8) if v < (1 << 23) else ((v >> 8) - (1 << 16)) for v in vals]
    assert list(r[2]) == exp
    i32 = np.array([0, 1 << 16, -(1 << 16), 0x7FFFFFFF, -0x80000000], "<i4")
    r = decode_wav(_wav(1, 1, 8000, 32, i32.tobytes()))
    assert list(r[2]) == [0, 1, -1, 0x7FFF, -0x8000]


def test_wav_float32_clip_and_scale_half_up():
    f = np.array([0.0, 0.5, -0.5, 2.0, -2.0, 1.0, -1.0], "<f4")
    r = decode_wav(_wav(3, 1, 8000, 32, f.tobytes()))
    assert list(r[2]) == [0, 16384, -16383, 32767, -32767, 32767, -32767]


def test_wav_extensible_wrapper_and_compressed_refusals():
    s = np.array([5, -7, 300], "<i2")
    r = decode_wav(_wav(1, 2, 16000, 16, s.tobytes() + s.tobytes(), extensible=True))
    assert r is not None and r[0] == 16000 and r[1] == 2
    f = np.array([0.25, -0.25], "<f4")
    r = decode_wav(_wav(3, 1, 16000, 32, f.tobytes(), extensible=True))
    # 0.25*32767 = 8191.75 -> half-up 8192; -8191.75 + 0.5 floors to -8192
    assert list(r[2]) == [8192, -8192]
    assert decode_wav(_wav(2, 1, 8000, 4, b"\x00" * 16)) is None  # ADPCM
    assert decode_wav(_wav(7, 1, 8000, 8, b"\x00" * 16)) is None  # mu-law
    assert decode_wav(_wav(1, 1, 8000, 12, b"\x00" * 16)) is None  # odd width


def test_wav_float32_nonfinite_samples_canonicalized():
    """NaN / ±inf float samples must decode deterministically (NaN → 0,
    ±inf → full scale) — a raw astype on NaN is C-undefined and varies
    across hosts, which would break the cross-host fingerprint
    contract."""
    f = np.array([np.nan, np.inf, -np.inf, 0.5], "<f4")
    r = decode_wav(_wav(3, 1, 8000, 32, f.tobytes()))
    assert r is not None
    assert list(r[2]) == [0, 32767, -32767, 16384]
