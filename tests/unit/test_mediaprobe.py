"""Header-layer probes for MP3 / ADTS-AAC / H.264 (functions/mediaprobe.py):
streams are synthesized here bit-by-bit from the public header layouts, so
every parsed field is checked against the value it was built from, and
decode_media's probe→stub chain is exercised end-to-end through Spark."""

from __future__ import annotations

from openie_spark.functions.mediaprobe import (
    parse_sps,
    probe_adts,
    probe_h264,
    probe_mp3,
)

# ---------------------------------------------------------------------------
# builders (test-local; the product side only parses)
# ---------------------------------------------------------------------------


def mp3_frame(kbps=128, rate=44100, padding=0, version="mpeg1") -> bytes:
    """One MPEG Layer III frame with a valid 4-byte header + zero payload."""
    br_tables = {
        "mpeg1": (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
        "mpeg2": (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    }
    rate_tables = {"mpeg1": (44100, 48000, 32000), "mpeg2": (22050, 24000, 16000)}
    version_bits = 3 if version == "mpeg1" else 2
    br_idx = br_tables[version].index(kbps)
    sr_idx = rate_tables[version].index(rate)
    b1 = 0xE0 | (version_bits << 3) | (1 << 1) | 1  # sync tail, layer III, no CRC
    b2 = (br_idx << 4) | (sr_idx << 2) | (padding << 1)
    header = bytes([0xFF, b1, b2, 0x00])
    spf = 1152 if version == "mpeg1" else 576
    frame_len = spf // 8 * kbps * 1000 // rate + padding
    return header + b"\x00" * (frame_len - 4)


def adts_frame(rate_idx=4, channels=2, payload_len=100) -> bytes:
    """One ADTS frame (AAC-LC, protection absent) + junk payload."""
    frame_len = 7 + payload_len
    b = bytearray(7)
    b[0] = 0xFF
    b[1] = 0xF1  # sync, MPEG-4, layer 00, no CRC
    b[2] = (1 << 6) | (rate_idx << 2) | (channels >> 2)  # profile AAC-LC
    b[3] = ((channels & 0x3) << 6) | ((frame_len >> 11) & 0x3)
    b[4] = (frame_len >> 3) & 0xFF
    b[5] = ((frame_len & 0x7) << 5) | 0x1F
    b[6] = 0xFC
    return bytes(b) + b"\xa5" * payload_len


class _BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def u(self, v: int, n: int):
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def ue(self, v: int):
        k = v + 1
        n = k.bit_length()
        self.u(0, n - 1)
        self.u(k, n)

    def bytes(self) -> bytes:
        # rbsp_trailing_bits: stop bit + pad
        bits = self.bits + [1]
        while len(bits) % 8:
            bits.append(0)
        return bytes(
            int("".join(map(str, bits[i : i + 8])), 2) for i in range(0, len(bits), 8)
        )


def build_sps(width_mbs, height_mbs, crop_r=0, crop_b=0, fps=None) -> bytes:
    """Baseline-profile SPS RBSP (frame_mbs_only, 4:2:0) with optional
    cropping and VUI timing; returns the full NAL (header byte 0x67)."""
    w = _BitWriter()
    w.u(66, 8)  # profile_idc baseline
    w.u(0, 8)  # constraint flags
    w.u(30, 8)  # level 3.0
    w.ue(0)  # sps id
    w.ue(4)  # log2_max_frame_num_minus4
    w.ue(2)  # pic_order_cnt_type = 2
    w.ue(1)  # max_num_ref_frames
    w.u(0, 1)  # gaps_in_frame_num
    w.ue(width_mbs - 1)
    w.ue(height_mbs - 1)
    w.u(1, 1)  # frame_mbs_only
    w.u(1, 1)  # direct_8x8_inference
    if crop_r or crop_b:
        w.u(1, 1)
        w.ue(0)
        w.ue(crop_r)
        w.ue(0)
        w.ue(crop_b)
    else:
        w.u(0, 1)
    if fps is None:
        w.u(0, 1)  # no VUI
    else:
        w.u(1, 1)  # vui present
        w.u(0, 1)  # no aspect ratio
        w.u(0, 1)  # no overscan
        w.u(0, 1)  # no video signal type
        w.u(0, 1)  # no chroma loc
        w.u(1, 1)  # timing info present
        w.u(1000, 32)  # num_units_in_tick
        w.u(fps * 2000, 32)  # time_scale (field-rate convention)
        w.u(1, 1)  # fixed_frame_rate
    return b"\x67" + w.bytes()


def annexb_stream(n_frames=5, fps=None, width_mbs=40, height_mbs=30,
                  crop_r=0, crop_b=0) -> bytes:
    """SPS + PPS stub + n_frames IDR/non-IDR slices (first_mb_in_slice=0,
    then junk — the probe only reads the first ue)."""
    out = b"\x00\x00\x00\x01" + build_sps(width_mbs, height_mbs, crop_r, crop_b, fps)
    out += b"\x00\x00\x01\x68\xce\x38\x80"  # PPS (ignored by the probe)
    for i in range(n_frames):
        w = _BitWriter()
        w.ue(0)  # first_mb_in_slice = 0 → new access unit
        w.ue(7 if i == 0 else 5)  # slice_type junk
        nal = bytes([0x65 if i == 0 else 0x41]) + w.bytes() + b"\x5a" * 40
        out += b"\x00\x00\x01" + nal
    return out


# ---------------------------------------------------------------------------
# MP3
# ---------------------------------------------------------------------------


def test_mp3_duration_and_bitrate_exact():
    frames = [mp3_frame(128, 44100), mp3_frame(192, 44100), mp3_frame(128, 44100)]
    rate, n, dur, kbps = probe_mp3(b"".join(frames))
    assert (rate, n) == (44100, 3)
    assert dur == 3 * 1152 * 1000 // 44100
    assert kbps == (128 + 192 + 128) // 3


def test_mp3_mpeg2_spf_and_padding():
    frames = [mp3_frame(64, 22050, padding=p, version="mpeg2") for p in (0, 1, 0, 1)]
    rate, n, dur, _ = probe_mp3(b"".join(frames))
    assert (rate, n) == (22050, 4)
    assert dur == 4 * 576 * 1000 // 22050


def test_mp3_id3v2_skip():
    tag = b"ID3\x04\x00\x00\x00\x00\x00\x0a" + b"\x00" * 10
    body = mp3_frame() + mp3_frame()
    assert probe_mp3(tag + body) == probe_mp3(body)


def test_mp3_rejects_lone_sync_and_junk():
    assert probe_mp3(mp3_frame()) is None  # one frame: not enough evidence
    assert probe_mp3(b"\xff\xe0 random junk that is not audio") is None
    assert probe_mp3(b"RIFF....WAVE") is None
    assert probe_mp3(b"") is None


# ---------------------------------------------------------------------------
# ADTS
# ---------------------------------------------------------------------------


def test_adts_duration_exact():
    data = b"".join(adts_frame(rate_idx=3, channels=2) for _ in range(10))  # 48 kHz
    rate, ch, n, dur = probe_adts(data)
    assert (rate, ch, n) == (48000, 2, 10)
    assert dur == 10 * 1024 * 1000 // 48000


def test_adts_rejects_mp3_and_junk():
    assert probe_adts(mp3_frame() + mp3_frame()) is None  # layer bits != 00
    assert probe_adts(adts_frame()) is None  # single frame
    assert probe_adts(b"\x00" * 64) is None


# ---------------------------------------------------------------------------
# H.264
# ---------------------------------------------------------------------------


def test_sps_dims_no_crop():
    sps = parse_sps(build_sps(40, 30)[1:])
    assert (sps["width"], sps["height"]) == (640, 480)
    assert sps["fps_num"] is None


def test_sps_dims_with_crop_420():
    # 120x68 mbs = 1920x1088; crop_b = 4 units x CropUnitY 2 = 8 px → 1080
    sps = parse_sps(build_sps(120, 68, crop_r=0, crop_b=4)[1:])
    assert (sps["width"], sps["height"]) == (1920, 1080)


def test_sps_vui_fps():
    sps = parse_sps(build_sps(8, 8, fps=25)[1:])
    assert sps["fps_num"] == 25 * 2000 and sps["fps_den"] == 2000


def test_h264_stream_frames_and_duration():
    w, h, n, dur = probe_h264(annexb_stream(n_frames=7, fps=25))
    assert (w, h, n) == (640, 480, 7)
    assert dur == 7 * 1000 * 2000 // 50000  # 7 frames at 25 fps = 280 ms


def test_h264_no_vui_gives_dims_but_no_duration():
    w, h, n, dur = probe_h264(annexb_stream(n_frames=3))
    assert (w, h, n) == (640, 480, 3)
    assert dur is None


def test_h264_rejects_non_streams():
    assert probe_h264(b"") is None
    assert probe_h264(b"\x00\x00\x01\x68\xce\x38\x80") is None  # PPS only
    assert probe_h264(mp3_frame()) is None


# ---------------------------------------------------------------------------
# Spark e2e: probe→stub chain inside decode_media
# ---------------------------------------------------------------------------


def test_decode_media_probes_compressed_formats(spark):
    """decode_media fills EXACT metadata for probed MP3/ADTS/H.264 bytes
    (duration, dims) and keeps the labeled stub only for the feature
    vector — the unparseable row still takes the stub path."""
    import pandas as pd

    from openie_spark.operators.multimodal import MEDIA_SCHEMA, decode_media

    rows = [
        ("d1", 0, "audio", "m1", b"".join(mp3_frame() for _ in range(5))),
        ("d2", 0, "audio", "m2", b"".join(adts_frame(3, 2) for _ in range(4))),
        ("d3", 0, "video", "m3", annexb_stream(n_frames=6, fps=10)),
        ("d4", 0, "audio", "m4", b"not a media file at all"),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA.fields]),
        MEDIA_SCHEMA,
    )
    got = {r["doc_id"]: r for r in decode_media(df).collect()}
    assert got["d1"]["duration_ms"] == 5 * 1152 * 1000 // 44100
    assert got["d2"]["duration_ms"] == 4 * 1024 * 1000 // 48000
    assert (got["d3"]["width"], got["d3"]["height"]) == (640, 480)
    assert got["d3"]["duration_ms"] == 6 * 1000 * 2000 // 20000
    assert got["d4"]["duration_ms"] is not None  # stub fallback, labeled fake
    for r in got.values():
        assert len(r["feature"]) == 16  # stub features: shape contract holds


# ---------------------------------------------------------------------------
# robustness: tag footers, truncation, stream-uniformity, damaged SPS
# ---------------------------------------------------------------------------


def test_mp3_id3v24_footer_skip():
    flags_footer = 0x10
    tag = bytes([0x49, 0x44, 0x33, 4, 0, flags_footer, 0, 0, 0, 10])
    tag += b"\x00" * 10 + b"3DI" + b"\x00" * 7  # body + footer
    body = mp3_frame() + mp3_frame()
    assert probe_mp3(tag + body) == probe_mp3(body)


def test_mp3_truncated_trailing_frame_not_counted():
    full = mp3_frame() + mp3_frame() + mp3_frame()
    cut = full[:-50]  # last frame loses its tail
    rate, n, dur, _ = probe_mp3(cut)
    assert n == 2 and dur == 2 * 1152 * 1000 // 44100
    # a spurious sync pair after the last full frame is also not counted
    rate, n, _, _ = probe_mp3(full[: 2 * len(mp3_frame())] + b"\xff\xfb\x90")
    assert n == 2


def test_adts_channel_change_refused_like_rate_change():
    data = adts_frame(3, 2) + adts_frame(3, 2) + adts_frame(3, 1) + adts_frame(3, 1)
    rate, ch, n, _ = probe_adts(data)
    assert (ch, n) == (2, 2)  # walk stops at the config change


def test_h264_damaged_first_sps_falls_through_to_repeat():
    good = annexb_stream(n_frames=4, fps=25)
    # prepend a truncated SPS NAL (header byte only, empty RBSP)
    damaged = b"\x00\x00\x00\x01\x67" + good
    assert probe_h264(damaged) == probe_h264(good)
