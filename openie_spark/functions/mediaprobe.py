"""Pure-stdlib metadata probes for the compressed media containers whose
FULL decode needs codec deps absent from this container (MP3, ADTS AAC,
H.264 Annex-B).  ffprobe-style: walk the container's frame/NAL structure
and return real stream metadata (duration, sample rate, bitrate, dims,
frame count) parsed from the actual bytes — no fake numbers.  PCM/pixel
reconstruction (Huffman + IMDCT / CABAC + deblock) is the part that
stays behind a codec dep; everything here is header-layer and exact.

Formats are public specs: MP3 = ISO/IEC 11172-3 audio frame header;
ADTS = ISO/IEC 14496-3 audio data transport stream; H.264 = ITU-T H.264
/ ISO 14496-10 Annex B byte streams with Exp-Golomb SPS syntax.

All three probes return ``None`` for bytes that do not parse as their
format (same convention as decode_wav / decode_image / decode_y4m), so
`operators/multimodal.py` can chain real-decode → probe → labeled stub.
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# MP3 (MPEG-1/2/2.5 Layer I-III frame-header walk)
# ---------------------------------------------------------------------------

# bitrate (kbps) tables indexed by [version_group][layer][bitrate_index];
# version_group: 0 = MPEG1, 1 = MPEG2/2.5.  Index 0 ("free") and 15 are
# invalid for the walker.
_BITRATE_KBPS = {
    (0, 1): (0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    (0, 2): (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    (0, 3): (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    (1, 1): (0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    (1, 2): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    (1, 3): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}
# sample-rate (Hz) by version bits (00=MPEG2.5, 10=MPEG2, 11=MPEG1)
_MP3_RATES = {
    3: (44100, 48000, 32000),
    2: (22050, 24000, 16000),
    0: (11025, 12000, 8000),
}
# samples per frame by (version_group, layer)
_SAMPLES_PER_FRAME = {(0, 1): 384, (1, 1): 384, (0, 2): 1152, (1, 2): 1152,
                      (0, 3): 1152, (1, 3): 576}


def _skip_id3v2(data: bytes) -> int:
    """Return the offset past an ID3v2 tag, 0 if none (syncsafe size;
    the v2.4 footer flag adds another 10 bytes not counted in size)."""
    if len(data) >= 10 and data[:3] == b"ID3":
        size = (data[6] << 21) | (data[7] << 14) | (data[8] << 7) | data[9]
        footer = 10 if data[5] & 0x10 else 0
        return 10 + size + footer
    return 0


def probe_mp3(data: bytes):
    """Walk consecutive MPEG audio frames from the first syncword.
    Returns ``(sample_rate, n_frames, duration_ms, avg_bitrate_kbps)``
    or None.  Requires ≥ 2 valid consecutive frames (a lone 0xFFE match
    in random bytes is common; a chained second header at the exact
    computed frame boundary is not)."""
    pos = _skip_id3v2(data)
    n_frames = 0
    total_samples = 0
    bitrate_sum = 0
    rate = None
    while pos + 4 <= len(data):
        b0, b1, b2 = data[pos], data[pos + 1], data[pos + 2]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            break
        version_bits = (b1 >> 3) & 0x3  # 0=2.5, 2=MPEG2, 3=MPEG1
        layer_bits = (b1 >> 1) & 0x3  # 1=III, 2=II, 3=I
        if version_bits == 1 or layer_bits == 0:
            break
        layer = 4 - layer_bits  # 1/2/3
        vgroup = 0 if version_bits == 3 else 1
        br_idx = (b2 >> 4) & 0xF
        sr_idx = (b2 >> 2) & 0x3
        padding = (b2 >> 1) & 0x1
        if br_idx in (0, 15) or sr_idx == 3:
            break
        kbps = _BITRATE_KBPS[(vgroup, layer)][br_idx]
        sr = _MP3_RATES[version_bits][sr_idx]
        if rate is None:
            rate = sr
        elif sr != rate:
            break  # rate change mid-stream: not a plain MP3 stream
        if layer == 1:
            frame_len = (12 * kbps * 1000 // sr + padding) * 4
        else:
            spf = _SAMPLES_PER_FRAME[(vgroup, layer)]
            frame_len = spf // 8 * kbps * 1000 // sr + padding
        if frame_len <= 4:
            break
        if pos + frame_len > len(data):
            break  # truncated trailing frame: header-only evidence — skip
        n_frames += 1
        total_samples += _SAMPLES_PER_FRAME[(vgroup, layer)]
        bitrate_sum += kbps
        pos += frame_len
    if n_frames < 2 or rate is None:
        return None
    duration_ms = total_samples * 1000 // rate
    return rate, n_frames, duration_ms, bitrate_sum // n_frames


# ---------------------------------------------------------------------------
# ADTS AAC
# ---------------------------------------------------------------------------

_ADTS_RATES = (96000, 88200, 64000, 48000, 44100, 32000, 24000, 22050,
               16000, 12000, 11025, 8000, 7350)
_AAC_SAMPLES_PER_FRAME = 1024  # AAC-LC, one raw data block per ADTS frame


def probe_adts(data: bytes):
    """Walk consecutive ADTS frames.  Returns ``(sample_rate, n_channels,
    n_frames, duration_ms)`` or None.  Requires ≥ 2 chained frames, same
    rationale as probe_mp3."""
    pos = 0
    n_frames = 0
    rate = None
    channels = None
    while pos + 7 <= len(data):
        if data[pos] != 0xFF or (data[pos + 1] & 0xF0) != 0xF0:
            break
        if (data[pos + 1] >> 1) & 0x3 != 0:  # layer must be 00
            break
        sr_idx = (data[pos + 2] >> 2) & 0xF
        if sr_idx >= len(_ADTS_RATES):
            break
        ch = ((data[pos + 2] & 0x1) << 2) | (data[pos + 3] >> 6)
        frame_len = ((data[pos + 3] & 0x3) << 11) | (data[pos + 4] << 3) | (
            data[pos + 5] >> 5
        )
        if frame_len < 7:
            break
        sr = _ADTS_RATES[sr_idx]
        if rate is None:
            rate, channels = sr, ch
        elif sr != rate or ch != channels:
            break  # rate/channel change mid-stream: not one uniform stream
        if pos + frame_len > len(data):
            break  # truncated trailing frame
        n_frames += 1
        pos += frame_len
    if n_frames < 2 or rate is None:
        return None
    duration_ms = n_frames * _AAC_SAMPLES_PER_FRAME * 1000 // rate
    return rate, channels, n_frames, duration_ms


# ---------------------------------------------------------------------------
# H.264 Annex-B (NAL walk + Exp-Golomb SPS parse)
# ---------------------------------------------------------------------------


class _BitReader:
    """MSB-first bit reader over an RBSP (emulation-prevention removed)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def u(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.data[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 31:
                raise ValueError("bad Exp-Golomb code")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)


def _unescape_rbsp(data: bytes) -> bytes:
    """Remove emulation-prevention bytes (00 00 03 → 00 00)."""
    out = bytearray()
    i = 0
    while i < len(data):
        if i + 2 < len(data) and data[i] == 0 and data[i + 1] == 0 and data[i + 2] == 3:
            out += data[i : i + 2]
            i += 3
        else:
            out.append(data[i])
            i += 1
    return bytes(out)


_HIGH_PROFILES = {100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135}


def parse_sps(rbsp: bytes):
    """Parse an SPS RBSP (NAL header byte already stripped, emulation
    prevention already removed) → dict with width/height (crop applied)
    and, when VUI timing info is present, fps_num/fps_den (field rate
    halved to frame rate per the spec's num_units_in_tick convention)."""
    r = _BitReader(rbsp)
    profile_idc = r.u(8)
    r.u(8)  # constraint flags + reserved
    level_idc = r.u(8)
    r.ue()  # seq_parameter_set_id
    chroma_format_idc = 1
    if profile_idc in _HIGH_PROFILES:
        chroma_format_idc = r.ue()
        if chroma_format_idc == 3:
            r.u(1)  # separate_colour_plane_flag
        r.ue()  # bit_depth_luma_minus8
        r.ue()  # bit_depth_chroma_minus8
        r.u(1)  # qpprime_y_zero_transform_bypass_flag
        if r.u(1):  # seq_scaling_matrix_present_flag
            for i in range(8 if chroma_format_idc != 3 else 12):
                if r.u(1):  # seq_scaling_list_present_flag[i]
                    size = 16 if i < 6 else 64
                    last, nxt = 8, 8
                    for _ in range(size):
                        if nxt != 0:
                            nxt = (last + r.se() + 256) % 256
                        last = last if nxt == 0 else nxt
    r.ue()  # log2_max_frame_num_minus4
    poc_type = r.ue()
    if poc_type == 0:
        r.ue()  # log2_max_pic_order_cnt_lsb_minus4
    elif poc_type == 1:
        r.u(1)
        r.se()
        r.se()
        for _ in range(r.ue()):
            r.se()
    r.ue()  # max_num_ref_frames
    r.u(1)  # gaps_in_frame_num_value_allowed_flag
    pic_width_in_mbs = r.ue() + 1
    pic_height_in_map_units = r.ue() + 1
    frame_mbs_only = r.u(1)
    if not frame_mbs_only:
        r.u(1)  # mb_adaptive_frame_field_flag
    r.u(1)  # direct_8x8_inference_flag
    crop_l = crop_r = crop_t = crop_b = 0
    if r.u(1):  # frame_cropping_flag
        crop_l, crop_r, crop_t, crop_b = r.ue(), r.ue(), r.ue(), r.ue()
    width = pic_width_in_mbs * 16
    height = pic_height_in_map_units * 16 * (2 - frame_mbs_only)
    # 4:2:0 crop units: x2 horizontally, x2 (x4 interlaced) vertically
    if chroma_format_idc in (1, 2):
        crop_x = 2
    else:
        crop_x = 1
    crop_y = (2 if chroma_format_idc == 1 else 1) * (2 - frame_mbs_only)
    width -= (crop_l + crop_r) * crop_x
    height -= (crop_t + crop_b) * crop_y
    fps_num = fps_den = None
    if r.u(1):  # vui_parameters_present_flag
        if r.u(1):  # aspect_ratio_info_present_flag
            if r.u(8) == 255:  # Extended_SAR
                r.u(16)
                r.u(16)
        if r.u(1):  # overscan_info_present_flag
            r.u(1)
        if r.u(1):  # video_signal_type_present_flag
            r.u(3)
            r.u(1)
            if r.u(1):  # colour_description_present_flag
                r.u(24)
        if r.u(1):  # chroma_loc_info_present_flag
            r.ue()
            r.ue()
        if r.u(1):  # timing_info_present_flag
            num_units_in_tick = r.u(32)
            time_scale = r.u(32)
            if num_units_in_tick:
                # field-rate convention: frame rate = time_scale / (2 * nuit)
                fps_num, fps_den = time_scale, 2 * num_units_in_tick
    return {
        "profile_idc": profile_idc,
        "level_idc": level_idc,
        "width": width,
        "height": height,
        "fps_num": fps_num,
        "fps_den": fps_den,
    }


def _nal_units(data: bytes):
    """Yield (nal_type, payload_with_header) for an Annex-B byte stream."""
    i = 0
    n = len(data)
    starts = []
    while i + 3 <= n:
        if data[i] == 0 and data[i + 1] == 0:
            if data[i + 2] == 1:
                starts.append(i + 3)
                i += 3
                continue
            if i + 4 <= n and data[i + 2] == 0 and data[i + 3] == 1:
                starts.append(i + 4)
                i += 4
                continue
        i += 1
    for k, s in enumerate(starts):
        e = (starts[k + 1] - 3) if k + 1 < len(starts) else n
        # trim the next start code's leading zeros (3- or 4-byte codes)
        while e > s and data[e - 1] == 0:
            e -= 1
        if e > s:
            yield data[s] & 0x1F, data[s:e]


def probe_h264(data: bytes):
    """Annex-B walk: parse the first PARSEABLE SPS for dims (+fps when
    VUI timing is present — streams repeat SPS before IDRs, so a damaged
    first copy falls through to the next) and count access units (VCL
    NALs whose slice header starts at first_mb_in_slice == 0).  Known
    limitation: field-coded (PAFF) pictures count as one unit per FIELD,
    so n_frames/duration are 2x for interlaced streams — distinguishing
    fields needs the PPS + full slice-header parse a real decoder does.
    Returns ``(width, height, n_frames, duration_ms_or_None)`` or None
    if no parseable SPS + VCL NAL pair is found."""
    sps = None
    n_frames = 0
    for nal_type, payload in _nal_units(data):
        if nal_type == 7 and sps is None:
            try:
                sps = parse_sps(_unescape_rbsp(payload[1:]))
            except (ValueError, IndexError):
                continue  # damaged SPS copy — try the next repetition
        elif nal_type in (1, 5) and len(payload) > 1:
            try:
                first_mb = _BitReader(_unescape_rbsp(payload[1:5])).ue()
            except (ValueError, IndexError):
                continue
            if first_mb == 0:  # a new access unit, not a continuation slice
                n_frames += 1
    if sps is None or n_frames == 0:
        return None
    duration_ms = None
    if sps["fps_num"]:
        duration_ms = n_frames * 1000 * sps["fps_den"] // sps["fps_num"]
    return sps["width"], sps["height"], n_frames, duration_ms
