"""Pure-stdlib baseline JPEG (ITU-T T.81 / JFIF) codec.

Same discipline as functions/{image,audio,video}codec.py: no codec
dependencies, so the multimodal image path can decode REAL JPEG payloads
end-to-end.  Scope (honest and spec-valid, not a general-purpose decoder):

  - **Encoder**: baseline sequential DCT, 8-bit, 4:4:4 (no chroma
    subsampling), JFIF color (RGB→YCbCr), edge-replicated padding to 8×8
    MCUs, and SELF-DEFINED canonical Huffman tables written to DHT (the
    spec lets any valid tables ride in the file — emitting our own
    removes any dependence on remembering Annex K byte-for-byte; every
    conforming decoder, including this one, reads tables from DHT).
  - **Decoder**: baseline sequential (SOF0) with per-component sampling
    factors 1-2 per axis — 4:4:4, 4:2:0, 4:2:2 (MCU-interleaved
    sub-block rasters, nearest-neighbor chroma upsample) — AND
    progressive (SOF2, 4:4:4 only): spectral selection, successive
    approximation (DC + AC first and refinement scans, EOB runs spanning
    blocks, buffered correction bits), multi-scan parsing with DHT/DQT
    between scans.  8-bit, tables taken from the stream, 0xFF00
    byte-stuffing, EOB/ZRL runs, DC prediction.  Anything else —
    sampling factors above 2, subsampled progressive, arithmetic coding,
    lossless/differential frames, restart intervals — returns None and
    the caller falls back to its labeled stub, exactly like decode_image
    on an unknown container.
  - **4:2:0 encoder** (``encode_jpeg_420``): luma 2×2 / chroma 1×1 with
    2×2 box-mean chroma downsampling — exists chiefly to round-trip-test
    the subsampled decode path (flat content survives the
    box-mean/replicate pair exactly; the MCU quadrant test pins the
    interleave order).
  - **Progressive encoder** (``encode_jpeg_progressive``): same quantized
    coefficients as the baseline encoder, emitted as a full scan script
    (interleaved DC first at Al=1 + DC refinement, then per-component AC
    first at Al=1 + AC refinement) — so a progressive round-trip must
    decode BIT-IDENTICAL to the baseline round-trip of the same pixels,
    which is exactly what the tests pin.

Determinism contract: FDCT/IDCT run in float64 through one fixed 8×8
DCT matrix; quantization is floor(x/q + 0.5) with half-away-from-zero
for negatives.  Both the Spark fence and the single-process oracle twin
import THIS module, so JVM/DuckDB sides cannot fork.  JPEG is lossy:
round-trips are near-exact for smooth content and bounded for noise
(tests pin the bounds); all downstream features compute from the DECODED
pixels on both sides, so loss never breaks parity.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# constants: zigzag order, quant tables, our canonical Huffman tables
# ---------------------------------------------------------------------------

_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Mild quantization (values 4..18): small loss, deterministic, valid.
_U, _V = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
_QTABLE = (4 + _U + _V).astype(np.int64)  # used for luma AND chroma

# Our canonical Huffman tables: all 12 DC categories at code length 5;
# all 162 AC symbols at code length 8.  Canonical assignment in symbol
# order keeps codes well below the forbidden all-ones code.
_DC_SYMBOLS = list(range(12))
_AC_SYMBOLS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]
_DC_BITS = [0] * 16
_DC_BITS[4] = len(_DC_SYMBOLS)  # length 5 (BITS index 4)
_AC_BITS = [0] * 16
_AC_BITS[7] = len(_AC_SYMBOLS)  # length 8


def _canonical_codes(bits: list[int], symbols: list[int]) -> dict[int, tuple[int, int]]:
    """T.81 canonical code construction: symbol → (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length_minus_1, count in enumerate(bits):
        for _ in range(count):
            out[symbols[k]] = (code, length_minus_1 + 1)
            code += 1
            k += 1
        code <<= 1
    return out


_DC_ENC = _canonical_codes(_DC_BITS, _DC_SYMBOLS)
_AC_ENC = _canonical_codes(_AC_BITS, _AC_SYMBOLS)

# Progressive AC table: the baseline symbols PLUS the EOBn codes
# (run<<4, size 0, run 1..14) progressive EOB runs need.  A SEPARATE
# table (DHT rides per-stream) so the baseline encoder's bytes — and with
# them every synthesized media fixture — stay bit-identical.
_AC_SYMBOLS_P = [0x00, 0xF0] + [run << 4 for run in range(1, 15)] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]
_AC_BITS_P = [0] * 16
_AC_BITS_P[7] = len(_AC_SYMBOLS_P)  # 176 codes at length 8 (max 175 < 255)
_AC_ENC_P = _canonical_codes(_AC_BITS_P, _AC_SYMBOLS_P)

# one fixed DCT-II matrix (float64) drives both transforms
_C = np.array(
    [
        [
            (np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8))
            * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def _fdct(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


def _idct(coef: np.ndarray) -> np.ndarray:
    return _C.T @ coef @ _C


def _quantize(coef: np.ndarray) -> np.ndarray:
    x = coef / _QTABLE
    return np.where(x >= 0, np.floor(x + 0.5), -np.floor(-x + 0.5)).astype(np.int64)


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    return np.stack(
        [
            0.299 * r + 0.587 * g + 0.114 * b,
            128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
            128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
        ],
        axis=-1,
    )


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    return np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=-1,
    )


# ---------------------------------------------------------------------------
# bit I/O with 0xFF00 stuffing
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per the spec
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, n: int) -> int | None:
        while self.nbits < n:
            if self.pos >= len(self.data):
                return None
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                if self.pos >= len(self.data):
                    return None
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    return None  # a real marker inside entropy data
            self.acc = (self.acc << 8) | byte
            self.nbits += 8
        self.nbits -= n
        val = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return val


def _size_cat(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _dht_segment(tc: int, th: int, bits: list[int], symbols: list[int]) -> bytes:
    payload = bytes([(tc << 4) | th]) + bytes(bits) + bytes(symbols)
    return struct.pack(">HH", 0xFFC4, 2 + len(payload)) + payload


def _quantize_image(width: int, height: int, rgb: bytes) -> np.ndarray:
    """RGB bytes → quantized zigzag-order coefficients (3, bh, bw, 64) —
    the shared front half of both encoders (so a progressive stream
    carries byte-for-byte the same coefficients as the baseline one)."""
    img = (
        np.frombuffer(rgb, np.uint8)
        .reshape(height, width, 3)
        .astype(np.float64)
    )
    ycc = _rgb_to_ycbcr(img)
    ph, pw = -(-height // 8) * 8, -(-width // 8) * 8
    padded = np.empty((ph, pw, 3))
    padded[:height, :width] = ycc
    padded[height:, :width] = ycc[height - 1 : height, :]  # edge replicate
    padded[:, width:] = padded[:, width - 1 : width]
    out = np.zeros((3, ph // 8, pw // 8, 64), np.int64)
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            for comp in range(3):
                block = padded[by : by + 8, bx : bx + 8, comp] - 128.0
                q = _quantize(_fdct(block))
                out[comp, by // 8, bx // 8] = q.reshape(64)[_ZIGZAG]
    return out


def _headers(
    width: int,
    height: int,
    sof_marker: int,
    samplings: tuple[int, int, int] = (0x11, 0x11, 0x11),
) -> list[bytes]:
    """SOI..DHT common header segments (SOF0 baseline / SOF2 progressive;
    the progressive variant writes the EOBn-capable AC tables)."""
    prog = sof_marker == 0xFFC2
    ac_bits = _AC_BITS_P if prog else _AC_BITS
    ac_syms = _AC_SYMBOLS_P if prog else _AC_SYMBOLS
    qzz = bytes(int(_QTABLE.reshape(64)[z]) for z in _ZIGZAG)
    return [
        b"\xff\xd8",  # SOI
        struct.pack(">HH", 0xFFE0, 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00",
        struct.pack(">HH", 0xFFDB, 2 + 65) + b"\x00" + qzz,  # DQT id 0
        struct.pack(">HH", 0xFFDB, 2 + 65) + b"\x01" + qzz,  # DQT id 1
        # SOF: 8-bit, 3 components
        struct.pack(">HHBHHB", sof_marker, 17, 8, height, width, 3)
        + bytes([1, samplings[0], 0, 2, samplings[1], 1, 3, samplings[2], 1]),
        _dht_segment(0, 0, _DC_BITS, _DC_SYMBOLS),
        _dht_segment(1, 0, ac_bits, ac_syms),
        _dht_segment(0, 1, _DC_BITS, _DC_SYMBOLS),
        _dht_segment(1, 1, ac_bits, ac_syms),
    ]


def _write_magnitude(w: _BitWriter, enc, sym: int, v: int, size: int) -> None:
    code, length = enc[sym]
    w.write(code, length)
    if size:
        w.write(v if v >= 0 else v + (1 << size) - 1, size)


def _encode_block_entropy(w: _BitWriter, zz, prev_dc: int) -> int:
    """One baseline block (DC diff + AC runs/EOB) → bitstream; returns
    the new DC predictor.  Shared verbatim by every baseline encoder
    flavor so their per-block bytes cannot drift."""
    diff = int(zz[0]) - prev_dc
    new_dc = int(zz[0])
    size = _size_cat(diff)
    _write_magnitude(w, _DC_ENC, size, diff, size)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            if k > last_nz:
                code, length = _AC_ENC[0x00]  # EOB
                w.write(code, length)
                break
            run += 1
            continue
        while run > 15:
            code, length = _AC_ENC[0xF0]  # ZRL
            w.write(code, length)
            run -= 16
        size = _size_cat(v)
        _write_magnitude(w, _AC_ENC, (run << 4) | size, v, size)
        run = 0
    return new_dc


def encode_jpeg(width: int, height: int, rgb: bytes) -> bytes:
    """Top-down RGB bytes → baseline 4:4:4 JFIF JPEG."""
    coefs = _quantize_image(width, height, rgb)
    _, bh, bw, _ = coefs.shape
    w = _BitWriter()
    prev_dc = [0, 0, 0]
    for by in range(bh):
        for bx in range(bw):
            for comp in range(3):
                prev_dc[comp] = _encode_block_entropy(
                    w, coefs[comp, by, bx], prev_dc[comp]
                )
    out = _headers(width, height, 0xFFC0)
    out += [
        # SOS: 3 components; luma uses tables (0,0), chroma (1,1)
        struct.pack(">HHB", 0xFFDA, 12, 3)
        + bytes([1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]),
        w.flush(),
        b"\xff\xd9",  # EOI
    ]
    return b"".join(out)


def _quantize_plane(plane: np.ndarray) -> np.ndarray:
    """(H, W) float plane with H, W multiples of 8 → quantized zigzag
    coefficients (H//8, W//8, 64)."""
    H, W = plane.shape
    out = np.zeros((H // 8, W // 8, 64), np.int64)
    for by in range(0, H, 8):
        for bx in range(0, W, 8):
            q = _quantize(_fdct(plane[by : by + 8, bx : bx + 8] - 128.0))
            out[by // 8, bx // 8] = q.reshape(64)[_ZIGZAG]
    return out


def encode_jpeg_420(width: int, height: int, rgb: bytes) -> bytes:
    """Top-down RGB bytes → baseline 4:2:0 JFIF JPEG (luma 2×2, chroma
    1×1; chroma downsampled by 2×2 box mean).  The common real-world
    photo flavor — exists chiefly so the decoder's subsampled MCU
    interleave + nearest-neighbor upsample path is round-trip-tested
    against content with known properties (flat regions survive the
    box-mean/replicate pair exactly)."""
    img = (
        np.frombuffer(rgb, np.uint8)
        .reshape(height, width, 3)
        .astype(np.float64)
    )
    ycc = _rgb_to_ycbcr(img)
    ph, pw = -(-height // 16) * 16, -(-width // 16) * 16
    padded = np.empty((ph, pw, 3))
    padded[:height, :width] = ycc
    padded[height:, :width] = ycc[height - 1 : height, :]  # edge replicate
    padded[:, width:] = padded[:, width - 1 : width]
    yb = _quantize_plane(padded[:, :, 0])
    csub = padded[:, :, 1:].reshape(ph // 2, 2, pw // 2, 2, 2).mean(axis=(1, 3))
    cbb = _quantize_plane(csub[:, :, 0])
    crb = _quantize_plane(csub[:, :, 1])

    w = _BitWriter()
    prev = [0, 0, 0]
    for my in range(ph // 16):
        for mx in range(pw // 16):
            for byy in range(2):  # luma 2×2 sub-blocks, raster order
                for bxx in range(2):
                    prev[0] = _encode_block_entropy(
                        w, yb[2 * my + byy, 2 * mx + bxx], prev[0]
                    )
            prev[1] = _encode_block_entropy(w, cbb[my, mx], prev[1])
            prev[2] = _encode_block_entropy(w, crb[my, mx], prev[2])

    out = _headers(width, height, 0xFFC0, samplings=(0x22, 0x11, 0x11))
    out += [
        struct.pack(">HHB", 0xFFDA, 12, 3)
        + bytes([1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]),
        w.flush(),
        b"\xff\xd9",  # EOI
    ]
    return b"".join(out)


def _sos_segment(comps: list[tuple[int, int]], ss: int, se: int, ah: int, al: int) -> bytes:
    """comps = [(component id, table-selector byte), ...]."""
    ns = len(comps)
    body = bytes([ns])
    for cid, tsel in comps:
        body += bytes([cid, tsel])
    body += bytes([ss, se, (ah << 4) | al])
    return struct.pack(">HH", 0xFFDA, 2 + len(body)) + body


class _EobState:
    """Cross-block EOB-run + buffered-correction-bit state for one
    progressive AC scan (the encoder mirror of the decoder's eobrun)."""

    def __init__(self, w: _BitWriter, enc) -> None:
        self.w = w
        self.enc = enc
        self.eobrun = 0
        self.pending: list[int] = []  # correction bits riding the EOB run

    def flush(self) -> None:
        if self.eobrun > 0:
            nbits = self.eobrun.bit_length() - 1
            code, length = self.enc[nbits << 4]
            self.w.write(code, length)
            if nbits:
                self.w.write(self.eobrun - (1 << nbits), nbits)
            self.eobrun = 0
        for b in self.pending:
            self.w.write(b, 1)
        self.pending = []


def _encode_ac_first(coefs_c, w: _BitWriter, enc, ss: int, se: int, al: int) -> None:
    """AC first pass (Ah=0): magnitudes point-transformed by |v| >> Al,
    EOB runs spanning blocks."""
    bh, bw = coefs_c.shape[0], coefs_c.shape[1]
    st = _EobState(w, enc)
    for by in range(bh):
        for bx in range(bw):
            zz = coefs_c[by, bx]
            run = 0
            for k in range(ss, se + 1):
                v = int(zz[k])
                mag = abs(v) >> al
                if mag == 0:
                    run += 1
                    continue
                st.flush()
                while run > 15:
                    code, length = enc[0xF0]  # ZRL
                    w.write(code, length)
                    run -= 16
                size = mag.bit_length()
                _write_magnitude(
                    w, enc, (run << 4) | size, mag if v >= 0 else -mag, size
                )
                run = 0
            if run > 0:
                st.eobrun += 1
                if st.eobrun == 0x7FFF:
                    st.flush()
    st.flush()


def _encode_ac_refine(coefs_c, w: _BitWriter, enc, ss: int, se: int, ah: int, al: int) -> None:
    """AC refinement (Ah=Al+1): newly-significant ±1-at-Al coefficients
    positioned by zero-HISTORY runs; correction bits for already-nonzero
    coefficients buffered and emitted after the covering symbol."""
    bh, bw = coefs_c.shape[0], coefs_c.shape[1]
    st = _EobState(w, enc)
    for by in range(bh):
        for bx in range(bw):
            zz = coefs_c[by, bx]
            mags = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
            eob = 0  # index past the last newly-significant coefficient
            for i, m in enumerate(mags):
                if m == 1 and (abs(int(zz[ss + i])) >> ah) == 0:
                    eob = i + 1
            run = 0
            br: list[int] = []
            for i, m in enumerate(mags):
                if m == 0:
                    run += 1
                    continue
                while run > 15 and i < eob:
                    st.flush()
                    code, length = enc[0xF0]  # ZRL
                    w.write(code, length)
                    run -= 16
                    for b in br:
                        w.write(b, 1)
                    br = []
                if (abs(int(zz[ss + i])) >> ah) != 0:
                    br.append(m & 1)  # history-nonzero: correction bit
                    continue
                # newly significant (m == 1 by construction)
                st.flush()
                code, length = enc[(run << 4) | 1]
                w.write(code, length)
                w.write(1 if int(zz[ss + i]) >= 0 else 0, 1)
                run = 0
                for b in br:
                    w.write(b, 1)
                br = []
            if run > 0 or br:
                st.eobrun += 1
                st.pending += br
                if st.eobrun == 0x7FFF:
                    st.flush()
    st.flush()


def encode_jpeg_progressive(width: int, height: int, rgb: bytes) -> bytes:
    """Top-down RGB bytes → progressive (SOF2) 4:4:4 JFIF JPEG carrying
    the SAME quantized coefficients as ``encode_jpeg``, emitted as a
    full scan script that exercises every progressive decode path:
    interleaved DC first at Al=1 → DC refinement, then per component an
    AC 1..63 first pass at Al=1 → AC refinement — so decoding must be
    bit-identical to decoding the baseline stream (test-pinned)."""
    coefs = _quantize_image(width, height, rgb)
    _, bh, bw, _ = coefs.shape
    out = _headers(width, height, 0xFFC2)

    # scan 1: DC first, all components interleaved, Al=1
    w = _BitWriter()
    prev = [0, 0, 0]
    for by in range(bh):
        for bx in range(bw):
            for comp in range(3):
                dc = int(coefs[comp, by, bx, 0]) >> 1  # arithmetic shift
                diff = dc - prev[comp]
                prev[comp] = dc
                size = _size_cat(diff)
                _write_magnitude(w, _DC_ENC, size, diff, size)
    out += [_sos_segment([(1, 0x00), (2, 0x00), (3, 0x00)], 0, 0, 0, 1), w.flush()]

    # scan 2: DC refinement, Ah=1 Al=0 — one raw bit per block
    w = _BitWriter()
    for by in range(bh):
        for bx in range(bw):
            for comp in range(3):
                w.write(int(coefs[comp, by, bx, 0]) & 1, 1)
    out += [_sos_segment([(1, 0x00), (2, 0x00), (3, 0x00)], 0, 0, 1, 0), w.flush()]

    # scans 3-5: per-component AC first pass (band 1..63, Al=1)
    for comp, cid in ((0, 1), (1, 2), (2, 3)):
        w = _BitWriter()
        _encode_ac_first(coefs[comp], w, _AC_ENC_P, 1, 63, 1)
        out += [_sos_segment([(cid, 0x00 if comp == 0 else 0x01)], 1, 63, 0, 1), w.flush()]

    # scans 6-8: per-component AC refinement (Ah=1, Al=0)
    for comp, cid in ((0, 1), (1, 2), (2, 3)):
        w = _BitWriter()
        _encode_ac_refine(coefs[comp], w, _AC_ENC_P, 1, 63, 1, 0)
        out += [_sos_segment([(cid, 0x00 if comp == 0 else 0x01)], 1, 63, 1, 0), w.flush()]

    out.append(b"\xff\xd9")  # EOI
    return b"".join(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def _build_decode_table(bits: list[int], symbols: list[int]) -> dict[tuple[int, int], int]:
    enc = _canonical_codes(bits, symbols)
    return {(length, code): sym for sym, (code, length) in enc.items()}


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _read_symbol(r: _BitReader, table: dict[tuple[int, int], int]) -> int | None:
    code = 0
    for length in range(1, 17):
        bit = r.read(1)
        if bit is None:
            return None
        code = (code << 1) | bit
        sym = table.get((length, code))
        if sym is not None:
            return sym
    return None


def _entropy_end(data: bytes, start: int) -> int | None:
    """Index of the first real marker after ``start`` (skipping stuffed
    0xFF00 pairs) — the end of one scan's entropy-coded segment."""
    i = start
    while True:
        j = data.find(b"\xff", i)
        if j < 0 or j + 1 >= len(data):
            return None
        if data[j + 1] == 0x00:
            i = j + 2
            continue
        return j


def _decode_block(zz, r, dct, act, prev_dc: int) -> int | None:
    """One baseline block (DC diff + full AC band) into ``zz``; returns
    the new DC predictor or None on error."""
    size = _read_symbol(r, dct)
    if size is None or size > 11:
        return None
    diff = 0
    if size:
        v = r.read(size)
        if v is None:
            return None
        diff = _extend(v, size)
    prev_dc += diff
    zz[0] = prev_dc
    k = 1
    while k < 64:
        sym = _read_symbol(r, act)
        if sym is None:
            return None
        if sym == 0x00:  # EOB
            break
        run, size = sym >> 4, sym & 0x0F
        if size == 0:
            if sym != 0xF0:
                return None
            k += 16  # ZRL
            continue
        k += run
        if k > 63:
            return None
        v = r.read(size)
        if v is None:
            return None
        zz[k] = _extend(v, size)
        k += 1
    return prev_dc


def _decode_baseline_scan(coefs, comps, scan, htables, r, mcuy, mcux) -> bool:
    """One full-band interleaved scan → per-component zigzag coefficient
    arrays, MCU order with per-component h×v sub-block rasters (T.81
    A.2.3) — 1×1 everywhere degenerates to the plain block raster."""
    prev_dc = [0] * len(coefs)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, dc_id, ac_id in scan:
                dct = htables.get((0, dc_id))
                act = htables.get((1, ac_id))
                if dct is None or act is None:
                    return False
                _, h, v, _ = comps[ci]
                for byy in range(v):
                    for bxx in range(h):
                        dc = _decode_block(
                            coefs[ci][my * v + byy, mx * h + bxx],
                            r, dct, act, prev_dc[ci],
                        )
                        if dc is None:
                            return False
                        prev_dc[ci] = dc
    return True


def _ac_first_block(block, r, act, ss, se, al, eobrun) -> int | None:
    """Progressive AC first-pass (Ah=0) for one block; returns the new
    EOB-run count (blocks this code already covers) or None on error."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        sym = _read_symbol(r, act)
        if sym is None:
            return None
        run, size = sym >> 4, sym & 0x0F
        if size == 0:
            if run == 15:
                k += 16  # ZRL
                continue
            eb = r.read(run) if run else 0
            if eb is None:
                return None
            return (1 << run) - 1 + eb  # EOBn: current block consumed
        k += run
        if k > se:
            return None
        v = r.read(size)
        if v is None:
            return None
        block[k] = _extend(v, size) << al
        k += 1
    return 0


def _refine_nonzero(block, r, k, al) -> bool:
    """Append one correction bit to an already-nonzero coefficient."""
    p1 = 1 << al
    bit = r.read(1)
    if bit is None:
        return False
    if bit and (int(block[k]) & p1) == 0:
        block[k] += p1 if block[k] >= 0 else -p1
    return True


def _ac_refine_block(block, r, act, ss, se, al, eobrun) -> int | None:
    """Progressive AC refinement (Ah>0) for one block; the T.81 G.1.2.3
    flow: new ±1-at-Al coefficients positioned by zero-HISTORY run
    lengths, correction bits interleaved on every nonzero-history
    position passed, EOB runs refining the band remainder."""
    p1 = 1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            sym = _read_symbol(r, act)
            if sym is None:
                return None
            run, size = sym >> 4, sym & 0x0F
            val = 0
            if size == 0:
                if run != 15:  # EOBn (ZRL handled by the advance loop)
                    eb = r.read(run) if run else 0
                    if eb is None:
                        return None
                    eobrun = (1 << run) + eb
                    break
            else:
                if size != 1:
                    return None  # refinement codes only ±1 new values
                bit = r.read(1)
                if bit is None:
                    return None
                val = p1 if bit else -p1
            while k <= se:
                if block[k] != 0:
                    if not _refine_nonzero(block, r, k, al):
                        return None
                else:
                    if run == 0:
                        break
                    run -= 1
                k += 1
            if val and k <= se:
                block[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            if block[k] != 0 and not _refine_nonzero(block, r, k, al):
                return None
            k += 1
        eobrun -= 1
    return eobrun


def _decode_progressive_scan(coefs, scan, ss, se, ah, al, htables, r, dc_pred) -> bool:
    # progressive support is 1×1-sampling only, so every component grid
    # has identical dims (checked by the caller)
    bh, bw, _ = coefs[0].shape
    if ss == 0:  # DC scan (first or refinement), interleaved
        if se != 0:
            return False
        for by in range(bh):
            for bx in range(bw):
                for ci, dc_id, _ in scan:
                    if ah == 0:
                        dct = htables.get((0, dc_id))
                        if dct is None:
                            return False
                        size = _read_symbol(r, dct)
                        if size is None or size > 11:
                            return False
                        diff = 0
                        if size:
                            v = r.read(size)
                            if v is None:
                                return False
                            diff = _extend(v, size)
                        dc_pred[ci] += diff
                        coefs[ci][by, bx, 0] = dc_pred[ci] << al
                    else:  # refinement: one raw bit per block
                        bit = r.read(1)
                        if bit is None:
                            return False
                        if bit:
                            coefs[ci][by, bx, 0] |= 1 << al
        return True
    # AC scan: exactly one component, band inside 1..63
    if len(scan) != 1 or ss > se or se > 63:
        return False
    ci, _, ac_id = scan[0]
    act = htables.get((1, ac_id))
    if act is None:
        return False
    eobrun = 0
    step = _ac_first_block if ah == 0 else _ac_refine_block
    for by in range(bh):
        for bx in range(bw):
            eobrun = step(coefs[ci][by, bx], r, act, ss, se, al, eobrun)
            if eobrun is None:
                return False
    return True


def decode_jpeg(data: bytes) -> tuple[int, int, bytes] | None:
    """Baseline (SOF0, sampling factors 1-2 per axis — 4:4:4, 4:2:0,
    4:2:2) or progressive (SOF2, 4:4:4) JPEG bytes → (width, height,
    top-down RGB) or None for any unsupported flavor (sampling factors
    above 2, subsampled progressive, arithmetic-coded,
    lossless/differential frames, restart intervals, non-8-bit).
    Chroma upsampling is nearest-neighbor replication (the exact inverse
    of encode_jpeg_420's box mean on flat content)."""
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        return None
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    width = height = None
    progressive = False
    comps: list[tuple[int, int, int, int]] = []  # (comp id, h, v, qtable id)
    # (scan comps, Ss, Se, Ah, Al, entropy bytes, Huffman-table SNAPSHOT)
    # per SOS — tables may be legally redefined between progressive scans
    # (libjpeg -optimize emits fresh DHTs reusing ids 0/1 per scan), so
    # each scan must decode with the table state in effect at ITS header,
    # not the final state.
    scans: list[tuple[list, int, int, int, int, bytes, dict]] = []
    # per-component quantization table, latched at the component's FIRST
    # scan (the libjpeg latch_quant_tables rule) — progressive dequant
    # happens once at EOI but must use the table in effect when the
    # component's coefficients started arriving
    latched_qt: dict[int, np.ndarray] = {}
    pos = 2
    saw_eoi = False
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            return None
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            saw_eoi = True
            break
        if pos + 4 > len(data):
            return None
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        seg = data[pos + 4 : pos + 2 + seglen]
        if len(seg) != seglen - 2:
            return None
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            sp = 0
            while sp < len(seg):
                prec, tid = seg[sp] >> 4, seg[sp] & 0x0F
                if prec != 0:
                    return None  # 16-bit tables: unsupported
                vals = np.frombuffer(seg[sp + 1 : sp + 65], np.uint8).astype(np.int64)
                if len(vals) != 64:
                    return None
                q = np.zeros(64, np.int64)
                q[_ZIGZAG] = vals
                qtables[tid] = q.reshape(8, 8)
                sp += 65
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            # malformed-but-self-consistent segment lengths must refuse,
            # not raise: a crafted short SOF would otherwise throw out of
            # the slice unpack and kill the task instead of stubbing
            if width is not None or len(seg) < 6 or seg[0] != 8:
                return None
            progressive = marker == 0xC2
            height, width = struct.unpack_from(">HH", seg, 1)
            ncomp = seg[5]
            if ncomp not in (1, 3) or len(seg) < 6 + 3 * ncomp:
                return None
            comps = []
            for c in range(ncomp):
                cid, sampling, qid = seg[6 + 3 * c : 9 + 3 * c]
                h, v = sampling >> 4, sampling & 0x0F
                if h not in (1, 2) or v not in (1, 2):
                    return None  # sampling factors above 2: unsupported
                comps.append((cid, h, v, qid))
            if ncomp == 1:
                # T.81 A.2: a single-component scan is NON-interleaved —
                # one data unit per MCU in plain block raster; the
                # declared sampling factors do not shape the scan.
                # Normalizing to 1×1 here makes the MCU loop degenerate
                # to exactly that raster (and keeps 2×2-declared
                # grayscale streams decoding unscrambled).
                cid, _, _, qid = comps[0]
                comps = [(cid, 1, 1, qid)]
        elif marker in (
            0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
            0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF,
        ):
            return None  # non-baseline/progressive SOF flavors
        elif marker == 0xC4:  # DHT (possibly several tables)
            sp = 0
            while sp + 17 <= len(seg):
                tc, th = seg[sp] >> 4, seg[sp] & 0x0F
                bits = list(seg[sp + 1 : sp + 17])
                n = sum(bits)
                symbols = list(seg[sp + 17 : sp + 17 + n])
                if len(symbols) != n:
                    return None
                htables[(tc, th)] = _build_decode_table(bits, symbols)
                sp += 17 + n
        elif marker == 0xDD:  # DRI restart interval
            return None  # unsupported (our encoder never emits it)
        elif marker == 0xDA:  # SOS
            if not seg:
                return None
            ns = seg[0]
            if width is None or ns < 1 or len(seg) < 1 + 2 * ns + 3:
                return None
            if not progressive and ns != len(comps):
                return None
            scan = []
            for c in range(ns):
                cid, tsel = seg[1 + 2 * c], seg[2 + 2 * c]
                idx = next(
                    (i for i, c4 in enumerate(comps) if c4[0] == cid), None
                )
                if idx is None:
                    return None
                scan.append((idx, tsel >> 4, tsel & 0x0F))
            band = seg[1 + 2 * ns : 4 + 2 * ns]
            entropy_start = pos + 2 + seglen
            end = _entropy_end(data, entropy_start)
            if end is None:
                return None
            for ci, _, _ in scan:
                if ci not in latched_qt and comps[ci][3] in qtables:
                    latched_qt[ci] = qtables[comps[ci][3]]
            scans.append(
                (scan, band[0], band[1], band[2] >> 4, band[2] & 0x0F,
                 data[entropy_start:end], dict(htables))
            )
            pos = end
            continue
        pos += 2 + seglen
    if not saw_eoi or width is None or not comps or not scans:
        return None

    ncomp = len(comps)
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    # per-component MCU-padded block grids (all equal when 1×1 everywhere)
    coefs = [
        np.zeros((mcuy * v, mcux * h, 64), np.int64) for _, h, v, _ in comps
    ]
    if not progressive:
        scan, ss, se, ah, al, ent, tabs = scans[0]
        if len(scans) != 1 or (ss, se, ah, al) != (0, 63, 0, 0):
            return None
        if not _decode_baseline_scan(
            coefs, comps, scan, tabs, _BitReader(ent), mcuy, mcux
        ):
            return None
    else:
        if hmax != 1 or vmax != 1:
            return None  # progressive support is 4:4:4 only
        dc_pred = [0] * ncomp
        for scan, ss, se, ah, al, ent, tabs in scans:
            if ss == 0 and ah == 0:
                for ci, _, _ in scan:
                    dc_pred[ci] = 0
            if not _decode_progressive_scan(
                coefs, scan, ss, se, ah, al, tabs, _BitReader(ent), dc_pred
            ):
                return None

    planes = np.zeros((mcuy * vmax * 8, mcux * hmax * 8, ncomp))
    for ci, (_, h, v, qid) in enumerate(comps):
        qt = latched_qt.get(ci)
        if qt is None:
            return None
        bh_c, bw_c = coefs[ci].shape[0], coefs[ci].shape[1]
        plane = np.zeros((bh_c * 8, bw_c * 8))
        for by in range(bh_c):
            for bx in range(bw_c):
                coef = np.zeros(64, np.int64)
                coef[_ZIGZAG] = coefs[ci][by, bx]
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _idct(coef.reshape(8, 8) * qt) + 128.0
                )
        # nearest-neighbor chroma upsample back to full resolution
        if v != vmax:
            plane = np.repeat(plane, vmax // v, axis=0)
        if h != hmax:
            plane = np.repeat(plane, hmax // h, axis=1)
        planes[:, :, ci] = plane[: planes.shape[0], : planes.shape[1]]
    planes = planes[:height, :width]
    if ncomp == 1:
        rgb = np.repeat(planes, 3, axis=-1)
    else:
        rgb = _ycbcr_to_rgb(planes)
    out = np.clip(np.floor(rgb + 0.5), 0, 255).astype(np.uint8)
    return width, height, out.tobytes()
