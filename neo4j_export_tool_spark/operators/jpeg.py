"""Baseline JFIF (JPEG) codec — stdlib + numpy only (round-6 de-stub).

The last PIL-class format expressible without external entropy-coder
libraries: baseline sequential JPEG is Huffman coding + an 8×8 DCT, both
implementable exactly in numpy/stdlib (unlike MP4's arithmetic/CABAC
coders, which stay honestly stubbed in `multimodal.require_codec`).

Reference parity: the reference tool treats media payloads as opaque
binary columns with typed metadata (`/root/reference/docs/
Improvements.md:156-162` media notes); this codec backs the REAL-decode
tier of `operators/multimodal.py` for ``image/jpeg`` payloads, next to
the PPM/PNG/WAV codecs.

Supported: baseline DCT (SOF0), 8-bit precision, grayscale (1
component) and YCbCr (3 components) with 4:4:4 or 4:2:0 chroma
sampling, restart intervals (DRI/RSTn), multi-segment DQT/DHT.
Rejected with ``ValueError``: progressive (SOF2) and every other SOF
variant, 12-bit precision, arithmetic coding, truncated payloads.

Determinism contract (what the closed-form q31 oracle leans on):

- Every float→int rounding in BOTH directions is ``floor(x + 0.5)``
  (half-up), then clamp to [0, 255] — mirrored verbatim in the DuckDB
  oracle SQL.
- Color transforms use the JFIF constants written in source-literal
  form (0.299/0.587/0.114; 1.402/0.344136/0.714136/1.772), evaluated
  left-to-right — the identical IEEE-double sequence any engine
  reproduces.
- The FDCT/IDCT are separable float64 matrix products.  For the
  solid-color blocks the gate uses, every AC term is exactly 0 and the
  DC path's relative error is ~1e-16, so the half-up rounding is
  categorically stable: decode(encode(solid)) reproduces the quantized
  closed form bit-for-bit at any quality, and at quality 100 (all
  quantizers 1) the YCbCr round trip is lossless.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Annex K tables (ITU-T T.81 K.1/K.3) — the "typical" tables every
# baseline encoder ships; the decoder never assumes them (it builds its
# tables from the DQT/DHT segments in the payload).
# ---------------------------------------------------------------------------

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

QUANT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]

QUANT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

# (bits-per-length[1..16], symbol list) — K.3.3.1/K.3.3.2
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))

AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _dct_matrix() -> np.ndarray:
    """Separable DCT-II basis: T[u, x] = 0.5·C(u)·cos((2x+1)uπ/16).
    FDCT: F = T·B·Tᵀ;  IDCT: B = Tᵀ·F·T."""
    T = np.zeros((8, 8))
    for u in range(8):
        c = (1.0 / np.sqrt(2.0)) if u == 0 else 1.0
        for x in range(8):
            T[u, x] = 0.5 * c * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return T


_DCT_T = _dct_matrix()


def _half_up(x: np.ndarray) -> np.ndarray:
    """floor(x + 0.5) — the codec-wide rounding rule (see module doc)."""
    return np.floor(x + 0.5)


def quality_scaled_quant(table: list[int], quality: int) -> list[int]:
    """libjpeg quality scaling: 50 → Annex K verbatim, 100 → all-ones
    (mathematically lossless for solid blocks)."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in [1, 100]")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return [min(255, max(1, (q * scale + 50) // 100)) for q in table]


# ---------------------------------------------------------------------------
# Huffman code construction (canonical, from (bits, vals))
# ---------------------------------------------------------------------------

def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_decode(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol."""
    return {
        (length, code): sym
        for sym, (code, length) in _build_codes(bits, vals).items()
    }


def _category(v: int) -> int:
    """JPEG magnitude category (bit length of |v|)."""
    return 0 if v == 0 else int(abs(v)).bit_length()


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    """(h, w, 3) uint8 → (h, w, 3) float64 YCbCr, rounded half-up and
    clamped — term order mirrors the oracle SQL exactly."""
    R = rgb[..., 0].astype(np.float64)
    G = rgb[..., 1].astype(np.float64)
    B = rgb[..., 2].astype(np.float64)
    y = 0.299 * R + 0.587 * G + 0.114 * B
    cb = 128.0 - 0.168735892 * R - 0.331264108 * G + 0.5 * B
    cr = 128.0 + 0.5 * R - 0.418687589 * G - 0.081312411 * B
    out = np.stack([y, cb, cr], axis=-1)
    return np.clip(_half_up(out), 0.0, 255.0)


def _encode_block(
    bw: _BitWriter,
    block: np.ndarray,
    quant: np.ndarray,
    pred: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
) -> int:
    """FDCT + quantize (half-away-from-zero, the standard rule) +
    entropy-code one 8×8 sample block.  Returns the new DC predictor."""
    F = _DCT_T @ (block - 128.0) @ _DCT_T.T
    q = np.sign(F) * np.floor(np.abs(F) / quant + 0.5)
    zz = [int(q.reshape(64)[ZIGZAG[i]]) for i in range(64)]
    # DC
    diff = zz[0] - pred
    cat = _category(diff)
    code, length = dc_codes[cat]
    bw.write(code, length)
    if cat:
        bw.write(diff if diff >= 0 else diff + (1 << cat) - 1, cat)
    # AC
    run = 0
    last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
    for i in range(1, last_nz + 1):
        if zz[i] == 0:
            run += 1
            continue
        while run >= 16:
            code, length = ac_codes[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        cat = _category(zz[i])
        code, length = ac_codes[(run << 4) | cat]
        bw.write(code, length)
        v = zz[i]
        bw.write(v if v >= 0 else v + (1 << cat) - 1, cat)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        bw.write(code, length)
    return zz[0]


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body


def encode_jpeg(
    width: int,
    height: int,
    rgb: bytes,
    quality: int = 75,
    subsampling: str = "444",
    grayscale: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Baseline JFIF encoder (independent forward path, the q48
    playbook's fixture generator).  ``rgb``: width*height*3 bytes (or
    width*height gray bytes when ``grayscale``).  ``restart_interval``
    > 0 emits a DRI segment and RSTn markers every that many MCUs (the
    decoder's restart path is round-trip tested through this)."""
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    nch = 1 if grayscale else 3
    if len(rgb) != width * height * nch:
        raise ValueError("pixel buffer does not match dimensions")
    if grayscale:
        planes = [np.frombuffer(rgb, np.uint8).reshape(height, width).astype(np.float64)]
    else:
        arr = np.frombuffer(rgb, np.uint8).reshape(height, width, 3)
        ycc = _rgb_to_ycbcr(arr)
        planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]

    ql = np.array(quality_scaled_quant(QUANT_LUMA, quality), dtype=np.float64).reshape(8, 8)
    qc = np.array(quality_scaled_quant(QUANT_CHROMA, quality), dtype=np.float64).reshape(8, 8)

    sub = subsampling if (not grayscale and subsampling == "420") else "444"
    if sub == "420" and not grayscale:
        # box-average chroma (half-up), edge-replicated to even dims
        def down(p: np.ndarray) -> np.ndarray:
            h, w = p.shape
            if h % 2:
                p = np.vstack([p, p[-1:]])
            if w % 2:
                p = np.hstack([p, p[:, -1:]])
            s = p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2]
            return np.clip(_half_up(s / 4.0), 0.0, 255.0)

        planes = [planes[0], down(planes[1]), down(planes[2])]
        samp = [(2, 2), (1, 1), (1, 1)]
    else:
        samp = [(1, 1)] * nch

    def pad_to(p: np.ndarray, bh: int, bw_: int) -> np.ndarray:
        h, w = p.shape
        return np.pad(p, ((0, bh - h), (0, bw_ - w)), mode="edge")

    hmax = max(h for h, _ in samp)
    vmax = max(v for _, v in samp)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (width + mcu_w - 1) // mcu_w
    mcus_y = (height + mcu_h - 1) // mcu_h
    padded = []
    for p, (hf, vf) in zip(planes, samp):
        padded.append(pad_to(p, mcus_y * vf * 8, mcus_x * hf * 8))

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    qt_l = bytes([0]) + bytes(int(ql.reshape(64)[ZIGZAG[i]]) for i in range(64))
    out += _seg(0xDB, qt_l)
    if nch == 3:
        qt_c = bytes([1]) + bytes(int(qc.reshape(64)[ZIGZAG[i]]) for i in range(64))
        out += _seg(0xDB, qt_c)
    sof = bytearray(struct.pack(">BHHB", 8, height, width, nch))
    for i in range(nch):
        hf, vf = samp[i]
        sof += bytes([i + 1, (hf << 4) | vf, 0 if i == 0 else 1])
    out += _seg(0xC0, bytes(sof))
    out += _seg(0xC4, bytes([0x00]) + bytes(DC_LUMA_BITS) + bytes(DC_LUMA_VALS))
    out += _seg(0xC4, bytes([0x10]) + bytes(AC_LUMA_BITS) + bytes(AC_LUMA_VALS))
    if nch == 3:
        out += _seg(0xC4, bytes([0x01]) + bytes(DC_CHROMA_BITS) + bytes(DC_CHROMA_VALS))
        out += _seg(0xC4, bytes([0x11]) + bytes(AC_CHROMA_BITS) + bytes(AC_CHROMA_VALS))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytearray([nch])
    for i in range(nch):
        sos += bytes([i + 1, 0x00 if i == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += _seg(0xDA, bytes(sos))

    dc_l = _build_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _build_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _build_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)
    tabs = [(ql, dc_l, ac_l)] + [(qc, dc_c, ac_c)] * (nch - 1)

    bw = _BitWriter()
    preds = [0] * nch
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if (
                restart_interval
                and mcu_count
                and mcu_count % restart_interval == 0
            ):
                bw.flush()
                out += bw.out
                out += bytes([0xFF, 0xD0 + (mcu_count // restart_interval - 1) % 8])
                bw = _BitWriter()
                preds = [0] * nch
            mcu_count += 1
            for ci in range(nch):
                hf, vf = samp[ci]
                quant, dcc, acc = tabs[ci]
                for by in range(vf):
                    for bx in range(hf):
                        y0 = (my * vf + by) * 8
                        x0 = (mx * hf + bx) * 8
                        block = padded[ci][y0 : y0 + 8, x0 : x0 + 8]
                        preds[ci] = _encode_block(
                            bw, block, quant, preds[ci], dcc, acc
                        )
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

class _BitReader:
    """Reads a de-stuffed entropy segment bit by bit (MSB first)."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy data")
            self.acc = self.data[self.pos]
            self.pos += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _read_symbol(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, cat: int) -> int:
    """Magnitude-category sign extension (T.81 F.2.2.1 EXTEND)."""
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def decode_jpeg(payload: bytes) -> tuple[int, int, int, bytes]:
    """Decode baseline JFIF → (width, height, n_channels, pixel bytes)
    (packed RGB for 3-component scans, gray bytes for 1-component).

    Raises ``ValueError`` on anything that is not a decodable baseline
    payload (the multimodal decode-failure convention)."""
    if len(payload) < 4 or payload[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    end = len(payload)
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None  # (height, width, [(cid, hf, vf, tq)])
    restart_interval = 0
    scan = None

    while pos + 2 <= end:
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker expected")
        # T.81 B.1.1.2: markers may be preceded by any number of 0xFF
        # fill bytes — skip to the final 0xFF of the run
        while pos + 2 <= end and payload[pos + 1] == 0xFF:
            pos += 1
        if pos + 2 > end:
            raise ValueError("truncated JPEG marker")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM / RSTn:
            pos += 2  # standalone, no length field
            continue
        if pos + 4 > end:
            raise ValueError("truncated JPEG segment header")
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        if pos + 2 + seglen > end:
            raise ValueError("truncated JPEG segment")
        body = payload[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            at = 0
            while at < len(body):
                pq, tq = body[at] >> 4, body[at] & 0x0F
                if pq != 0:
                    raise ValueError("only 8-bit quantization tables supported")
                if at + 65 > len(body):
                    raise ValueError("truncated DQT")
                tbl = np.zeros(64)
                for i in range(64):
                    tbl[ZIGZAG[i]] = body[at + 1 + i]
                quant[tq] = tbl.reshape(8, 8)
                at += 65
        elif marker == 0xC4:  # DHT (possibly several tables per segment)
            at = 0
            while at < len(body):
                tc, th = body[at] >> 4, body[at] & 0x0F
                bits = list(body[at + 1 : at + 17])
                n = sum(bits)
                vals = list(body[at + 17 : at + 17 + n])
                if len(vals) != n:
                    raise ValueError("truncated DHT")
                huff[(tc, th)] = _build_decode(bits, vals)
                at += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline (SOF0) JPEG supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = body[0]
            sel = []
            for i in range(ns):
                cs, tables = body[1 + 2 * i], body[2 + 2 * i]
                sel.append((cs, tables >> 4, tables & 0x0F))
            scan = (sel, pos)
            break
        # else: APPn/COM — skipped

    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF0/SOS")
    height, width, comps = frame
    sel, pos = scan
    if len(sel) != len(comps):
        raise ValueError("scan/frame component mismatch")

    # split the entropy stream into de-stuffed restart segments
    segments: list[bytes] = []
    cur = bytearray()
    while pos < end:
        b = payload[pos]
        if b != 0xFF:
            cur.append(b)
            pos += 1
            continue
        nxt = payload[pos + 1] if pos + 1 < end else None
        if nxt == 0x00:
            cur.append(0xFF)
            pos += 2
        elif nxt is not None and 0xD0 <= nxt <= 0xD7:  # RSTn
            segments.append(bytes(cur))
            cur = bytearray()
            pos += 2
        else:
            break  # next real marker (EOI) ends the scan
    segments.append(bytes(cur))

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = (width + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (height + 8 * vmax - 1) // (8 * vmax)

    by_id = {c[0]: c for c in comps}
    order = []
    for cs, td, ta in sel:
        if cs not in by_id:
            raise ValueError("scan references unknown component")
        cid, hf, vf, tq = by_id[cs]
        if (0, td) not in huff or (1, ta) not in huff or tq not in quant:
            raise ValueError("scan references missing Huffman/quant table")
        order.append((cid, hf, vf, quant[tq], huff[(0, td)], huff[(1, ta)]))

    planes = [
        np.zeros((mcus_y * vf * 8, mcus_x * hf * 8)) for _, hf, vf, *_ in order
    ]
    preds = [0] * len(order)
    seg_idx = 0
    br = _BitReader(segments[0])
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                seg_idx += 1
                if seg_idx >= len(segments):
                    raise ValueError("missing JPEG restart segment")
                br = _BitReader(segments[seg_idx])
                preds = [0] * len(order)
            mcu_count += 1
            for ci, (cid, hf, vf, q, dct, act) in enumerate(order):
                for byy in range(vf):
                    for bxx in range(hf):
                        # decode one block
                        cat = _read_symbol(br, dct)
                        diff = _extend(br.read_bits(cat), cat) if cat else 0
                        preds[ci] += diff
                        zz = np.zeros(64)
                        zz[0] = preds[ci]
                        kpos = 1
                        while kpos < 64:
                            sym = _read_symbol(br, act)
                            if sym == 0x00:  # EOB
                                break
                            run, scat = sym >> 4, sym & 0x0F
                            if scat == 0:
                                if run != 15:
                                    raise ValueError("invalid JPEG AC symbol")
                                kpos += 16  # ZRL
                                continue
                            kpos += run
                            if kpos > 63:
                                raise ValueError("JPEG AC index overflow")
                            zz[kpos] = _extend(br.read_bits(scat), scat)
                            kpos += 1
                        blk = np.zeros(64)
                        for i in range(64):
                            blk[ZIGZAG[i]] = zz[i]
                        F = blk.reshape(8, 8) * q
                        spatial = _DCT_T.T @ F @ _DCT_T + 128.0
                        y0 = (my * vf + byy) * 8
                        x0 = (mx * hf + bxx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = spatial

    out_planes = []
    for (cid, hf, vf, *_), p in zip(order, planes):
        # upsample to full resolution by nearest replication, then crop
        ry, rx = vmax // vf, hmax // hf
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out_planes.append(
            np.clip(_half_up(p[:height, :width]), 0.0, 255.0)
        )

    if len(out_planes) == 1:
        return width, height, 1, out_planes[0].astype(np.uint8).tobytes()
    Y, Cb, Cr = out_planes
    R = Y + 1.402 * (Cr - 128.0)
    G = Y - 0.344136 * (Cb - 128.0) - 0.714136 * (Cr - 128.0)
    B = Y + 1.772 * (Cb - 128.0)
    rgb = np.stack(
        [
            np.clip(_half_up(R), 0.0, 255.0),
            np.clip(_half_up(G), 0.0, 255.0),
            np.clip(_half_up(B), 0.0, 255.0),
        ],
        axis=-1,
    ).astype(np.uint8)
    return width, height, 3, rgb.tobytes()


def jpeg_to_rgb(payload: bytes) -> tuple[int, int, bytes]:
    """Decode a JPEG and normalize to packed RGB bytes (gray replicated)
    — the decode_ppm-compatible shape used by `extract_image_features`."""
    w, h, nch, px = decode_jpeg(payload)
    if nch == 3:
        return w, h, px
    a = np.frombuffer(px, np.uint8).reshape(h * w, 1)
    return w, h, np.repeat(a, 3, axis=1).tobytes()
