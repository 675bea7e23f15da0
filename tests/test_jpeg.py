"""Baseline JPEG codec tests (round-6 de-stub, the q48 playbook).

Tiers:
- a HAND-ASSEMBLED spec fixture (entropy bits derived from T.81 by hand,
  not by the encoder) pins the decoder against the standard;
- closed-form solid-block round trips pin the exact arithmetic the q31
  oracle replays;
- structural round trips (4:2:0, restart markers, odd dims, gray) and
  error paths cover the rest of the surface.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pytest

from neo4j_export_tool_spark.operators.jpeg import (
    AC_LUMA_BITS,
    AC_LUMA_VALS,
    DC_LUMA_BITS,
    DC_LUMA_VALS,
    QUANT_LUMA,
    ZIGZAG,
    decode_jpeg,
    encode_jpeg,
    jpeg_to_rgb,
    quality_scaled_quant,
)


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body


def test_hand_assembled_fixture_decodes_per_spec():
    """8×8 gray, every pixel 136: s=8 → F(0,0)=64 → Dq=round(64/16)=4.
    Entropy bits derived BY HAND from T.81: DC category 3 code '100'
    (canonical DC-luma table), value bits '100' (=4), AC EOB '1010' —
    10 bits → 0x92, 0xBF (1-padded).  A decoder bug in Huffman table
    construction, EXTEND, dequantization, or the IDCT DC path cannot
    pass this, no matter what the encoder does."""
    fix = bytearray(b"\xff\xd8")
    fix += _seg(
        0xDB,
        bytes([0]) + bytes(QUANT_LUMA[ZIGZAG[i]] for i in range(64)),
    )
    fix += _seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    fix += _seg(0xC4, bytes([0x00]) + bytes(DC_LUMA_BITS) + bytes(DC_LUMA_VALS))
    fix += _seg(0xC4, bytes([0x10]) + bytes(AC_LUMA_BITS) + bytes(AC_LUMA_VALS))
    fix += _seg(0xDA, bytes([1, 1, 0x00]) + b"\x00\x3f\x00")
    fix += bytes([0x92, 0xBF])
    fix += b"\xff\xd9"

    w, h, nch, px = decode_jpeg(bytes(fix))
    assert (w, h, nch) == (8, 8, 1)
    assert px == bytes([136] * 64)


def test_solid_gray_closed_form_all_values():
    """EVEN gray levels round-trip to the closed form
    clamp(floor(round_away(8s/Q00)·Q00/8 + 128 + 0.5)) at quality 50
    (Q00 = 16), uniformly across the block.  Even s keeps 8s/16 = s/2 an
    integer, away from the .5 boundary where the float FDCT's ~1e-13
    error decides the round — the same reason the q31 oracle's planted
    JPEG rows use quality 100 (all quantizers 1, no half cases at all).
    Odd levels are float-boundary cases: still deterministic and
    uniform, pinned to ±2 of the closed form."""
    for v in range(0, 256, 2):
        p = encode_jpeg(8, 8, bytes([v] * 64), quality=50, grayscale=True)
        _, _, nch, px = decode_jpeg(p)
        assert nch == 1
        s = v - 128
        dq = int(np.sign(s) * np.floor(abs(8 * s) / 16 + 0.5))
        exp = max(0, min(255, int(np.floor(dq * 16 / 8 + 128 + 0.5))))
        assert set(px) == {exp}, (v, exp, px[0])
    for v in range(1, 256, 16):
        _, _, _, px = decode_jpeg(
            encode_jpeg(8, 8, bytes([v] * 64), quality=50, grayscale=True)
        )
        assert len(set(px)) == 1 and abs(px[0] - v) <= 2


def test_solid_color_quality100_matches_ycbcr_closed_form():
    """At quality 100 every quantizer is 1, so solid blocks reproduce the
    integer YCbCr round trip exactly — the arithmetic the q31 oracle
    replays in SQL (same constants, same floor(x+0.5), same order)."""
    for r, g, b in [(37, 201, 90), (0, 0, 255), (255, 1, 2), (13, 13, 13)]:
        p = encode_jpeg(8, 8, bytes([r, g, b]) * 64, quality=100)
        _, _, nch, px = decode_jpeg(p)
        assert nch == 3
        Y = np.floor(0.299 * r + 0.587 * g + 0.114 * b + 0.5)
        Cb = min(255.0, np.floor(128 - 0.168735892 * r - 0.331264108 * g + 0.5 * b + 0.5))
        Cr = min(255.0, np.floor(128 + 0.5 * r - 0.418687589 * g - 0.081312411 * b + 0.5))
        R = np.clip(np.floor(Y + 1.402 * (Cr - 128) + 0.5), 0, 255)
        G = np.clip(np.floor(Y - 0.344136 * (Cb - 128) - 0.714136 * (Cr - 128) + 0.5), 0, 255)
        B = np.clip(np.floor(Y + 1.772 * (Cb - 128) + 0.5), 0, 255)
        dec = np.frombuffer(px, np.uint8).reshape(64, 3)
        assert (dec == [int(R), int(G), int(B)]).all()


def test_quality_scaling_endpoints():
    assert quality_scaled_quant(QUANT_LUMA, 50) == QUANT_LUMA
    assert quality_scaled_quant(QUANT_LUMA, 100) == [1] * 64
    assert all(q >= 2 * k for q, k in zip(
        quality_scaled_quant(QUANT_LUMA, 25), QUANT_LUMA))
    with pytest.raises(ValueError):
        quality_scaled_quant(QUANT_LUMA, 0)


def test_textured_roundtrip_error_bounds():
    """Lossy but sane: high-quality 4:4:4 keeps mean abs error small on
    noise and a smooth gradient decodes near-exactly."""
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (16, 24, 3)).astype(np.uint8)
    dec = np.frombuffer(
        decode_jpeg(encode_jpeg(24, 16, img.tobytes(), quality=90))[3],
        np.uint8,
    ).reshape(16, 24, 3)
    assert np.abs(dec.astype(int) - img.astype(int)).mean() < 12

    gy, gx = np.mgrid[0:16, 0:16]
    grad = np.stack([gy * 8, gx * 8, (gy + gx) * 4], axis=-1).astype(np.uint8)
    dec_g = np.frombuffer(
        decode_jpeg(encode_jpeg(16, 16, grad.tobytes(), quality=95))[3],
        np.uint8,
    ).reshape(16, 16, 3)
    assert np.abs(dec_g.astype(int) - grad.astype(int)).mean() < 2


def test_420_subsampling_and_odd_dimensions():
    # solid color through 4:2:0 at q100 == the 4:4:4 closed form
    p = encode_jpeg(16, 16, bytes([37, 201, 90]) * 256, quality=100,
                    subsampling="420")
    w, h, _, px = decode_jpeg(p)
    dec = np.frombuffer(px, np.uint8).reshape(16, 16, 3)
    assert len(np.unique(dec.reshape(-1, 3), axis=0)) == 1
    assert (w, h) == (16, 16)
    # odd dims survive pad/crop in both modes
    for sub in ("444", "420"):
        img = (np.arange(19 * 21 * 3) % 251).astype(np.uint8)
        w, h, _, px = decode_jpeg(
            encode_jpeg(21, 19, img.tobytes(), quality=90, subsampling=sub)
        )
        assert (w, h) == (21, 19) and len(px) == 21 * 19 * 3


def test_restart_markers_do_not_change_output():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (24, 24, 3)).astype(np.uint8)
    no_rst = decode_jpeg(encode_jpeg(24, 24, img.tobytes(), quality=90))
    with_rst = decode_jpeg(
        encode_jpeg(24, 24, img.tobytes(), quality=90, restart_interval=1)
    )
    assert no_rst == with_rst


def test_error_paths():
    good = encode_jpeg(8, 8, bytes(range(64)), quality=75, grayscale=True)
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01")  # not a JPEG
    with pytest.raises(ValueError):
        decode_jpeg(good[:20])  # truncated inside a segment
    with pytest.raises(ValueError):
        decode_jpeg(good[:-10])  # truncated entropy data / missing blocks
    # progressive (SOF2) is rejected, not mis-decoded
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError):
        decode_jpeg(prog)
    with pytest.raises(ValueError):
        encode_jpeg(4, 4, b"\x00" * 7, grayscale=True)  # bad buffer size
    with pytest.raises(ValueError):
        encode_jpeg(4, 4, b"\x00" * 48, subsampling="422")


def test_golden_payload_and_decode_pinned():
    """Deterministic encoder bytes + decoded pixels pinned — any codec
    regression flips a hash."""
    img = bytes((i * 7 + 13) % 251 for i in range(12 * 10 * 3))
    p = encode_jpeg(12, 10, img, quality=80)
    w, h, nch, px = decode_jpeg(p)
    assert (w, h, nch) == (12, 10, 3)
    assert hashlib.sha256(p).hexdigest() == GOLDEN_PAYLOAD_SHA
    assert hashlib.sha256(px).hexdigest() == GOLDEN_PIXELS_SHA


def test_jpeg_to_rgb_gray_replication():
    p = encode_jpeg(8, 8, bytes([136] * 64), quality=50, grayscale=True)
    w, h, rgb = jpeg_to_rgb(p)
    assert (w, h) == (8, 8)
    assert rgb == bytes([136, 136, 136] * 64)


def test_feature_extraction_and_resize_integration(spark):
    """JPEG payloads flow through the Arrow-batched sniffing codec next
    to PPM/PNG: features decode, resize stays JPEG."""
    from pyspark.sql import functions as F

    from neo4j_export_tool_spark.operators.multimodal import (
        decode_image_payload,
        extract_image_features,
        resize_image_payload,
    )

    rows = []
    for d in range(12):
        r, g, b = d % 251, (d * 7) % 251, (d * 13) % 251
        rows.append((str(d), encode_jpeg(8, 8, bytes([r, g, b]) * 64, quality=100)))
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    got = {
        r["media_id"]: (r["width"], r["height"], r["mean_r"], r["mean_g"], r["mean_b"])
        for r in extract_image_features(df).collect()
    }
    for d in range(12):
        r, g, b = d % 251, (d * 7) % 251, (d * 13) % 251
        Y = np.floor(0.299 * r + 0.587 * g + 0.114 * b + 0.5)
        Cb = min(255.0, np.floor(128 - 0.168735892 * r - 0.331264108 * g + 0.5 * b + 0.5))
        Cr = min(255.0, np.floor(128 + 0.5 * r - 0.418687589 * g - 0.081312411 * b + 0.5))
        R = int(np.clip(np.floor(Y + 1.402 * (Cr - 128) + 0.5), 0, 255))
        G = int(np.clip(np.floor(Y - 0.344136 * (Cb - 128) - 0.714136 * (Cr - 128) + 0.5), 0, 255))
        B = int(np.clip(np.floor(Y + 1.772 * (Cb - 128) + 0.5), 0, 255))
        assert got[str(d)] == (8, 8, R, G, B)

    # resize keeps the container
    resized = resize_image_payload(rows[3][1], 4, 4)
    w, h, rgb, fmt = decode_image_payload(resized)
    assert (w, h, fmt) == (4, 4, "jpeg")


# computed once from the deterministic encoder (pinned regression values)
GOLDEN_PAYLOAD_SHA = (
    "e6f4c3c1cf966a8a4756909ed5b3e64b9c797abeccd457edcf9f6b0d5b86a870"
)
GOLDEN_PIXELS_SHA = (
    "916395746f9a250c15fceb7069a8ec136b3050bafabae48a7c8c5db66a78436d"
)


def test_fill_bytes_and_standalone_markers_are_tolerated():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker,
    and TEM (0xFF01) is a standalone marker with no length field — both
    legal in foreign encoders' output."""
    p = encode_jpeg(8, 8, bytes([120] * 64), quality=50, grayscale=True)
    base = decode_jpeg(p)
    # inject two fill bytes + a TEM marker right after SOI (before DQT)
    padded = p[:2] + b"\xff\xff" + b"\xff\x01" + p[2:]
    assert decode_jpeg(padded) == base
