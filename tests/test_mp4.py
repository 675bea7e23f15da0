"""ISO BMFF (MP4) container demux tests (round-6 de-stub of the video
container tier; the entropy-coded bitstream inside samples stays stubbed).

Tiers:
- a HAND-ASSEMBLED container (boxes packed inline from the BMFF spec, not
  via encode_mp4) pins the parser against the standard;
- encode→parse round trips with varied per-sample bytes pin offsets,
  sizes, timing, and BYTE EQUALITY of extracted samples;
- structural variants cover stts RLE, multi-chunk stsc runs, co64,
  ctts composition offsets, stss-absent sync semantics, 64-bit box
  headers, and truncation error paths;
- a Spark-lane test pins extract_video_samples against demux_samples.
"""

from __future__ import annotations

import struct

import pytest

from neo4j_export_tool_spark.operators.mp4 import (
    demux_samples,
    encode_mp4,
    extract_video_samples,
    parse_mp4,
)


def _mk_samples(n: int, seed: int = 7) -> tuple[list[bytes], list[int]]:
    """Deterministic varied payloads + deltas (no two samples equal)."""
    samples = [
        bytes(((seed * 31 + i * 17 + j * 7) % 256) for j in range(20 + (seed + i * 13) % 40))
        for i in range(n)
    ]
    deltas = [3000 + 100 * ((seed + i) % 5) for i in range(n)]
    return samples, deltas


def test_round_trip_samples_bit_exact():
    samples, deltas = _mk_samples(9)
    payload = encode_mp4(
        samples, deltas, width=320, height=240, keyframes=[0, 3, 6],
        chunk_pattern=(2, 3),
    )
    trk = parse_mp4(payload)["tracks"][0]
    assert trk["handler"] == "vide"
    assert trk["codec"] == "avc1"
    assert (trk["width"], trk["height"]) == (320, 240)
    assert trk["timescale"] == 90_000
    assert trk["duration_ticks"] == sum(deltas)
    assert trk["duration_ms"] == (sum(deltas) * 1000) // 90_000

    got = demux_samples(payload)
    assert [g["data"] for g in got] == samples
    want_dts = [sum(deltas[:i]) for i in range(9)]
    assert [g["dts"] for g in got] == want_dts
    assert [g["pts"] for g in got] == want_dts  # no ctts
    assert [g["keyframe"] for g in got] == [i in (0, 3, 6) for i in range(9)]


def test_every_n_sampling():
    samples, deltas = _mk_samples(10)
    payload = encode_mp4(samples, deltas, width=64, height=64)
    got = demux_samples(payload, every_n=3)
    assert [g["sample_idx"] for g in got] == [0, 3, 6, 9]
    assert [g["data"] for g in got] == [samples[i] for i in (0, 3, 6, 9)]


def test_stts_rle_is_actually_merged_and_expanded():
    samples, _ = _mk_samples(6)
    deltas = [1000, 1000, 1000, 2000, 2000, 500]
    payload = encode_mp4(samples, deltas, width=16, height=16)
    at = payload.find(b"stts")
    (n_runs,) = struct.unpack_from(">I", payload, at + 8)
    assert n_runs == 3  # (3,1000)(2,2000)(1,500) — real RLE, not per-sample
    trk = parse_mp4(payload)["tracks"][0]
    assert [s[2] for s in trk["samples"]] == [0, 1000, 2000, 3000, 5000, 7000]


def test_multi_chunk_offsets_match_brute_force():
    samples, deltas = _mk_samples(11, seed=3)
    payload = encode_mp4(samples, deltas, width=8, height=8, chunk_pattern=(3, 1, 2))
    trk = parse_mp4(payload)["tracks"][0]
    # brute force: locate each unique sample by byte search
    for (off, size, _dts, _pts, _k), want in zip(trk["samples"], samples):
        assert payload[off : off + size] == want


def test_co64_and_largesize_box():
    samples, deltas = _mk_samples(4)
    payload = encode_mp4(samples, deltas, width=8, height=8, force_co64=True)
    assert b"co64" in payload and b"stco" not in payload
    assert [g["data"] for g in demux_samples(payload)] == samples

    # rewrite the trailing moov as a 64-bit-size box: parser must still
    # walk it (moov sits last, so absolute chunk offsets stay valid)
    at = payload.find(b"moov") - 4
    (size,) = struct.unpack_from(">I", payload, at)
    big = payload[:at] + struct.pack(">I4sQ", 1, b"moov", size + 8) + payload[at + 8 :]
    assert [g["data"] for g in demux_samples(big)] == samples


def test_ctts_composition_offsets_give_pts():
    samples, deltas = _mk_samples(5)
    ctts = [0, 2000, 0, 2000, 0]
    payload = encode_mp4(samples, deltas, width=8, height=8, ctts_offsets=ctts)
    got = demux_samples(payload)
    assert [g["pts"] - g["dts"] for g in got] == ctts


def test_missing_stss_means_all_sync():
    samples, deltas = _mk_samples(4)
    payload = encode_mp4(samples, deltas, width=8, height=8, keyframes=None)
    assert b"stss" not in payload
    assert all(g["keyframe"] for g in demux_samples(payload))


@pytest.mark.parametrize("cut", [3, 9, 40, -30, -3])
def test_truncation_raises_valueerror(cut):
    samples, deltas = _mk_samples(4)
    payload = encode_mp4(samples, deltas, width=8, height=8)
    broken = payload[:cut] if cut > 0 else payload[: len(payload) + cut]
    with pytest.raises(ValueError):
        parse_mp4(broken)


def test_no_moov_raises():
    with pytest.raises(ValueError, match="moov"):
        parse_mp4(struct.pack(">I4s", 16, b"mdat") + b"\x00" * 8)


def _full(tag: bytes, version: int, flags: int, body: bytes) -> bytes:
    payload = struct.pack(">B3s", version, flags.to_bytes(3, "big")) + body
    return struct.pack(">I4s", 8 + len(payload), tag) + payload


def _b(tag: bytes, body: bytes) -> bytes:
    return struct.pack(">I4s", 8 + len(body), tag) + body


def test_hand_assembled_container_parses_per_spec():
    """Independent forward path: every box packed inline from ISO 14496-12
    field tables (NOT via encode_mp4).  Two samples 'AAAA' + 'BBBBBB' in
    one chunk; timescale 600; deltas 600,300; sample 2 is the only sync;
    mdhd/tkhd use VERSION 1 (64-bit) headers, which encode_mp4 never
    emits, so agreement here cannot be writer-echo."""
    ftyp = _b(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom")
    mdat = _b(b"mdat", b"AAAA" + b"BBBBBB")
    first = len(ftyp) + 8

    matrix = struct.pack(">9I", 1 << 16, 0, 0, 0, 1 << 16, 0, 0, 0, 0x40000000)
    tkhd = _full(
        b"tkhd", 1, 7,
        struct.pack(">QQIIQ", 0, 0, 9, 0, 900)      # v1: 64-bit times, id 9
        + b"\x00" * 8 + struct.pack(">4H", 0, 0, 0, 0) + matrix
        + struct.pack(">II", 100 << 16, 50 << 16),
    )
    mdhd = _full(b"mdhd", 1, 0, struct.pack(">QQIQ", 0, 0, 600, 900)
                 + struct.pack(">HH", 0x55C4, 0))
    hdlr = _full(b"hdlr", 0, 0, struct.pack(">I4s", 0, b"vide") + b"\x00" * 13)
    stsd = _full(
        b"stsd", 0, 0,
        struct.pack(">I", 1)
        + _b(b"avc1",
             b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 16
             + struct.pack(">HH", 100, 50)
             + struct.pack(">II", 0x480000, 0x480000) + struct.pack(">I", 0)
             + struct.pack(">H", 1) + b"\x00" * 32 + struct.pack(">Hh", 24, -1)),
    )
    stts = _full(b"stts", 0, 0, struct.pack(">IIIII", 2, 1, 600, 1, 300))
    stss = _full(b"stss", 0, 0, struct.pack(">II", 1, 2))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, 2, 1))
    stsz = _full(b"stsz", 0, 0, struct.pack(">IIII", 0, 2, 4, 6))
    stco = _full(b"stco", 0, 0, struct.pack(">II", 1, first))
    stbl = _b(b"stbl", stsd + stts + stss + stsc + stsz + stco)
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b""))
    minf = _b(b"minf", _full(b"vmhd", 0, 1, b"\x00" * 8) + _b(b"dinf", dref) + stbl)
    trak = _b(b"trak", tkhd + _b(b"mdia", mdhd + hdlr + minf))
    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, 600, 900) + struct.pack(">IHH", 1 << 16, 0x100, 0)
        + b"\x00" * 8 + matrix + b"\x00" * 24 + struct.pack(">I", 10),
    )
    payload = ftyp + mdat + _b(b"moov", mvhd + trak)

    trk = parse_mp4(payload)["tracks"][0]
    assert trk["track_id"] == 9
    assert trk["timescale"] == 600
    assert trk["duration_ticks"] == 900
    assert trk["duration_ms"] == 1500
    assert (trk["width"], trk["height"]) == (100, 50)
    got = demux_samples(payload)
    assert [g["data"] for g in got] == [b"AAAA", b"BBBBBB"]
    assert [g["dts"] for g in got] == [0, 600]
    assert [g["keyframe"] for g in got] == [False, True]


def test_spark_lane_matches_local_demux(spark):
    import pandas as pd

    rows = []
    payloads = {}
    for d in range(12):
        n = d % 5 + 2
        samples, deltas = _mk_samples(n, seed=d)
        p = encode_mp4(
            samples, deltas, width=16 * (d + 1), height=8 * (d + 1),
            keyframes=[i for i in range(n) if i % 3 == 0], chunk_pattern=(2, 3),
        )
        payloads[str(d)] = p
        rows.append((str(d), p))
    media = spark.createDataFrame(rows, "media_id string, payload binary")
    got = {
        (r.media_id, r.sample_idx): r
        for r in extract_video_samples(media, every_n=2).collect()
    }
    n_expected = 0
    for mid, p in payloads.items():
        for s in demux_samples(p, every_n=2):
            n_expected += 1
            r = got[(mid, s["sample_idx"])]
            assert r.dts_ticks == s["dts"]
            assert r.pts_ticks == s["pts"]
            assert r.keyframe_flag == int(s["keyframe"])
            assert r.n_bytes == len(s["data"])
            assert r.byte_sum == sum(s["data"])
            assert r.codec == "avc1"
    assert len(got) == n_expected


def test_invalid_payloads_are_skipped_not_fatal(spark):
    samples, deltas = _mk_samples(3)
    good = encode_mp4(samples, deltas, width=8, height=8)
    media = spark.createDataFrame(
        [("ok", good), ("junk", b"\x00\x01\x02"), ("trunc", good[:20])],
        "media_id string, payload binary",
    )
    out = extract_video_samples(media).collect()
    assert {r.media_id for r in out} == {"ok"}
    assert len(out) == 3


def _mini_payload(include_stbl: bool = True, stsc_first: int = 1) -> bytes:
    """Minimal container for malformed-structure regression tests: one
    sample 'AAAA' in one chunk, optionally omitting stbl or corrupting
    stsc's (1-based) first_chunk."""
    ftyp = _b(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom")
    mdat = _b(b"mdat", b"AAAA")
    first = len(ftyp) + 8
    mdhd = _full(b"mdhd", 0, 0, struct.pack(">IIII", 0, 0, 600, 600)
                 + struct.pack(">HH", 0x55C4, 0))
    hdlr = _full(b"hdlr", 0, 0, struct.pack(">I4s", 0, b"vide") + b"\x00" * 13)
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, 1, 600))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", stsc_first, 1, 1, 1))
    stsz = _full(b"stsz", 0, 0, struct.pack(">III", 0, 1, 4))
    stco = _full(b"stco", 0, 0, struct.pack(">II", 1, first))
    stbl = _b(b"stbl", stts + stsc + stsz + stco)
    minf = _b(b"minf", _full(b"vmhd", 0, 1, b"\x00" * 8)
              + (stbl if include_stbl else b""))
    matrix = struct.pack(">9I", 1 << 16, 0, 0, 0, 1 << 16, 0, 0, 0, 0x40000000)
    tkhd = _full(
        b"tkhd", 0, 7,
        struct.pack(">IIIII", 0, 0, 1, 0, 600) + b"\x00" * 8
        + struct.pack(">4H", 0, 0, 0, 0) + matrix
        + struct.pack(">II", 8 << 16, 8 << 16),
    )
    trak = _b(b"trak", tkhd + _b(b"mdia", mdhd + hdlr + minf))
    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, 600, 600)
        + struct.pack(">IHH", 1 << 16, 0x100, 0) + b"\x00" * 8
        + struct.pack(">9I", 1 << 16, 0, 0, 0, 1 << 16, 0, 0, 0, 0x40000000)
        + b"\x00" * 24 + struct.pack(">I", 2),
    )
    return ftyp + mdat + _b(b"moov", mvhd + trak)


def test_missing_stbl_raises_valueerror_not_keyerror():
    # the documented skip-invalid contract catches ValueError — a KeyError
    # here would crash the whole Spark lane on one malformed container
    assert demux_samples(_mini_payload())[0]["data"] == b"AAAA"  # sane base
    with pytest.raises(ValueError, match="stbl"):
        parse_mp4(_mini_payload(include_stbl=False))


def test_stsc_first_chunk_zero_raises():
    with pytest.raises(ValueError, match="stsc"):
        demux_samples(_mini_payload(stsc_first=0))
