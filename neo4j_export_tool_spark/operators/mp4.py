"""ISO BMFF (MP4) container demux — REAL, stdlib-only.

The CPU side of a 100 TB video pipeline is container work: walk the box
tree, interpret the sample tables, slice coded sample payloads and
timestamps out of ``mdat``, and hand them to hardware decoders.  That
layer is pure struct unpacking and is implemented here for real:

- top-level / nested box traversal (32-bit, 64-bit ``largesize``, and
  size-0 run-to-end headers, every read bounds-checked → ``ValueError``)
- ``moov/trak/mdia/minf/stbl`` interpretation: ``stts`` (RLE expanded),
  ``ctts`` (composition offsets, version 0/1), ``stsc`` chunk-run rules,
  ``stsz`` (fixed or per-sample), ``stco``/``co64`` chunk offsets,
  ``stss`` sync table (absent ⇒ every sample is a keyframe, per spec)
- per-sample (offset, size, dts, pts, keyframe) and byte extraction

The H.264/H.265 bitstream *inside* each sample needs CABAC/CAVLC entropy
decoding and stays honestly stubbed (``multimodal.require_codec``), the
same policy as the PNG/JPEG vs MP4 split documented in
``operators/multimodal.py``.

``encode_mp4`` is a minimal spec-shaped writer used by tests and gates as
the independent forward path (the q48 playbook): it writes real
``ftyp``/``mdat``/``moov`` structure — including merged ``stts`` runs,
multi-chunk ``stsc``/``stco`` layouts, and an ``avcC`` decoder-config box —
so the parser is exercised against genuinely-shaped containers, not an
echo of its own assumptions.

Reference parity: the reference tool carries media URLs as opaque
properties only (``/root/reference/docs/Configuration.md``); this module is
part of the beyond-reference LLM-pipeline tier (multimodal frame-sample).

Scale shape: one payload = one parse (Arrow-batched ``mapInPandas``); the
parallel unit is the media row, identical to the PPM/PNG/JPEG/WAV lanes.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame

# ---------------------------------------------------------------------------
# box writer helpers
# ---------------------------------------------------------------------------


def _box(tag: bytes, payload: bytes) -> bytes:
    return struct.pack(">I4s", 8 + len(payload), tag) + payload


def _full(tag: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(tag, struct.pack(">B3s", version, flags.to_bytes(3, "big")) + payload)


_MATRIX = struct.pack(">9I", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)


def _rle(values: Sequence[int]) -> list[tuple[int, int]]:
    """Merge adjacent equal values into (count, value) runs (stts shape)."""
    runs: list[tuple[int, int]] = []
    for v in values:
        if runs and runs[-1][1] == v:
            runs[-1] = (runs[-1][0] + 1, v)
        else:
            runs.append((1, v))
    return runs


def _chunk_layout(n_samples: int, chunk_pattern: Sequence[int]) -> list[int]:
    """Samples-per-chunk list covering n_samples by cycling chunk_pattern."""
    if not chunk_pattern or any(c <= 0 for c in chunk_pattern):
        raise ValueError("chunk_pattern must be positive")
    out: list[int] = []
    i = 0
    left = n_samples
    while left > 0:
        take = min(chunk_pattern[i % len(chunk_pattern)], left)
        out.append(take)
        left -= take
        i += 1
    return out


def encode_mp4(
    samples: Sequence[bytes],
    deltas: Sequence[int],
    *,
    width: int,
    height: int,
    timescale: int = 90_000,
    keyframes: Sequence[int] | None = None,
    chunk_pattern: Sequence[int] = (1,),
    ctts_offsets: Sequence[int] | None = None,
    force_co64: bool = False,
) -> bytes:
    """Minimal valid single-video-track ISO BMFF container.

    ``samples``: coded sample payloads (opaque).  ``deltas``: per-sample
    decode durations in ``timescale`` ticks.  ``keyframes``: 0-based sync
    sample indices (None ⇒ omit ``stss`` ⇒ all sync).  ``chunk_pattern``
    cycles to group samples into chunks (exercises stsc/stco for real).
    """
    if len(samples) != len(deltas):
        raise ValueError("samples and deltas must align")
    n = len(samples)
    if n == 0:
        raise ValueError("at least one sample required")
    if ctts_offsets is not None and len(ctts_offsets) != n:
        raise ValueError("ctts_offsets must align with samples")

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2avc1mp41")
    mdat = _box(b"mdat", b"".join(samples))
    first_off = len(ftyp) + 8  # mdat body starts after its 8-byte header

    # chunk offsets: cumulative within mdat following the chunk layout
    per_chunk = _chunk_layout(n, chunk_pattern)
    offsets: list[int] = []
    pos = first_off
    s = 0
    for cnt in per_chunk:
        offsets.append(pos)
        for _ in range(cnt):
            pos += len(samples[s])
            s += 1

    dur_ticks = sum(deltas)
    movie_ts = 1000
    movie_dur = (dur_ticks * movie_ts) // timescale

    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, movie_ts, movie_dur)
        + struct.pack(">IHH", 0x00010000, 0x0100, 0)
        + b"\x00" * 8 + _MATRIX + b"\x00" * 24 + struct.pack(">I", 2),
    )
    tkhd = _full(
        b"tkhd", 0, 7,
        struct.pack(">IIIII", 0, 0, 1, 0, movie_dur)
        + b"\x00" * 8 + struct.pack(">HHHH", 0, 0, 0, 0) + _MATRIX
        + struct.pack(">II", width << 16, height << 16),
    )
    mdhd = _full(
        b"mdhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, dur_ticks)
        + struct.pack(">HH", 0x55C4, 0),  # language 'und'
    )
    hdlr = _full(
        b"hdlr", 0, 0,
        struct.pack(">I4s", 0, b"vide") + b"\x00" * 12 + b"VideoHandler\x00",
    )

    avcc = _box(b"avcC", bytes([1, 66, 0, 30, 0xFC | 3, 0xE0]) + b"\x00")
    avc1_body = (
        b"\x00" * 6 + struct.pack(">H", 1)          # data_reference_index
        + struct.pack(">HH", 0, 0) + b"\x00" * 12   # pre_defined/reserved
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + struct.pack(">I", 0) + struct.pack(">H", 1)  # frame_count
        + b"\x00" * 32                               # compressorname
        + struct.pack(">Hh", 0x0018, -1)
        + avcc
    )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + _box(b"avc1", avc1_body))

    stts_runs = _rle(list(deltas))
    stts = _full(
        b"stts", 0, 0,
        struct.pack(">I", len(stts_runs))
        + b"".join(struct.pack(">II", c, d) for c, d in stts_runs),
    )
    stsz = _full(
        b"stsz", 0, 0,
        struct.pack(">II", 0, n) + b"".join(struct.pack(">I", len(x)) for x in samples),
    )
    # stsc: one entry per change in samples-per-chunk (spec run encoding)
    stsc_entries: list[tuple[int, int]] = []
    for idx, cnt in enumerate(per_chunk, start=1):
        if not stsc_entries or stsc_entries[-1][1] != cnt:
            stsc_entries.append((idx, cnt))
    stsc = _full(
        b"stsc", 0, 0,
        struct.pack(">I", len(stsc_entries))
        + b"".join(struct.pack(">III", f, c, 1) for f, c in stsc_entries),
    )
    if force_co64:
        stco = _full(
            b"co64", 0, 0,
            struct.pack(">I", len(offsets))
            + b"".join(struct.pack(">Q", o) for o in offsets),
        )
    else:
        stco = _full(
            b"stco", 0, 0,
            struct.pack(">I", len(offsets))
            + b"".join(struct.pack(">I", o) for o in offsets),
        )
    stbl = stsd + stts
    if ctts_offsets is not None:
        ctts_runs = _rle(list(ctts_offsets))
        stbl += _full(
            b"ctts", 0, 0,
            struct.pack(">I", len(ctts_runs))
            + b"".join(struct.pack(">Ii", c, o) for c, o in ctts_runs),
        )
    if keyframes is not None:
        stbl += _full(
            b"stss", 0, 0,
            struct.pack(">I", len(keyframes))
            + b"".join(struct.pack(">I", k + 1) for k in sorted(keyframes)),
        )
    stbl += stsc + stsz + stco
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b""))
    minf = _box(
        b"minf",
        _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
        + _box(b"dinf", dref)
        + _box(b"stbl", stbl),
    )
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------


def _walk(buf: bytes, start: int, end: int) -> Iterator[tuple[bytes, int, int]]:
    """Yield (type, body_start, body_end) for each box in [start, end)."""
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise ValueError("truncated MP4 box header")
        size, typ = struct.unpack_from(">I4s", buf, pos)
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated MP4 largesize header")
            size = struct.unpack_from(">Q", buf, pos + 8)[0]
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError("truncated MP4 box body")
        yield typ, pos + hdr, pos + size
        pos += size


def _children(buf: bytes, start: int, end: int) -> dict[bytes, tuple[int, int]]:
    return {t: (a, b) for t, a, b in _walk(buf, start, end)}


def _fullbox(buf: bytes, start: int, end: int) -> tuple[int, int]:
    if start + 4 > end:
        raise ValueError("truncated MP4 full box")
    version = buf[start]
    return version, start + 4


def _read_table(buf: bytes, start: int, end: int, fmt: str) -> list[tuple]:
    """FullBox with a u32 entry-count then fixed-width entries."""
    _, p = _fullbox(buf, start, end)
    if p + 4 > end:
        raise ValueError("truncated MP4 table header")
    (count,) = struct.unpack_from(">I", buf, p)
    p += 4
    width = struct.calcsize(fmt)
    if p + count * width > end:
        raise ValueError("truncated MP4 table entries")
    return [struct.unpack_from(fmt, buf, p + i * width) for i in range(count)]


def parse_mp4(payload: bytes) -> dict:
    """Parse an ISO BMFF container → track metadata + per-sample table.

    Returns ``{"tracks": [...]}``, each track a dict with ``track_id``,
    ``handler``, ``codec``, ``timescale``, ``duration_ticks``,
    ``duration_ms``, ``width``, ``height`` (visual tracks), and
    ``samples``: a list of ``(offset, size, dts, pts, keyframe)``.
    """
    top = {}
    for t, a, b in _walk(payload, 0, len(payload)):
        top.setdefault(t, (a, b))
    if b"moov" not in top:
        raise ValueError("no moov box")
    tracks = []
    moov_a, moov_b = top[b"moov"]
    for t, a, b in _walk(payload, moov_a, moov_b):
        if t != b"trak":
            continue
        tracks.append(_parse_trak(payload, a, b))
    return {"tracks": tracks}


def _parse_trak(buf: bytes, start: int, end: int) -> dict:
    kids = _children(buf, start, end)
    if b"tkhd" not in kids or b"mdia" not in kids:
        raise ValueError("trak missing tkhd/mdia")
    ta, tb = kids[b"tkhd"]
    ver, p = _fullbox(buf, ta, tb)
    if ver == 1:
        if p + 20 > tb:
            raise ValueError("truncated tkhd")
        (track_id,) = struct.unpack_from(">I", buf, p + 16)
        p_after = p + 8 + 8 + 4 + 4 + 8
    else:
        if p + 12 > tb:
            raise ValueError("truncated tkhd")
        (track_id,) = struct.unpack_from(">I", buf, p + 8)
        p_after = p + 4 + 4 + 4 + 4 + 4
    # layer/alt/volume/reserved(16B? -> 2+2+2+2) + matrix(36) then w/h
    wh_at = p_after + 8 + 8 + 36
    if wh_at + 8 > tb:
        raise ValueError("truncated tkhd matrix")
    w_fp, h_fp = struct.unpack_from(">II", buf, wh_at)

    mkids = _children(buf, *kids[b"mdia"])
    if b"mdhd" not in mkids or b"minf" not in mkids:
        raise ValueError("mdia missing mdhd/minf")
    ma, mb = mkids[b"mdhd"]
    ver, p = _fullbox(buf, ma, mb)
    if ver == 1:
        if p + 28 > mb:
            raise ValueError("truncated mdhd")
        timescale, duration = struct.unpack_from(">IQ", buf, p + 16)
    else:
        if p + 16 > mb:
            raise ValueError("truncated mdhd")
        timescale, duration = struct.unpack_from(">II", buf, p + 8)
    handler = ""
    if b"hdlr" in mkids:
        ha, hb = mkids[b"hdlr"]
        _, p = _fullbox(buf, ha, hb)
        if p + 8 > hb:
            raise ValueError("truncated hdlr")
        handler = struct.unpack_from(">4s", buf, p + 4)[0].decode("ascii", "replace")

    minf_kids = _children(buf, *mkids[b"minf"])
    if b"stbl" not in minf_kids:
        raise ValueError("minf missing stbl")
    skids = _children(buf, *minf_kids[b"stbl"])

    codec = ""
    sd_w = sd_h = 0
    if b"stsd" in skids:
        sa, sb = skids[b"stsd"]
        _, p = _fullbox(buf, sa, sb)
        (n_desc,) = struct.unpack_from(">I", buf, p)
        if n_desc >= 1:
            esize, etag = struct.unpack_from(">I4s", buf, p + 4)
            codec = etag.decode("ascii", "replace")
            if handler == "vide" and p + 4 + 36 + 4 <= sb:
                # VisualSampleEntry: 8 hdr + 6 reserved + 2 dref +
                # 16 predefined/reserved, then u16 width, u16 height
                sd_w, sd_h = struct.unpack_from(">HH", buf, p + 4 + 8 + 6 + 2 + 16)

    if b"stts" not in skids or b"stsz" not in skids or b"stsc" not in skids:
        raise ValueError("stbl missing stts/stsz/stsc")
    stts = _read_table(buf, *skids[b"stts"], fmt=">II")

    za, zb = skids[b"stsz"]
    _, p = _fullbox(buf, za, zb)
    if p + 8 > zb:
        raise ValueError("truncated stsz")
    fixed, n_samples = struct.unpack_from(">II", buf, p)
    if fixed:
        sizes = [fixed] * n_samples
    else:
        if p + 8 + 4 * n_samples > zb:
            raise ValueError("truncated stsz entries")
        sizes = list(struct.unpack_from(f">{n_samples}I", buf, p + 8)) if n_samples else []

    stsc = _read_table(buf, *skids[b"stsc"], fmt=">III")
    if b"stco" in skids:
        chunk_offsets = [o for (o,) in _read_table(buf, *skids[b"stco"], fmt=">I")]
    elif b"co64" in skids:
        chunk_offsets = [o for (o,) in _read_table(buf, *skids[b"co64"], fmt=">Q")]
    else:
        raise ValueError("stbl missing stco/co64")

    sync: set[int] | None = None
    if b"stss" in skids:
        sync = {s - 1 for (s,) in _read_table(buf, *skids[b"stss"], fmt=">I")}

    ctts: list[int] | None = None
    if b"ctts" in skids:
        ctts = []
        for cnt, off in _read_table(buf, *skids[b"ctts"], fmt=">Ii"):
            ctts.extend([off] * cnt)
        if len(ctts) < n_samples:
            raise ValueError("ctts shorter than sample count")

    # dts from stts runs
    dts: list[int] = []
    t_acc = 0
    for cnt, delta in stts:
        for _ in range(cnt):
            if len(dts) >= n_samples:
                break
            dts.append(t_acc)
            t_acc += delta
    if len(dts) != n_samples:
        raise ValueError("stts does not cover all samples")

    # per-sample offsets via stsc chunk runs
    offsets: list[int] = [0] * n_samples
    s = 0
    n_chunks = len(chunk_offsets)
    for e_idx, (first, per_chunk, _desc) in enumerate(stsc):
        last = stsc[e_idx + 1][0] - 1 if e_idx + 1 < len(stsc) else n_chunks
        for c in range(first, last + 1):
            if c < 1 or c > n_chunks:  # chunk numbers are 1-based per spec
                raise ValueError("stsc refers outside stco")
            pos = chunk_offsets[c - 1]
            for _ in range(per_chunk):
                if s >= n_samples:
                    break
                offsets[s] = pos
                pos += sizes[s]
                s += 1
    if s != n_samples:
        raise ValueError("stsc/stco do not cover all samples")

    samples = [
        (
            offsets[i],
            sizes[i],
            dts[i],
            dts[i] + (ctts[i] if ctts else 0),
            (sync is None) or (i in sync),
        )
        for i in range(n_samples)
    ]
    return {
        "track_id": track_id,
        "handler": handler,
        "codec": codec,
        "timescale": timescale,
        "duration_ticks": duration,
        "duration_ms": (duration * 1000) // max(timescale, 1),
        "width": sd_w or (w_fp >> 16),
        "height": sd_h or (h_fp >> 16),
        "samples": samples,
    }


def demux_samples(payload: bytes, every_n: int = 1) -> list[dict]:
    """Extract every ``every_n``-th sample's bytes + timing per track."""
    if every_n < 1:
        raise ValueError("every_n must be >= 1")
    out = []
    for trk in parse_mp4(payload)["tracks"]:
        for i, (off, size, dts, pts, key) in enumerate(trk["samples"]):
            if i % every_n:
                continue
            if off + size > len(payload):
                raise ValueError("sample extends past payload")
            out.append(
                {
                    "track_id": trk["track_id"],
                    "sample_idx": i,
                    "dts": dts,
                    "pts": pts,
                    "keyframe": key,
                    "data": payload[off : off + size],
                }
            )
    return out


# ---------------------------------------------------------------------------
# Spark lane
# ---------------------------------------------------------------------------

VIDEO_SAMPLES_SCHEMA = (
    "media_id string, track_id long, sample_idx long, dts_ticks long, "
    "pts_ticks long, keyframe_flag long, n_bytes long, byte_sum long, "
    "width long, height long, duration_ms long, codec string"
)


def extract_video_samples(media: DataFrame, every_n: int = 1) -> DataFrame:
    """REAL MP4 container demux over opaque payloads: one row per
    (payload, track, sampled frame) with offsets resolved, bytes sliced
    out of mdat (surfaced as length + byte-sum so the gate's oracle can
    replay them in closed form; bit-level equality is pinned by
    tests/test_mp4.py), timestamps from stts/ctts, keyframes from stss.
    Arrow-batched; invalid containers are skipped (media hygiene lanes
    count them upstream)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, raw in zip(pdf["media_id"], pdf["payload"]):
                try:
                    payload = bytes(raw)
                    trks = parse_mp4(payload)["tracks"]
                except (ValueError, struct.error):
                    continue
                for trk in trks:
                    for i, (off, size, dts, pts, key) in enumerate(trk["samples"]):
                        if i % every_n:
                            continue
                        data = payload[off : off + size]
                        if len(data) != size:
                            continue
                        rows.append(
                            (
                                mid, trk["track_id"], i, dts, pts, int(key),
                                size, sum(data), trk["width"], trk["height"],
                                trk["duration_ms"], trk["codec"],
                            )
                        )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "track_id", "sample_idx", "dts_ticks",
                    "pts_ticks", "keyframe_flag", "n_bytes", "byte_sum",
                    "width", "height", "duration_ms", "codec",
                ],
            )

    return media.select("media_id", "payload").mapInPandas(
        run, schema=VIDEO_SAMPLES_SCHEMA
    )
