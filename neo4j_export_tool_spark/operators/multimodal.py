"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` UDFs.

Two codec tiers:

- REAL stdlib decoders for simple formats: binary PPM (P6) images —
  parse / mean-RGB / nearest-neighbor resize — and RIFF WAV audio (stdlib
  ``wave``) — sample rate / channels / duration / every-Nth frame
  sampling.  These exercise the full decode→feature→re-encode dataflow
  end-to-end with zero external dependencies.
- PIL/ffmpeg/librosa-class formats (JPEG/MP4/…) are NOT decodable in this
  container — that step is STUBBED behind ``require_codec``
  (clearly-marked NotImplementedError); the Spark-side plumbing is the
  same as the real tiers.

Scale notes: binary batches are large — ``spark.sql.execution.arrow.
maxRecordsPerBatch`` bounds Arrow batch memory, and media tables should be
written with small ``maxPartitionBytes`` so a task holds O(100 MB) of
payload, not O(1 GB).
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "media_id string, kind string, payload binary, "
    "meta struct<content_type:string, n_bytes:long, source_url:string>"
)

FEATURES_SCHEMA = (
    "media_id string, n_bytes long, payload_sha256 string, "
    "fake_width int, fake_height int"
)

_CODEC_AVAILABLE = False  # no image/audio libs in this container


def require_codec(name: str) -> None:
    """STUB: the real decoder dependency is unavailable here by design."""
    if not _CODEC_AVAILABLE:
        raise NotImplementedError(
            f"media codec '{name}' not available in this environment; "
            "install PIL/ffmpeg and set multimodal._CODEC_AVAILABLE"
        )


def decode_image(payload: bytes):  # pragma: no cover - stub
    require_codec("image")


def fake_decode_meta(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for image dimensions (tests the plumbing,
    not pixels): derived from payload length."""
    n = len(payload)
    return (n % 640) + 1, (n % 480) + 1


# ---------------------------------------------------------------------------
# REAL stdlib codecs: binary PPM (P6) images, RIFF WAV audio
# ---------------------------------------------------------------------------

def encode_ppm(width: int, height: int, pixels: bytes) -> bytes:
    """Binary PPM (P6, maxval 255).  ``pixels``: width*height*3 RGB bytes."""
    if len(pixels) != width * height * 3:
        raise ValueError("pixel buffer does not match dimensions")
    return b"P6\n%d %d\n255\n" % (width, height) + pixels


def decode_ppm(payload: bytes) -> tuple[int, int, bytes]:
    """Parse a binary PPM (P6) → (width, height, rgb_bytes)."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload")
    # header: magic, width, height, maxval — whitespace-separated, then one
    # whitespace byte before pixel data (comments unsupported: synthetic).
    # Every scan is bounded: a truncated header must raise, not spin.
    parts: list[int] = []
    i, end = 2, len(payload)
    while len(parts) < 3:
        while i < end and payload[i : i + 1].isspace():
            i += 1
        j = i
        while j < end and not payload[j : j + 1].isspace():
            j += 1
        if i == j or j >= end:
            raise ValueError("truncated PPM header")
        parts.append(int(payload[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    width, height, maxval = parts
    if maxval != 255:
        raise ValueError("only maxval 255 supported")
    pixels = payload[i : i + width * height * 3]
    if len(pixels) != width * height * 3:
        raise ValueError("truncated pixel data")
    return width, height, pixels


def ppm_mean_rgb(payload: bytes) -> tuple[int, int, int]:
    """Integer mean per channel (floor) — exact, engine-portable.
    C-speed byte-slice sums, not a per-pixel Python loop."""
    w, h, px = decode_ppm(payload)
    n = w * h
    return sum(px[0::3]) // n, sum(px[1::3]) // n, sum(px[2::3]) // n


def resize_ppm(payload: bytes, new_w: int, new_h: int) -> bytes:
    """Nearest-neighbor resize → a valid P6 payload."""
    w, h, px = decode_ppm(payload)
    out = bytearray()
    for y in range(new_h):
        sy = y * h // new_h
        row = sy * w * 3
        for x in range(new_w):
            sx = x * w // new_w
            o = row + sx * 3
            out += px[o : o + 3]
    return encode_ppm(new_w, new_h, bytes(out))


def encode_wav(
    samples: list[int], sample_rate: int = 8000, n_channels: int = 1
) -> bytes:
    """16-bit PCM RIFF WAV from integer samples (stdlib ``wave``)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        # one C-level pack for the whole buffer, not a per-sample loop
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[int, int, int, int]:
    """(sample_rate, n_channels, n_frames, duration_ms) via stdlib wave."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        rate, channels, frames = w.getframerate(), w.getnchannels(), w.getnframes()
    return rate, channels, frames, (frames * 1000) // max(rate, 1)


def sample_wav_frames(payload: bytes, every_n: int) -> list[int]:
    """Every-Nth 16-bit sample of channel 0 — the frame-sampling analog."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        channels = w.getnchannels()
        raw = w.readframes(w.getnframes())
    # decode channel 0 only, every_n frames apart, straight from offsets —
    # no full-buffer Python unpack
    step = 2 * channels * every_n
    return [
        struct.unpack_from("<h", raw, i)[0] for i in range(0, len(raw), step)
    ]


IMAGE_FEATURES_SCHEMA = (
    "media_id string, width int, height int, mean_r int, mean_g int, mean_b int"
)


def extract_image_features(media: DataFrame) -> DataFrame:
    """REAL decode for P6 PPM payloads: dimensions + integer mean RGB.
    Non-PPM payloads yield nulls (decode failure is data, not a crash)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    raw = bytes(payload)
                    w, h, _ = decode_ppm(raw)
                    r, g, b = ppm_mean_rgb(raw)
                    rows.append((mid, w, h, r, g, b))
                except Exception:
                    rows.append((mid, None, None, None, None, None))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "mean_r", "mean_g", "mean_b"],
            )

    return media.select("media_id", "payload").mapInPandas(
        run, schema=IMAGE_FEATURES_SCHEMA
    )


AUDIO_FEATURES_SCHEMA = (
    "media_id string, sample_rate int, n_channels int, n_frames int, "
    "duration_ms int, sampled_head array<int>"
)


def extract_audio_features(media: DataFrame, sample_every: int = 1000) -> DataFrame:
    """REAL decode for RIFF WAV payloads: format fields + every-Nth frame
    sample head (first 8)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    raw = bytes(payload)
                    rate, ch, frames, ms = decode_wav(raw)
                    head = sample_wav_frames(raw, sample_every)[:8]
                    rows.append((mid, rate, ch, frames, ms, head))
                except Exception:
                    rows.append((mid, None, None, None, None, None))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "sample_rate", "n_channels", "n_frames",
                    "duration_ms", "sampled_head",
                ],
            )

    return media.select("media_id", "payload").mapInPandas(
        run, schema=AUDIO_FEATURES_SCHEMA
    )


def resize_images(media: DataFrame, new_w: int, new_h: int) -> DataFrame:
    """Nearest-neighbor resize of P6 PPM payloads → (media_id, payload)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mids, outs = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    outs.append(resize_ppm(bytes(payload), new_w, new_h))
                except Exception:
                    outs.append(None)
                mids.append(mid)
            yield pd.DataFrame({"media_id": mids, "payload": outs})

    return media.select("media_id", "payload").mapInPandas(
        run, schema="media_id string, payload binary"
    )


def extract_media_features(media: DataFrame) -> DataFrame:
    """Per-payload features via Arrow batches: byte length, sha256, fake dims.

    The real pipeline swaps ``fake_decode_meta`` for an actual decoder; the
    dataflow (binary in → feature row out, no shuffle) is identical.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                w, h = fake_decode_meta(raw)
                rows.append(
                    (mid, len(raw), hashlib.sha256(raw).hexdigest(), w, h)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "n_bytes",
                    "payload_sha256",
                    "fake_width",
                    "fake_height",
                ],
            )

    return media.select("media_id", "payload").mapInPandas(
        run, schema=FEATURES_SCHEMA
    )
