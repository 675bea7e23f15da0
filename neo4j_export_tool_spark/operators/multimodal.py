"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` UDFs.  The actual codecs (PIL/ffmpeg/librosa)
are NOT in this container — the decode step is STUBBED behind
``require_codec`` (clearly-marked NotImplementedError) with a deterministic
fake used by tests, while the Spark-side plumbing (schema, batch iteration,
partition sizing) is real and exercised.

Scale notes: binary batches are large — ``spark.sql.execution.arrow.
maxRecordsPerBatch`` bounds Arrow batch memory, and media tables should be
written with small ``maxPartitionBytes`` so a task holds O(100 MB) of
payload, not O(1 GB).
"""

from __future__ import annotations

import hashlib
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
