"""Streaming deduplication — the incremental twin of `operators.dedup`.

Exact content dedup over an unbounded feed: key = sha256(content);
``dropDuplicatesWithinWatermark`` keeps state only inside the watermark
horizon, so the state store is bounded by (arrival rate × watermark) rather
than corpus size — the property that makes exact dedup feasible on a
perpetual 10^12-doc crawl where a global-state dropDuplicates would OOM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream_exact(
    events: DataFrame,
    content_col: str,
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Drop rows whose content hash was already seen within the watermark."""
    keyed = events.withColumn(
        "_content_sha256", F.sha2(F.col(content_col).cast("string"), 256)
    ).withWatermark(ts_col, watermark)
    return keyed.dropDuplicatesWithinWatermark(["_content_sha256"]).drop(
        "_content_sha256"
    )
