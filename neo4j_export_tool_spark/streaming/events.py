"""Structured Streaming analogs of the batch operators.

The reference is a one-shot batch job (SURVEY.md §2.7 — no watermarks, no
windows); its "streaming" is constant-memory iteration.  The Spark-native
equivalent of its incremental-export posture is a real incremental pipeline:

- ``stream_events``        — file-source stream over the events table schema
  (micro-batch; ``availableNow`` drains a static directory, the same code
  path a Kafka source would feed).
- ``windowed_event_stats`` — tumbling-window per-type aggregation with a
  watermark for late data (the streaming version of the per-label stats fold
  A2).
- ``incremental_export_stream``  — per-record JSONL lines as they arrive:
  the streaming version of the export loop, with exactly-once via
  checkpointed file sink.

State sizing at scale: the window agg keeps one row per (window, type) in
the state store; the watermark bounds state growth — both knobs that the
reference's single cursor never needed but a 10^12-doc feed does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_DDL = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def stream_events(spark: SparkSession, source_dir: str) -> DataFrame:
    """Micro-batch stream over a directory of events parquet files."""
    return (
        spark.readStream.schema(EVENTS_DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )


def windowed_event_stats(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window stats per event type; late rows beyond the watermark
    are dropped (bounded state)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_value_c"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value_c",
        )
    )


def batch_event_stats(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """The batch twin of `windowed_event_stats` (for equivalence tests)."""
    return (
        events.groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_value_c"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value_c",
        )
    )


def run_stream_to_memory(
    spark: SparkSession,
    streaming_df: DataFrame,
    query_name: str,
    output_mode: str = "complete",
) -> DataFrame:
    """Drain a stream with availableNow into an in-memory table; returns the
    final result as a batch DataFrame."""
    q = (
        streaming_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)


def incremental_export_stream(
    events: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
):
    """Streaming JSONL sink: one JSON line per record as it arrives —
    the exactly-once incremental analog of the reference's append loop."""
    lines = events.select(
        F.to_json(
            F.struct(
                F.lit("event").alias("type"),
                F.col("event_id").alias("element_id"),
                F.col("ts"),
                F.col("event_type"),
                F.col("value"),
            )
        ).alias("value")
    )
    return (
        lines.writeStream.format("text")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
