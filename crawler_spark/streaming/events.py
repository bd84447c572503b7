"""Streaming event processing: watermarked windowed aggregation + dedup.

The reference has no true streaming (SURVEY.md §2.8 — its loops are queue
polling), but the engine exposes the standard Structured Streaming shapes a
training-data pipeline needs. Each transformation is written against a plain
DataFrame so the *same function* serves the batch tables and a
``readStream`` source — the Spark-idiomatic unification.

Scale notes: watermark bounds state; the windowed agg is a streaming
hash-agg partitioned by (window, event_type); ``dropDuplicates`` keeps a
per-key state store pruned by the same watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    streaming: bool | None = None,
) -> DataFrame:
    """Tumbling-window counts/sums per event_type with late-data bound.

    Works on both batch and streaming inputs; the watermark is applied only
    when the input is streaming (harmless but useless on batch).
    """
    if streaming is None:
        streaming = events.isStreaming
    src = events.withWatermark("ts", watermark) if streaming else events
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.floor(F.sum(F.col("value")) * 100.0 + F.lit(0.5)).cast("long")
            .alias("sum_value_cents"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value_cents",
        )
    )


def deduped_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Exactly-once event stream by (event_id) with watermark-pruned state."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return src.dropDuplicates(["event_id"])


def stream_events_from_dir(spark, path: str, schema) -> DataFrame:
    """File-source stream over a directory of parquet event files.

    Watermarks require TZ-aware event time; NTZ timestamp columns (parquet
    written without timezone) are cast up front.
    """
    df = spark.readStream.schema(schema).parquet(path)
    for field in df.schema.fields:
        if field.dataType.typeName() == "timestamp_ntz":
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    return df
