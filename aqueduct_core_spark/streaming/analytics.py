"""Streaming analytics over the change feed: watermarked windowed aggregates.

The reference exposes only counters/metrics (PipeStatusController, @Measure
interceptors); a Spark-native engine gets real streaming analytics for free.
These power the ingest observability dashboards: event rates per entity per
window, late-event accounting, per-routing-partition lag.

Late data policy: `withWatermark` bounds state exactly like the engine's
tombstone retention bounds deletes — both say "events later than X are not
honored", and both thresholds must exceed the feed's real out-of-orderness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    feed_stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window event counts per entity with late-data watermark.
    Output: (window_start, window_end, entity, n, n_deletes)."""
    return (
        feed_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "entity")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("op") == "D", 1).otherwise(0)).alias("n_deletes"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "entity",
            "n",
            "n_deletes",
        )
    )


def routing_lag(feed_stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Per-routing-partition high-watermark stream (the lineage table's
    streaming twin): max LSN seen per partition per window."""
    return (
        feed_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "15 minutes"), "routing_id")
        .agg(F.max("change_lsn").alias("high_watermark_lsn"))
        .select(
            F.col("window.start").alias("window_start"),
            "routing_id",
            "high_watermark_lsn",
        )
    )
