"""Watermarked event-time windowed aggregation (Structured Streaming).

The reference has no streams (SURVEY.md §2.9) — this is the Spark-native
extension for the engine's event/metrics side: per-event-type counts and
value sums over tumbling event-time windows with a late-data watermark.
The same dataflow serves (a) crawl/ingest telemetry rollups at index-build
time and (b) query-log analytics at serve time.

Scale notes: watermark + window state lives in the state store keyed by
(window, event_type) — cardinality is windows x types, not events; the
aggregation is algebraic (count/sum) so partial aggregation happens before
the stateful exchange. ``availableNow`` gives incremental-batch semantics
(drain backlog, checkpoint, stop), matching ``streaming/incremental.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

EVENTS_SCHEMA = ("event_id long, ts timestamp, user_id long, "
                 "event_type string, value double, props string")


def windowed_event_stats(events: DataFrame,
                         window_duration: str = "1 hour",
                         watermark: str = "2 hours") -> DataFrame:
    """(window_start, window_end, event_type, n_events, sum_value) with a
    late-data watermark; works on both static and streaming frames."""
    src = events
    if src.isStreaming:
        src = src.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", window_duration).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 6).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "event_type", "n_events", "sum_value")
    )


def start_windowed_stats(spark: SparkSession, events_dir: str,
                         out_dir: str, checkpoint_dir: str,
                         window_duration: str = "1 hour",
                         watermark: str = "2 hours"):
    """File-source stream → watermarked windowed agg → parquet (append).

    Append mode emits a window only once its watermark passes — exactly-
    once window rows under restart via the checkpoint.
    """
    stream = (spark.readStream.schema(EVENTS_SCHEMA)
              .option("maxFilesPerTrigger", 16)
              .parquet(events_dir))
    agg = windowed_event_stats(stream, window_duration, watermark)
    return (agg.writeStream
            .format("parquet")
            .outputMode("append")
            .option("path", out_dir)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())
