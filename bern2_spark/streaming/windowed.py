"""Watermarked event-time windowed aggregation over a document/event
stream — the standard Structured Streaming late-data pattern.

The KG pipeline itself is per-document (no event-time semantics), but a
production ingest tier tracks arrival-rate / per-window throughput
metrics over the event stream that feeds it. This module provides that
operator: tumbling event-time windows with a watermark so state for
closed windows is dropped (bounded state at any scale) and late rows
inside the allowed lateness still fold in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_event_counts(events: DataFrame,
                          window_duration: str = "1 hour",
                          watermark: str = "2 hours",
                          ts_col: str = "ts") -> DataFrame:
    """Event stream -> (window, event_type, n_events, total_value).
    Watermark bounds the aggregation state: windows older than
    max(event time) - watermark are finalized and emitted (append
    mode), later stragglers inside the bound still count."""
    return (events
            .withWatermark(ts_col, watermark)
            .groupBy(F.window(ts_col, window_duration).alias("window"),
                     "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.sum("value").alias("total_value")))


def stream_windowed_counts(spark: SparkSession, input_dir: str,
                           out_dir: str, checkpoint_dir: str,
                           window_duration: str = "1 hour",
                           watermark: str = "2 hours"):
    """File-source stream of event parquet -> watermarked windowed
    counts appended to ``out_dir`` (availableNow: drain backlog, stop).
    Append mode emits only FINALIZED windows — the correctness
    guarantee late data would otherwise break."""
    schema = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    stream = spark.readStream.schema(schema).parquet(input_dir)
    agg = windowed_event_counts(stream, window_duration, watermark)
    query = (agg.writeStream
             .outputMode("append")
             .format("parquet")
             .option("path", out_dir)
             .option("checkpointLocation", checkpoint_dir)
             .trigger(availableNow=True)
             .start())
    query.awaitTermination()
    return query
