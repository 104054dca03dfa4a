"""Watermarked windowed aggregation over an event stream.

The reference has no stateful streaming (its Kinesis consumer is
stateless per record, ``fulltext/agent/consumer.py:115-145``), but a
production extraction service needs operational metrics over its
notification stream. This operator is that surface: tumbling-window
counts/sums per event type with a watermark bounding late-data state.

Batch and streaming share one definition — the same windowed plan runs
on a static DataFrame (tests, backfills) or a readStream source.
"""

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_metrics(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """(window_start, window_end, event_type, n_events, total_value).

    On a streaming DataFrame the watermark bounds state (late rows
    beyond it are dropped); on a batch DataFrame the watermark is a
    no-op and results are exact.
    """
    # watermarks require TIMESTAMP (with timezone); NTZ sources are cast
    src = events.withColumn("ts", F.col("ts").cast("timestamp"))
    if events.isStreaming:
        src = src.withWatermark("ts", watermark)
    return (
        src.groupBy(
            F.window("ts", window_duration).alias("w"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def run_streaming_event_metrics(
    spark,
    landing_dir: str,
    checkpoint_dir: str,
    output_dir: str,
    schema,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
):
    """Drain a parquet landing dir through the windowed aggregation.

    Append mode: a window's row emits once its watermark passes —
    exactly-once per (window, event_type) in the output files.
    """
    stream = spark.readStream.schema(schema).parquet(landing_dir)
    metrics = windowed_event_metrics(stream, window_duration, watermark)
    query = (
        metrics.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return query
