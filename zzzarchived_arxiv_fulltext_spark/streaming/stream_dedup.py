"""Streaming exact deduplication: first-seen-wins on content hash.

The streaming twin of ``operators/dedup.drop_exact_duplicates`` for a
continuously-arriving corpus: new documents stream in, and only the
FIRST document with each content hash passes through. State is
bounded by the event-time watermark (``dropDuplicatesWithinWatermark``
evicts hashes older than the watermark), so the operator runs forever
without unbounded state — the correct trade for web-scale feeds, where
re-crawls of the same content cluster in time.

Exactly-once output comes from the streaming checkpoint (offsets +
dedup state) plus the idempotent file sink.
"""

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schema import INPUT_SCHEMA


def dedup_stream(stream_df: DataFrame, text_col: str = "text",
                 ts_col: str = "ts",
                 watermark: str = "10 minutes") -> DataFrame:
    """First document per content hash within the watermark window."""
    return (
        stream_df
        .withColumn("_h", F.md5(F.col(text_col)))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["_h"])
        .drop("_h")
    )


def run_streaming_dedup(
    spark: SparkSession,
    landing_dir: str,
    checkpoint_dir: str,
    output_dir: str,
    schema=None,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    available_now: bool = True,
):
    """Drain the landing dir through the dedup into a parquet sink."""
    stream = (
        spark.readStream.schema(schema or INPUT_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(landing_dir)
    )
    deduped = dedup_stream(stream, text_col=text_col, ts_col=ts_col,
                           watermark=watermark)
    writer = (
        deduped.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        query = writer.trigger(availableNow=True).start()
        query.awaitTermination()
        return query
    return writer.start()
