"""Incremental extraction as a Structured Streaming job.

Spark restatement of the reference's Kinesis notification path
(``fulltext/agent/consumer.py:115-145``): new span-table files arrive
in a landing directory, a file-source stream picks them up, and
``foreachBatch`` runs the SAME batch extraction + snapshot commit per
micro-batch. Exactly-once visibility comes from the same two
mechanisms as the batch job: the anti-join against committed output
(work dedup, at-least-once safe) and the atomic snapshot manifest.

The reference's external Kinesis checkpoint volume
(``fulltext/config.py:295-296``) maps to the Spark streaming
checkpoint directory; the 0.2s/record throttle disappears (batch
backpressure is native).
"""

from typing import Optional

from pyspark.sql import SparkSession

from ..plans.extraction_job import run_extraction
from ..schema import INPUT_SCHEMA
from ..sources.tables import SnapshotTable


def run_streaming_extraction(
    spark: SparkSession,
    landing_dir: str,
    checkpoint_dir: str,
    output_table: SnapshotTable,
    lineage_table: Optional[SnapshotTable] = None,
    parallelism: Optional[int] = None,
    available_now: bool = True,
):
    """Start (and by default drain) the streaming extraction.

    ``available_now=True`` processes everything currently in the
    landing dir then stops — the batch-incremental mode the north rule
    needs; ``False`` leaves a continuous stream running and returns
    the StreamingQuery handle.
    """
    stream = (
        spark.readStream.schema(INPUT_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(landing_dir)
    )

    def process_batch(batch_df, batch_id: int) -> None:
        run_extraction(
            spark,
            batch_df,
            output_table,
            lineage_table=lineage_table,
            parallelism=parallelism,
        )

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        query = writer.trigger(availableNow=True).start()
        query.awaitTermination()
        return query
    return writer.start()
