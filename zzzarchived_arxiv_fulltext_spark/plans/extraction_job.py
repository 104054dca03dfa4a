"""The end-to-end extraction job: read → resume-filter → extract → commit.

Spark restatement of the reference's whole service (SURVEY.md §3.1):
the Flask/Celery/Kinesis/Docker chain collapses to one DataFrame job
whose commit IS the checkpoint.

Resume semantics (north rule): work already present in the committed
output is skipped via a left-anti join on ``(doc_id)`` at the current
extractor version — the reference's skip-if-exists
(``extractor/fulltext/fulltext.py:241-242``) and task dedup
(``fulltext/controllers.py:140-158``). A mid-run kill loses only the
uncommitted snapshot; the rerun completes exactly the remaining
documents.

Scale notes:
- The anti-join build side (committed doc_ids) is column-pruned to one
  string column at scan time; AQE turns the join into a broadcast when
  the done-set is small and splits skewed partitions when it is not.
- Lineage metrics are aggregated by RE-READING the just-committed
  snapshot's metric columns (columnar scan, text columns pruned) —
  the extraction UDF never runs twice.
"""

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .. import EXTRACTOR_VERSION
from ..operators.span_extract import extract_documents
from ..schema import LINEAGE_SCHEMA, OUTPUT_SCHEMA
from ..sources.tables import SnapshotTable


def pending_documents(
    input_df: DataFrame,
    output_table: SnapshotTable,
    spark: SparkSession,
    force: bool = False,
) -> DataFrame:
    """Input rows not yet present in the committed output.

    ``force=True`` skips the dedup (reference: the ``force`` flag at
    ``fulltext/controllers.py:140``).
    """
    if force or not output_table.snapshots():
        return input_df
    done = (
        output_table.read(spark, OUTPUT_SCHEMA)
        .where(F.col("extractor_version") == EXTRACTOR_VERSION)
        .select("doc_id")
    )
    return input_df.join(done, on="doc_id", how="left_anti")


def _lineage_from_snapshot(
    spark: SparkSession, output_table: SnapshotTable, snap_id: int
) -> DataFrame:
    committed = output_table.read_snapshot(spark, snap_id)
    return (
        committed.groupBy("partition_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("status") == "succeeded", 1).otherwise(0)
                  ).alias("n_succeeded"),
            F.sum(F.when(F.col("status") == "failed", 1).otherwise(0)
                  ).alias("n_failed"),
            F.sum("chars_extracted").alias("chars_extracted"),
            F.sum("n_text_spans").cast("long").alias("n_text_spans"),
            F.sum("n_media_spans").cast("long").alias("n_media_spans"),
        )
        .select(
            F.lit(snap_id).cast("long").alias("snapshot_id"),
            "partition_id",
            "n_docs",
            "n_succeeded",
            "n_failed",
            "chars_extracted",
            "n_text_spans",
            "n_media_spans",
            F.lit(EXTRACTOR_VERSION).alias("extractor_version"),
        )
    )


def _heal_lineage(
    spark: SparkSession,
    output_table: SnapshotTable,
    lineage_table: SnapshotTable,
) -> None:
    """Backfill lineage rows for committed output snapshots missing them.

    The output commit and the lineage commit are separate atomic steps;
    a crash between them leaves a committed snapshot with no metrics
    row. Lineage is derived data, so the fix is idempotent backfill at
    the start of every run.
    """
    have = {
        r["snapshot_id"]
        for r in lineage_table.read(spark, LINEAGE_SCHEMA)
        .select("snapshot_id").distinct().collect()
    } if lineage_table.snapshots() else set()
    for snap_id in output_table.snapshot_ids():
        if snap_id not in have:
            lineage_table.append(
                _lineage_from_snapshot(spark, output_table, snap_id)
            )


def run_extraction(
    spark: SparkSession,
    input_df: DataFrame,
    output_table: SnapshotTable,
    lineage_table: Optional[SnapshotTable] = None,
    parallelism: Optional[int] = None,
    force: bool = False,
) -> Optional[int]:
    """Run one extraction increment; returns the committed snapshot id.

    Returns None when there was nothing to do (all documents already
    committed at this extractor version).
    """
    if lineage_table is not None:
        _heal_lineage(spark, output_table, lineage_table)
    todo = pending_documents(input_df, output_table, spark, force=force)
    if todo.isEmpty():
        return None
    extracted = extract_documents(todo, parallelism=parallelism)

    snap_id = output_table.append(extracted)

    if lineage_table is not None:
        lineage_table.append(
            _lineage_from_snapshot(spark, output_table, snap_id)
        )
    return snap_id


def get_document(
    spark: SparkSession, output_table: SnapshotTable, doc_id: str
) -> Optional[dict]:
    """Point retrieval of one extracted document (latest version).

    Spark restatement of the reference's GET endpoint
    (``fulltext/routes.py:87-121`` → ``controllers.retrieve`` →
    latest-version resolution ``store.py:145-165``): a predicate on
    the committed table; the in-progress/303 state doesn't exist
    because visibility is snapshot-atomic.
    """
    rows = (
        read_extracted(spark, output_table)
        .where(F.col("doc_id") == doc_id)
        .collect()
    )
    return rows[0].asDict(recursive=True) if rows else None


def read_extracted(spark: SparkSession, output_table: SnapshotTable) -> DataFrame:
    """Latest-version view of the committed output (J3 semantics).

    One row per doc_id: the row from the lexicographically greatest
    extractor_version (reference latest-version resolution,
    ``fulltext/services/store/store.py:145-165``).
    """
    out = output_table.read(spark, OUTPUT_SCHEMA)
    latest = Window.partitionBy("doc_id").orderBy(
        F.desc("extractor_version"), F.desc("ended")
    )
    return (
        out.withColumn("_rank", F.row_number().over(latest))
        .where(F.col("_rank") == 1)
        .drop("_rank")
    )
