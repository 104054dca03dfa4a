"""Streaming extraction: file-source micro-batches, exactly-once output."""

from zzzarchived_arxiv_fulltext_spark.schema import OUTPUT_SCHEMA
from zzzarchived_arxiv_fulltext_spark.sources.fixtures import spans_table
from zzzarchived_arxiv_fulltext_spark.sources.tables import SnapshotTable
from zzzarchived_arxiv_fulltext_spark.streaming.stream_extract import (
    run_streaming_extraction,
)


def test_streaming_two_waves_exactly_once(spark, tmp_path):
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    out = SnapshotTable(str(tmp_path / "out"))

    # wave 1: 40 docs land
    spans_table(spark, 40, seed=21).write.mode("append").parquet(landing)
    run_streaming_extraction(spark, landing, ckpt, out, parallelism=4)
    n1 = out.read(spark, OUTPUT_SCHEMA).count()
    assert n1 == 40

    # wave 2: 30 more docs land (overlapping ids 20-39 re-delivered —
    # at-least-once duplication upstream must not duplicate output)
    spans_table(spark, 70, seed=21).where(
        "pmod(xxhash64(doc_id), 1000) >= 0"
    ).write.mode("append").parquet(landing)
    run_streaming_extraction(spark, landing, ckpt, out, parallelism=4)

    result = out.read(spark, OUTPUT_SCHEMA)
    assert result.count() == 70
    assert result.select("doc_id").distinct().count() == 70
