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


def test_streaming_dedup_first_seen_wins(spark, tmp_path):
    from zzzarchived_arxiv_fulltext_spark.streaming.stream_dedup import (
        run_streaming_dedup,
    )

    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "deduped")
    schema = "doc_id long, text string, ts timestamp"

    def wave(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append").parquet(landing)

    import datetime as dt
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)

    # wave 1: two distinct contents, one duplicated in-batch
    wave([(1, "alpha body", t0),
          (2, "beta body", t0 + dt.timedelta(seconds=10)),
          (3, "alpha body", t0 + dt.timedelta(seconds=20))])
    run_streaming_dedup(spark, landing, ckpt, out_dir, schema=schema)
    got = spark.read.parquet(out_dir)
    assert got.count() == 2
    assert {r["text"] for r in got.collect()} == {"alpha body", "beta body"}

    # wave 2: a re-crawl of 'alpha body' within the watermark plus one
    # genuinely new content — only the new one passes
    wave([(4, "alpha body", t0 + dt.timedelta(seconds=40)),
          (5, "gamma body", t0 + dt.timedelta(seconds=50))])
    run_streaming_dedup(spark, landing, ckpt, out_dir, schema=schema)
    got = spark.read.parquet(out_dir)
    assert got.count() == 3
    assert sorted(r["text"] for r in got.collect()) == [
        "alpha body", "beta body", "gamma body"]


def test_read_as_of_time_travel(spark, tmp_path):
    from zzzarchived_arxiv_fulltext_spark.sources.tables import SnapshotTable

    t = SnapshotTable(str(tmp_path / "t"))
    t.append(spark.range(0, 5).toDF("id"))
    snap2 = t.append(spark.range(5, 9).toDF("id"))
    t.append(spark.range(9, 12).toDF("id"))

    assert t.read(spark).count() == 12
    as_of = t.read_as_of(spark, snap2)
    assert as_of.count() == 9
    assert {r["id"] for r in as_of.collect()} == set(range(9))
    import pytest
    with pytest.raises(ValueError):
        t.read_as_of(spark, 0)
