"""Windowed event metrics: batch/stream parity + late-data handling."""

from datetime import datetime

from pyspark.sql import functions as F

from zzzarchived_arxiv_fulltext_spark.streaming.windowed_metrics import (
    run_streaming_event_metrics,
    windowed_event_metrics,
)

SF = "/root/testdata/sf0.001"


def test_batch_windowed_metrics_match_manual_rollup(spark):
    events = spark.read.parquet(f"{SF}/events.parquet")
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in windowed_event_metrics(events).collect()
    }
    manual = {
        (r["h"], r["event_type"]): (r["n"], r["v"])
        for r in events.groupBy(
            F.date_trunc("hour", "ts").alias("h"), "event_type"
        ).agg(F.count("*").alias("n"),
              F.sum("value").cast("double").alias("v")).collect()
    }
    assert got == manual


def test_streaming_windowed_metrics_with_late_wave(spark, tmp_path):
    landing = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    events = spark.read.parquet(f"{SF}/events.parquet")
    schema = events.schema
    cutoff = events.agg(F.max("ts")).collect()[0][0]

    # wave 1: everything except the last hour; wave 2 delivers the rest
    # late (arrives in a later micro-batch)
    on_time = events.where(
        F.col("ts") < F.lit(cutoff) - F.expr("INTERVAL 1 HOUR"))
    late = events.join(on_time, on="event_id", how="left_anti")
    on_time.write.mode("append").parquet(landing)
    run_streaming_event_metrics(spark, landing, ckpt, out, schema)
    late.write.mode("append").parquet(landing)
    run_streaming_event_metrics(spark, landing, ckpt, out, schema)

    emitted = spark.read.parquet(out)
    # append mode emits a window only after the watermark passes it;
    # every emitted (window, type) row must be final & correct
    batch = windowed_event_metrics(events).collect()
    batch_map = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in batch
    }
    rows = emitted.collect()
    assert rows, "no windows emitted"
    for r in rows:
        key = (r["window_start"], r["event_type"])
        assert batch_map[key] == (r["n_events"], r["total_value"]), key
    # no duplicate emissions
    assert emitted.count() == emitted.select(
        "window_start", "event_type").distinct().count()
