"""Sessionization: batch-vs-stateful-stream agreement on real events."""

from pyspark.sql import functions as F

from zzzarchived_arxiv_fulltext_spark.streaming.sessionize import (
    sessionize_batch,
    sessionize_stream,
)

SF = "/root/testdata/sf0.001"


def _norm(rows):
    return sorted(
        (r["user_id"], r["session_start"], r["session_end"],
         r["n_events"], r["total_value"])
        for r in rows
    )


def test_batch_sessionize_structure(spark):
    events = spark.read.parquet(f"{SF}/events.parquet")
    sessions = sessionize_batch(events, gap_minutes=30)
    rows = sessions.collect()
    assert rows
    assert sum(r["n_events"] for r in rows) == events.count()
    assert all(r["session_start"] <= r["session_end"] for r in rows)
    # one user's sessions never overlap and respect the gap
    per_user = {}
    for r in rows:
        per_user.setdefault(r["user_id"], []).append(r)
    some = max(per_user.values(), key=len)
    some.sort(key=lambda r: r["session_start"])
    for a, b in zip(some, some[1:]):
        assert (b["session_start"] - a["session_end"]).total_seconds() >= 1800


def test_stream_sessionize_matches_batch(spark, tmp_path):
    events = spark.read.parquet(f"{SF}/events.parquet")
    landing = str(tmp_path / "landing")
    events.write.parquet(landing)

    stream = (
        spark.readStream.schema(events.schema).parquet(landing)
    )
    sessions = sessionize_stream(stream, gap_minutes=30, watermark="1 minute")
    out = str(tmp_path / "out")
    q = (
        sessions.writeStream.outputMode("append").format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    emitted = spark.read.parquet(out)
    batch = sessionize_batch(events, gap_minutes=30)

    # append mode withholds sessions the watermark hasn't closed; every
    # emitted session must match the batch oracle exactly
    batch_set = set(_norm(batch.collect()))
    emitted_rows = _norm(emitted.collect())
    assert emitted_rows, "no sessions emitted"
    missing = [r for r in emitted_rows if tuple(r) not in batch_set]
    assert missing == []
    # and the vast majority of sessions should have closed
    assert len(emitted_rows) >= 0.8 * len(batch_set)
