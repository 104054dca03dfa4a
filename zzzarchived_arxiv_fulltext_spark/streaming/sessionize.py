"""Custom stateful streaming operator: event sessionization.

Groups a user's events into sessions separated by >= ``gap`` of
inactivity — the canonical custom-stateful-operator shape Spark lacks
as a built-in. Implemented with ``applyInPandasWithState`` (Arrow
batches per key, explicit GroupState, event-time timeout) for streams,
plus an equivalent window-expression formulation for batch — the
batch form is the correctness oracle for the stateful one.

Reference analogue: none (the reference's stream consumer is stateless
per record, ``fulltext/agent/consumer.py:115-145``); this is part of
the training-data-pipeline surface (user activity → session features).
"""

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.window import Window

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("session_start", T.TimestampType(), False),
        T.StructField("session_end", T.TimestampType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("total_value", T.DoubleType(), True),
    ]
)

# open-session state: (start_ms, last_ms, event_count, value_sum)
_STATE_SCHEMA = "start BIGINT, last BIGINT, n BIGINT, v DOUBLE"

_COLS = ["user_id", "session_start", "session_end", "n_events", "total_value"]


def sessionize_batch(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Batch sessionization via window expressions (the oracle form).

    New-session flag = ts - lag(ts) > gap; session id = running sum of
    flags per user; then one groupBy. Window and aggregation share the
    user_id partitioning, so the second shuffle is avoided.
    """
    w = Window.partitionBy("user_id").orderBy("ts")
    gap = F.expr(f"INTERVAL {gap_minutes} MINUTES")
    flagged = (
        events.select(
            "user_id", F.col("ts").cast("timestamp").alias("ts"), "value"
        )
        .withColumn(
            "_new",
            F.when(F.lag("ts").over(w).isNull(), 1)
            .when(F.col("ts") >= F.lag("ts").over(w) + gap, 1)
            .otherwise(0),
        )
        .withColumn("_sid", F.sum("_new").over(w))
    )
    return (
        flagged.groupBy("user_id", "_sid")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            F.sum("value").cast("double").alias("total_value"),
        )
        .drop("_sid")
    )


def _session_kernel(key, batches, state: GroupState, gap_us: int
                    ) -> Iterator[pd.DataFrame]:
    """Per-user stateful kernel: fold this trigger's events into the
    open session, emit closed sessions, persist the open one.

    Timestamps are carried as microseconds (the source precision) so
    emitted sessions agree exactly with the batch oracle; only the
    GroupState timeout API needs milliseconds."""
    ts_all, v_all = [], []
    for pdf in batches:
        ts_all.extend((pdf["ts"].astype("int64") // 1_000).tolist())
        v_all.extend(pdf["value"].astype(float).tolist())

    closed = []
    if state.hasTimedOut:
        start, last, n, v = state.get
        closed.append((key[0], start, last, n, v))
        state.remove()
    elif ts_all:
        order = sorted(range(len(ts_all)), key=ts_all.__getitem__)
        ts_sorted = [ts_all[i] for i in order]
        v_sorted = [v_all[i] for i in order]
        if state.exists:
            start, last, n, v = state.get
        else:
            start, last, n, v = ts_sorted[0], ts_sorted[0], 0, 0.0
        for t, val in zip(ts_sorted, v_sorted):
            if n > 0 and t - last >= gap_us:
                closed.append((key[0], start, last, n, v))
                start, n, v = t, 0, 0.0
            last = max(last, t)
            n += 1
            v += val
        state.update((start, last, n, v))
        state.setTimeoutTimestamp((last + gap_us) // 1_000)

    pdf = pd.DataFrame(closed, columns=_COLS)
    if len(pdf):
        pdf["session_start"] = pd.to_datetime(pdf["session_start"], unit="us")
        pdf["session_end"] = pd.to_datetime(pdf["session_end"], unit="us")
    yield pdf


def sessionize_stream(events: DataFrame, gap_minutes: int = 30,
                      watermark: str = "2 hours") -> DataFrame:
    """Streaming sessionization via ``applyInPandasWithState``.

    Sessions close when a later event arrives past the gap, or when the
    event-time timeout fires after the watermark passes
    session_end + gap.
    """
    gap_us = gap_minutes * 60 * 1_000_000

    def kernel(key, batches, state):
        return _session_kernel(key, batches, state, gap_us)

    src = (
        events.select(
            "user_id",
            F.col("ts").cast("timestamp").alias("ts"),
            F.col("value").cast("double").alias("value"),
        )
        .withWatermark("ts", watermark)
    )
    return src.groupBy("user_id").applyInPandasWithState(
        kernel,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
