"""Temporal joins: as-of (point-in-time) join over event tables.

``asof_join(left, right)`` attaches to every left row the LATEST right
row with the same key and ``right.ts <= left.ts`` — the standard
feature-engineering primitive ("state of X as of this event") that
plain equi-joins cannot express and a range join makes quadratic.

Spark-idiomatic single-pass implementation: union both sides tagged
with a side bit, one window partitioned by key and ordered by
(ts, side), and a running ``last(..., ignorenulls)`` carries the most
recent right payload forward onto each left row. Cost = ONE shuffle on
the key + a sort within partitions — no per-row range probe, no
key×time explosion, skew handled by AQE exactly like any keyed window.

Right rows that share (key, ts) are first reduced to the
lexicographically greatest payload struct, so results are
deterministic regardless of partitioning (and match DuckDB's
``ASOF JOIN`` on the deduplicated right side).
"""

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    right_cols: Sequence[str] = ("value",),
    prefix: str = "asof_",
    tolerance: float = None,
) -> DataFrame:
    """Left rows + the latest right payload at or before each left ts.

    Output: all left columns, plus ``<prefix>ts`` and ``<prefix><col>``
    for every name in ``right_cols`` (NULL when no right row precedes).

    ``tolerance`` (seconds for timestamp ``ts`` columns, plain units
    for numeric ones) bounds staleness: a match older than
    ``left.ts - tolerance`` is nulled out, like DuckDB's
    ``ASOF ... AND l.ts - r.ts <= X`` shape — the common
    feature-engineering variant ("last click, but only if within the
    attribution window"). There is no fallback to an older row: any
    earlier right row is staler still.
    """
    payload = F.struct(
        F.col(ts).alias("ts"), *[F.col(c) for c in right_cols]
    )
    # deterministic dedup: greatest payload per (key, ts)
    r = (
        right.groupBy(key, ts)
        .agg(F.max(payload).alias("_r"))
        .select(key, ts, "_r")
    )
    left_struct = F.struct(*[F.col(c) for c in left.columns])
    l_tagged = left.select(
        F.col(key).alias("_k"), F.col(ts).alias("_ts"),
        F.lit(1).alias("_side"),
        left_struct.alias("_l"),
        F.lit(None).cast(r.schema["_r"].dataType).alias("_r"),
    )
    r_tagged = r.select(
        F.col(key).alias("_k"), F.col(ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_tagged.schema["_l"].dataType).alias("_l"),
        F.col("_r"),
    )
    # right (side 0) sorts before left (side 1) at equal ts → the
    # match is inclusive (right.ts == left.ts counts), like ASOF JOIN
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l_tagged.unionByName(r_tagged)
        .withColumn("_m", F.last("_r", ignorenulls=True).over(w))
        .where(F.col("_side") == 1)
    )
    if tolerance is not None:
        if tolerance < 0:
            raise ValueError("tolerance must be >= 0")
        if "timestamp" in dict(matched.dtypes)["_ts"]:
            # TIMESTAMP/_NTZ cannot cast to double; age via microseconds
            age = (
                F.unix_micros(F.col("_ts").cast("timestamp"))
                - F.unix_micros(F.col("_m.ts").cast("timestamp"))
            ) / 1e6
        else:
            age = F.col("_ts").cast("double") - F.col("_m.ts").cast("double")
        matched = matched.withColumn(
            "_m", F.when(age <= F.lit(float(tolerance)), F.col("_m")))
    out_cols = [F.col(f"_l.{c}").alias(c) for c in left.columns]
    out_cols.append(F.col("_m.ts").alias(f"{prefix}ts"))
    out_cols += [F.col(f"_m.{c}").alias(f"{prefix}{c}") for c in right_cols]
    return matched.select(*out_cols)


def sequence_funnel(
    events: DataFrame,
    steps: Sequence[str],
    key: str = "user_id",
    ts: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel analysis: per key, the first time each step was
    reached STRICTLY AFTER the previous step.

    (key, step_1_ts..step_k_ts, steps_completed): step i's timestamp
    is the min event time of type steps[i] occurring after step i-1's
    timestamp (NULL once the chain breaks). The classic product-
    analytics funnel that a plain conditional aggregation cannot
    express — implemented as k chained windows over ONE key
    partitioning, so the whole funnel costs a single shuffle.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    w = Window.partitionBy(key)
    out = events
    prev: Optional[str] = None
    for i, step in enumerate(steps, start=1):
        cond = F.col(type_col) == step
        if prev is not None:
            # NULL prev (chain broken) makes ts > prev NULL → excluded
            cond = cond & (F.col(ts) > F.col(prev))
        col = f"_step_{i}"
        out = out.withColumn(
            col, F.min(F.when(cond, F.col(ts))).over(w))
        prev = col
    agg = out.groupBy(key).agg(*[
        F.first(f"_step_{i}").alias(f"step_{i}_ts")
        for i in range(1, len(steps) + 1)
    ])
    completed = sum(
        F.when(F.col(f"step_{i}_ts").isNotNull(), 1).otherwise(0)
        for i in range(1, len(steps) + 1)
    )
    return agg.withColumn("steps_completed", completed.cast("int"))


def range_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts: str = "ts_s",
    lower: int = -300,
    upper: int = 0,
    prefix: str = "r_",
) -> DataFrame:
    """All (left, right) pairs with the same key and
    ``left.ts + lower <= right.ts <= left.ts + upper``.

    A naive range join degenerates to a per-key cross product; this
    one buckets time into bins of the window width and equi-joins on
    (key, bin) — each left row probes at most
    ``ceil(window/width)+1 = 2`` bins, so the join fan-in is bounded
    by the per-bin row count, never the per-key count. The exact
    range predicate filters the bin collisions. ``ts`` must be a
    numeric (epoch) column; window bounds are inclusive.
    """
    if upper <= lower:
        raise ValueError("upper must be > lower")
    width = upper - lower
    r = right.select(
        F.col(key).alias("_k"),
        F.floor(F.col(ts) / width).alias("_bin"),
        F.struct(*[F.col(c) for c in right.columns]).alias("_r"),
    )
    lo_bin = F.floor((F.col(ts) + lower) / width)
    hi_bin = F.floor((F.col(ts) + upper) / width)
    l = left.select(
        F.col(key).alias("_k"),
        F.explode(F.sequence(lo_bin, hi_bin)).alias("_bin"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
    )
    in_range = (
        (F.col(f"_r.{ts}") >= F.col(f"_l.{ts}") + lower)
        & (F.col(f"_r.{ts}") <= F.col(f"_l.{ts}") + upper)
    )
    out_cols = [F.col(f"_l.{c}").alias(c) for c in left.columns]
    out_cols += [F.col(f"_r.{c}").alias(f"{prefix}{c}")
                 for c in right.columns]
    return (
        l.join(r, on=["_k", "_bin"]).where(in_range).select(*out_cols)
    )
