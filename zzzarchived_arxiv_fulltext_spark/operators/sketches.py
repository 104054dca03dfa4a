"""Deterministic, engine-portable sketches.

``approx_count_distinct`` (HyperLogLog) is the built-in answer for
cardinality at 100 TB, but its estimates are engine-specific — no
oracle can pin them, and two runs on different partition layouts can
disagree. The KMV (k-minimum-values) sketch built on the corpus's
stable md5 hash family has neither problem: the k smallest hash
values of a set are a pure function of the SET, independent of
partitioning, engine, and row order — so the estimate is exactly
reproducible everywhere, DuckDB included.

Estimator (Bar-Yossef et al. 2002): hash values uniform on [0, 1);
if the k-th smallest is v_k, the distinct count ≈ (k-1)/v_k (exact
count when fewer than k distinct values exist).

Scale shape: per group, the k smallest hashes via a row_number window
over (group, hash) — one shuffle on the group key, a top-k heap per
partition feeding it (never a global sort); the sketch itself is k
doubles per group, mergeable by union + re-top-k (the property that
makes KMV a distributed sketch).
"""

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# 13 hex chars = 52 bits — exactly representable in a double
_HEX_CHARS = 13
_SCALE = float(16 ** _HEX_CHARS)


def kmv_hash(col) -> "F.Column":
    """md5-derived uniform double in [0, 1) — the shared hash family
    (and the SQL twin: ('0x' || substr(md5(x),1,13))::BIGINT / 16^13).
    """
    h = F.conv(F.substring(F.md5(col.cast("string")), 1, _HEX_CHARS),
               16, 10)
    return h.cast("double") / F.lit(_SCALE)


def kmv_distinct(df: DataFrame, value_col: str, k: int = 256,
                 group_cols=()) -> DataFrame:
    """(group..., n_seen, kth_min, est_distinct): KMV cardinality
    estimate of ``value_col`` per group (global when no groups).

    ``n_seen`` is the number of sketch slots filled (= exact distinct
    count when < k, in which case the estimate IS exact). Estimates
    are deterministic and engine-portable — the correctness gate can
    pin them to the digit.
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    groups = list(group_cols)
    hashed = df.select(
        *groups, kmv_hash(F.col(value_col)).alias("_h")
    ).dropDuplicates(groups + ["_h"])
    if groups:
        w = Window.partitionBy(*[F.col(g) for g in groups]).orderBy("_h")
        topk = hashed.withColumn("_r", F.row_number().over(w)) \
                     .where(F.col("_r") <= k)
    else:
        # global sketch: TakeOrdered heap (per-partition top-k merged
        # on the driver), NEVER a single-partition window sort
        topk = hashed.orderBy("_h").limit(k)
    agg = topk.groupBy(*groups).agg(
        F.count("*").alias("n_seen"),
        F.max("_h").alias("kth_min"),
    )
    est = F.when(
        F.col("n_seen") < k, F.col("n_seen").cast("double")
    ).otherwise((F.lit(float(k - 1))) / F.col("kth_min"))
    return agg.select(
        *groups,
        F.col("n_seen").cast("long").alias("n_seen"),
        F.round("kth_min", 9).alias("kth_min"),
        F.round(est, 6).alias("est_distinct"),
    )


def kmv_union_estimate(df_a: DataFrame, df_b: DataFrame,
                       value_col: str, k: int = 256) -> DataFrame:
    """One-row union-cardinality estimate of two corpora's values —
    the mergeability property: union the hash sets, re-take the k
    minimum. Never materializes either distinct set in full."""
    both = df_a.select(F.col(value_col)).unionByName(
        df_b.select(F.col(value_col)))
    return kmv_distinct(both, value_col, k=k)


def _cm_bucket(col, row: int, width: int) -> "F.Column":
    """Row-seeded md5 bucket (SQL twin:
    ('0x' || substr(md5(row || '|' || x), 1, 8))::BIGINT % width)."""
    h = F.conv(F.substring(
        F.md5(F.concat(F.lit(f"{row}|"), col.cast("string"))), 1, 8),
        16, 10)
    return F.pmod(h.cast("bigint"), F.lit(width))


def cm_sketch(df: DataFrame, value_col: str, width: int = 1024,
              depth: int = 4) -> DataFrame:
    """Count-min sketch of ``value_col``'s frequencies: (row, bucket,
    cnt), ``depth × width`` rows total regardless of corpus size.

    Deterministic and engine-portable for the same reason as KMV (the
    md5 hash family), so estimates are oracle-checkable — unlike
    sampled counters. Mergeable by summing counters bucket-wise
    (union two sketches = one groupBy-sum), which is what makes it a
    per-increment structure: commit the delta's sketch, add on read.

    Scale shape: one explode-free projection per depth row + one
    map-side-combinable aggregation; the result is bounded metadata.
    """
    rows = [
        df.select(F.lit(r).alias("row"),
                  _cm_bucket(F.col(value_col), r, width).alias("bucket"))
        for r in range(depth)
    ]
    all_rows = rows[0]
    for r in rows[1:]:
        all_rows = all_rows.unionByName(r)
    return (
        all_rows.groupBy("row", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def cm_estimate(sketch: DataFrame, items: DataFrame,
                value_col: str, width: int = 1024,
                depth: int = 4) -> DataFrame:
    """(item, est_count): count-min point estimate — the MIN over the
    depth rows of each item's bucket counter (an overestimate bounded
    by n/width with probability 1 - 2^-depth). ``items`` is small by
    contract (the probes you care about); the sketch side is bounded,
    so the join broadcasts it."""
    probes = items.select(F.col(value_col).alias("item")).distinct()
    exploded = probes.select(
        "item",
        F.explode(F.array(*[
            F.struct(F.lit(r).alias("row"),
                     _cm_bucket(F.col("item"), r, width).alias("bucket"))
            for r in range(depth)
        ])).alias("_p"),
    ).select("item", "_p.row", "_p.bucket")
    return (
        exploded.join(F.broadcast(sketch), on=["row", "bucket"],
                      how="left")
        .groupBy("item")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("long")
             .alias("est_count"))
    )


def kmv_overlap(df_a: DataFrame, df_b: DataFrame, value_col: str,
                k: int = 256) -> DataFrame:
    """One row: (jaccard_est, union_est, intersection_est) between
    two corpora's value sets — corpus-level overlap screening (e.g.
    "how contaminated is this crawl slice by the benchmark corpus?")
    at sketch cost, before paying for exact decontamination.

    Theta-sketch-style estimator: take the k smallest hashes of the
    UNION; the fraction of those present in both sets estimates the
    Jaccard similarity, and jaccard × union-estimate gives the
    intersection size. Deterministic for the usual md5 reason — the
    oracle pins all three numbers exactly.
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    # the union's k smallest hashes are each within their own set's k
    # smallest (union ⊇ each side ⇒ union_kth ≤ side_kth), so both
    # sides reduce to bounded k-row sketches via TakeOrdered heaps
    # BEFORE any join — no global sort, no full-set shuffle; the
    # membership flags stay exact for every hash that survives.
    ha = (df_a.select(kmv_hash(F.col(value_col)).alias("_h"))
          .dropDuplicates(["_h"]).orderBy("_h").limit(k)
          .withColumn("_ina", F.lit(1)))
    hb = (df_b.select(kmv_hash(F.col(value_col)).alias("_h"))
          .dropDuplicates(["_h"]).orderBy("_h").limit(k)
          .withColumn("_inb", F.lit(1)))
    both = ha.join(hb, on="_h", how="full").select(
        "_h",
        F.coalesce("_ina", F.lit(0)).alias("_ina"),
        F.coalesce("_inb", F.lit(0)).alias("_inb"),
    )
    topk = both.orderBy("_h").limit(k)  # ≤ 2k rows reach this
    agg = topk.agg(
        F.count("*").alias("n_seen"),
        F.max("_h").alias("_kth"),
        F.sum(F.col("_ina") * F.col("_inb")).alias("_inter"),
    )
    union_est = F.when(
        F.col("n_seen") < k, F.col("n_seen").cast("double")
    ).otherwise(F.lit(float(k - 1)) / F.col("_kth"))
    jac = F.col("_inter") / F.col("n_seen")
    return agg.select(
        F.col("n_seen").cast("long").alias("n_seen"),
        F.round(jac, 6).alias("jaccard_est"),
        F.round(union_est, 6).alias("union_est"),
        F.round(jac * union_est, 6).alias("intersection_est"),
    )
