"""Deterministic corpus sampling and dataset splits.

Training-data pipelines need REPRODUCIBLE sampling: the same document
must land in the same split on every run, every engine, every cluster
size — RNG-based ``df.sample`` cannot promise that across engines or
re-partitions. These operators assign by md5 hash bucket of a key
column instead (the engine-portable family used throughout), so:

- a 10% sample is the same 10% forever (stable under corpus growth:
  new docs join it iff their hash lands in the range);
- train/val/test assignment never leaks a document across splits even
  when the corpus is re-partitioned, deduplicated, or extended;
- everything is a pure JVM projection (conv(md5)) — no Python, no
  shuffle, Catalyst pipelines it with the scan.
"""

from typing import Dict, List, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

HASH_BUCKETS = 1 << 20


def hash_bucket(key: Column, buckets: int = HASH_BUCKETS) -> Column:
    """Stable bucket in [0, buckets): first 8 md5 hex chars mod buckets."""
    h32 = F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10)
    return F.pmod(h32.cast("bigint"), F.lit(buckets))


def deterministic_sample(
    df: DataFrame,
    fraction: float,
    key_col: str = "doc_id",
    buckets: int = HASH_BUCKETS,
) -> DataFrame:
    """Content-stable sample: rows whose key hashes under the cut."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    cut = int(fraction * buckets)
    return df.where(hash_bucket(F.col(key_col), buckets) < cut)


def split_boundaries(weights: Dict[str, float],
                     buckets: int = HASH_BUCKETS) -> List[Tuple[str, int]]:
    """Cumulative (name, upper_bound) boundaries for the weight map."""
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    bounds, acc = [], 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        bounds.append((name, int(acc * buckets)))
    bounds.append((names[-1], buckets))  # last split absorbs rounding
    return bounds


def stratified_sample(
    df: DataFrame,
    rates: Dict[str, float],
    strata_col: str = "lang",
    key_col: str = "doc_id",
    default_rate: float = 0.0,
    buckets: int = HASH_BUCKETS,
) -> DataFrame:
    """Per-stratum content-stable sampling (training-mix construction).

    ``rates`` maps stratum value → keep fraction; strata not listed
    use ``default_rate``. Same stability guarantees as
    :func:`deterministic_sample`, per stratum.
    """
    cut = F.lit(int(default_rate * buckets))
    for value, rate in rates.items():
        if not 0.0 <= rate <= 1.0:
            raise ValueError(f"rate for {value!r} must be in [0, 1]")
        cut = F.when(F.col(strata_col) == value,
                     F.lit(int(rate * buckets))).otherwise(cut)
    return df.where(hash_bucket(F.col(key_col), buckets) < cut)


def shard_by_token_budget(
    df: DataFrame,
    budget_tokens: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    shard_col: str = "shard",
) -> DataFrame:
    """Assign documents to ~``budget_tokens``-sized output shards.

    The pretraining-shard writer's primitive: documents in id order
    accumulate whitespace-token counts, and a document's shard is its
    exclusive prefix sum divided by the budget — deterministic under
    any partitioning, so re-running materializes identical shards.
    (The id-ordered running sum is one global sort — at 10^12 rows,
    run it per hash-bucketed partition group instead; the assignment
    stays deterministic because bucket membership is content-stable.)
    """
    if budget_tokens <= 0:
        raise ValueError("budget_tokens must be positive")
    n_tokens = F.size(F.split(F.col(text_col), " "))
    w = Window.orderBy(id_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    running = F.sum(n_tokens).over(w) - n_tokens  # exclusive prefix sum
    return df.withColumn(
        shard_col, F.floor(running / budget_tokens).cast("int")
    ).withColumn("n_tokens", n_tokens)


def hash_split(
    df: DataFrame,
    weights: Dict[str, float],
    key_col: str = "doc_id",
    buckets: int = HASH_BUCKETS,
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split by hash-bucket range.

    ``weights`` is an ordered {name: weight} map (normalized to 1).
    Assignment is a pure expression of the key, so it is stable under
    re-partitioning, incremental appends, and engine swaps.
    """
    bucket = hash_bucket(F.col(key_col), buckets)
    bounds = split_boundaries(weights, buckets)
    expr = F.lit(bounds[-1][0])
    for name, upper in reversed(bounds[:-1]):
        expr = F.when(bucket < upper, F.lit(name)).otherwise(expr)
    return df.withColumn(split_col, expr)
