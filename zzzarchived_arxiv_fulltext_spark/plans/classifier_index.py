"""Persistent quality classifier: train once, serve many.

``operators/classifier.train_quality_classifier`` runs full-batch GD
— ``steps`` corpus passes — inside every caller. The production shape
is the IVF-centroid pattern (``plans/ivf_index``): commit the trained
(weights, bias) once, then every scoring call LOADS it (a
buckets+1-row read, no training pass). Re-training happens on
labeled-set growth, warm-started from the committed weights so the
decision boundary moves continuously instead of resetting.

Each training commit is one snapshot carrying
``{kind, buckets, steps, lr, trained_rows}`` meta; readers take the
LATEST snapshot (weights are a full replacement). The bias rides as
the ``bucket = -1`` row.
"""

from typing import List, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..operators.classifier import train_quality_classifier
from ..sources.tables import SnapshotTable

WEIGHTS_SCHEMA = T.StructType([
    T.StructField("bucket", T.IntegerType(), False),
    T.StructField("weight", T.DoubleType(), False),
])


def train_and_commit_classifier(
    spark: SparkSession,
    pos: DataFrame,
    neg: DataFrame,
    table: SnapshotTable,
    buckets: int = 256,
    steps: int = 5,
    lr: float = 1.0,
    init: Optional[Tuple[List[float], float]] = None,
    trained_rows: Optional[int] = None,
    **train_kwargs,
) -> int:
    """Train (optionally warm-started) and commit one weight snapshot;
    returns the snapshot id."""
    w, bias = train_quality_classifier(
        pos, neg, buckets=buckets, steps=steps, lr=lr, init=init,
        **train_kwargs)
    if trained_rows is None:
        trained_rows = pos.count() + neg.count()
    rows = spark.createDataFrame(
        [(-1, float(bias))] + [(b, float(w[b])) for b in range(buckets)],
        WEIGHTS_SCHEMA)
    return table.append(rows.coalesce(1), meta={
        "kind": "quality_classifier", "buckets": buckets,
        "steps": steps, "lr": lr, "trained_rows": trained_rows,
    })


def load_classifier(spark: SparkSession, table: SnapshotTable
                    ) -> Optional[Tuple[List[float], float]]:
    """Latest committed (weights, bias), or None. A buckets+1-row
    read — bounded driver state by construction."""
    snap = table.latest_snapshot_id()
    if snap is None:
        return None
    rows = spark.read.parquet(table.snapshot_dir(snap)).collect()
    by_bucket = {r["bucket"]: r["weight"] for r in rows}
    bias = by_bucket.pop(-1, 0.0)
    return [by_bucket[b] for b in range(len(by_bucket))], bias


def ensure_classifier(
    spark: SparkSession,
    pos: DataFrame,
    neg: DataFrame,
    table: SnapshotTable,
    growth_factor: float = 1.5,
    buckets: int = 256,
    **train_kwargs,
) -> Tuple[List[float], float]:
    """Serve-path weights: load when fresh, (re)train when the table
    is empty, the labeled set outgrew the last run, or the committed
    shape mismatches the requested ``buckets`` (config change → cold
    retrain, never a mis-shaped warm start)."""
    snaps = [s for s in table.snapshots()
             if s.get("kind") == "quality_classifier"]
    current = load_classifier(spark, table) if snaps else None
    if current is not None and len(current[0]) == buckets:
        trained_rows = snaps[-1].get("trained_rows") or 0
        n_now = pos.count() + neg.count()
        if n_now <= trained_rows * growth_factor:
            return current
        train_and_commit_classifier(
            spark, pos, neg, table, buckets=buckets, init=current,
            trained_rows=n_now, **train_kwargs)
        return load_classifier(spark, table)
    train_and_commit_classifier(
        spark, pos, neg, table, buckets=buckets, **train_kwargs)
    return load_classifier(spark, table)
