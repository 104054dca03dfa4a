"""Distributed quality-classifier training and scoring.

The CCNet / LLaMA-pipeline pattern: train a tiny linear classifier
(logistic regression over hashed bag-of-words features) that
separates a high-quality target corpus from the raw crawl, then score
every raw document and keep the best. The reference corpus motivates
the feature choice — the same md5 ``hash_bucket`` features the DSIR
selector uses, so the two selection families share one feature
extraction.

Training is full-batch gradient descent where EACH STEP IS ONE
DATAFRAME AGGREGATION: the executors compute the per-bucket gradient
sum (map-side combinable), the driver holds only the weight vector
(``buckets + 1`` doubles — bounded metadata, like IVF centroids), and
the next step broadcasts the updated weights back. No vector ever
exceeds ``buckets`` entries anywhere; corpus size only affects the
scan, never memory. Feature values are term frequencies (count /
doc length) so document length never inflates the logit.

Scoring is a broadcast join of the (bucket, weight) table against the
per-doc bucket counts plus one aggregation — the corpus streams
through in one pass.
"""

import math
from typing import List, Optional, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sampling import hash_bucket


def hashed_tf(df: DataFrame, text_col: str = "text",
              id_col: str = "doc_id", buckets: int = 256) -> DataFrame:
    """(id, bucket, tf): term-frequency of each md5 hash bucket per
    document (tf = bucket count / doc token count; empty docs emit
    nothing). Map-side-combinable; one explode, one aggregation."""
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.filter(F.split(F.col(text_col), " "),
                     lambda t: t != F.lit(""))
        ).alias("_tok"),
    )
    counts = (
        toks.select(id_col, hash_bucket(F.col("_tok"), buckets)
                    .alias("bucket"))
        .groupBy(id_col, "bucket").agg(F.count("*").alias("_c"))
    )
    total = counts.groupBy(id_col).agg(F.sum("_c").alias("_n"))
    return counts.join(total, on=id_col).select(
        id_col, "bucket",
        (F.col("_c").cast("double") / F.col("_n")).alias("tf"),
    )


def train_quality_classifier(
    pos: DataFrame,
    neg: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 256,
    steps: int = 5,
    lr: float = 1.0,
    init: Optional[Tuple[List[float], float]] = None,
) -> Tuple[List[float], float]:
    """Full-batch logistic regression: returns (weights[buckets],
    bias). ``pos`` documents are label 1, ``neg`` label 0. ``init``
    warm-starts GD from committed (weights, bias) — the
    train-once/serve-many retrain path (``plans/classifier_index``).

    Per step: score every doc with the current broadcast weights
    (join + agg), compute the residual ``sigmoid(z) - y``, and
    aggregate the per-bucket gradient ``sum(residual * tf) / N`` in
    one map-side-combinable pass. The labeled set is materialized
    once (``localCheckpoint``) so the feature explode is not
    recomputed every step. Driver state: ``buckets + 1`` doubles.
    """
    labeled = (
        hashed_tf(pos, text_col, id_col, buckets)
        .withColumn("_y", F.lit(1.0))
        .unionByName(
            hashed_tf(neg, text_col, id_col, buckets)
            .withColumn("_y", F.lit(0.0)))
        # one row per (doc, bucket); reused `steps` times
        .localCheckpoint(eager=True)
    )
    n_docs = labeled.select(id_col, "_y").distinct().count()
    if init is not None:
        if len(init[0]) != buckets:
            raise ValueError(
                f"init weights have {len(init[0])} buckets, "
                f"expected {buckets}")
        w, bias = list(init[0]), float(init[1])
    else:
        w, bias = [0.0] * buckets, 0.0
    spark = labeled.sparkSession
    for _ in range(steps):
        wdf = F.broadcast(spark.createDataFrame(
            [(b, w[b]) for b in range(buckets)], "bucket int, _w double"))
        resid = (
            labeled.join(wdf, on="bucket")
            .groupBy(id_col, "_y")
            .agg(F.sum(F.col("tf") * F.col("_w")).alias("_z"))
            .select(
                id_col,
                (F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.col("_z") + bias)))
                 - F.col("_y")).alias("_r"),
            )
        )
        grad = (
            labeled.join(resid, on=id_col)
            .groupBy("bucket")
            .agg(F.sum(F.col("_r") * F.col("tf")).alias("_g"))
            .collect()  # <= buckets rows
        )
        bias_g = resid.agg(F.sum("_r")).collect()[0][0] or 0.0
        for row in grad:
            w[row["bucket"]] -= lr * row["_g"] / n_docs
        bias -= lr * bias_g / n_docs
    return w, bias


def score_quality(df: DataFrame, weights: List[float], bias: float,
                  text_col: str = "text", id_col: str = "doc_id"
                  ) -> DataFrame:
    """(id, quality_prob): sigmoid of the linear score under the
    trained weights. Weight table (<= buckets rows) broadcasts; the
    corpus streams through one explode + two aggregations. Docs with
    no tokens score ``sigmoid(bias)``."""
    buckets = len(weights)
    spark = df.sparkSession
    wdf = F.broadcast(spark.createDataFrame(
        [(b, float(weights[b])) for b in range(buckets)],
        "bucket int, _w double"))
    scored = (
        hashed_tf(df, text_col, id_col, buckets)
        .join(wdf, on="bucket")
        .groupBy(id_col)
        .agg(F.sum(F.col("tf") * F.col("_w")).alias("_z"))
    )
    return (
        df.select(id_col).distinct()
        .join(scored, on=id_col, how="left")
        .select(
            id_col,
            F.round(
                F.lit(1.0)
                / (F.lit(1.0)
                   + F.exp(-(F.coalesce("_z", F.lit(0.0)) + bias))),
                6,
            ).alias("quality_prob"),
        )
    )


def sigmoid(x: float) -> float:
    """Driver-side twin of the scoring nonlinearity (tests)."""
    return 1.0 / (1.0 + math.exp(-x))
