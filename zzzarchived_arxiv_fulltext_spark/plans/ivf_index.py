"""Persistent IVF coarse quantizer: train once, serve many.

``operators/similarity.train_ivf_centroids`` runs Lloyd iterations —
full corpus passes — inside every caller. Sound at any single scale,
but the production shape (VERDICT r4 #7) is the same as
``plans/ann_index``: commit the trained k×dim centroid table once,
then every ``ivf_topk`` call LOADS it (a k×dim read, no training
pass). Re-training happens on corpus growth, warm-started from the
committed centroids so cluster identities stay stable for the
already-assigned corpus.

Each training commit is one snapshot carrying
``{kind, n_centroids, dim, iterations, trained_rows}`` meta; readers
take the LATEST snapshot (centroids are a full replacement, not an
append union). At 10^12 vectors the table is still k rows — the
training cost, not the storage, is what this plan amortizes.
"""

from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.similarity import ivf_topk, train_ivf_centroids
from ..sources.tables import SnapshotTable

CENTROID_SCHEMA = T.StructType([
    T.StructField("centroid_id", T.IntegerType(), False),
    T.StructField("vec", T.ArrayType(T.DoubleType()), False),
])


def train_and_commit_centroids(
    spark: SparkSession,
    corpus: DataFrame,
    table: SnapshotTable,
    n_centroids: int = 16,
    iterations: int = 5,
    sample_fraction: float = 1.0,
    vec_col: str = "embedding",
    dim: int = 64,
    init=None,
    trained_rows: int = None,
) -> int:
    """Train (optionally warm-started) and commit one centroid
    snapshot; returns the snapshot id. ``trained_rows`` lets a caller
    that already counted the corpus (the growth check) avoid a second
    full count action."""
    centroids = train_ivf_centroids(
        corpus, n_centroids=n_centroids, iterations=iterations,
        sample_fraction=sample_fraction, vec_col=vec_col, dim=dim,
        init=init)
    if trained_rows is None:
        trained_rows = corpus.count()
    rows = spark.createDataFrame(
        [(c, vec) for c, vec in enumerate(centroids)], CENTROID_SCHEMA)
    return table.append(rows.coalesce(1), meta={
        "kind": "ivf_centroids", "n_centroids": n_centroids,
        "dim": dim, "iterations": iterations,
        "trained_rows": trained_rows,
    })


def load_centroids(spark: SparkSession,
                   table: SnapshotTable) -> Optional[List[list]]:
    """Latest committed centroids as a python k×dim list (None when
    the table has no training snapshot). A k-row read — bounded
    driver-side state by construction."""
    snap = table.latest_snapshot_id()
    if snap is None:
        return None
    df = spark.read.parquet(table.snapshot_dir(snap))
    rows = df.orderBy("centroid_id").collect()
    return [list(r["vec"]) for r in rows]


def ensure_centroids(
    spark: SparkSession,
    corpus: DataFrame,
    table: SnapshotTable,
    growth_factor: float = 1.5,
    **train_kwargs,
) -> List[list]:
    """The serve-path centroids: load when fresh, (re)train when the
    table is empty or the corpus outgrew the last training run.

    Growth check compares the corpus row count against the committed
    ``trained_rows`` meta; a re-train warm-starts from the committed
    centroids (``init=``) so Lloyd continues from the served state.
    A committed snapshot whose shape does not match the REQUESTED
    (n_centroids, dim) — a config change since the last commit — is
    ignored and replaced by a cold re-train, never served stale or
    fed as a mis-shaped warm start.
    """
    want_k = train_kwargs.get("n_centroids", 16)
    want_dim = train_kwargs.get("dim", 64)
    snaps = [s for s in table.snapshots()
             if s.get("kind") == "ivf_centroids"]
    current = load_centroids(spark, table) if snaps else None
    if current is not None and \
            (len(current), len(current[0])) == (want_k, want_dim):
        trained_rows = snaps[-1].get("trained_rows") or 0
        n_now = corpus.count()
        if n_now <= trained_rows * growth_factor:
            return current
        train_and_commit_centroids(
            spark, corpus, table, init=current, trained_rows=n_now,
            **train_kwargs)
        return load_centroids(spark, table)
    train_and_commit_centroids(spark, corpus, table, **train_kwargs)
    return load_centroids(spark, table)


def ivf_topk_indexed(
    spark: SparkSession,
    corpus: DataFrame,
    queries: DataFrame,
    table: SnapshotTable,
    k: int = 10,
    n_probes: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    **train_kwargs,
) -> DataFrame:
    """IVF search against the COMMITTED quantizer (training only if
    the table is empty / stale) — identical results to the one-shot
    ``ivf_topk`` on the same centroids, minus the per-call Lloyd
    passes."""
    centroids = ensure_centroids(spark, corpus, table, **train_kwargs)
    return ivf_topk(corpus, queries, centroids, k=k, n_probes=n_probes,
                    id_col=id_col, vec_col=vec_col)
