"""Persistent IVF quantizer (train-once/serve-many, VERDICT r4 #7)."""

import pytest

from zzzarchived_arxiv_fulltext_spark.operators.similarity import (
    ivf_topk,
    train_ivf_centroids,
)
from zzzarchived_arxiv_fulltext_spark.plans.ivf_index import (
    ensure_centroids,
    ivf_topk_indexed,
    load_centroids,
    train_and_commit_centroids,
)
from zzzarchived_arxiv_fulltext_spark.sources.tables import SnapshotTable


def _vec(i, dim=8):
    # deterministic spread-out vectors; +1 keeps every norm nonzero
    return [(float((i * (d + 3) * 2654435761) % 97) + 1.0) / 98.0
            for d in range(dim)]


def _corpus(spark, n, start=0, dim=8):
    return spark.createDataFrame(
        [(i, _vec(i, dim)) for i in range(start, start + n)],
        "vec_id long, embedding array<double>")


def test_indexed_equals_one_shot(spark, tmp_path):
    corpus = _corpus(spark, 60)
    queries = _corpus(spark, 5, start=10)
    table = SnapshotTable(str(tmp_path / "ivf"))

    got = ivf_topk_indexed(
        spark, corpus, queries, table, k=3, n_probes=2,
        n_centroids=4, iterations=3, dim=8).collect()
    centroids = train_ivf_centroids(
        corpus, n_centroids=4, iterations=3, dim=8)
    want = ivf_topk(corpus, queries, centroids, k=3, n_probes=2).collect()

    key = lambda r: (r["query_id"], r["rank"])
    assert sorted([tuple(r) for r in got], key=lambda t: (t[0], t[-1])) == \
        sorted([tuple(r) for r in want], key=lambda t: (t[0], t[-1]))
    # the committed quantizer equals the one-shot training
    assert load_centroids(spark, table) == centroids


def test_serve_path_loads_instead_of_training(spark, tmp_path):
    corpus = _corpus(spark, 60)
    table = SnapshotTable(str(tmp_path / "ivf"))
    first = ensure_centroids(spark, corpus, table,
                             n_centroids=4, iterations=3, dim=8)
    assert len(table.snapshots()) == 1
    # same corpus → loads, no new snapshot
    again = ensure_centroids(spark, corpus, table,
                             n_centroids=4, iterations=3, dim=8)
    assert again == first
    assert len(table.snapshots()) == 1


def test_growth_triggers_warm_retrain(spark, tmp_path):
    table = SnapshotTable(str(tmp_path / "ivf"))
    small = _corpus(spark, 40)
    first = ensure_centroids(spark, small, table,
                             n_centroids=4, iterations=2, dim=8)
    big = _corpus(spark, 120)  # 3× growth > 1.5 threshold
    second = ensure_centroids(spark, big, table,
                              n_centroids=4, iterations=2, dim=8)
    assert len(table.snapshots()) == 2
    assert second != first  # retrained on the grown corpus
    # warm start: the retrain result equals Lloyd continued from the
    # committed centroids, NOT a from-scratch train
    warm = train_ivf_centroids(big, n_centroids=4, iterations=2,
                               dim=8, init=first)
    assert second == warm
    cold = train_ivf_centroids(big, n_centroids=4, iterations=2, dim=8)
    assert second != cold or warm == cold


def test_init_shape_validated(spark):
    with pytest.raises(ValueError):
        train_ivf_centroids(_corpus(spark, 10), n_centroids=4, dim=8,
                            init=[[0.0] * 8] * 3)


def test_shape_mismatch_triggers_cold_retrain(spark, tmp_path):
    """Review fix: a committed quantizer with a different shape than
    the request must be replaced by a cold retrain, not served stale
    or fed as a mis-shaped warm start (which raised ValueError)."""
    table = SnapshotTable(str(tmp_path / "ivf"))
    corpus = _corpus(spark, 50)
    ensure_centroids(spark, corpus, table,
                     n_centroids=4, iterations=2, dim=8)
    got = ensure_centroids(spark, corpus, table,
                           n_centroids=6, iterations=2, dim=8)
    assert len(got) == 6
    assert got == train_ivf_centroids(corpus, n_centroids=6,
                                      iterations=2, dim=8)
    assert len(table.snapshots()) == 2
