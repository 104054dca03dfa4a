"""Persistent ANN index == the one-shot ann_topk; grows by deltas."""

from pyspark.sql import functions as F

from zzzarchived_arxiv_fulltext_spark.operators.similarity import ann_topk
from zzzarchived_arxiv_fulltext_spark.plans.ann_index import (
    build_ann_index,
    query_ann_index,
)
from zzzarchived_arxiv_fulltext_spark.sources.tables import SnapshotTable

_PARAMS = dict(tables=6, planes=6, dim=8)


def _vectors(spark, lo: int, hi: int):
    rows = [(i, [float((i * 7 + d * 3) % 11 - 5) for d in range(8)])
            for i in range(lo, hi)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _topk(df) -> set:
    return {(r["query_id"], r["neighbor_id"], r["cos"], r["rank"])
            for r in df.collect()}


def test_committed_index_matches_one_shot_ann(spark, tmp_path):
    corpus = _vectors(spark, 0, 60)
    queries = _vectors(spark, 0, 4)
    idx = SnapshotTable(str(tmp_path / "idx"))

    build_ann_index(spark, corpus, idx, **_PARAMS)
    got = _topk(query_ann_index(spark, queries, idx, corpus, k=3,
                                **_PARAMS))
    want = _topk(ann_topk(corpus, queries, k=3, **_PARAMS))
    assert got == want and got


def test_query_before_any_build_is_empty(spark, tmp_path):
    idx = SnapshotTable(str(tmp_path / "idx"))
    out = query_ann_index(spark, _vectors(spark, 0, 2), idx,
                          _vectors(spark, 0, 10), k=3, **_PARAMS)
    assert out.count() == 0


def test_index_grows_incrementally(spark, tmp_path):
    w1 = _vectors(spark, 0, 40)
    w2 = _vectors(spark, 40, 60)
    full = w1.unionByName(w2)
    queries = _vectors(spark, 0, 4)
    idx = SnapshotTable(str(tmp_path / "idx"))

    build_ann_index(spark, w1, idx, **_PARAMS)
    build_ann_index(spark, w2, idx, **_PARAMS)
    assert idx.read(spark).count() == 60 * _PARAMS["tables"]

    got = _topk(query_ann_index(spark, queries, idx, full, k=3, **_PARAMS))
    want = _topk(ann_topk(full, queries, k=3, **_PARAMS))
    assert got == want

    # vector fetches are candidate-bounded: serving only candidate ids
    # from the "corpus" must suffice
    cand_ids = {r["neighbor_id"] for r in query_ann_index(
        spark, queries, idx, full, k=60, **_PARAMS).collect()}
    slim = full.join(
        spark.createDataFrame([(i,) for i in cand_ids], ["vec_id"]),
        on="vec_id", how="left_semi")
    again = _topk(query_ann_index(spark, queries, idx, slim, k=3,
                                  **_PARAMS))
    assert again == want
