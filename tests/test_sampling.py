"""Deterministic sampling / splits: content-stable, partition-stable."""

import pytest
from pyspark.sql import functions as F

from zzzarchived_arxiv_fulltext_spark.operators.sampling import (
    deterministic_sample,
    hash_split,
    split_boundaries,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.range(0, 2000).select(F.col("id").alias("doc_id"))


def test_sample_is_stable_under_repartition(spark, docs):
    a = {r["doc_id"] for r in deterministic_sample(docs, 0.2).collect()}
    b = {r["doc_id"] for r in
         deterministic_sample(docs.repartition(7), 0.2).collect()}
    assert a == b
    assert 0.15 < len(a) / 2000 < 0.25  # ~20%


def test_sample_is_monotone_in_fraction(docs):
    small = {r["doc_id"] for r in deterministic_sample(docs, 0.1).collect()}
    big = {r["doc_id"] for r in deterministic_sample(docs, 0.3).collect()}
    assert small <= big  # growing the rate only ADDS documents


def test_sample_stable_under_corpus_growth(spark, docs):
    grown = spark.range(0, 4000).select(F.col("id").alias("doc_id"))
    before = {r["doc_id"] for r in deterministic_sample(docs, 0.2).collect()}
    after = {r["doc_id"]
             for r in deterministic_sample(grown, 0.2).collect()}
    assert before == {d for d in after if d < 2000}  # old members unchanged


def test_split_is_disjoint_exhaustive_and_sized(docs):
    out = hash_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 2000
    assert 0.74 < counts["train"] / 2000 < 0.86
    assert counts["val"] > 0 and counts["test"] > 0
    # re-running yields byte-identical assignment
    again = hash_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1})
    assert out.exceptAll(again).isEmpty()


def test_split_boundaries_and_validation(docs):
    bounds = split_boundaries({"a": 1, "b": 1}, buckets=100)
    assert bounds == [("a", 50), ("b", 100)]
    with pytest.raises(ValueError):
        split_boundaries({"a": 0.0})
    with pytest.raises(ValueError):
        deterministic_sample(docs, 1.5)


def test_split_is_a_pure_projection(spark, docs):
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        hash_split(docs, {"train": 0.9, "val": 0.1}).explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan and "Python" not in plan
