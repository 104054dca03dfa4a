"""End-to-end dedup job: pairs + keep-list with cluster transitivity."""

import pytest
from pyspark.sql import functions as F

from zzzarchived_arxiv_fulltext_spark.plans.dedup_job import (
    connected_keep_list,
    duplicate_pairs,
    run_dedup,
)
from zzzarchived_arxiv_fulltext_spark.sources.tables import SnapshotTable

A = ("the quick brown fox jumps over the lazy dog while a cat "
     "watches quietly from the warm windowsill every single morning")
B = A.replace("warm", "cold")          # near-dup of A
C = B.replace("morning", "evening")    # near-dup of B (chain: A-B-C)
D = "totally unrelated text about adaptive query execution plans " \
    "and broadcast hash joins inside modern distributed engines today"


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(1, A), (2, A), (3, B), (4, C), (5, D), (6, D)]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_duplicate_pairs(corpus):
    pairs = {(r["id_a"], r["id_b"]): r["kind"]
             for r in duplicate_pairs(corpus, threshold=0.5).collect()}
    assert pairs.get((1, 2)) == "exact"
    assert pairs.get((5, 6)) == "exact"
    assert any(k == "near" for k in pairs.values())
    assert (1, 3) in pairs or (2, 3) in pairs  # A~B detected


def test_keep_list_transitive_clusters(corpus, spark):
    pairs = duplicate_pairs(corpus, threshold=0.5)
    keep = {r["id"]: (r["keep"], r["cluster"])
            for r in connected_keep_list(pairs, corpus).collect()}
    # A,B,C chain collapses into one cluster rooted at 1 (even if the
    # A-C pair itself was never emitted — transitivity via propagation)
    assert keep[1] == (True, 1)
    assert keep[2][1] == 1 and not keep[2][0]
    assert keep[3][1] == 1 and not keep[3][0]
    assert keep[4][1] == 1 and not keep[4][0]
    assert keep[5] == (True, 5)
    assert keep[6][1] == 5 and not keep[6][0]


def test_run_dedup_commits(corpus, spark, tmp_path):
    pairs_t = SnapshotTable(str(tmp_path / "pairs"))
    keep_t = SnapshotTable(str(tmp_path / "keep"))
    snap = run_dedup(spark, corpus, pairs_t, keep_t, threshold=0.5)
    assert snap == 1
    keep = keep_t.read(spark)
    assert keep.count() == 6
    kept = keep.where("keep").count()
    assert kept == 2  # one representative per cluster
