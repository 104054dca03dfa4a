"""Bucketed tables must join WITHOUT an Exchange on either side."""

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from zzzarchived_arxiv_fulltext_spark.plans.bucketed_tables import (
    co_located_join,
    write_bucketed,
)


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture()
def no_broadcast(spark):
    """Disable auto-broadcast so the test proves the BUCKETED path
    (broadcast would hide the exchange question entirely)."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange(spark, no_broadcast):
    docs = spark.range(0, 5000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).alias("v"))
    meta = spark.range(0, 5000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).alias("m"))
    write_bucketed(docs, "bt_docs", "doc_id", 8)
    write_bucketed(meta, "bt_meta", "doc_id", 8)

    joined = co_located_join(spark, "bt_docs", "bt_meta", on="doc_id")
    plan = _plan(joined)
    assert "SortMergeJoin" in plan, plan
    assert "Exchange" not in plan, plan  # the whole point
    assert joined.count() == 5000

    # the same join on UNBUCKETED frames shuffles both sides — the
    # control that shows bucketing is what removed the exchange
    control = docs.join(meta, on="doc_id")
    assert "Exchange" in _plan(control)


def _sort_nodes(plan: str) -> int:
    # formatted plans list operators as '(N) Sort' — count the Sort
    # OPERATORS, not the SortMergeJoin substring
    import re

    return len(re.findall(r"\(\d+\) Sort\b", plan))


def test_bucket_sorted_tables_skip_the_sort(spark, no_broadcast):
    """Sorted one-file-per-bucket layouts + the sorted-scan conf plan
    with ZERO Sort operators; without sortBy the per-task sorts come
    back — proving the assertion bites."""
    conf = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    old = spark.conf.get(conf, "false")
    spark.conf.set(conf, "true")
    try:
        a = spark.range(0, 2000).select(F.col("id").alias("k"))
        b = spark.range(0, 2000).select(F.col("id").alias("k"))
        write_bucketed(a, "bt_sa", "k", 4, sort=True)
        write_bucketed(b, "bt_sb", "k", 4, sort=True)
        plan = _plan(co_located_join(spark, "bt_sa", "bt_sb", on="k"))
        assert "Exchange" not in plan, plan
        assert _sort_nodes(plan) == 0, plan

        write_bucketed(a, "bt_ua", "k", 4, sort=False)
        write_bucketed(b, "bt_ub", "k", 4, sort=False)
        unsorted = _plan(co_located_join(spark, "bt_ua", "bt_ub", on="k"))
        assert "Exchange" not in unsorted, unsorted
        assert _sort_nodes(unsorted) >= 2, unsorted
    finally:
        spark.conf.set(conf, old)


def test_write_bucketed_validates(spark):
    df = spark.range(3).select(F.col("id").alias("k"))
    with pytest.raises(ValueError):
        write_bucketed(df, "bt_bad", "k", 0)


def test_warehouse_not_in_cwd(spark):
    import os

    wh = spark.conf.get("spark.sql.warehouse.dir")
    assert "spark_graft_warehouse" in wh or not wh.startswith(
        "file:" + os.getcwd())
