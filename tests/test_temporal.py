"""As-of join: point-in-time semantics, tie-breaks, plan shape."""

import contextlib
import io

from pyspark.sql import functions as F

from zzzarchived_arxiv_fulltext_spark.operators.temporal import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        [("u1", 10, "p1"), ("u1", 20, "p2"), ("u1", 4, "p0"),
         ("u2", 15, "p3")],
        "user_id string, ts int, pid string",
    )
    right = spark.createDataFrame(
        [("u1", 5, 50.0, "c1"), ("u1", 20, 99.0, "c2"),
         ("u1", 20, 99.0, "c3"),          # (key, ts) tie → max event_id
         ("u3", 1, 7.0, "cx")],           # key with no left rows
        "user_id string, ts int, value double, event_id string",
    )
    return left, right


def test_asof_semantics(spark):
    left, right = _frames(spark)
    got = {
        r["pid"]: (r["asof_ts"], r["asof_value"], r["asof_event_id"])
        for r in asof_join(left, right, key="user_id", ts="ts",
                           right_cols=("value", "event_id")).collect()
    }
    assert len(got) == 4                      # every left row survives
    assert got["p0"] == (None, None, None)    # nothing at or before ts=4
    assert got["p1"] == (5, 50.0, "c1")       # latest at ts<=10
    assert got["p2"] == (20, 99.0, "c3")      # inclusive + tie → max struct
    assert got["p3"] == (None, None, None)    # key never clicked


def test_asof_tolerance_bounds_staleness(spark):
    left, right = _frames(spark)
    got = {
        r["pid"]: (r["asof_ts"], r["asof_value"])
        for r in asof_join(left, right, key="user_id", ts="ts",
                           right_cols=("value",), tolerance=5).collect()
    }
    assert len(got) == 4                 # left rows always survive
    assert got["p1"] == (5, 50.0)        # ts=10, match at 5 → age 5 ok
    assert got["p2"] == (20, 99.0)       # age 0
    assert got["p0"] == (None, None)     # no preceding row at all
    # a tighter window nulls the p1 match (age 5 > 4) but keeps exact
    tight = {
        r["pid"]: r["asof_ts"]
        for r in asof_join(left, right, key="user_id", ts="ts",
                           right_cols=("value",), tolerance=4).collect()
    }
    assert tight["p1"] is None and tight["p2"] == 20

    import pytest
    with pytest.raises(ValueError):
        asof_join(left, right, key="user_id", ts="ts",
                  tolerance=-1).collect()


def test_asof_is_one_shuffle(spark):
    left, right = _frames(spark)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        asof_join(left, right, key="user_id", ts="ts",
                  right_cols=("value",)).explain("formatted")
    plan = buf.getvalue()
    import re

    # dedup agg + window share the same key partitioning; no join node
    assert "Join" not in plan
    exchanges = {m for m in re.findall(r"Exchange hashpartitioning\([^)]*\)",
                                       plan)}
    assert len(exchanges) <= 2, plan  # (key,ts) agg + key window


def test_sequence_funnel_strict_ordering(spark):
    from zzzarchived_arxiv_fulltext_spark.operators.temporal import (
        sequence_funnel,
    )

    rows = [
        # u1: full ordered funnel
        ("u1", 1, "signup"), ("u1", 2, "view"), ("u1", 3, "click"),
        # u2: click BEFORE view → chain breaks at step 2... but a later
        # view exists, then no click after it
        ("u2", 1, "signup"), ("u2", 2, "click"), ("u2", 3, "view"),
        # u3: never signed up → zero steps despite later events
        ("u3", 1, "view"), ("u3", 2, "click"),
        # u4: simultaneous ts does NOT count (strictly after)
        ("u4", 1, "signup"), ("u4", 1, "view"),
    ]
    ev = spark.createDataFrame(rows, "user_id string, ts int, event_type string")
    got = {r["user_id"]: r for r in sequence_funnel(
        ev, steps=("signup", "view", "click")).collect()}
    assert got["u1"]["steps_completed"] == 3
    assert (got["u1"]["step_1_ts"], got["u1"]["step_2_ts"],
            got["u1"]["step_3_ts"]) == (1, 2, 3)
    assert got["u2"]["steps_completed"] == 2
    assert got["u2"]["step_2_ts"] == 3 and got["u2"]["step_3_ts"] is None
    assert got["u3"]["steps_completed"] == 0
    assert got["u4"]["steps_completed"] == 1

    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        sequence_funnel(ev, steps=("signup", "view", "click")).explain(
            "formatted")
    import re
    # the whole k-step chain must cost ONE key shuffle
    assert len(set(re.findall(r"Exchange hashpartitioning\([^)]*\)",
                              buf.getvalue()))) <= 1

    import pytest
    with pytest.raises(ValueError):
        sequence_funnel(ev, steps=())


def test_range_join_pairs_and_bins(spark):
    from zzzarchived_arxiv_fulltext_spark.operators.temporal import range_join

    left = spark.createDataFrame(
        [("u1", 1000, "p1"), ("u1", 2000, "p2"), ("u2", 1000, "p3")],
        "user_id string, ts_s long, pid string",
    )
    right = spark.createDataFrame(
        [("u1", 700, "c1"),    # exactly at the lower bound of p1
         ("u1", 1000, "c2"),   # equal ts (upper bound, inclusive)
         ("u1", 1001, "c3"),   # after p1 — excluded
         ("u1", 699, "c4"),    # just outside — excluded
         ("u2", 2000, "c5")],  # right key+ts that matches nothing
        "user_id string, ts_s long, cid string",
    )
    pairs = range_join(left, right, key="user_id", ts="ts_s",
                       lower=-300, upper=0)
    got = sorted((r["pid"], r["r_cid"]) for r in pairs.collect())
    assert got == [("p1", "c1"), ("p1", "c2")]
    # each qualifying pair appears exactly once despite 2-bin probing
    assert pairs.count() == pairs.distinct().count() == 2

    import pytest
    with pytest.raises(ValueError):
        range_join(left, right, lower=0, upper=0)
