"""KMV cardinality sketch: exactness below k, accuracy above k,
partition invariance, mergeability."""

from zzzarchived_arxiv_fulltext_spark.operators.sketches import (
    kmv_distinct,
    kmv_union_estimate,
)


def test_exact_below_k(spark):
    df = spark.createDataFrame(
        [(v,) for v in ["a", "b", "c", "a", "b"]], "v string")
    row = kmv_distinct(df, "v", k=16).collect()[0]
    assert row["n_seen"] == 3
    assert row["est_distinct"] == 3.0  # exact when the sketch isn't full


def test_estimate_within_tolerance_above_k(spark):
    n = 5000
    df = spark.createDataFrame([(f"tok{i}",) for i in range(n)],
                               "v string")
    row = kmv_distinct(df, "v", k=256).collect()[0]
    assert row["n_seen"] == 256
    # KMV relative error ~ 1/sqrt(k) ≈ 6%; allow 4 sigma
    assert abs(row["est_distinct"] - n) / n < 0.25


def test_partition_invariance(spark):
    rows = [(f"t{i % 700}",) for i in range(3000)]
    df1 = spark.createDataFrame(rows, "v string").repartition(1)
    df16 = spark.createDataFrame(rows, "v string").repartition(16)
    a = kmv_distinct(df1, "v", k=64).collect()[0]
    b = kmv_distinct(df16, "v", k=64).collect()[0]
    assert a == b  # bit-identical regardless of layout


def test_grouped_and_union_merge(spark):
    df = spark.createDataFrame(
        [("en", f"w{i}") for i in range(300)]
        + [("de", f"w{i}") for i in range(100, 500)],
        "lang string, v string")
    per = {r["lang"]: r for r in
           kmv_distinct(df, "v", k=64, group_cols=["lang"]).collect()}
    assert set(per) == {"en", "de"}
    union = kmv_union_estimate(
        df.where("lang = 'en'"), df.where("lang = 'de'"), "v",
        k=64).collect()[0]
    # true union cardinality is 500 (overlap 100..299)
    assert abs(union["est_distinct"] - 500) / 500 < 0.5


def test_cm_sketch_never_underestimates(spark):
    from zzzarchived_arxiv_fulltext_spark.operators.sketches import (
        cm_estimate,
        cm_sketch,
    )

    rows = [("hot",)] * 500 + [(f"cold{i}",) for i in range(200)]
    df = spark.createDataFrame(rows, "v string")
    sk = cm_sketch(df, "v", width=64, depth=4)
    assert sk.count() <= 4 * 64  # bounded metadata by construction
    probes = spark.createDataFrame(
        [("hot",), ("cold0",), ("never_seen",)], "v string")
    got = {r["item"]: r["est_count"]
           for r in cm_estimate(sk, probes, "v", width=64,
                                depth=4).collect()}
    assert got["hot"] >= 500          # CM never underestimates
    assert got["cold0"] >= 1
    assert got["hot"] <= 500 + 200    # collisions bound the excess
    assert got["never_seen"] <= 200


def test_cm_sketch_merges_by_sum(spark):
    from pyspark.sql import functions as F

    from zzzarchived_arxiv_fulltext_spark.operators.sketches import (
        cm_estimate,
        cm_sketch,
    )

    a = spark.createDataFrame([("x",)] * 5 + [("y",)], "v string")
    b = spark.createDataFrame([("x",)] * 7, "v string")
    merged = (
        cm_sketch(a, "v", width=32, depth=3)
        .unionByName(cm_sketch(b, "v", width=32, depth=3))
        .groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))
    )
    direct = cm_sketch(a.unionByName(b), "v", width=32, depth=3)
    assert sorted(map(tuple, merged.collect())) == \
        sorted(map(tuple, direct.collect()))
    got = cm_estimate(merged, spark.createDataFrame([("x",)], "v string"),
                      "v", width=32, depth=3).collect()[0]
    assert got["est_count"] >= 12


def test_kmv_overlap_estimates_jaccard(spark):
    from zzzarchived_arxiv_fulltext_spark.operators.sketches import (
        kmv_overlap,
    )

    a = spark.createDataFrame([(f"w{i}",) for i in range(400)],
                              "v string")
    b = spark.createDataFrame([(f"w{i}",) for i in range(200, 600)],
                              "v string")
    row = kmv_overlap(a, b, "v", k=128).collect()[0]
    # truth: |inter|=200, |union|=600, jaccard=1/3
    assert abs(row["jaccard_est"] - 1 / 3) < 0.15
    assert abs(row["union_est"] - 600) / 600 < 0.3
    assert abs(row["intersection_est"] - 200) / 200 < 0.5
    # exact when the union fits in the sketch
    small = kmv_overlap(
        spark.createDataFrame([("x",), ("y",)], "v string"),
        spark.createDataFrame([("y",), ("z",)], "v string"),
        "v", k=128).collect()[0]
    assert small["n_seen"] == 3
    assert small["jaccard_est"] == round(1 / 3, 6)
    assert small["intersection_est"] == 1.0


def test_global_kmv_plans_a_heap_not_a_global_sort(spark):
    import contextlib
    import io

    from zzzarchived_arxiv_fulltext_spark.operators.sketches import (
        kmv_distinct,
    )

    df = spark.createDataFrame([(f"t{i}",) for i in range(100)],
                               "v string")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        kmv_distinct(df, "v", k=8).explain("formatted")
    plan = buf.getvalue()
    assert "TakeOrderedAndProject" in plan, plan
    assert "Window" not in plan, plan
