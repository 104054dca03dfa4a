import pytest


def test_flatten_json_infers_and_expands(spark):
    from zzzarchived_arxiv_fulltext_spark.operators.semistructured import (
        flatten_json,
        infer_json_schema,
    )

    df = spark.createDataFrame(
        [(1, '{"a": 1, "b": "x"}'),
         (2, '{"a": 2, "c": true}'),
         (3, "not json at all"),
         (4, None)],
        ["id", "js"],
    )
    schema = infer_json_schema(df, "js")
    assert {f.name for f in schema.fields} == {"a", "b", "c"}
    got = {r["id"]: (r["a"], r["b"], r["c"])
           for r in flatten_json(df, "js").collect()}
    assert got[1] == (1, "x", None)
    assert got[2] == (2, None, True)
    assert got[3] == (None, None, None)   # unparseable → NULL fields
    assert got[4] == (None, None, None)
    # prefix avoids collisions with existing columns
    pref = flatten_json(df.withColumn("a", df.id), "js", prefix="js_")
    assert {"a", "js_a", "js_b", "js_c"} <= set(pref.columns)

    empty = spark.createDataFrame([(1, None)], "id int, js string")
    with pytest.raises(ValueError):
        infer_json_schema(empty, "js")
