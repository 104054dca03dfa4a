"""Oracle output-type drift gate.

The driver's correctness hash is type-sensitive: a DuckDB oracle whose
final projection surfaces HUGEINT (integer ``sum()``), DECIMAL, or any
other type whose pandas/arrow representation differs from the Spark
query's output type will hash-mismatch even when every value is equal
(the round-4 ``repetition_metrics`` failure). This test plans every
registered oracle in DuckDB (no data fetched), builds every Spark query
lazily at sf0.001 (no action run), and compares per-column type classes
so a drifting oracle fails *here* before it ships to the driver.
"""

import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from check_oracles import TABLES, duck_type_class, spark_type_class

SF_DIR = "/root/testdata/sf0.001"


def _registry():
    import __spark_entry__ as e

    return e.queries(), e.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def test_every_oracle_output_type_matches_spark(spark, duck):
    queries, oracles = _registry()
    problems = []
    for name, sql in sorted(oracles.items()):
        rel = duck.sql(sql)  # plans only; nothing fetched
        d_class = {c: duck_type_class(t)
                   for c, t in zip(rel.columns, rel.types)}
        df = queries[name](spark, SF_DIR)  # lazy; schema only
        s_class = {f.name: spark_type_class(f.dataType)
                   for f in df.schema.fields}
        if sorted(d_class) != sorted(s_class):
            problems.append(
                f"{name}: column sets differ "
                f"spark={sorted(s_class)} duck={sorted(d_class)}")
            continue
        for col in sorted(s_class):
            if s_class[col] != d_class[col]:
                problems.append(
                    f"{name}.{col}: spark={s_class[col]} "
                    f"duck={d_class[col]}")
    assert not problems, (
        f"{len(problems)} oracle type drift(s) — cast the oracle's final "
        f"SELECT (e.g. ::BIGINT for integer sums, ::DOUBLE for decimals):\n"
        + "\n".join(problems))


def test_no_oracle_surfaces_hugeint_or_decimal(duck):
    """Belt-and-braces: HUGEINT/DECIMAL must never reach a final
    projection regardless of what Spark emits."""
    _, oracles = _registry()
    offenders = []
    for name, sql in sorted(oracles.items()):
        rel = duck.sql(sql)
        for c, t in zip(rel.columns, rel.types):
            if duck_type_class(t) in ("hugeint", "decimal"):
                offenders.append(f"{name}.{c}: {t}")
    assert not offenders, "\n".join(offenders)
