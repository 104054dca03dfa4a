"""Semi-structured column handling: schema inference + flattening.

Crawl/event tables carry JSON string columns whose shape is only
discoverable from the data. ``flatten_json`` infers a schema from a
bounded sample (driver-side, `sample` rows max) and expands the
column into typed top-level fields via ``from_json`` — after which
the fields are ordinary Catalyst columns (prunable, filterable,
aggregable). Rows that do not parse yield NULL fields, never errors.
"""

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def infer_json_schema(df: DataFrame, json_col: str, sample: int = 200):
    """Schema of the JSON column from a bounded sample (one driver
    action over ``sample`` rows; the inferred schema is the union of
    the sampled shapes)."""
    spark = df.sparkSession
    rows = [r[0] for r in
            df.select(json_col).where(F.col(json_col).isNotNull())
            .limit(sample).collect()]
    if not rows:
        raise ValueError(f"no non-null rows to infer {json_col!r} from")
    schema = spark.read.json(
        spark.sparkContext.parallelize(rows, 1)).schema
    bad = [f.name for f in schema.fields if f.name == "_corrupt_record"]
    if bad:
        schema = type(schema)(
            [f for f in schema.fields if f.name != "_corrupt_record"])
    return schema


def flatten_json(df: DataFrame, json_col: str, sample: int = 200,
                 prefix: str = "") -> DataFrame:
    """Replace ``json_col`` with its fields as top-level columns.

    ``prefix`` namespaces the new columns (collision protection when
    field names shadow existing columns).
    """
    schema = infer_json_schema(df, json_col, sample)
    parsed = df.withColumn("_flat", F.from_json(F.col(json_col), schema))
    cols = [c for c in df.columns if c != json_col]
    out = parsed.select(
        *cols,
        *[F.col(f"_flat.{f.name}").alias(f"{prefix}{f.name}")
          for f in schema.fields],
    )
    return out
