"""The extraction operator: Arrow-batched pandas UDF over span arrays.

This is the engine's single JVM→Python crossing for the hot path
(SURVEY.md §2.6): one vectorized UDF receives a batch of documents'
span arrays via Arrow, runs the pure decision tree
(:func:`..functions.extract.extract_document`) per document, and
returns one struct per document. No row-at-a-time Python dispatch; no
driver-side loops.

Reference analogue: the per-document Celery task body
(``fulltext/extract.py:194-230``) and the extractor fallback ladder
(``extractor/fulltext/fulltext.py:136-178``), collapsed into one
DataFrame stage.
"""

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .. import EXTRACTOR_VERSION
from ..functions.extract import extract_document
from ..schema import EXTRACT_RESULT


@pandas_udf(EXTRACT_RESULT)
def extract_spans_udf(spans: pd.Series) -> pd.DataFrame:
    """Batch of span arrays → batch of extraction result structs."""
    results = [extract_document(doc_spans) for doc_spans in spans]
    return pd.DataFrame(results)


def salt_column(parallelism: int, over: Column | None = None) -> Column:
    """Skew-spreading repartition key.

    Documents cannot be split below row granularity, so balance comes
    from spreading many docs uniformly over ``parallelism·8`` buckets
    (a giant doc then shares its partition with ~1/8 of a normal
    partition's docs on average). Cheap JVM-side hash, no extra scan.
    """
    over = F.col("doc_id") if over is None else over
    return F.pmod(F.xxhash64(over), F.lit(parallelism * 8))


def extract_documents(df: DataFrame, parallelism: int | None = None) -> DataFrame:
    """input (doc_id, spans) → extracted output columns.

    Plan shape: scan → repartition(salt) → project(UDF) — map-only
    besides the single skew-spreading exchange; the UDF result struct
    is expanded via ``result.*`` so Catalyst can prune unused columns
    downstream.
    """
    if parallelism is not None:
        df = df.repartition(parallelism, salt_column(parallelism))

    started = F.current_timestamp()
    return (
        df.withColumn("result", extract_spans_udf(F.col("spans")))
        .select(
            "doc_id",
            "result.*",
            F.lit(EXTRACTOR_VERSION).alias("extractor_version"),
            started.alias("started"),
            F.current_timestamp().alias("ended"),
            F.spark_partition_id().alias("partition_id"),
        )
    )
