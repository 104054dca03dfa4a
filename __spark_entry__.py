"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship extraction pipeline end-to-end on
sf0.001: span-ize the documents table (interleaved text+media spans,
scrambled order), run the Arrow-batched extraction UDF, return the
per-document span sequences + metrics.

``queries()`` / ``oracle_sql()`` expose the operator battery in
``zzzarchived_arxiv_fulltext_spark.queries`` — every registered query
carries a DuckDB oracle (UDF-backed pipelines included, via planted
deterministic inputs and closed-form SQL twins).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))


def _prepare(spark: SparkSession) -> None:
    """Ship the engine package to the session's executors.

    The driver harness builds its OWN SparkSession from an arbitrary
    cwd; without this, executor python workers cannot unpickle the
    engine's UDFs. Idempotent per application.
    """
    from zzzarchived_arxiv_fulltext_spark.config import ship_package

    ship_package(spark)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: interleaved-span extraction on sf0.001."""
    _prepare(spark)
    from zzzarchived_arxiv_fulltext_spark.operators.span_extract import (
        extract_documents,
    )
    from zzzarchived_arxiv_fulltext_spark.sources.spanize import (
        spanized_documents,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    extracted = extract_documents(spanized_documents(docs), parallelism=None)
    # project a stable, timestamp-free schema for the smoke check
    return extracted.select(
        "doc_id", "spans", "plain_text", "psv_text", "status",
        "failure_class", "via", "chars_extracted", "n_text_spans",
        "n_media_spans",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from zzzarchived_arxiv_fulltext_spark.queries import QUERIES

    def with_shipping(fn):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            _prepare(spark)
            return fn(spark, sf_dir)
        return wrapped

    return {name: with_shipping(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from zzzarchived_arxiv_fulltext_spark.queries import ORACLES

    return dict(ORACLES)
