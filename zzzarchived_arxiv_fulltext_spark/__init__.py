"""PySpark-native main-content extraction engine.

A from-scratch reimplementation of the capabilities of
arXiv/zzzArchived_arxiv-fulltext as an idiomatic PySpark pipeline:
an interleaved text+media span table goes in, cleaned per-document
span sequences (plus plain/PSV text, lineage and metrics) come out.

Layout
------
functions/   pure text transforms (no Spark) — the correctness core
operators/   Spark DataFrame operators (extraction UDFs, dedup, ANN, metrics)
sources/     table IO (snapshot-committed parquet) + deterministic fixtures
plans/       end-to-end jobs (extraction with resume + lineage)
streaming/   incremental / structured-streaming variants
"""

__version__ = "0.1.0"

EXTRACTOR_VERSION = "spark-0.1"
