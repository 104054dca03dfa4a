"""Raw-HTML ingestion: web documents → main-content plain text.

The web-document twin of ``pdf_ingest``: one Arrow-batched pandas UDF
runs the deterministic DOM-heuristic extractor
(``functions/html_extract.py``) per document. Map-only — no shuffle,
one JVM→Python crossing carrying only (id, html) strings.
"""

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..functions.html_extract import (
    DEFAULT_MAX_LINK_DENSITY,
    extract_main_spans,
    extract_main_text,
)
from ..schema import INPUT_SCHEMA


def html_main_text(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    max_link_density: float = DEFAULT_MAX_LINK_DENSITY,
) -> DataFrame:
    """(id, html) → (id, text): boilerplate-free main content."""

    @pandas_udf("string")
    def extract_udf(htmls: pd.Series) -> pd.Series:
        return htmls.map(
            lambda h: extract_main_text(h or "", max_link_density)
        )

    return df.select(
        F.col(id_col),
        extract_udf(F.col(html_col)).alias("text"),
    )


def html_to_spans(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    base_url_col: str = None,
    max_link_density: float = DEFAULT_MAX_LINK_DENSITY,
) -> DataFrame:
    """(doc_id, html[, base_url]) → (doc_id, spans): the INTERLEAVED
    span input table (BASELINE.json input_hint shape).

    Text blocks and media references (``img``/``video``/…) are emitted
    at their true document positions by the DOM-heuristic extractor
    (``functions.html_extract.extract_main_spans``), so downstream
    ``extract_documents`` sees the same interleaving a span-native
    corpus would carry. Map-only, one Arrow crossing; media srcs
    resolve against ``base_url_col`` when given.
    """
    cols = [id_col, html_col] + ([base_url_col] if base_url_col else [])
    narrowed = df.select(*cols)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            bases = (batch[base_url_col] if base_url_col
                     else [None] * len(batch))
            yield pd.DataFrame({
                "doc_id": batch[id_col],
                "spans": [
                    extract_main_spans(h or "", base, max_link_density)
                    for h, base in zip(batch[html_col], bases)
                ],
            })

    return narrowed.mapInPandas(run, schema=INPUT_SCHEMA)
