"""Raw-HTML ingestion: web documents → main-content plain text.

The web-document twin of ``pdf_ingest``: one Arrow-batched pandas UDF
runs the deterministic DOM-heuristic extractor
(``functions/html_extract.py``) per document. Map-only — no shuffle,
one JVM→Python crossing carrying only (id, html) strings.
"""

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..functions.html_extract import DEFAULT_MAX_LINK_DENSITY, extract_main_text


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
