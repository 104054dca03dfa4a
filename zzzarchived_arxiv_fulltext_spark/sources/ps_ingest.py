"""Raw-PostScript ingestion: PS bytes → the interleaved-span table.

The PS half of the reference's "PDF/PS → plain text" charter (arXiv's
pre-2000s corpus is PostScript; the reference shelled to binaries
that consumed both formats — extractor/fulltext/fulltext.py:50-109).
One Arrow-batched ``mapInPandas`` stage runs the tokenizer-level
interpreter in ``functions/ps_text.py`` and emits one text span per
page plus one media span per ``image`` operator, interleaved at the
page's position — the same ``INPUT_SCHEMA`` shape ``pdf_to_spans``
produces, so the extraction pipeline is format-blind downstream.

Scale shape: map-only, no shuffle, payload crosses into Python once —
identical plan profile to ``pdf_to_spans`` (SCALE.md arguments apply
unchanged).
"""

from typing import Iterator, List

import pandas as pd
from pyspark.sql import DataFrame

from ..functions.ps_text import extract_ps_page_texts, ps_page_image_counts
from .pdf_ingest import INGEST_SCHEMA


def build_ps_spans(doc_id: str, data: bytes,
                   pages: List[str]) -> List[dict]:
    """Interleaved span list for one parsed PS document.

    ``pages`` must come from ``extract_ps_page_texts(data)`` — the
    interpreter emits text and image counts in one pass, so page
    alignment is exact by construction (no PDF-style page-tree
    realignment needed). Media refs are ``psimg://{doc_id}/{m}`` with
    ``m`` the document-order image index.
    """
    per_page = ps_page_image_counts(data) if data else []
    spans: List[dict] = []
    img_idx = 0
    for k, page in enumerate(pages):
        spans.append({"kind": "text", "text": page,
                      "media_ref": None, "offset": len(spans)})
        for _ in range(per_page[k] if k < len(per_page) else 0):
            spans.append({
                "kind": "media", "text": None,
                "media_ref": f"psimg://{doc_id}/{img_idx}",
                "offset": len(spans),
            })
            img_idx += 1
    return spans


def ps_to_spans(ps: DataFrame, strip_furniture: bool = False) -> DataFrame:
    """(doc_id, ps:binary) → (doc_id, spans, failure_class).

    ``failure_class`` is always NULL today (PostScript has no standard
    document encryption analogous to PDF /Encrypt); the column is kept
    so PS and PDF ingest union cleanly into one table.
    ``strip_furniture=True`` removes running headers/footers via the
    shared positional heuristic before span emission.
    """
    from ..functions.quality import strip_page_furniture

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out_ids, out_spans, out_fail = [], [], []
            for doc_id, payload in zip(batch["doc_id"], batch["ps"]):
                data = bytes(payload) if payload is not None else b""
                pages = extract_ps_page_texts(data)
                if strip_furniture:
                    pages, _ = strip_page_furniture(pages)
                out_ids.append(doc_id)
                out_spans.append(build_ps_spans(doc_id, data, pages))
                out_fail.append(None)
            yield pd.DataFrame({"doc_id": out_ids, "spans": out_spans,
                                "failure_class": out_fail})

    return ps.mapInPandas(run, schema=INGEST_SCHEMA)
