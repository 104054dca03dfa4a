"""Unified raw-document ingestion: one entry point for a mixed crawl.

Real corpora arrive as a bag of bytes — PDFs, HTML pages, plain text,
and junk interleaved in one table. ``raw_to_spans`` sniffs each
payload's format from magic bytes and routes it to the right parser
(``functions/pdf_text``, ``functions/html_extract``, UTF-8 decode),
emitting the INPUT_SCHEMA span shape plus a ``format`` column, so one
map-only stage turns any crawl dump into the extraction pipeline's
input. Undecodable payloads yield empty spans with
``format='unknown'`` — the row survives for accounting, matching the
failure-isolation contract of the extraction job (P2).

Scale shape: identical to ``pdf_to_spans`` — map-only mapInPandas, no
shuffle, payload crosses into Python once.
"""

from typing import Iterator, List

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..functions.html_extract import extract_main_spans
from ..functions.pdf_text import extract_pdf_page_texts
from ..schema import INPUT_SPAN
from .pdf_ingest import build_pdf_spans
from .warc import gunzip_members

ROUTED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("format", T.StringType(), False),
        T.StructField("spans", T.ArrayType(INPUT_SPAN), False),
    ]
)


def sniff_format(data: bytes) -> str:
    """'pdf' | 'ps' | 'html' | 'text' | 'unknown' from leading bytes."""
    if not data:
        return "unknown"
    if data.startswith(b"%PDF"):
        return "pdf"
    if data.startswith(b"%!"):
        return "ps"
    if (b"\\documentclass" in data[:2048]
            or b"\\begin{document}" in data[:2048]):
        return "tex"
    head = data[:2048].lstrip()
    low = head[:256].lower()
    if low.startswith(b"<!doctype") or low.startswith(b"<html") or (
            head.startswith(b"<") and b">" in head):
        return "html"
    try:
        data.decode("utf-8")
        return "text"
    except UnicodeDecodeError:
        return "unknown"


def _spans_for(doc_id: str, data: bytes, fmt: str) -> List[dict]:
    if fmt == "pdf":
        return build_pdf_spans(doc_id, data, extract_pdf_page_texts(data))
    if fmt == "ps":
        from ..functions.ps_text import extract_ps_page_texts
        from .ps_ingest import build_ps_spans

        return build_ps_spans(doc_id, data, extract_ps_page_texts(data))
    if fmt == "tex":
        import re as _re

        from ..functions.tex_text import extract_tex_text

        src = data.decode("utf-8", "replace")
        text = extract_tex_text(src)
        spans = []
        if text:
            spans.append({"kind": "text", "text": text,
                          "media_ref": None, "offset": 0})
        for m in range(len(_re.findall(r"\\includegraphics", src))):
            spans.append({"kind": "media", "text": None,
                          "media_ref": f"teximg://{doc_id}/{m}",
                          "offset": len(spans)})
        return spans
    if fmt == "html":
        return extract_main_spans(data.decode("utf-8", "replace"))
    if fmt == "text":
        return [{"kind": "text", "text": data.decode("utf-8"),
                 "media_ref": None, "offset": 0}]
    return []


def read_raw_dir(spark, path: str, glob: str = "*",
                 recursive: bool = True) -> DataFrame:
    """A directory of raw files on disk/object storage → (doc_id,
    payload) rows, via Spark's ``binaryFile`` source.

    The from-disk twin of the reference's filesystem walk
    (``extractor/fulltext/fulltext.py:136-178``): doc_id is the file
    path, payload the bytes. binaryFile is split-per-file and predicate
    -prunes on path/length/modificationTime, so a 10^9-file bucket
    scans in parallel with no driver-side listing loop. Chain into
    :func:`raw_to_spans` for the span table.
    """
    from pyspark.sql import functions as F  # noqa: WPS433 (local, thin)

    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", str(recursive).lower())
        .load(path)
        .select(F.col("path").alias("doc_id"),
                F.col("content").alias("payload"))
    )


def raw_to_spans(raw: DataFrame, payload_col: str = "payload",
                 id_col: str = "doc_id") -> DataFrame:
    """(doc_id, payload:binary) → (doc_id, format, spans)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids, fmts, spans = [], [], []
            for doc_id, payload in zip(batch[id_col], batch[payload_col]):
                data = bytes(payload) if payload is not None else b""
                data = gunzip_members(data)  # transparent gzip wrapper
                fmt = sniff_format(data)
                ids.append(str(doc_id))
                fmts.append(fmt)
                spans.append(_spans_for(str(doc_id), data, fmt))
            yield pd.DataFrame(
                {"doc_id": ids, "format": fmts, "spans": spans})

    return raw.mapInPandas(run, schema=ROUTED_SCHEMA)
