"""WARC (Web ARChive) ingestion: crawl containers → raw documents.

Real web-scale corpora arrive as WARC files (the Common Crawl /
Internet Archive container): a concatenation of records, each with
WARC headers, an optional HTTP envelope, and a payload — usually
stored as per-record gzip members. This module parses that structure
with the stdlib only:

- multi-member gzip streams (one ``zlib.decompressobj`` per member,
  chained through ``unused_data``),
- WARC/1.x record headers (``Content-Length``-delimited payloads),
- HTTP response envelopes (status line + headers stripped).

``warc_to_raw`` is the Spark stage: one Arrow-batched ``mapInPandas``
over binary WARC payloads (e.g. from ``read_raw_dir``) that explodes
each container into (doc_id=WARC-Target-URI, payload=response body)
rows — exactly the shape ``ingest_router.raw_to_spans`` consumes, so
WARC → spans → extraction is three chained map-only stages.
"""

import zlib
from typing import Iterator, List, Optional, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

RAW_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
    ]
)


def gunzip_members(data: bytes) -> bytes:
    """Decompress a (possibly multi-member) gzip stream; raw input
    passes through unchanged when it is not gzip."""
    if not data.startswith(b"\x1f\x8b"):
        return data
    out = bytearray()
    rest = data
    while rest.startswith(b"\x1f\x8b"):
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        try:
            out += d.decompress(rest)
        except zlib.error:
            break
        rest = d.unused_data
    return bytes(out)


def _parse_headers(block: bytes) -> dict:
    headers = {}
    for line in block.split(b"\r\n"):
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().lower().decode("latin-1")] = \
                v.strip().decode("latin-1")
    return headers


def iter_warc_records(data: bytes) -> Iterator[Tuple[dict, bytes]]:
    """Yield (warc_headers, record_payload) for every record.

    Gzip members are inflated first; malformed tails terminate
    iteration instead of raising (truncated crawls are normal).
    """
    data = gunzip_members(data)
    pos = 0
    n = len(data)
    while True:
        start = data.find(b"WARC/", pos)
        if start < 0 or start >= n:
            return
        head_end = data.find(b"\r\n\r\n", start)
        if head_end < 0:
            return
        headers = _parse_headers(data[start:head_end])
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            return
        body_start = head_end + 4
        if body_start + length > n:
            length = max(n - body_start, 0)  # truncated final record
        yield headers, data[body_start:body_start + length]
        pos = body_start + length


def _dechunk(body: bytes) -> bytes:
    """Undo HTTP/1.1 chunked transfer framing: each chunk is
    ``<hex-size>[;ext]\\r\\n<data>\\r\\n``, terminated by a 0-size
    chunk (optionally followed by trailers). Malformed framing
    returns what was decoded so far plus nothing invented — junk-safe
    for truncated records.
    """
    out = bytearray()
    i, n = 0, len(body)
    while i < n:
        eol = body.find(b"\r\n", i)
        if eol < 0:
            break
        size_tok = body[i:eol].split(b";", 1)[0].strip()
        try:
            size = int(size_tok, 16)
        except ValueError:
            break
        if size == 0:  # terminal chunk (trailers ignored)
            break
        data_start = eol + 2
        out += body[data_start:data_start + size]
        i = data_start + size + 2  # skip the chunk's trailing CRLF
    return bytes(out)


def http_body(payload: bytes) -> Optional[bytes]:
    """Strip an HTTP response envelope; None when there is none.

    Common Crawl response records frequently use
    ``Transfer-Encoding: chunked`` — without de-chunking, hex
    chunk-size tokens stay in the payload, corrupting format sniffing
    and leaking into extracted text (ADVICE r3).
    """
    if not payload.startswith(b"HTTP/"):
        return None
    sep = payload.find(b"\r\n\r\n")
    if sep < 0:
        return None
    headers = _parse_headers(payload[:sep])
    body = payload[sep + 4:]
    if "chunked" in headers.get("transfer-encoding", "").lower():
        return _dechunk(body)
    return body


def warc_documents(data: bytes) -> List[Tuple[str, bytes]]:
    """(target_uri, document_bytes) for every response/resource record."""
    docs = []
    for headers, payload in iter_warc_records(data):
        rtype = headers.get("warc-type", "")
        uri = headers.get("warc-target-uri")
        if not uri or rtype not in ("response", "resource"):
            continue
        body = http_body(payload) if rtype == "response" else payload
        if body is None:
            body = payload
        docs.append((uri, body))
    return docs


def warc_to_raw(warcs: DataFrame, warc_col: str = "payload",
                id_col: str = "doc_id") -> DataFrame:
    """(container_id, warc_bytes) → one (doc_id=URI, payload) row per
    archived document, ready for ``raw_to_spans``."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids, payloads = [], []
            for blob in batch[warc_col]:
                data = bytes(blob) if blob is not None else b""
                for uri, body in warc_documents(data):
                    ids.append(uri)
                    payloads.append(body)
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return warcs.mapInPandas(run, schema=RAW_SCHEMA)
