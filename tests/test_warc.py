"""WARC container parsing: multi-member gzip, record walk, HTTP
envelope strip, and the full WARC → spans chain."""

import gzip

from zzzarchived_arxiv_fulltext_spark.functions.pdf_text import make_simple_pdf
from zzzarchived_arxiv_fulltext_spark.sources.warc import (
    gunzip_members,
    iter_warc_records,
    warc_documents,
    warc_to_raw,
)


def _record(rtype: str, uri: str, payload: bytes) -> bytes:
    head = (f"WARC/1.0\r\nWARC-Type: {rtype}\r\n"
            f"WARC-Target-URI: {uri}\r\n"
            f"Content-Length: {len(payload)}\r\n").encode()
    return head + b"\r\n" + payload + b"\r\n\r\n"


def _http(body: bytes, ctype: str = "text/html") -> bytes:
    return (f"HTTP/1.1 200 OK\r\nContent-Type: {ctype}\r\n"
            f"Content-Length: {len(body)}\r\n").encode() + b"\r\n" + body


_HTML = b"<html><body><p>archived page body text</p></body></html>"
_PDF = make_simple_pdf([["archived pdf text"]])


def _warc(per_record_gzip: bool = False) -> bytes:
    records = [
        _record("request", "http://a.example/", b"GET / HTTP/1.1\r\n"),
        _record("response", "http://a.example/", _http(_HTML)),
        _record("resource", "http://b.example/doc.pdf", _PDF),
        _record("metadata", "http://a.example/", b"via: crawler"),
    ]
    if per_record_gzip:
        return b"".join(gzip.compress(r) for r in records)
    return b"".join(records)


def test_gunzip_members():
    parts = [b"alpha ", b"beta ", b"gamma"]
    stream = b"".join(gzip.compress(p) for p in parts)
    assert gunzip_members(stream) == b"alpha beta gamma"
    assert gunzip_members(b"not gzip") == b"not gzip"
    assert gunzip_members(b"") == b""
    # corrupt member: best-effort prefix, no raise
    assert gunzip_members(gzip.compress(b"ok") + b"\x1f\x8b\xff") == b"ok"


def test_warc_record_walk_and_documents():
    for gz in (False, True):
        data = _warc(per_record_gzip=gz)
        records = list(iter_warc_records(data))
        assert [h.get("warc-type") for h, _ in records] == [
            "request", "response", "resource", "metadata"]
        docs = dict(warc_documents(data))
        assert docs["http://a.example/"] == _HTML   # HTTP envelope gone
        assert docs["http://b.example/doc.pdf"] == _PDF
        assert len(docs) == 2                        # request/meta skipped


def test_http_chunked_transfer_is_dechunked():
    from zzzarchived_arxiv_fulltext_spark.sources.warc import http_body

    # chunked framing as Common Crawl response records carry it
    parts = [b"<html><body><p>chunked pa", b"ge</p></body></ht", b"ml>"]
    framed = b"".join(
        hex(len(p))[2:].encode() + (b"; ext=1" if i == 1 else b"")
        + b"\r\n" + p + b"\r\n"
        for i, p in enumerate(parts)
    )
    chunked = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
               b"Transfer-Encoding: chunked\r\n\r\n"
               + framed + b"0\r\nX-Trailer: v\r\n\r\n")
    assert http_body(chunked) == \
        b"<html><body><p>chunked page</p></body></html>"

    # non-chunked responses untouched
    assert http_body(_http(_HTML)) == _HTML

    # junk-safe: truncated mid-chunk / bad size token
    trunc = (b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
             b"5\r\nhello\r\nZZ\r\nrest")
    assert http_body(trunc) == b"hello"
    assert http_body(
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\nnonsense"
    ) == b""

    # end-to-end: a chunked response record still routes and parses
    body = _HTML
    chunked_http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                    b"Transfer-Encoding: chunked\r\n\r\n"
                    + hex(len(body))[2:].encode() + b"\r\n" + body
                    + b"\r\n0\r\n\r\n")
    warc = _record("response", "http://c.example/", chunked_http)
    docs = dict(warc_documents(warc))
    assert docs["http://c.example/"] == _HTML


def test_warc_truncated_tail_is_tolerated():
    data = _warc()[:-40]  # cut into the last record
    docs = dict(warc_documents(data))
    assert docs["http://a.example/"] == _HTML


def test_warc_to_spans_chain(spark):
    from zzzarchived_arxiv_fulltext_spark.sources.ingest_router import (
        raw_to_spans,
    )

    warcs = spark.createDataFrame(
        [("w1", _warc()), ("w2", _warc(per_record_gzip=True)),
         ("empty", b"")],
        "doc_id string, payload binary",
    )
    raw = warc_to_raw(warcs)
    assert raw.count() == 4  # 2 docs per non-empty container
    rows = raw_to_spans(raw).collect()  # both containers yield same URIs
    html_rows = [r for r in rows if r["format"] == "html"]
    pdf_rows = [r for r in rows if r["format"] == "pdf"]
    assert len(html_rows) == 2 and len(pdf_rows) == 2
    assert all(r["spans"][0]["text"] == "archived pdf text"
               for r in pdf_rows)
    assert all(r["spans"][0]["text"] == "archived page body text"
               for r in html_rows)
