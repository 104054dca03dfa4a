"""S4/S5 HTTP fetch stage against a real local http.server."""

import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from zzzarchived_arxiv_fulltext_spark.functions.pdf_text import (
    make_simple_pdf,
)
from zzzarchived_arxiv_fulltext_spark.sources.http_fetch import (
    _checksum,
    fetch_documents,
)

PDF = make_simple_pdf([["Fetched page one."]])
LATE_HITS = {"n": 0}


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):  # quiet
        pass

    def do_GET(self):
        if self.path == "/pdf/good":
            self._send(200, "application/pdf", PDF)
        elif self.path == "/pdf/late":
            # the reference's classic route: 200 with HTML until the
            # PDF is generated (legacy.py content-type retry loop)
            LATE_HITS["n"] += 1
            if LATE_HITS["n"] <= 2:
                self._send(200, "text/html", b"<html>not yet</html>")
            else:
                self._send(200, "application/pdf", PDF)
        elif self.path == "/pdf/never":
            self._send(200, "text/html", b"<html>never</html>")
        elif self.path == "/pdf/big":
            self._send(200, "application/pdf", b"x" * 100_000)
        elif self.path == "/pdf/boom":
            self._send(500, "text/plain", b"boom")
        else:
            self._send(404, "text/plain", b"nope")

    def _send(self, code, ctype, body):
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture(scope="module")
def base_url():
    srv = HTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_fetch_classifies_and_checksums(spark, base_url):
    rows = [("good", f"{base_url}/pdf/good"),
            ("late", f"{base_url}/pdf/late"),
            ("never", f"{base_url}/pdf/never"),
            ("missing", f"{base_url}/pdf/missing"),
            ("boom", f"{base_url}/pdf/boom"),
            ("big", f"{base_url}/pdf/big")]
    df = spark.createDataFrame(rows, "doc_id string, url string")
    got = {r["doc_id"]: r for r in fetch_documents(
        df, expect_content_type="application/pdf", retries=5,
        retry_sleep=0.0, max_bytes=50_000,
        fetch_partitions=1,  # single worker so LATE_HITS is ordered
    ).collect()}

    assert got["good"]["failure_class"] is None
    assert bytes(got["good"]["payload"]) == PDF
    assert got["good"]["n_bytes"] == len(PDF)
    assert got["good"]["checksum"] == _checksum(PDF)
    assert got["good"]["content_type"] == "application/pdf"

    # content-type retry loop recovered the late PDF
    assert got["late"]["failure_class"] is None
    assert bytes(got["late"]["payload"]) == PDF

    assert got["never"]["failure_class"] == "wrong_content_type"
    assert got["never"]["payload"] is None
    assert got["missing"]["failure_class"] == "not_found"
    assert got["missing"]["status_code"] == 404
    assert got["boom"]["failure_class"] == "http_500"
    # oversize payload → fetch_error, row survives
    assert got["big"]["failure_class"] == "fetch_error"


def test_fetch_feeds_pdf_ingestion(spark, base_url):
    from pyspark.sql import functions as F

    from zzzarchived_arxiv_fulltext_spark.sources.pdf_ingest import (
        pdf_to_spans,
    )

    df = spark.createDataFrame(
        [("d1", f"{base_url}/pdf/good")], "doc_id string, url string")
    fetched = fetch_documents(df, expect_content_type="application/pdf",
                              retry_sleep=0.0)
    spans = pdf_to_spans(
        fetched.where(F.col("failure_class").isNull())
        .select("doc_id", F.col("payload").alias("pdf"))).collect()
    assert len(spans) == 1
    assert [s["text"] for s in spans[0]["spans"]] == ["Fetched page one."]


def test_injected_fetcher_no_network(spark):
    def fake(url):
        if url.endswith("/ok"):
            return 200, {"content-type": "application/pdf"}, b"%PDF-ok"
        return 404, {}, b""

    df = spark.createDataFrame(
        [("a", "fake://x/ok"), ("b", "fake://x/gone")],
        "doc_id string, url string")
    got = {r["doc_id"]: r for r in
           fetch_documents(df, expect_content_type="application/pdf",
                           fetcher=fake).collect()}
    assert bytes(got["a"]["payload"]) == b"%PDF-ok"
    assert got["b"]["failure_class"] == "not_found"


def test_fetcher_exception_isolates_per_row(spark):
    def flaky(url):
        if "bad" in url:
            raise RuntimeError("socket reset")
        return 200, {"content-type": "text/plain"}, b"ok"

    df = spark.createDataFrame(
        [("a", "fake://good"), ("b", "fake://bad"), ("c", "fake://good2")],
        "doc_id string, url string")
    got = {r["doc_id"]: r for r in
           fetch_documents(df, fetcher=flaky).collect()}
    assert got["a"]["failure_class"] is None
    assert got["b"]["failure_class"] == "fetch_error"
    assert got["c"]["failure_class"] is None


def test_injected_fetcher_natural_header_casing(spark):
    """Review fix: header keys from an injected transport arrive in
    natural casing and must still satisfy expect_content_type."""
    def fake(url):
        return 200, {"Content-Type": "application/pdf",
                     "ETag": "abc"}, b"%PDF-x"

    df = spark.createDataFrame([("a", "fake://x")],
                               "doc_id string, url string")
    r = fetch_documents(df, expect_content_type="application/pdf",
                        retry_sleep=0.0, fetcher=fake).collect()[0]
    assert r["failure_class"] is None
    assert bytes(r["payload"]) == b"%PDF-x"
    assert r["content_type"] == "application/pdf"


def test_same_host_urls_land_in_one_partition(spark):
    """VERDICT r5 #6: per-host co-location — every host maps to
    exactly one partition after politeness partitioning, at any
    partition count."""
    from pyspark.sql import functions as F

    from zzzarchived_arxiv_fulltext_spark.sources.http_fetch import (
        partition_urls_by_host,
    )

    rows = [(str(i), "https://host%d.example/p/%d" % (i % 7, i))
            for i in range(140)]
    ids = spark.createDataFrame(rows, ["doc_id", "url"])
    for n in (3, 8):
        parted = partition_urls_by_host(ids, n).withColumn(
            "p", F.spark_partition_id())
        per_host = (parted
                    .withColumn("host", F.regexp_extract(
                        "url", r"https://([^/]+)/", 1))
                    .groupBy("host")
                    .agg(F.count_distinct("p").alias("np"))
                    .collect())
        assert per_host and all(r["np"] == 1 for r in per_host)


def test_host_delay_spaces_same_host_requests(spark):
    """Consecutive requests to one host are spaced >= host_delay.
    The injected fetcher returns its call timestamp AS the payload
    (the fetcher runs in the executor process, so a driver-side
    closure list would stay empty)."""
    from zzzarchived_arxiv_fulltext_spark.sources.http_fetch import (
        fetch_documents,
    )

    def stamping_fetcher(url):
        import time as _t
        return 200, {"content-type": "application/pdf"}, \
            repr(_t.monotonic()).encode()

    rows = [("a1", "https://same.example/1"),
            ("a2", "https://same.example/2"),
            ("a3", "https://same.example/3"),
            ("b1", "https://other.example/1")]
    df = spark.createDataFrame(rows, ["doc_id", "url"])
    out = fetch_documents(
        df, fetcher=stamping_fetcher, host_delay=0.25,
        fetch_partitions=1).collect()
    assert all(r["failure_class"] is None for r in out)
    ts = {r["url"]: float(bytes(r["payload"])) for r in out}
    same = sorted(v for u, v in ts.items() if "same.example" in u)
    assert len(same) == 3
    assert same[1] - same[0] >= 0.24 and same[2] - same[1] >= 0.24
    assert "https://other.example/1" in ts


def test_zero_delay_default_keeps_round_robin(spark):
    """Without host_delay, existing behavior is unchanged (round-robin
    repartition, no sleeps) — politeness is opt-in."""
    from zzzarchived_arxiv_fulltext_spark.sources.http_fetch import (
        fetch_documents,
    )

    df = spark.createDataFrame(
        [(str(i), "https://h%d.example/x" % i) for i in range(8)],
        ["doc_id", "url"])
    out = fetch_documents(
        df, fetcher=lambda u: (200, {"content-type": "text/x"}, b"ok"),
        fetch_partitions=4).collect()
    assert len(out) == 8
    assert all(r["failure_class"] is None for r in out)
