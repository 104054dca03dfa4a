"""PII redaction and context-window segmentation."""

import pytest
from pyspark.sql import functions as F

from zzzarchived_arxiv_fulltext_spark.operators.redact import (
    redact_pii,
    segment_tokens,
)


def test_redaction_replaces_and_counts(spark):
    df = spark.createDataFrame(
        [
            ("a", "mail bob@site.org and carol.x@a.co.uk now"),
            ("b", "see https://ex.com/u?token=abc@evil.com for info"),
            ("c", "call +1 (555) 123-4567 or 555-123-4567"),
            ("d", "host 10.0.0.1 and 192.168.001.255 up"),
            ("e", "nothing sensitive here"),
        ],
        "doc_id string, text string",
    )
    got = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert got["a"]["redacted"] == "mail <EMAIL> and <EMAIL> now"
    assert got["a"]["n_email"] == 2
    # the email inside the URL is consumed by URL redaction, not
    # double-counted as an email
    assert got["b"]["redacted"] == "see <URL> for info"
    assert (got["b"]["n_url"], got["b"]["n_email"]) == (1, 0)
    assert got["c"]["redacted"] == "call <PHONE> or <PHONE>"
    assert got["c"]["n_phone"] == 2
    assert got["d"]["redacted"] == "host <IP> and <IP> up"
    assert got["e"]["redacted"] == "nothing sensitive here"
    assert all(got["e"][c] == 0
               for c in ("n_url", "n_email", "n_phone", "n_ipv4"))


def test_segments_cover_all_tokens_with_overlap(spark):
    words = [f"w{i}" for i in range(100)]
    df = spark.createDataFrame([("d", " ".join(words))],
                               "doc_id string, text string")
    segs = sorted(
        (r["seg_id"], r["seg_text"].split(" "))
        for r in segment_tokens(df, max_tokens=48, stride=32).collect()
    )
    # starts 0, 32, 64 — last window reaches the end
    assert [s for s, _ in segs] == [0, 1, 2]
    assert segs[0][1] == words[0:48]
    assert segs[1][1] == words[32:80]
    assert segs[2][1] == words[64:100]
    covered = {w for _, seg in segs for w in seg}
    assert covered == set(words)


def test_short_doc_is_one_segment(spark):
    df = spark.createDataFrame([("d", "just five little words here")],
                               "doc_id string, text string")
    rows = segment_tokens(df, max_tokens=48, stride=32).collect()
    assert len(rows) == 1 and rows[0]["seg_text"].startswith("just")
    with pytest.raises(ValueError):
        segment_tokens(df, max_tokens=0)


def test_iban_redaction(spark):
    from zzzarchived_arxiv_fulltext_spark.operators.redact import (
        redact_pii,
    )

    df = spark.createDataFrame(
        [(1, "pay DE89370400440532013000 or GB29NWBK60161331926819 now"),
         (2, "no iban, just a phone +1 555-123-4567")],
        "doc_id int, text string")
    got = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert got[1]["n_iban"] == 2
    assert "<IBAN>" in got[1]["redacted"]
    assert "DE89" not in got[1]["redacted"]
    assert got[2]["n_iban"] == 0
    assert got[2]["n_phone"] == 1  # phone still matches, not eaten
