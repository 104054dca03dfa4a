"""Span-sequence equality: Spark pipeline vs the pure-Python oracle.

The north-rule invariant: for every document, the Spark-extracted span
sequence equals the oracle's, compared on (kind, text, media_ref,
order).
"""

import pytest

from zzzarchived_arxiv_fulltext_spark.functions import extract_document
from zzzarchived_arxiv_fulltext_spark.operators.span_extract import extract_documents
from zzzarchived_arxiv_fulltext_spark.sources.fixtures import make_doc, spans_table

N_DOCS = 500
SEED = 42


@pytest.fixture(scope="module")
def extracted_rows(spark):
    df = extract_documents(spans_table(spark, N_DOCS, SEED), parallelism=8)
    rows = {r["doc_id"]: r for r in df.collect()}
    assert len(rows) == N_DOCS
    return rows


def _span_tuples(spans):
    return [(s["kind"], s["text"], s["media_ref"], s["order"]) for s in spans]


def test_span_sequence_equality_vs_oracle(extracted_rows):
    mismatches = []
    for i in range(N_DOCS):
        doc_id, raw_spans = make_doc(i, SEED)
        oracle = extract_document(raw_spans)
        got = extracted_rows[doc_id]
        if _span_tuples(got["spans"]) != _span_tuples(oracle["spans"]):
            mismatches.append(doc_id)
    assert mismatches == []


def test_plain_psv_status_metrics_vs_oracle(extracted_rows):
    for i in range(0, N_DOCS, 7):
        doc_id, raw_spans = make_doc(i, SEED)
        oracle = extract_document(raw_spans)
        got = extracted_rows[doc_id]
        assert got["plain_text"] == oracle["plain_text"], doc_id
        assert got["psv_text"] == oracle["psv_text"], doc_id
        assert got["status"] == oracle["status"], doc_id
        assert got["failure_class"] == oracle["failure_class"], doc_id
        assert got["via"] == oracle["via"], doc_id
        assert got["chars_extracted"] == oracle["chars_extracted"], doc_id
        assert got["n_text_spans"] == oracle["n_text_spans"], doc_id
        assert got["n_media_spans"] == oracle["n_media_spans"], doc_id


def test_fixture_mix_covers_all_paths(extracted_rows):
    statuses = {r["status"] for r in extracted_rows.values()}
    vias = {r["via"] for r in extracted_rows.values()}
    assert statuses == {"succeeded", "failed"}
    assert {"primary", "layout_retry", "none"} <= vias
    # media handling: media-only docs exist and keep spans
    media_only = [
        r for r in extracted_rows.values()
        if r["n_media_spans"] > 0 and r["n_text_spans"] == 0
    ]
    assert media_only and all(len(r["spans"]) > 0 for r in media_only)


def test_generator_is_deterministic_across_partitioning(spark):
    a = spans_table(spark, 50, SEED, parallelism=1).collect()
    b = spans_table(spark, 50, SEED, parallelism=7).collect()
    key = lambda r: r["doc_id"]
    assert sorted(a, key=key) == sorted(b, key=key)
