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


# -- caption-context mining (media ↔ adjacent text) --------------------------


def test_media_caption_contexts_basic(spark):
    from zzzarchived_arxiv_fulltext_spark.operators.span_extract import (
        media_caption_contexts,
    )

    def span(kind, text, ref, off):
        return {"kind": kind, "text": text, "media_ref": ref,
                "offset": off}

    rows = [
        # media between two text spans; offsets deliberately unsorted
        ("d1", [span("text", "after fig", None, 2),
                span("media", None, "img://1", 1),
                span("text", "before fig", None, 0)]),
        # media at both document edges
        ("d2", [span("media", None, "img://a", 0),
                span("text", "middle", None, 1),
                span("media", None, "img://b", 2)]),
        # consecutive media share the same neighbours
        ("d3", [span("text", "lead", None, 0),
                span("media", None, "img://x", 1),
                span("media", None, "img://y", 2),
                span("text", "tail", None, 3)]),
        # no media → contributes no rows
        ("d4", [span("text", "only text", None, 0)]),
    ]
    schema = ("doc_id string, spans array<struct<kind:string,"
              "text:string,media_ref:string,offset:int>>")
    out = {(r["doc_id"], r["media_ref"]): r for r in
           media_caption_contexts(
               spark.createDataFrame(rows, schema)).collect()}

    assert len(out) == 5
    r = out[("d1", "img://1")]
    assert (r["text_before"], r["text_after"]) == ("before fig", "after fig")
    assert out[("d2", "img://a")]["text_before"] is None
    assert out[("d2", "img://a")]["text_after"] == "middle"
    assert out[("d2", "img://b")]["text_before"] == "middle"
    assert out[("d2", "img://b")]["text_after"] is None
    for ref in ("img://x", "img://y"):
        r = out[("d3", ref)]
        assert (r["text_before"], r["text_after"]) == ("lead", "tail")


def test_media_caption_contexts_on_generated_fixture(spark):
    from zzzarchived_arxiv_fulltext_spark.operators.span_extract import (
        media_caption_contexts,
    )
    from zzzarchived_arxiv_fulltext_spark.sources.fixtures import (
        spans_table,
    )

    df = spans_table(spark, 80, SEED)
    got = media_caption_contexts(df).collect()
    n_media = df.selectExpr(
        "aggregate(transform(spans, s -> cast(s.kind = 'media' as int)),"
        " 0, (a, x) -> a + x) n").agg({"n": "sum"}).first()[0]
    # one output row per media span, each with a python-side twin
    assert len(got) == n_media
    rows = {r["doc_id"]: sorted(
        [s.asDict() for s in r["spans"]], key=lambda s: s["offset"])
        for r in df.collect()}
    for r in got:
        spans = rows[r["doc_id"]]
        i = next(k for k, s in enumerate(spans)
                 if s["kind"] == "media"
                 and s["media_ref"] == r["media_ref"]
                 and s["offset"] == r["media_offset"])
        before = next((s["text"] for s in reversed(spans[:i])
                       if s["kind"] == "text"), None)
        after = next((s["text"] for s in spans[i + 1:]
                      if s["kind"] == "text"), None)
        assert (r["text_before"], r["text_after"]) == (before, after), r


def test_drop_boilerplate_media(spark):
    from zzzarchived_arxiv_fulltext_spark.operators.span_extract import (
        drop_boilerplate_media,
    )

    def span(kind, text, ref, off):
        return {"kind": kind, "text": text, "media_ref": ref,
                "offset": off}

    rows = [
        # logo appears in all three docs → boilerplate; uniques survive
        ("d1", [span("text", "a", None, 0),
                span("media", None, "img://logo", 1),
                span("media", None, "img://u1", 2)]),
        ("d2", [span("media", None, "img://logo", 0),
                span("text", "b", None, 1)]),
        # logo TWICE in one doc still counts d3 once (distinct docs)
        ("d3", [span("media", None, "img://logo", 0),
                span("media", None, "img://logo", 1),
                span("media", None, "img://u3", 2)]),
        # media-only doc whose media all drop → empty array kept
        ("d4", [span("media", None, "img://logo", 0)]),
    ]
    schema = ("doc_id string, spans array<struct<kind:string,"
              "text:string,media_ref:string,offset:int>>")
    df = spark.createDataFrame(rows, schema)
    out = {r["doc_id"]: r for r in
           drop_boilerplate_media(df, min_docs=3).collect()}

    assert [s["media_ref"] for s in out["d1"]["spans"]
            if s["kind"] == "media"] == ["img://u1"]
    assert [s["text"] for s in out["d1"]["spans"]
            if s["kind"] == "text"] == ["a"]
    assert out["d1"]["n_media_dropped"] == 1
    assert out["d2"]["n_spans"] == 1 and out["d2"]["n_media_dropped"] == 1
    # both logo copies in d3 drop; distinct-doc count saw d3 once
    assert out["d3"]["n_media_dropped"] == 2
    assert [s["media_ref"] for s in out["d3"]["spans"]] == ["img://u3"]
    assert out["d4"]["spans"] == [] and out["d4"]["n_spans"] == 0
    # order preserved by offset after the cut
    offs = [s["offset"] for s in out["d1"]["spans"]]
    assert offs == sorted(offs)


def test_drop_boilerplate_media_min_docs_threshold(spark):
    from zzzarchived_arxiv_fulltext_spark.operators.span_extract import (
        drop_boilerplate_media,
    )

    def span(ref, off):
        return {"kind": "media", "text": None, "media_ref": ref,
                "offset": off}

    schema = ("doc_id string, spans array<struct<kind:string,"
              "text:string,media_ref:string,offset:int>>")
    df = spark.createDataFrame(
        [("a", [span("img://pair", 0)]), ("b", [span("img://pair", 0)]),
         ("c", [span("img://solo", 0)])], schema)
    out = {r["doc_id"]: r["n_media_dropped"]
           for r in drop_boilerplate_media(df, min_docs=2).collect()}
    assert out == {"a": 1, "b": 1, "c": 0}


def test_span_extraction_diff(spark):
    from zzzarchived_arxiv_fulltext_spark.operators.span_extract import (
        span_extraction_diff,
    )

    def span(kind, text, ref, off):
        return {"kind": kind, "text": text, "media_ref": ref,
                "offset": off}

    schema = ("doc_id string, spans array<struct<kind:string,"
              "text:string,media_ref:string,offset:int>>")
    old = spark.createDataFrame([
        # unchanged (offsets renumbered — must NOT count as a change)
        ("same", [span("text", "a", None, 0),
                  span("media", None, "m1", 1)]),
        # changed: second text span rewritten
        ("chg", [span("text", "a", None, 0),
                 span("text", "b", None, 1),
                 span("media", None, "m2", 2)]),
        # removed doc
        ("gone", [span("text", "x", None, 0)]),
        # duplicate spans: old has the same text twice, new once
        ("dup", [span("text", "t", None, 0),
                 span("text", "t", None, 1)]),
    ], schema)
    new = spark.createDataFrame([
        ("same", [span("text", "a", None, 10),
                  span("media", None, "m1", 20)]),
        ("chg", [span("text", "a", None, 0),
                 span("text", "B", None, 1),
                 span("media", None, "m2", 2)]),
        ("dup", [span("text", "t", None, 0)]),
        # added doc
        ("new", [span("media", None, "m9", 0)]),
    ], schema)

    out = {r["doc_id"]: r for r in
           span_extraction_diff(old, new).collect()}

    assert out["same"]["status"] == "unchanged"
    assert out["same"]["common_prefix"] == 2
    assert not out["same"]["text_changed"]
    assert out["same"]["n_added"] == 0 and out["same"]["n_removed"] == 0

    assert out["chg"]["status"] == "changed"
    assert out["chg"]["common_prefix"] == 1      # diverges at span 2
    assert out["chg"]["text_changed"]
    # multiset: 'a' + media survive, 'b' removed, 'B' added
    assert out["chg"]["n_common"] == 2
    assert out["chg"]["n_added"] == 1 and out["chg"]["n_removed"] == 1

    assert out["gone"]["status"] == "only_old"
    assert out["gone"]["n_spans_new"] == 0
    assert out["gone"]["n_removed"] == 1 and out["gone"]["n_common"] == 0

    assert out["new"]["status"] == "only_new"
    assert out["new"]["n_added"] == 1 and out["new"]["n_spans_old"] == 0

    # duplicate handling: multiset intersection counts ONE shared 't'
    assert out["dup"]["status"] == "changed"
    assert out["dup"]["n_common"] == 1
    assert out["dup"]["n_removed"] == 1 and out["dup"]["n_added"] == 0
    assert out["dup"]["common_prefix"] == 1


def test_span_integrity_flags_each_violation(spark):
    from zzzarchived_arxiv_fulltext_spark.operators.span_audit import (
        span_doc_flags,
        span_integrity_report,
    )

    def span(kind, text, ref, off):
        return {"kind": kind, "text": text, "media_ref": ref,
                "offset": off}

    rows = [
        ("clean", [span("text", "a", None, 0),
                   span("media", None, "m://1", 1)]),
        ("gap", [span("text", "a", None, 0),
                 span("text", "b", None, 2)]),
        ("dup", [span("text", "a", None, 0),
                 span("text", "b", None, 0)]),
        ("leak", [span("text", "a", "m://x", 0)]),
        ("mtext", [span("media", "oops", "m://y", 0)]),
        ("weird", [span("blob", "a", None, 0)]),
        ("empty", []),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>")
    flags = {r["doc_id"]: r for r in span_doc_flags(df).collect()}
    assert flags["clean"]["offsets_not_dense"] == 0
    assert all(flags["clean"][c] == 0 for c in (
        "bad_text_span", "bad_media_span", "unknown_kind", "empty_spans"))
    assert flags["gap"]["offsets_not_dense"] == 1
    assert flags["dup"]["offsets_not_dense"] == 1
    assert flags["leak"]["bad_text_span"] == 1
    assert flags["mtext"]["bad_media_span"] == 1
    assert flags["weird"]["unknown_kind"] == 1
    assert flags["empty"]["empty_spans"] == 1
    report = {r["violation"]: r["n_docs"]
              for r in span_integrity_report(df).collect()}
    assert report == {"offsets_not_dense": 2, "bad_text_span": 1,
                      "bad_media_span": 1, "unknown_kind": 1,
                      "empty_spans": 1, "clean": 1}


def test_span_integrity_clean_on_real_fixture(spark):
    from zzzarchived_arxiv_fulltext_spark.operators.span_audit import (
        span_integrity_report,
    )
    from zzzarchived_arxiv_fulltext_spark.sources.fixtures import (
        spans_table,
    )

    df = spans_table(spark, 80, seed=3)
    report = {r["violation"]: r["n_docs"]
              for r in span_integrity_report(df).collect()}
    assert report["clean"] == 80
    assert sum(v for k, v in report.items() if k != "clean") == 0


def test_run_extraction_quarantines_invalid_spans(spark, tmp_path):
    from zzzarchived_arxiv_fulltext_spark.plans.extraction_job import (
        run_extraction,
    )
    from zzzarchived_arxiv_fulltext_spark.sources.tables import (
        SnapshotTable,
    )

    def span(kind, text, ref, off):
        return {"kind": kind, "text": text, "media_ref": ref,
                "offset": off}

    rows = [
        ("good", [span("text", "hello clean doc", None, 0)]),
        ("dup_off", [span("text", "a", None, 0),
                     span("text", "b", None, 0)]),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>")
    out = SnapshotTable(str(tmp_path / "out"))
    run_extraction(spark, df, out, validate_spans=True)
    got = {r["doc_id"]: r for r in out.read(spark).collect()}
    assert got["good"]["status"] == "succeeded"
    assert got["dup_off"]["status"] == "failed"
    assert got["dup_off"]["failure_class"] == "invalid_spans"
    assert got["dup_off"]["extractor_version"] == \
        got["good"]["extractor_version"]
    # quarantined docs are committed work: a second increment over the
    # same input has nothing to do
    assert run_extraction(spark, df, out, validate_spans=True) is None
