"""Tests for the per-document extraction decision tree (pure oracle).

Decision-tree parity target: reference ``extractor/fulltext/fulltext.py:
136-178`` (primary → gate → layout retry → gate → fail), restated over
pre-span-ized input.
"""

from zzzarchived_arxiv_fulltext_spark.functions import extract_document


def _text(offset, text):
    return {"kind": "text", "text": text, "media_ref": None, "offset": offset}


def _media(offset, ref):
    return {"kind": "media", "text": None, "media_ref": ref, "offset": offset}


def test_happy_path_order_and_passthrough():
    spans = [_media(2, "img://d/2"), _text(0, "Hello ﬁne world"), _text(1, "second")]
    out = extract_document(spans)
    assert out["status"] == "succeeded"
    assert out["via"] == "primary"
    assert [s["order"] for s in out["spans"]] == [0, 1, 2]
    assert out["spans"][0]["text"] == "Hello fine world"  # ligature fixed
    assert out["spans"][1]["text"] == "second"
    assert out["spans"][2] == {
        "kind": "media", "text": None, "media_ref": "img://d/2", "order": 2
    }
    assert out["plain_text"] == "Hello fine world\nsecond"
    assert out["n_text_spans"] == 2 and out["n_media_spans"] == 1
    assert out["chars_extracted"] == len(out["plain_text"])


def test_layout_retry_path():
    # Merged-word runs (pdfminer gluing words together) inflate average
    # word length past 45 → primary fails the gate; the de-merging
    # retry splits the seams and passes it.
    merged = "TheQuickBrownFoxJumpsOverTheLazyDog" * 3
    spans = [_text(0, merged)]
    out = extract_document(spans)
    assert out["status"] == "succeeded"
    assert out["via"] == "layout_retry"
    assert "Quick Brown" in out["spans"][0]["text"]


def test_quality_gate_failure_is_isolated():
    # A single unsplittable giant word survives junk-stripping → both
    # attempts exceed the gate → failed row, no exception.
    spans = [_text(0, "x" * 500)]
    out = extract_document(spans)
    assert out["status"] == "failed"
    assert out["failure_class"] == "quality_gate"
    assert out["via"] == "none"
    assert out["plain_text"] is None and out["psv_text"] is None
    assert out["chars_extracted"] == 0
    # spans still emitted, raw text preserved
    assert out["spans"][0]["text"] == "x" * 500


def test_media_only_and_empty_documents():
    out = extract_document([_media(0, "img://d/0"), _media(1, "img://d/1")])
    assert out["status"] == "succeeded"
    assert out["plain_text"] == ""
    assert out["n_media_spans"] == 2 and out["n_text_spans"] == 0

    out = extract_document([])
    assert out["status"] == "succeeded"
    assert out["spans"] == []


def test_psv_drops_reference_section():
    body = "This is a perfectly normal sentence about physics experiments."
    spans = [
        _text(0, body),
        _text(1, "References"),
        _text(2, "[1] Someone, A. Journal 2001."),
    ]
    out = extract_document(spans)
    assert out["status"] == "succeeded"
    assert "journal" not in out["psv_text"]
    assert "normal sentence" in out["psv_text"]


def test_strip_page_furniture_heuristics():
    from zzzarchived_arxiv_fulltext_spark.functions.quality import (
        strip_page_furniture,
    )

    pages = [
        "Running Title\nreal body one\nPage 1",
        "Running Title\nreal body two\nPage 2",
        "Running Title\nreal body three\nPage 3",
        "Running Title\nreal body four\nPage 4",
    ]
    cleaned, dropped = strip_page_furniture(pages)
    assert cleaned == ["real body one", "real body two",
                       "real body three", "real body four"]
    assert dropped == 8

    # under 3 pages: untouched (repetition is meaningless)
    two = pages[:2]
    assert strip_page_furniture(two) == (two, 0)

    # a header on only 1 of 4 pages survives (< 50%)
    rare = ["One-off banner\nbody a\nPage 1",
            "body b\nPage 2", "body c\nPage 3", "body d\nPage 4"]
    cleaned, _ = strip_page_furniture(rare)
    assert cleaned[0] == "One-off banner\nbody a"

    # deep body lines (outside the probe zone) are never dropped even
    # if identical across pages
    deep = ["h\nx\ny\nSAME DEEP\nz\nw\nPage 1",
            "h\nq\nr\nSAME DEEP\ns\nt\nPage 2",
            "h\na\nb\nSAME DEEP\nc\nd\nPage 3"]
    cleaned, _ = strip_page_furniture(deep, probe_lines=2)
    assert all("SAME DEEP" in p for p in cleaned)
