"""Unit tests for operators/references.py (bibliography mining)."""

import pytest

from zzzarchived_arxiv_fulltext_spark.operators.references import (
    citation_edges,
    reference_entries,
)


@pytest.fixture(scope="module")
def ref_docs(spark):
    body = "\n".join(f"body line {i} with several words here" for i in
                     range(8))
    rows = [
        # normal: heading + 2 entries, one wrapping across lines
        ("d1", body + "\nReferences\n[1] Alpha et al, Some Paper,\n"
                      "  Journal of Things 2020 arXiv:2001.12345\n"
                      "[2] Beta, Other Paper hep-th/9901001"),
        # decorated heading + numbering gap preserved
        ("d2", body + "\n--- REFERENCES ---\n[3] Gamma arXiv:1501.0001\n"
                      "[7] Delta"),
        # heading early in the doc: block would be >50% of lines → guard
        ("d3", "Bibliography\n[1] not a real block\n" + body),
        # no heading at all
        ("d4", body),
        # LAST heading wins: a body mention plus a real block
        ("d5", "References\n" + body + "\nReferences\n[1] Real entry"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_reference_entries_basic(spark, ref_docs):
    out = reference_entries(ref_docs).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)

    d1 = sorted(by_doc["d1"], key=lambda r: r["ref_idx"])
    assert [r["ref_idx"] for r in d1] == [1, 2]
    # wrapped entry collapses to single-spaced text, marker stripped
    assert d1[0]["ref_text"] == (
        "Alpha et al, Some Paper, Journal of Things 2020 "
        "arXiv:2001.12345")
    assert d1[1]["ref_text"] == "Beta, Other Paper hep-th/9901001"

    # decorated heading recognized; ref_idx comes from the marker
    d2 = sorted(by_doc["d2"], key=lambda r: r["ref_idx"])
    assert [r["ref_idx"] for r in d2] == [3, 7]

    # guard: early heading → no rows; no heading → no rows
    assert "d3" not in by_doc
    assert "d4" not in by_doc

    # last heading wins
    assert [r["ref_text"] for r in by_doc["d5"]] == ["Real entry"]


def test_citation_edges_styles(spark, ref_docs):
    edges = {(r["src_doc_id"], r["cited_arxiv_id"])
             for r in citation_edges(ref_docs).collect()}
    assert ("d1", "2001.12345") in edges
    assert ("d1", "hep-th/9901001") in edges
    assert ("d2", "1501.0001") in edges
    assert not any(src == "d4" for src, _ in edges)


def test_citation_edges_distinct(spark):
    df = spark.createDataFrame(
        [("x", "see arXiv:2101.00001 and again arXiv:2101.00001")],
        ["doc_id", "text"])
    out = citation_edges(df).collect()
    assert len(out) == 1 and out[0]["cited_arxiv_id"] == "2101.00001"


def test_section_segments(spark):
    from zzzarchived_arxiv_fulltext_spark.operators.references import (
        section_segments,
    )

    rows = [
        # preamble + two sections, one sub-numbered, one trailing-dot
        (0, "Title line here\nabstract text\n"
            "1 Introduction\nbody a b\nbody c\n"
            "2.1 Methods Details\nonly line\n"
            "3. Results\n"),
        # no headings at all -> single preamble row
        (1, "just two\nplain lines"),
        # heading on line 1 -> no preamble row
        (2, "1 First\nx y\n2 Second\nz"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = sorted(
        ((r["doc_id"], r["sec_idx"], r["heading"], r["n_lines"],
          r["n_words"]) for r in section_segments(df).collect())
    )

    assert out == sorted([
        (0, 0, "", 2, 5),                       # preamble
        (0, 1, "1 Introduction", 2, 5),
        (0, 2, "2.1 Methods Details", 1, 2),
        # trailing-dot heading, empty body (the final "\n" makes one
        # empty line after it)
        (0, 3, "3. Results", 1, 0),
        (1, 0, "", 2, 4),
        (2, 1, "1 First", 1, 2),
        (2, 2, "2 Second", 1, 1),
    ])
