"""PostScript extraction: round trips, operator coverage, junk
safety, and the Spark ingestion path (ps_to_spans + router)."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from zzzarchived_arxiv_fulltext_spark.functions.ps_text import (
    extract_ps_page_texts,
    make_simple_ps,
    ps_page_image_counts,
)
from zzzarchived_arxiv_fulltext_spark.sources.ingest_router import (
    sniff_format,
)
from zzzarchived_arxiv_fulltext_spark.sources.ps_ingest import (
    build_ps_spans,
)


def test_roundtrip_multipage_unicode_and_specials():
    pages = [
        ["Hello (world) 100% \\backslash", "naïve café — ünïcodé"],
        ["second page", "", "after empty line"],
    ]
    ps = make_simple_ps(pages)
    assert extract_ps_page_texts(ps) == ["\n".join(p) for p in pages]


def test_image_counts_interleave():
    ps = make_simple_ps([["a"], ["b"]], images_per_page=[2, 1])
    assert ps_page_image_counts(ps) == [2, 1]
    spans = build_ps_spans("d1", ps, extract_ps_page_texts(ps))
    assert [(s["kind"], s["offset"]) for s in spans] == [
        ("text", 0), ("media", 1), ("media", 2), ("text", 3), ("media", 4)
    ]
    assert spans[1]["media_ref"] == "psimg://d1/0"
    assert spans[4]["media_ref"] == "psimg://d1/2"


def test_show_family_and_hex_strings():
    src = (
        "%!PS\n"
        "72 720 moveto <48656c6c6f> show\n"  # hex 'Hello'
        "3 0 (w2) ashow\n"
        "72 708 moveto 1 0 32 (wide) widthshow\n"
        "1 0 32 2 0 (awide) awidthshow\n"
        "{pop} (kerned) kshow\n"
        "(xsh) [1 2 3] xshow\n"
        "showpage\n"
    ).encode()
    assert extract_ps_page_texts(src) == ["Hellow2\nwideawidekernedxsh"]


def test_moveto_same_y_inserts_space_and_rmoveto_breaks_lines():
    src = (
        "%!PS\n"
        "72 700 moveto (left) show 300 700 moveto (right) show\n"
        "0 -12 rmoveto (next line) show\n"
        "5 0 rmoveto (cont) show\n"
        "showpage\n"
    ).encode()
    assert extract_ps_page_texts(src) == ["left right\nnext line cont"]


def test_comments_and_procedures_ignored():
    src = (
        "%!PS\n"
        "% a comment with (parens) and show inside\n"
        "/mk { (procbody) } def\n"
        "72 720 moveto (real) show\n"
        "showpage\n"
    ).encode()
    # the proc's string sits unconsumed on the stack; only 'real' shows
    assert extract_ps_page_texts(src) == ["real"]


def test_octal_escapes_and_continuation():
    src = b"%!PS\n72 720 moveto (A\\101\\12B\\\nC) show\nshowpage\n"
    # \101='A', \12=LF, backslash-newline = nothing
    assert extract_ps_page_texts(src) == ["AA\nBC"]


def test_trailing_text_without_showpage_flushes():
    src = b"%!PS\n72 720 moveto (tail) show\n"
    assert extract_ps_page_texts(src) == ["tail"]


def test_no_text_no_pages():
    assert extract_ps_page_texts(b"%!PS\n0 0 moveto stroke\n") == []
    assert extract_ps_page_texts(b"") == []


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=400))
def test_junk_never_raises(data):
    pages = extract_ps_page_texts(b"%!PS\n" + data)
    assert all(isinstance(p, str) for p in pages)
    ps_page_image_counts(b"%!PS\n" + data)


@settings(max_examples=120, deadline=None)
@given(
    st.lists(
        st.lists(
            st.text(
                alphabet=st.characters(
                    blacklist_categories=("Cs",),
                ),
                max_size=40,
            ).map(lambda s: s.replace("\n", " ").replace("\r", " ")),
            max_size=4,
        ),
        min_size=1,
        max_size=3,
    )
)
def test_roundtrip_property(pages):
    got = extract_ps_page_texts(make_simple_ps(pages))
    want = ["\n".join(p) for p in pages]
    # pages with no lines produce no output page (nothing was shown)
    want = [w for w, p in zip(want, pages) if p]
    assert got == want


def test_sniff_ps():
    assert sniff_format(b"%!PS-Adobe-3.0\n...") == "ps"
    assert sniff_format(b"%!PS\n") == "ps"
    assert sniff_format(b"%PDF-1.4") == "pdf"


@pytest.mark.usefixtures("spark")
def test_ps_to_spans_and_router(spark):
    from pyspark.sql import functions as F

    from zzzarchived_arxiv_fulltext_spark.sources.ingest_router import (
        raw_to_spans,
    )
    from zzzarchived_arxiv_fulltext_spark.sources.ps_ingest import (
        ps_to_spans,
    )

    docs = {
        "a": make_simple_ps([["line one", "line two"], ["page 2"]],
                            images_per_page=[1, 0]),
        "b": make_simple_ps([["solo"]]),
    }
    df = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in docs.items()], "doc_id string, ps binary"
    )
    out = {r["doc_id"]: r for r in ps_to_spans(df).collect()}
    a = [(s["kind"], s["text"], s["media_ref"], s["offset"])
         for s in out["a"]["spans"]]
    assert a == [
        ("text", "line one\nline two", None, 0),
        ("media", None, "psimg://a/0", 1),
        ("text", "page 2", None, 2),
    ]
    assert out["a"]["failure_class"] is None
    assert [s["text"] for s in out["b"]["spans"]] == ["solo"]

    routed = raw_to_spans(
        df.select("doc_id", F.col("ps").alias("payload")))
    fmts = {r["doc_id"]: r["format"] for r in routed.collect()}
    assert fmts == {"a": "ps", "b": "ps"}
