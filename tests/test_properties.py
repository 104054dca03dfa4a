"""Property-based invariants (hypothesis) — no Spark, pure oracle."""

from hypothesis import given, settings
from hypothesis import strategies as st

from zzzarchived_arxiv_fulltext_spark.functions import (
    extract_document,
    fix_unicode,
    normalize_text_psv,
)
from zzzarchived_arxiv_fulltext_spark.functions.tidy import (
    blank_intra_whitespace,
)

_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=300
)

_span = st.one_of(
    st.builds(
        lambda t, o: {"kind": "text", "text": t, "media_ref": None,
                      "offset": o},
        _text, st.integers(-1000, 1000),
    ),
    st.builds(
        lambda r, o: {"kind": "media", "text": None,
                      "media_ref": f"img://{r}", "offset": o},
        st.integers(0, 99), st.integers(-1000, 1000),
    ),
)


@settings(max_examples=200, deadline=None)
@given(st.lists(_span, max_size=20))
def test_extract_document_invariants(spans):
    out = extract_document(spans)
    # orders are dense 0..n-1
    assert [s["order"] for s in out["spans"]] == list(range(len(spans)))
    # media refs preserved as a multiset, in offset order
    in_media = [s["media_ref"] for s in sorted(spans, key=lambda s: s["offset"])
                if s["kind"] != "text"]
    out_media = [s["media_ref"] for s in out["spans"] if s["kind"] != "text"]
    assert in_media == out_media
    # span counts add up
    assert out["n_text_spans"] + out["n_media_spans"] == len(spans)
    # kinds preserved positionally (offset-sorted)
    in_kinds = [s["kind"] for s in sorted(spans, key=lambda s: s["offset"])]
    assert [s["kind"] for s in out["spans"]] == in_kinds
    # text spans never carry media_ref and vice versa
    for s in out["spans"]:
        if s["kind"] == "text":
            assert s["media_ref"] is None
        else:
            assert s["text"] is None
    # status consistency
    if out["status"] == "succeeded":
        assert out["plain_text"] is not None
        assert out["chars_extracted"] == len(out["plain_text"])
    else:
        assert out["failure_class"] == "quality_gate"
        assert out["chars_extracted"] == 0


@settings(max_examples=200, deadline=None)
@given(_text)
def test_fix_unicode_idempotent_on_ascii(t):
    cleaned = fix_unicode(t)
    if cleaned.isascii():
        assert fix_unicode(cleaned) == cleaned


@settings(max_examples=200, deadline=None)
@given(_text)
def test_psv_output_is_clean(t):
    psv = normalize_text_psv(t)
    # PSV output is single-line lowercase with no runs of whitespace
    assert "\n" not in psv
    assert psv == psv.lower()
    for sentence in psv.split(" "):
        assert sentence == sentence.strip()


@settings(max_examples=100, deadline=None)
@given(st.lists(_text, max_size=10))
def test_whitespace_blanking_idempotent(lines):
    once = list(blank_intra_whitespace(lines))
    assert list(blank_intra_whitespace(once)) == once
