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


# --- raw-bytes parser robustness: web-crawl junk must never raise -----------

_raw_bytes = st.binary(max_size=800)


@settings(max_examples=300, deadline=None)
@given(_raw_bytes)
def test_pdf_parser_never_raises_on_junk(data):
    from zzzarchived_arxiv_fulltext_spark.functions.pdf_text import (
        count_pdf_images,
        extract_pdf_text,
        parse_tounicode_cmaps,
    )

    assert isinstance(extract_pdf_text(data), str)
    assert isinstance(parse_tounicode_cmaps(data), dict)
    assert count_pdf_images(data) >= 0
    # parser wrapped in PDF scaffolding still never raises
    framed = (b"1 0 obj\n<< /Length %d /Filter /FlateDecode >>\nstream\n"
              % len(data)) + data + b"\nendstream"
    assert isinstance(extract_pdf_text(framed), str)


@settings(max_examples=300, deadline=None)
@given(_raw_bytes)
def test_media_header_decoders_never_raise(data):
    from zzzarchived_arxiv_fulltext_spark.operators.multimodal import (
        decode_audio_header,
        decode_image_header,
        decode_video_header,
        sniff_format,
    )

    for fn in (decode_image_header, decode_audio_header,
               decode_video_header):
        out = fn(data)
        assert out is None or isinstance(out, dict)
    assert sniff_format(data) in (None, "png", "jpeg", "gif", "riff",
                                  "pdf", "mp4ish", "mp3", "ogg", "unknown")


@settings(max_examples=200, deadline=None)
@given(_raw_bytes)
def test_ingest_router_sniff_total(data):
    from zzzarchived_arxiv_fulltext_spark.sources.ingest_router import (
        _spans_for,
        sniff_format,
    )

    fmt = sniff_format(data)
    assert fmt in ("pdf", "html", "text", "unknown")
    spans = _spans_for("x", data, fmt)
    assert isinstance(spans, list)
    for s in spans:
        assert s["kind"] in ("text", "media")


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=400))
def test_html_extractor_never_raises(page):
    from zzzarchived_arxiv_fulltext_spark.functions.html_extract import (
        extract_main_text,
    )

    assert isinstance(extract_main_text(page), str)


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.characters(blacklist_categories=("Cs",)),
               max_size=300))
def test_winnow_families_agree_on_structure(text):
    """Both fingerprint families produce the same COUNT shape class:
    empty iff text shorter than k, else non-empty sorted-unique."""
    import pandas as pd

    from zzzarchived_arxiv_fulltext_spark.operators.text_metrics import (
        WINNOW_K,
        winnowing_fingerprint_fast_udf,
        winnowing_fingerprint_udf,
    )

    md5_fp = winnowing_fingerprint_udf.func(pd.Series([text]))[0]
    fast_fp = winnowing_fingerprint_fast_udf.func(pd.Series([text]))[0]
    if len(text) < WINNOW_K:
        assert md5_fp == [] and fast_fp == []
    else:
        assert md5_fp and fast_fp
        assert len(set(md5_fp)) == len(md5_fp)
        assert len(set(fast_fp)) == len(fast_fp)


@settings(max_examples=200, deadline=None)
@given(_text, st.one_of(st.none(), st.text(max_size=60)))
def test_html_links_never_raises_and_filters_schemes(page, base):
    from zzzarchived_arxiv_fulltext_spark.functions.html_extract import (
        html_links,
    )

    out = html_links(page, base)
    assert isinstance(out, list)
    for url in out:
        assert url.startswith(("http://", "https://"))
        assert "#" not in url      # fragments always stripped


@settings(max_examples=200, deadline=None)
@given(st.lists(_text, max_size=8), st.integers(1, 4))
def test_strip_page_furniture_total_and_conservative(pages, probe):
    from zzzarchived_arxiv_fulltext_spark.functions.quality import (
        strip_page_furniture,
    )

    cleaned, dropped = strip_page_furniture(pages, probe_lines=probe)
    assert len(cleaned) == len(pages)
    assert dropped >= 0
    # never invents text: every surviving line existed on its page
    for before, after in zip(pages, cleaned):
        had = before.splitlines()
        for line in after.splitlines():
            assert line in had
    if len(pages) < 3:
        assert (cleaned, dropped) == (list(pages), 0)
