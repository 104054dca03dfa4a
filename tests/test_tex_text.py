"""LaTeX detex extraction: fixtures, escapes, junk safety, routing."""

from hypothesis import given, settings
from hypothesis import strategies as st

from zzzarchived_arxiv_fulltext_spark.functions.tex_text import (
    extract_tex_text,
    make_simple_tex,
)
from zzzarchived_arxiv_fulltext_spark.sources.ingest_router import (
    sniff_format,
)


def test_fixture_roundtrip_with_planted_markup():
    paras = ["the quick brown fox", "jumps over lazy dogs", "third one"]
    assert extract_tex_text(make_simple_tex(paras)) == "\n".join(paras)


def test_sections_unwrap_and_machinery_drops():
    src = (r"\section*{Intro} Hello \emph{world} and \textbf{bold} "
           r"\cite{x2020} \ref{fig:1} end")
    assert extract_tex_text(src) == "Intro\nHello world and bold end"


def test_escaped_specials_survive():
    assert extract_tex_text(r"cost \$5 \& 10\% of \_x\_") == \
        "cost $5 & 10% of _x_"


def test_display_and_inline_math_dropped():
    src = ("before\n"
           r"\begin{align*} x &= y \\ z &= w \end{align*}" "\n"
           "mid $a+b$ word $$c$$ after\n"
           r"\[ display \] tail")
    got = extract_tex_text(src)
    assert got == "before\nmid word after\ntail"


def test_comments_dropped_but_escaped_percent_kept():
    src = "text % a comment with \\emph{markup}\n50\\% rate"
    assert extract_tex_text(src) == "text\n50% rate"


def test_body_cut_and_trailing_junk_ignored():
    src = (r"\documentclass{article}\newcommand{\x}{LEAK}"
           r"\begin{document}body text\end{document}garbage")
    assert extract_tex_text(src) == "body text"


def test_unknown_commands_never_leak_backslash():
    got = extract_tex_text(r"a \unknowncmd b \weird[opt]{arg} c")
    assert "\\" not in got
    assert got.startswith("a") and got.endswith("c")


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=300))
def test_junk_never_raises(src):
    out = extract_tex_text(src)
    assert isinstance(out, str)
    assert "\ue000" not in out  # sentinels never leak


def test_sniff_tex_vs_ps_vs_html():
    assert sniff_format(b"\\documentclass{article}...") == "tex"
    assert sniff_format(b"% comment\n\\begin{document}hi") == "tex"
    assert sniff_format(b"%!PS-Adobe") == "ps"
    assert sniff_format(b"<html><body>x</body></html>") == "html"
    assert sniff_format(b"plain words") == "text"


def test_router_tex_spans_with_media(spark):
    from pyspark.sql import functions as F  # noqa: F401

    from zzzarchived_arxiv_fulltext_spark.sources.ingest_router import (
        raw_to_spans,
    )

    tex = make_simple_tex(["alpha beta", "gamma delta"]).encode()
    df = spark.createDataFrame(
        [("d1", bytearray(tex))], "doc_id string, payload binary")
    row = raw_to_spans(df).collect()[0]
    assert row["format"] == "tex"
    kinds = [(s["kind"], s["offset"]) for s in row["spans"]]
    assert kinds == [("text", 0), ("media", 1)]  # one includegraphics
    assert row["spans"][0]["text"] == "alpha beta\ngamma delta"
    assert row["spans"][1]["media_ref"] == "teximg://d1/0"
