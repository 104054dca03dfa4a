"""C4/Gopher rule-based quality filters."""

from zzzarchived_arxiv_fulltext_spark.operators.quality_rules import (
    c4_line_filter,
    gopher_quality_signals,
)


GOOD = ("the quick brown fox jumps over the lazy dog and then some "
        "more words that have to be written with care so the text "
        "reaches fifty whole words of natural prose which is what "
        "the gopher rules demand of any document worth keeping in a "
        "training corpus today right now")


def test_gopher_passes_natural_prose(spark):
    df = spark.createDataFrame([(1, GOOD)], ["doc_id", "text"])
    row = gopher_quality_signals(df).first()
    assert row["n_words"] >= 50
    assert 3 <= row["mean_word_length"] <= 10
    assert row["alpha_word_frac"] == 1.0
    assert row["n_stopwords"] >= 2
    assert row["passes"] is True


def test_gopher_rejects_each_pathology(spark):
    rows = [
        (1, "too short text here"),                       # word count
        (2, " ".join(["#"] * 60) + " the of"),            # symbols+alpha
        (3, "\n".join(["- bullet item point"] * 10)
            + "\n" + GOOD),                               # bullets
        (4, "\n".join(["trailing off..."] * 10)),         # ellipsis
        (5, " ".join(["12345"] * 60) + " the of"),        # alpha frac
        (6, " ".join(["zork"] * 60)),                     # no stopwords
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in gopher_quality_signals(df).collect()}
    assert not got[1]["passes"]
    assert got[2]["symbol_word_ratio"] > 0.1 and not got[2]["passes"]
    assert got[3]["bullet_line_frac"] >= 0.9 and not got[3]["passes"]
    assert got[4]["ellipsis_line_frac"] >= 0.3 and not got[4]["passes"]
    assert got[5]["alpha_word_frac"] < 0.8 and not got[5]["passes"]
    assert got[6]["n_stopwords"] < 2 and not got[6]["passes"]


def test_c4_keeps_terminal_punct_lines_in_order(spark):
    text = ("First good sentence with punctuation here.\n"
            "no terminal punctuation on this line\n"
            "Second good sentence follows right after this.\n"
            "tiny line.\n"
            "Third good sentence closes out the document!")
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    row = c4_line_filter(df).first()
    assert row["n_lines_kept"] == 3
    assert row["n_lines_dropped"] == 2
    assert row["clean_text"].splitlines() == [
        "First good sentence with punctuation here.",
        "Second good sentence follows right after this.",
        "Third good sentence closes out the document!",
    ]


def test_c4_page_level_drops(spark):
    good3 = ("One fine sentence with enough words.\n"
             "Two fine sentences with enough words.\n"
             "Three fine sentences with enough words.")
    rows = [
        (1, good3),                                     # survives
        (2, good3.replace("One", "lorem ipsum One")),   # lorem page
        (3, good3 + "\nvar x = { a: 1 };"),             # curly brace
        (4, "Only two good lines here today.\n"
            "And the second one right here."),          # < 3 kept
        (5, good3.replace("Two", "Javascript Two")),    # js line -> 2 kept
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    kept = sorted(r["doc_id"] for r in c4_line_filter(df).collect())
    assert kept == [1]


def test_license_tags_specificity(spark):
    from zzzarchived_arxiv_fulltext_spark.operators.quality_rules import (
        license_tags,
    )

    df = spark.createDataFrame(
        [(1, "This work is CC-BY-SA licensed."),
         (2, "Creative Commons Attribution applies"),
         (3, "dual: MIT license AND Apache License, Version 2.0"),
         (4, "nothing declared"),
         (5, None)],
        "doc_id long, text string")
    got = {r["id"]: r for r in license_tags(df).collect()}
    # the SA variant must not also tag as plain CC-BY
    assert got[1]["has_cc_by_sa"] and not got[1]["has_cc_by"]
    assert got[1]["license_summary"] == "cc-by-sa"
    assert got[2]["has_cc_by"] and got[2]["license_summary"] == "cc-by"
    assert got[3]["has_mit"] and got[3]["has_apache_2"]
    assert got[3]["license_summary"] == "apache-2,mit"  # sorted
    assert got[4]["license_summary"] == ""
    assert got[5]["license_summary"] == ""  # NULL text


def test_flag_blocklisted_terms_whole_word(spark):
    import pytest

    from zzzarchived_arxiv_fulltext_spark.operators.quality_rules import (
        flag_blocklisted_terms,
    )

    df = spark.createDataFrame(
        [(1, "bad BAD badly bad-ish bad"),
         (2, "all clean here")],
        "doc_id long, text string")
    got = {r["id"]: r for r in
           flag_blocklisted_terms(df, ["bad"]).collect()}
    # case-insensitive whole words: bad, BAD, bad(-ish), bad = 4;
    # 'badly' is not a whole-word match
    assert got[1]["n_blocklisted"] == 4
    assert got[2]["n_blocklisted"] == 0
    sub = flag_blocklisted_terms(df, ["bad"], whole_words=False)
    assert {r["id"]: r["n_blocklisted"] for r in sub.collect()}[1] == 5
    with pytest.raises(ValueError):
        flag_blocklisted_terms(df, [])
