"""Text-analysis operator tests."""

import pytest
from pyspark.sql import functions as F

from zzzarchived_arxiv_fulltext_spark.operators.text_metrics import (
    document_fingerprints,
    fingerprint_overlap_pairs,
    language_id,
    quality_scores,
    token_stats,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the cat is on the mat and the dog is in the yard"),
        (2, "der Hund ist nicht in der Schule und die Katze ist da"),
        (3, "el gato que vive en la casa de los vecinos es una maravilla"),
        (4, "le chat est dans la maison et les oiseaux sont dans une cage"),
        (5, "我是在这里的不是那里的我不知道了"),
        (6, "x7! yz-2 hello_world 3.14 foo"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_language_id(docs):
    pred = {r["doc_id"]: r["predicted_lang"]
            for r in language_id(docs).collect()}
    assert pred[1] == "en"
    assert pred[2] == "de"
    assert pred[3] == "es"
    assert pred[4] == "fr"
    assert pred[5] == "zh"


def test_token_stats(docs):
    row = token_stats(docs).where("doc_id = 6").collect()[0]
    assert row["ws_tokens"] == 5
    # x,7,!,yz,-,2,hello,_,world,3,.,14,foo  → 13 BPE-ish tokens
    assert row["bpe_tokens"] == 13


def test_quality_scores(docs):
    row = quality_scores(docs).where("doc_id = 1").collect()[0]
    assert row["n_tokens"] == 13
    assert 0 < row["stopword_ratio"] < 1
    assert row["punct_ratio"] == 0.0
    assert row["distinct_token_ratio"] < 1  # repeated 'the'/'is'


def test_fingerprints_detect_shared_passages(spark):
    shared = "a long shared passage that appears verbatim in both docs "
    rows = [
        (1, shared * 3 + "unique tail one two three"),
        (2, "different head material " + shared * 3),
        (3, "entirely unrelated words with no common substring at all"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    fps = document_fingerprints(df).collect()
    assert all(len(r["fingerprints"]) > 0 for r in fps)
    pairs = fingerprint_overlap_pairs(df, min_shared=3).collect()
    keys = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 2) in keys
    assert (1, 3) not in keys and (2, 3) not in keys


def test_cross_fingerprint_overlap_flags_planted_leaks(spark):
    from zzzarchived_arxiv_fulltext_spark.operators.text_metrics import (
        cross_fingerprint_overlap,
    )

    base = ("the training corpus contains this very specific passage "
            "about winnowing fingerprints and benchmark leakage that "
            "is long enough to fingerprint reliably end to end")
    corpus = spark.createDataFrame(
        [("c1", base),
         ("c2", "a completely unrelated document about query engines "
                "and shuffle partitioning strategies at large scale")],
        "doc_id string, text string",
    )
    bench = spark.createDataFrame(
        [("b1", base[20:150]),    # substring of c1 → leak
         ("b2", "novel benchmark prompt that appears nowhere above")],
        "doc_id string, text string",
    )
    got = cross_fingerprint_overlap(corpus, bench, min_shared=3).collect()
    assert {(r["doc_id"], r["benchmark_id"]) for r in got} == {("c1", "b1")}
    assert all(r["shared_fingerprints"] >= 3 for r in got)

    # containment: the benchmark item is a verbatim substring of c1,
    # so (almost) all of its fingerprints are contained
    with_c = cross_fingerprint_overlap(
        corpus, bench, min_shared=3, with_containment=True).collect()
    row = [r for r in with_c if r["doc_id"] == "c1"][0]
    assert row["containment"] > 0.8
    assert 0.0 < row["containment"] <= 1.0


def test_rolling_fingerprint_family_matches_md5_semantics(spark):
    """The vectorized rolling-hash family must produce the SAME
    overlap structure as the oracle-reproducible md5 family (values
    differ; winnowing semantics don't)."""
    shared = "a long shared passage that appears verbatim in both docs "
    rows = [
        (1, shared * 3 + "unique tail one two three"),
        (2, "different head material " + shared * 3),
        (3, "entirely unrelated words with no common substring at all"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    for family in ("md5", "rolling"):
        pairs = {(r["id_a"], r["id_b"])
                 for r in fingerprint_overlap_pairs(
                     df, min_shared=3, family=family).collect()}
        assert pairs == {(1, 2)}, family

    # deterministic across runs, and identical docs → identical sets
    dup = spark.createDataFrame([(1, shared), (2, shared)],
                                ["doc_id", "text"])
    fps = {r["doc_id"]: sorted(r["fingerprints"])
           for r in document_fingerprints(dup, family="rolling").collect()}
    assert fps[1] == fps[2] and len(fps[1]) > 0

    import pytest
    with pytest.raises(ValueError):
        document_fingerprints(df, family="nope")


def test_hot_fingerprint_cap_bounds_pairs(spark):
    """A fingerprint shared corpus-wide (boilerplate) must not produce
    m² pairs when the cap is on."""
    boiler = "identical boilerplate text repeated everywhere " * 4
    docs = spark.createDataFrame(
        [(i, boiler) for i in range(40)], ["doc_id", "text"])
    assert fingerprint_overlap_pairs(
        docs, min_shared=1, max_fp_docs=10).count() == 0
    assert fingerprint_overlap_pairs(
        docs, min_shared=1, max_fp_docs=None).count() == 40 * 39 // 2

    # the drop is observable, not silent: every one of the shared
    # fingerprints is held by all 40 docs and gets dropped
    pairs, dropped = fingerprint_overlap_pairs(
        docs, min_shared=1, max_fp_docs=10, with_drop_stats=True)
    assert pairs.count() == 0
    drop_rows = dropped.collect()
    assert len(drop_rows) >= 1
    assert all(r["n_docs"] == 40 for r in drop_rows)

    # cap disabled → empty, type-correct stats frame
    _, off = fingerprint_overlap_pairs(
        docs, min_shared=1, max_fp_docs=None, with_drop_stats=True)
    assert off.count() == 0 and off.columns == ["fp", "n_docs"]


def test_mojibake_score_counts_artifacts(spark):
    from zzzarchived_arxiv_fulltext_spark.operators.text_metrics import (
        mojibake_score,
    )

    clean = "plain ascii text only"
    # cafÃ© ('cafÃ©'), curly-quote wreck 'â€œ'
    # + 'â€', NBSP mojibake 'Â ', replacement char
    dirty = ("cafÃ© â€œquoteâ€ "
             "Â nbsp � end")
    df = spark.createDataFrame(
        [(1, clean), (2, dirty), (3, "")], ["doc_id", "text"])
    got = {r["doc_id"]: r for r in mojibake_score(df).collect()}
    assert got[1]["mojibake_count"] == 0
    assert got[1]["mojibake_per_100_chars"] == 0.0
    assert got[2]["mojibake_count"] == 5
    assert got[2]["mojibake_per_100_chars"] > 10
    assert got[3]["mojibake_count"] == 0 and \
        got[3]["mojibake_per_100_chars"] == 0.0



def test_fix_mojibake_repairs_double_decoding(spark):
    from zzzarchived_arxiv_fulltext_spark.operators.text_metrics import (
        fix_mojibake,
    )

    good = "caf\u00e9 ser\u00e1 \u201cbonito\u201d"
    double = good.encode("utf-8").decode("latin-1")
    rows = [
        (1, double),                     # repaired exactly
        (2, "plain ascii text"),         # untouched, no artifacts
        (3, "caf\u00e9 already fine"),  # legit accents -> invalid
                                         # UTF-8 round trip -> untouched
        (4, None),                       # NULL passes through
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["text"], r["repaired"])
           for r in fix_mojibake(df).collect()}
    assert got[1] == (good, 1)
    assert got[2] == ("plain ascii text", 0)
    assert got[3] == ("caf\u00e9 already fine", 0)
    assert got[4] == (None, 0)   # NULL text -> flag 0, never NULL


def test_script_profile_counts_and_dominant(spark):
    from zzzarchived_arxiv_fulltext_spark.operators.text_metrics import (
        script_profile,
    )

    df = spark.createDataFrame(
        [(1, "hello мир"),            # 5 latin, 3 cyrillic
         (2, "中文 text 中"),          # 3 han, 4 latin
         (3, "12345 !!"),             # no scripted chars
         (4, "αβ ж中")],               # 2 greek, 1 cyr, 1 han → tie? no
        "doc_id long, text string")
    got = {r["id"]: r for r in script_profile(df).collect()}
    assert (got[1]["n_latin"], got[1]["n_cyrillic"]) == (5, 3)
    assert got[1]["dominant_script"] == "latin"
    assert (got[2]["n_han"], got[2]["n_latin"]) == (3, 4)
    assert got[2]["dominant_script"] == "latin"
    assert got[3]["dominant_script"] == "none"
    assert got[3]["n_other"] == 8  # digits + spaces + punctuation
    assert got[4]["dominant_script"] == "greek"


def test_script_profile_tie_breaks_lexicographically(spark):
    from zzzarchived_arxiv_fulltext_spark.operators.text_metrics import (
        script_profile,
    )

    # cyrillic and han tie at 2 → 'cyrillic' < 'han' wins
    df = spark.createDataFrame([(1, "жж中中")], "doc_id long, text string")
    r = script_profile(df).collect()[0]
    assert r["n_cyrillic"] == 2 and r["n_han"] == 2
    assert r["dominant_script"] == "cyrillic"


def test_compression_ratio_orders_redundancy(spark):
    from zzzarchived_arxiv_fulltext_spark.operators.text_metrics import (
        compression_ratio,
    )
    import os

    df = spark.createDataFrame(
        [(1, "spam " * 400),                      # ultra-redundant
         (2, "the quick brown fox jumps over the lazy dog. " * 40),
         (3, os.urandom(1000).hex()),             # high-entropy hex
         (4, "")],
        "doc_id long, text string")
    got = {r["id"]: r for r in compression_ratio(df).collect()}
    assert got[1]["compression_ratio"] < got[2]["compression_ratio"] \
        < got[3]["compression_ratio"]
    assert got[1]["compression_ratio"] < 0.05   # boilerplate signature
    assert got[3]["compression_ratio"] > 0.5
    assert got[4]["compression_ratio"] is None  # empty → no signal
    assert got[2]["n_bytes"] == 45 * 40


def test_script_profile_null_text_is_none(spark):
    from zzzarchived_arxiv_fulltext_spark.operators.text_metrics import (
        script_profile,
    )

    df = spark.createDataFrame([(1, None), (2, "abc")],
                               "doc_id long, text string")
    got = {r["id"]: r for r in script_profile(df).collect()}
    assert got[1]["dominant_script"] == "none"
    assert got[1]["n_latin"] == 0 and got[1]["n_other"] == 0


def test_latex_math_stats(spark):
    from zzzarchived_arxiv_fulltext_spark.operators.text_metrics import (
        latex_math_stats,
    )

    rows = [
        (0, "plain prose only"),
        # 2 inline, 1 bare command
        (1, r"let $x$ and $y_i$ be \alpha values"),
        # display env (2 commands) + $$ block; $$ body must NOT count
        # as inline
        (2, r"\begin{equation} E=mc^2 \end{equation} then $$a+b$$"),
        # inline adjacent to display dollars
        (3, "$u$ $$vv$$ $w$"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in latex_math_stats(df).collect()}

    assert (out[0]["n_inline"], out[0]["n_display"],
            out[0]["n_commands"]) == (0, 0, 0)
    assert out[0]["math_char_fraction"] == 0.0

    assert out[1]["n_inline"] == 2
    assert out[1]["n_display"] == 0
    assert out[1]["n_commands"] == 1
    # spans: "$x$" (3) + "$y_i$" (5) over 36 chars
    t1 = rows[1][1]
    assert out[1]["math_char_fraction"] == round(8 / len(t1), 6)

    assert out[2]["n_inline"] == 0
    assert out[2]["n_display"] == 2          # env + $$ block
    assert out[2]["n_commands"] == 2         # \begin + \end

    assert out[3]["n_inline"] == 2           # $u$, $w$
    assert out[3]["n_display"] == 1
    # spans: 3 + 3 inline + 6 display over the full string
    assert out[3]["math_char_fraction"] == round(12 / len(rows[3][1]), 6)
