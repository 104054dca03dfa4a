"""robots.txt consent filtering (host-level REP, RFC 9309)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from zzzarchived_arxiv_fulltext_spark.functions.robots import (
    parse_robots_txt,
    robots_allows,
    robots_rule_table,
)

TXT = """
# spark-graft fixture
User-agent: *
Disallow: /private/
Allow: /private/ok
Crawl-delay: 2

User-agent: gptbot
Disallow: /

User-agent: spark-fulltext-fetch
Allow: /api/
Disallow: /api/internal*
Crawl-delay: 5
"""


def test_star_group_longest_match():
    p = parse_robots_txt(TXT, "*")
    assert robots_allows(p["rules"], "/public")
    assert not robots_allows(p["rules"], "/private/x")
    assert robots_allows(p["rules"], "/private/ok/y")
    assert p["crawl_delay"] == 2.0


def test_specific_group_overrides_star():
    g = parse_robots_txt(TXT, "GPTBot/1.0")
    assert not robots_allows(g["rules"], "/anything")
    s = parse_robots_txt(TXT, "spark-fulltext-fetch/1.0")
    assert robots_allows(s["rules"], "/api/x")
    assert not robots_allows(s["rules"], "/api/internal/secret")
    assert robots_allows(s["rules"], "/elsewhere")
    assert s["crawl_delay"] == 5.0


def test_wildcards_and_end_anchor():
    w = parse_robots_txt(
        "User-agent: *\nDisallow: /*.pdf$\nAllow: /docs/*.pdf$", "*")
    assert not robots_allows(w["rules"], "/a/b/file.pdf")
    assert robots_allows(w["rules"], "/docs/file.pdf")
    assert robots_allows(w["rules"], "/a/file.pdfx")  # $ anchor holds


def test_allow_beats_disallow_on_equal_length():
    p = parse_robots_txt("User-agent: *\nDisallow: /a/\nAllow: /a/", "*")
    assert robots_allows(p["rules"], "/a/x")


def test_empty_disallow_is_allow_all():
    p = parse_robots_txt("User-agent: *\nDisallow:", "*")
    assert robots_allows(p["rules"], "/anything")


def test_stacked_agents_and_group_reset():
    p = parse_robots_txt(
        "User-agent: a\nUser-agent: *\nDisallow: /x\n"
        "User-agent: b\nDisallow: /y\n", "*")
    assert not robots_allows(p["rules"], "/x/1")
    assert robots_allows(p["rules"], "/y/1")  # b's group, not ours


def test_robots_txt_itself_always_allowed():
    p = parse_robots_txt("User-agent: *\nDisallow: /", "*")
    assert robots_allows(p["rules"], "/robots.txt")
    assert not robots_allows(p["rules"], "/other")


def test_rule_table_priority_encoding():
    rows = robots_rule_table("User-agent: *\nDisallow: /a\nAllow: /a", "*")
    pri = {r["allow"]: r["priority"] for r in rows}
    assert pri[True] == pri[False] + 1  # allow wins ties via max_by


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=400), st.text(max_size=60))
def test_parser_junk_safe(txt, path):
    p = parse_robots_txt(txt, "anybot")
    robots_allows(p["rules"], path)


def test_filter_robots_disallowed_operator(spark):
    from zzzarchived_arxiv_fulltext_spark.operators.weblinks import (
        filter_robots_disallowed,
    )

    docs = spark.createDataFrame(
        [(1, "https://a.example/private/x"),
         (2, "https://a.example/private/ok/y"),
         (3, "https://a.example/pub"),
         (4, "https://b.example/anything"),     # no robots row
         (5, "https://c.example/blocked/1"),
         (6, "https://A.EXAMPLE/private/z")],   # host case-folding
        ["doc_id", "url"])
    robots = spark.createDataFrame(
        [("a.example", TXT),
         ("c.example", "User-agent: *\nDisallow: /blocked")],
        ["host", "robots_txt"])
    kept = sorted(r["doc_id"] for r in
                  filter_robots_disallowed(docs, robots).collect())
    assert kept == [2, 3, 4]


def test_robots_crawl_delays(spark):
    from zzzarchived_arxiv_fulltext_spark.operators.weblinks import (
        robots_crawl_delays,
    )

    robots = spark.createDataFrame(
        [("a.example", TXT), ("b.example", "User-agent: *\nDisallow: /x")],
        ["host", "robots_txt"])
    got = {r["host"]: r["crawl_delay"]
           for r in robots_crawl_delays(robots).collect()}
    assert got == {"a.example": 2.0}  # b has no delay -> filtered
