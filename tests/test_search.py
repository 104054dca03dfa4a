"""Retrieval: inverted index + BM25 ranked search."""

import math

from zzzarchived_arxiv_fulltext_spark.operators.search import (
    bm25_search,
    inverted_index,
)


def test_inverted_index_postings_and_cap(spark):
    docs = spark.createDataFrame(
        [(1, "apple banana"), (2, "apple"), (3, "banana apple"),
         (4, "cherry")],
        ["doc_id", "text"])
    got = {r["term"]: r for r in inverted_index(docs).collect()}
    assert got["apple"]["n_docs"] == 3
    assert got["apple"]["postings"] == "1,2,3"
    assert got["cherry"]["postings"] == "4"

    capped = {r["term"]: r
              for r in inverted_index(docs, max_postings=2).collect()}
    assert capped["apple"]["n_docs"] == 3       # truth preserved
    assert capped["apple"]["postings"] == "1,2"  # visibly truncated


def test_bm25_matches_reference_formula(spark):
    corpus = [
        (1, "cat dog fish"),
        (2, "cat cat cat cat"),
        (3, "dog bird bird bird bird bird bird bird"),
        (4, "fish"),
        (5, "tree rock sand"),
    ]
    docs = spark.createDataFrame(corpus, ["doc_id", "text"])
    got = {r["doc_id"]: r["score"]
           for r in bm25_search(docs, ["cat", "fish"], k=5).collect()}

    # reference computation
    k1, b = 1.2, 0.75
    dls = {i: len(t.split()) for i, t in corpus}
    n, avgdl = len(corpus), sum(dls.values()) / len(corpus)
    tfs = {i: {} for i, _ in corpus}
    for i, t in corpus:
        for w in t.split():
            tfs[i][w] = tfs[i].get(w, 0) + 1
    dfq = {q: sum(1 for i in tfs if q in tfs[i]) for q in ("cat", "fish")}
    expect = {}
    for i in tfs:
        s = 0.0
        for q in ("cat", "fish"):
            tf = tfs[i].get(q, 0)
            if not tf:
                continue
            idf = math.log(1 + (n - dfq[q] + 0.5) / (dfq[q] + 0.5))
            s += idf * tf * (k1 + 1) / (
                tf + k1 * (1 - b + b * dls[i] / avgdl))
        if s:
            expect[i] = round(s, 6)
    assert got == expect
    # doc 5 matches nothing and must be absent
    assert 5 not in got
