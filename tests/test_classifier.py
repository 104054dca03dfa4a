"""Quality-classifier training/scoring: separability, bounded state,
empty-doc behavior."""


def test_classifier_separates_vocabularies(spark):
    from zzzarchived_arxiv_fulltext_spark.operators.classifier import (
        score_quality,
        train_quality_classifier,
    )

    pos = spark.createDataFrame(
        [(i, "good clean prose text") for i in range(8)],
        "doc_id int, text string")
    neg = spark.createDataFrame(
        [(100 + i, "spam junk noise garbage") for i in range(8)],
        "doc_id int, text string")
    w, b = train_quality_classifier(pos, neg, buckets=32, steps=5,
                                    lr=2.0)
    assert len(w) == 32  # driver state bounded by construction
    scored = {r["doc_id"]: r["quality_prob"]
              for r in score_quality(pos.unionByName(neg), w, b).collect()}
    assert min(scored[i] for i in range(8)) > \
        max(scored[100 + i] for i in range(8))
    assert scored[0] > 0.5 > scored[100]


def test_classifier_scores_empty_doc_at_bias(spark):
    import math

    from zzzarchived_arxiv_fulltext_spark.operators.classifier import (
        score_quality,
    )

    df = spark.createDataFrame(
        [(1, "some words"), (2, "")], "doc_id int, text string")
    got = {r["doc_id"]: r["quality_prob"]
           for r in score_quality(df, [0.5] * 8, -1.0).collect()}
    assert got[2] == round(1.0 / (1.0 + math.exp(1.0)), 6)


def test_single_gradient_step_matches_closed_form(spark):
    from zzzarchived_arxiv_fulltext_spark.operators.classifier import (
        train_quality_classifier,
    )

    # one doc per class, one distinct token each, buckets=4:
    # step 1 from w=0: residual = 0.5 - y; tf = 1.0 for the doc's
    # bucket; grad_b = r * 1.0 / 2; w1_b = -lr * grad_b
    pos = spark.createDataFrame([(1, "aa")], "doc_id int, text string")
    neg = spark.createDataFrame([(2, "bb")], "doc_id int, text string")
    w, b = train_quality_classifier(pos, neg, buckets=4, steps=1,
                                    lr=1.0)
    import hashlib

    def bk(t):
        return int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % 4

    assert abs(w[bk("aa")] - 0.25) < 1e-12
    assert abs(w[bk("bb")] + 0.25) < 1e-12
    assert abs(b) < 1e-12  # residuals cancel: (0.5-1)+(0.5-0)=0
