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


def test_classifier_index_load_retrain_and_shape_guard(spark, tmp_path):
    from zzzarchived_arxiv_fulltext_spark.operators.classifier import (
        score_quality,
        train_quality_classifier,
    )
    from zzzarchived_arxiv_fulltext_spark.plans.classifier_index import (
        ensure_classifier,
        load_classifier,
    )
    from zzzarchived_arxiv_fulltext_spark.sources.tables import (
        SnapshotTable,
    )

    pos = spark.createDataFrame(
        [(i, "good clean prose") for i in range(6)],
        "doc_id int, text string")
    neg = spark.createDataFrame(
        [(100 + i, "spam junk noise") for i in range(6)],
        "doc_id int, text string")
    table = SnapshotTable(str(tmp_path / "clf"))

    w1, b1 = ensure_classifier(spark, pos, neg, table, buckets=32,
                               steps=3, lr=2.0)
    # identical params direct-trained → identical committed weights
    wd, bd = train_quality_classifier(pos, neg, buckets=32, steps=3,
                                      lr=2.0)
    assert w1 == wd and b1 == bd
    # fresh corpus → served from the table, no retrain snapshot
    n_snaps = len(table.snapshots())
    w2, b2 = ensure_classifier(spark, pos, neg, table, buckets=32,
                               steps=3, lr=2.0)
    assert (w2, b2) == (w1, b1)
    assert len(table.snapshots()) == n_snaps

    # growth → warm retrain commits a NEW snapshot that still separates
    pos_big = pos.unionByName(spark.createDataFrame(
        [(50 + i, "good clean prose") for i in range(20)],
        "doc_id int, text string"))
    w3, b3 = ensure_classifier(spark, pos_big, neg, table, buckets=32,
                               steps=3, lr=2.0)
    assert len(table.snapshots()) == n_snaps + 1
    scored = {r["doc_id"]: r["quality_prob"] for r in score_quality(
        pos.unionByName(neg), w3, b3).collect()}
    assert scored[0] > scored[100]

    # requested shape change → cold retrain with the new bucket count
    w4, _ = ensure_classifier(spark, pos_big, neg, table, buckets=16,
                              steps=2, lr=1.0)
    assert len(w4) == 16
    assert len(load_classifier(spark, table)[0]) == 16
