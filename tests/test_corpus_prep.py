"""End-to-end corpus preparation: funnel semantics + committed output."""

from pyspark.sql import functions as F

from zzzarchived_arxiv_fulltext_spark.plans.corpus_prep import (
    corpus_prep_funnel,
    run_corpus_prep,
)
from zzzarchived_arxiv_fulltext_spark.sources.tables import SnapshotTable


def _corpus(spark):
    rows = [
        # (doc_id, text, lang)
        (1, "the quick brown fox jumps over the lazy dog again and "
            "again because the quick brown fox likes to jump over "
            "lazy dogs every single day of the week", "en"),
        (2, "tiny", "en"),                              # quality: too short
        (3, "der schnelle braune fuchs springt immer wieder ueber den "
            "faulen hund weil der schnelle braune fuchs gerne ueber "
            "faule hunde springt jeden einzelnen tag der woche", "de"),
        (4, "the quick brown fox jumps over the lazy dog again and "
            "again because the quick brown fox likes to jump over "
            "lazy dogs every single day of the week", "en"),  # exact dup of 1
        (5, "the quick brown fox jumps over the lazy dog again and "
            "again because the quick brown fox likes to jump over "
            "lazy dogs every single day of the month", "en"),  # near dup of 1
        (6, "completely different content about distributed query "
            "engines and their shuffle behavior at large scale with "
            "columnar storage formats and vectorized execution paths "
            "mail me at a@b.co now", "en"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string, lang string")


def test_funnel_assigns_first_failing_stage(spark):
    stages = {
        r["doc_id"]: r["stage"]
        for r in corpus_prep_funnel(
            _corpus(spark), min_tokens=10, max_avg_token_len=8.0,
            near_threshold=0.5,
        ).collect()
    }
    assert len(stages) == 6  # every input row is accounted for
    assert stages[2] == "drop_quality"
    assert stages[3] == "drop_lang"
    assert stages[4] == "drop_exact_dup"   # larger id of the exact pair
    assert stages[5] == "drop_near_dup"    # larger id of the near pair
    assert stages[1].startswith("kept_")   # the representative survives
    assert stages[6].startswith("kept_")


def test_run_corpus_prep_commits_redacted_splits(spark, tmp_path):
    corpus = SnapshotTable(str(tmp_path / "corpus"))
    funnel_t = SnapshotTable(str(tmp_path / "funnel"))
    counts = run_corpus_prep(
        spark, _corpus(spark), corpus, funnel_t,
        min_tokens=10, max_avg_token_len=8.0, near_threshold=0.5,
    )
    assert sum(counts.values()) == 6
    assert counts["drop_quality"] == 1 and counts["drop_exact_dup"] == 1

    kept = corpus.read(spark).collect()
    assert {r["doc_id"] for r in kept} == {1, 6}
    assert all(r["split"] in ("train", "val", "test") for r in kept)
    # PII was redacted on the way out
    doc6 = [r for r in kept if r["doc_id"] == 6][0]
    assert "<EMAIL>" in doc6["text"] and "a@b.co" not in doc6["text"]
    # the committed funnel covers every input doc
    assert funnel_t.read(spark).count() == 6


def test_funnel_dag_materializes_exactly_once(spark, tmp_path, monkeypatch):
    """The kept-join, funnel commit, and counts must NOT each re-run
    the funnel DAG (VERDICT r2 #2): a row-counting pandas UDF spliced
    onto the funnel output fires exactly once per document."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    import zzzarchived_arxiv_fulltext_spark.plans.corpus_prep as cp

    acc = spark.sparkContext.accumulator(0)

    @pandas_udf("string")
    def tag(s: pd.Series) -> pd.Series:
        acc.add(len(s))
        return s

    real = cp.corpus_prep_funnel

    def counting_funnel(docs, **kw):
        return real(docs, **kw).withColumn("stage", tag("stage"))

    monkeypatch.setattr(cp, "corpus_prep_funnel", counting_funnel)
    for with_funnel_table in (True, False):
        acc.value = 0
        corpus = SnapshotTable(
            str(tmp_path / f"corpus-{with_funnel_table}"))
        funnel_t = SnapshotTable(
            str(tmp_path / f"funnel-{with_funnel_table}")) \
            if with_funnel_table else None
        counts = run_corpus_prep(
            spark, _corpus(spark), corpus, funnel_t,
            min_tokens=10, max_avg_token_len=8.0, near_threshold=0.5,
        )
        assert sum(counts.values()) == 6
        assert acc.value == 6, (
            f"funnel DAG ran {acc.value / 6:.0f}x "
            f"(funnel_table={with_funnel_table})")
