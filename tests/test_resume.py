"""Checkpoint/resume semantics: snapshot commits + anti-join dedup.

North-rule requirement: resumable from the last committed snapshot —
a killed run loses only uncommitted work; the rerun completes exactly
the remaining documents, and every document appears exactly once.
"""

import pytest

from zzzarchived_arxiv_fulltext_spark.plans.extraction_job import (
    pending_documents,
    read_extracted,
    run_extraction,
)
from zzzarchived_arxiv_fulltext_spark.schema import OUTPUT_SCHEMA
from zzzarchived_arxiv_fulltext_spark.sources.fixtures import spans_table
from zzzarchived_arxiv_fulltext_spark.sources.tables import SnapshotTable


@pytest.fixture()
def tmp_tables(tmp_path):
    out = SnapshotTable(str(tmp_path / "out"))
    lineage = SnapshotTable(str(tmp_path / "lineage"))
    return out, lineage


def test_interrupted_run_resumes_exactly_once(spark, tmp_tables):
    out, lineage = tmp_tables
    full = spans_table(spark, 120, seed=7)

    # "crashed" first run: only half the input got committed before the
    # kill (simulated by feeding half), plus an orphan staging dir that
    # must stay invisible
    first_half = full.where("pmod(xxhash64(doc_id), 2) = 0")
    snap1 = run_extraction(spark, first_half, out, lineage, parallelism=4)
    assert snap1 == 1
    import os
    os.makedirs(os.path.join(out.path, "_staging-deadbeef"), exist_ok=True)

    committed_1 = out.read(spark, OUTPUT_SCHEMA).count()
    assert 0 < committed_1 < 120

    # rerun over the FULL input: anti-join resumes the remainder only
    todo = pending_documents(full, out, spark)
    assert todo.count() == 120 - committed_1

    snap2 = run_extraction(spark, full, out, lineage, parallelism=4)
    assert snap2 == 2

    result = out.read(spark, OUTPUT_SCHEMA)
    assert result.count() == 120
    assert result.select("doc_id").distinct().count() == 120  # exactly once

    # a third run is a no-op: nothing pending, no empty snapshot kept
    assert run_extraction(spark, full, out, lineage, parallelism=4) is None


def test_uncommitted_snapshot_is_invisible(spark, tmp_tables):
    out, _ = tmp_tables
    df = spans_table(spark, 10, seed=3)
    # write data files WITHOUT committing the manifest
    import os
    staging = os.path.join(out.path, "_staging-xyz")
    from zzzarchived_arxiv_fulltext_spark.operators.span_extract import (
        extract_documents,
    )
    extract_documents(df).write.mode("overwrite").parquet(staging)
    assert out.snapshots() == []
    assert out.read(spark, OUTPUT_SCHEMA).count() == 0


def test_lineage_metrics_cover_all_docs(spark, tmp_tables):
    out, lineage = tmp_tables
    run_extraction(spark, spans_table(spark, 60, seed=5), out, lineage,
                   parallelism=4)
    from zzzarchived_arxiv_fulltext_spark.schema import LINEAGE_SCHEMA
    lin = lineage.read(spark, LINEAGE_SCHEMA).collect()
    assert sum(r["n_docs"] for r in lin) == 60
    assert all(r["n_docs"] == r["n_succeeded"] + r["n_failed"] for r in lin)
    out_rows = out.read(spark, OUTPUT_SCHEMA).collect()
    assert sum(r["chars_extracted"] for r in out_rows) == \
        sum(r["chars_extracted"] for r in lin)
    # per-partition lineage: partition ids are real and plural
    assert len({r["partition_id"] for r in lin}) >= 2


def test_force_reextraction_and_latest_version_view(spark, tmp_tables):
    out, _ = tmp_tables
    df = spans_table(spark, 15, seed=11)
    run_extraction(spark, df, out, parallelism=2)
    run_extraction(spark, df, out, parallelism=2, force=True)
    assert out.read(spark, OUTPUT_SCHEMA).count() == 30  # duplicated history
    latest = read_extracted(spark, out)
    assert latest.count() == 15  # J3 latest-version view dedups
