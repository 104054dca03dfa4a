"""Steady-state incremental extraction (snapshot-delta reads, no
anti-join), bucket namespaces, and numeric latest-version resolution.
"""

import contextlib
import io

from pyspark.sql import functions as F

from zzzarchived_arxiv_fulltext_spark.operators.span_extract import (
    extract_documents,
)
from zzzarchived_arxiv_fulltext_spark.plans.extraction_job import (
    consumed_input_snapshot,
    get_document,
    pending_documents,
    read_extracted,
    run_extraction,
    run_extraction_incremental,
)
from zzzarchived_arxiv_fulltext_spark.schema import INPUT_SCHEMA, OUTPUT_SCHEMA
from zzzarchived_arxiv_fulltext_spark.sources.fixtures import spans_table
from zzzarchived_arxiv_fulltext_spark.sources.tables import SnapshotTable


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_incremental_consumes_deltas_without_joins(spark, tmp_path):
    src = SnapshotTable(str(tmp_path / "src"))
    out = SnapshotTable(str(tmp_path / "out"))
    lineage = SnapshotTable(str(tmp_path / "lineage"))

    full = spans_table(spark, 60, seed=1)
    first = full.where("pmod(xxhash64(doc_id), 2) = 0")
    second = full.where("pmod(xxhash64(doc_id), 2) = 1")
    n_first = first.count()

    src.append(first)
    assert run_extraction_incremental(spark, src, out, lineage,
                                      parallelism=2) == 1
    assert out.read(spark, OUTPUT_SCHEMA).count() == n_first
    assert consumed_input_snapshot(out) == 1

    # steady state with no new input: no-op, no empty snapshot
    assert run_extraction_incremental(spark, src, out, lineage) is None
    assert out.latest_snapshot_id() == 1

    # second increment reads ONLY the delta, through a join-free plan
    src.append(second)
    delta = src.read_since(spark, consumed_input_snapshot(out),
                           INPUT_SCHEMA, up_to=src.latest_snapshot_id())
    plan = _plan(extract_documents(delta))
    assert "Join" not in plan, "steady-state increment must not join"
    assert "Exchange" not in plan

    assert run_extraction_incremental(spark, src, out, lineage,
                                      parallelism=2) == 2
    result = out.read(spark, OUTPUT_SCHEMA)
    assert result.count() == 60
    assert result.select("doc_id").distinct().count() == 60
    assert consumed_input_snapshot(out) == 2


def test_consumed_position_commits_atomically_with_data(spark, tmp_path):
    src = SnapshotTable(str(tmp_path / "src"))
    out = SnapshotTable(str(tmp_path / "out"))
    src.append(spans_table(spark, 10, seed=2))
    snap = run_extraction_incremental(spark, src, out)
    entry = [s for s in out.snapshots() if s["id"] == snap][0]
    # the position lives IN the data commit's manifest entry — there is
    # no separate marker file a crash could strand out of sync
    assert entry["consumed_input_snapshot"] == 1
    import os
    assert not any(f.startswith("_consumed") for f in os.listdir(out.path))


def test_bucket_namespaces_isolate_resume(spark, tmp_path):
    out = SnapshotTable(str(tmp_path / "out"))
    docs = spans_table(spark, 10, seed=3)
    run_extraction(spark, docs.withColumn("bucket", F.lit("arxiv")), out)

    # the same doc_ids under another namespace are new work, not dups
    sub = docs.withColumn("bucket", F.lit("submission"))
    assert pending_documents(sub, out, spark).count() == 10
    run_extraction(spark, sub, out)
    assert out.read(spark, OUTPUT_SCHEMA).count() == 20
    # ... but re-running the same namespace is a no-op
    assert run_extraction(spark, sub, out) is None

    some_id = docs.select("doc_id").first()["doc_id"]
    a = get_document(spark, out, some_id, bucket="arxiv")
    s = get_document(spark, out, some_id, bucket="submission")
    assert a and a["bucket"] == "arxiv"
    assert s and s["bucket"] == "submission"
    # bucket-less inputs land in the default namespace
    assert get_document(spark, out, some_id, bucket="nope") is None


def test_latest_version_is_numeric_not_lexicographic(
    spark, tmp_path, monkeypatch
):
    import zzzarchived_arxiv_fulltext_spark.operators.span_extract as se

    out = SnapshotTable(str(tmp_path / "out"))
    docs = spans_table(spark, 6, seed=4)
    monkeypatch.setattr(se, "EXTRACTOR_VERSION", "spark-9.0")
    run_extraction(spark, docs, out, force=True)
    monkeypatch.setattr(se, "EXTRACTOR_VERSION", "spark-10.0")
    run_extraction(spark, docs, out, force=True)

    rows = read_extracted(spark, out).collect()
    assert len(rows) == 6
    # reference float-sorts versions (store.py:145-165): 10.0 > 9.0,
    # even though "10.0" < "9.0" lexicographically
    assert all(r["extractor_version"] == "spark-10.0" for r in rows)


def test_dotted_versions_fall_back_to_string_order(
    spark, tmp_path, monkeypatch
):
    import zzzarchived_arxiv_fulltext_spark.operators.span_extract as se

    out = SnapshotTable(str(tmp_path / "out"))
    docs = spans_table(spark, 4, seed=9)
    # "2.1.0" is not a float: it must NOT tail-parse as 1.0 (which
    # would rank it below "1.9.9" = 9.9); both fall to string order
    monkeypatch.setattr(se, "EXTRACTOR_VERSION", "2.1.0")
    run_extraction(spark, docs, out, force=True)
    monkeypatch.setattr(se, "EXTRACTOR_VERSION", "1.9.9")
    run_extraction(spark, docs, out, force=True)

    rows = read_extracted(spark, out).collect()
    assert len(rows) == 4
    assert all(r["extractor_version"] == "2.1.0" for r in rows)


def test_pre_bucket_snapshots_heal_on_read(spark, tmp_path):
    """Output committed before the bucket column existed must not be
    silently re-extracted (ADVICE r2): schema-on-read yields NULL
    buckets, healed to the default namespace."""
    out = SnapshotTable(str(tmp_path / "out"))
    docs = spans_table(spark, 8, seed=12)
    # simulate a pre-bucket-era commit: extract, then drop the column
    legacy = extract_documents(docs).drop("bucket")
    out.append(legacy)

    # resume over the same input: nothing pending — the anti-join
    # matches the healed default bucket
    assert pending_documents(docs, out, spark).count() == 0
    assert run_extraction(spark, docs, out) is None

    # the latest-version view serves legacy rows under the default
    latest = read_extracted(spark, out)
    assert latest.count() == 8
    assert latest.where("bucket = 'arxiv'").count() == 8

    # mixed old/new snapshots coexist
    sub = docs.withColumn("bucket", F.lit("submission"))
    run_extraction(spark, sub, out)
    assert read_extracted(spark, out).count() == 16
