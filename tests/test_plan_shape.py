"""Physical-plan regression guards for the scale-critical properties.

These assert the *shape* of the plans Catalyst produces — the
properties that decide 100 TB behavior — so a future refactor that
silently introduces a shuffle or breaks column pruning fails loudly.
"""

import contextlib
import io

from pyspark.sql import functions as F

from zzzarchived_arxiv_fulltext_spark.operators.span_extract import (
    extract_documents,
)
from zzzarchived_arxiv_fulltext_spark.sources.fixtures import spans_table


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_extraction_is_map_only(spark, tmp_path):
    path = str(tmp_path / "spans")
    spans_table(spark, 50, seed=1).write.parquet(path)
    plan = _plan(extract_documents(spark.read.parquet(path)))
    assert "Exchange" not in plan, "extraction hot path gained a shuffle"
    assert "ArrowEvalPython" in plan  # single Arrow-batched UDF stage


def test_salted_path_has_exactly_one_exchange(spark, tmp_path):
    path = str(tmp_path / "spans")
    spans_table(spark, 50, seed=1).write.parquet(path)
    plan = _plan(extract_documents(spark.read.parquet(path), parallelism=4))
    import re

    nodes = re.findall(r"\(\d+\) Exchange", plan)
    assert len(nodes) == 1, plan


def test_revenue_join_broadcasts_and_pushes_filters(spark):
    from zzzarchived_arxiv_fulltext_spark.queries import QUERIES

    plan = _plan(QUERIES["revenue_by_nation"](spark, "/root/testdata/sf0.001"))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # dims must not sort-merge
    assert "PushedFilters" in plan


def test_anti_join_prunes_output_scan(spark, tmp_path):
    from zzzarchived_arxiv_fulltext_spark.plans.extraction_job import (
        pending_documents,
        run_extraction,
    )
    from zzzarchived_arxiv_fulltext_spark.sources.tables import SnapshotTable

    out = SnapshotTable(str(tmp_path / "out"))
    src = spans_table(spark, 20, seed=1)
    run_extraction(spark, src, out)
    plan = _plan(pending_documents(src, out, spark))
    # the committed-output scan must read only the anti-join columns,
    # never the text/span payloads
    import re

    schemas = re.findall(r"ReadSchema: (struct<[^\n]*)", plan)
    out_scan = [s for s in schemas if "extractor_version" in s or
                ("doc_id" in s and "spans" not in s)]
    assert out_scan, f"no pruned output scan found in:\n{schemas}"
    assert all("plain_text" not in s and "psv_text" not in s
               for s in out_scan)


def test_ingestion_stages_are_map_only(spark):
    from zzzarchived_arxiv_fulltext_spark.sources.html_ingest import (
        html_main_text,
    )
    from zzzarchived_arxiv_fulltext_spark.sources.pdf_ingest import (
        pdf_to_spans,
    )

    pdfs = spark.createDataFrame([("a", b"%PDF")],
                                 "doc_id string, pdf binary")
    plan = _plan(pdf_to_spans(pdfs))
    assert "Exchange" not in plan and "Join" not in plan

    pages = spark.createDataFrame([("a", "<p>x</p>")],
                                  "doc_id string, html string")
    plan = _plan(html_main_text(pages))
    assert "Exchange" not in plan and "Join" not in plan
    assert "ArrowEvalPython" in plan


def test_ann_query_broadcasts_queries(spark):
    from zzzarchived_arxiv_fulltext_spark.queries import QUERIES

    plan = _plan(QUERIES["ann_topk_lsh"](spark, "/root/testdata/sf0.001"))
    # candidate generation must be a broadcast bucket equi-join, never
    # a sort-merge of the corpus
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
