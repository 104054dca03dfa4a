"""The full user journey in one test: raw mixed-format bytes →
format-sniffing router → committed extraction → language ID →
corpus prep funnel → dedup keep-list → training shards/splits.

This is the "a reference user could switch" path: every stage is the
public operator surface, chained on its real outputs.
"""

from pyspark.sql import functions as F

from zzzarchived_arxiv_fulltext_spark.functions.pdf_text import make_simple_pdf
from zzzarchived_arxiv_fulltext_spark.operators.sampling import (
    hash_split,
    shard_by_token_budget,
)
from zzzarchived_arxiv_fulltext_spark.operators.text_metrics import language_id
from zzzarchived_arxiv_fulltext_spark.plans.dedup_job import run_dedup
from zzzarchived_arxiv_fulltext_spark.plans.extraction_job import run_extraction
from zzzarchived_arxiv_fulltext_spark.sources.ingest_router import raw_to_spans
from zzzarchived_arxiv_fulltext_spark.sources.tables import SnapshotTable

_EN = ("the quick brown fox jumps over the lazy dog and the cat that "
       "is watching from the windowsill of the old house in the town")
_DE = ("der schnelle braune fuchs springt und der faule hund schaut "
       "nicht zu weil der hund ist zu muede und der tag ist lang")


def test_full_pipeline_end_to_end(spark, tmp_path):
    # -- stage 0: a raw crawl dump (PDF, HTML, plain text, junk, dups)
    rows = [
        ("pdf-1", make_simple_pdf([[_EN]])),
        ("html-1", f"<html><body><p>{_EN} again</p></body></html>".encode()),
        ("txt-1", _EN.encode()),                     # exact dup of pdf-1's text
        ("txt-2", (_DE + " tag").encode()),          # German
        ("junk-1", b"\xff\xfe\x00\x01\x80garbage"),  # undecodable
    ]
    raw = spark.createDataFrame(rows, "doc_id string, payload binary")

    # -- stage 1: route to spans, extract, commit
    out = SnapshotTable(str(tmp_path / "extracted"))
    lineage = SnapshotTable(str(tmp_path / "lineage"))
    spans = raw_to_spans(raw).drop("format")
    snap = run_extraction(spark, spans, out, lineage, parallelism=2)
    assert snap == 1

    extracted = out.read(spark)
    assert extracted.count() == 5  # junk-1 survives as a row ...
    docs = (extracted
            .where("status = 'succeeded' AND chars_extracted > 0")
            .select("doc_id", F.col("plain_text").alias("text")))
    assert docs.count() == 4  # ... but carries no text downstream

    # -- stage 2: language ID becomes the corpus lang column
    langs = language_id(docs).withColumnRenamed("predicted_lang", "lang")
    corpus = docs.join(langs.select("doc_id", "lang"), on="doc_id")
    by_lang = {r["doc_id"]: r["lang"] for r in corpus.collect()}
    assert by_lang["txt-2"] == "de"
    assert by_lang["pdf-1"] == "en"

    # -- stage 3: dedup pairs + keep-list on the extracted corpus
    pairs_t = SnapshotTable(str(tmp_path / "pairs"))
    keep_t = SnapshotTable(str(tmp_path / "keep"))
    run_dedup(spark, corpus, pairs_t, keep_t, threshold=0.5)
    keep = {r["id"]: r["keep"] for r in keep_t.read(spark).collect()}
    # pdf-1/txt-1 are exact dups and html-1 a near-dup of the same
    # text: the whole English cluster keeps exactly ONE representative
    cluster = ["html-1", "pdf-1", "txt-1"]
    assert sum(keep[i] for i in cluster) == 1
    assert keep["txt-2"]  # the German doc is its own cluster

    kept_ids = [i for i, k in keep.items() if k]
    kept = corpus.join(
        spark.createDataFrame([(i,) for i in kept_ids], ["doc_id"]),
        on="doc_id", how="left_semi")

    # -- stage 4: training splits + token-budget shards
    final = hash_split(shard_by_token_budget(kept, budget_tokens=40),
                       {"train": 0.8, "val": 0.2})
    rows = final.collect()
    assert {r["split"] for r in rows} <= {"train", "val"}
    assert all(r["shard"] >= 0 and r["n_tokens"] > 0 for r in rows)
    assert len(rows) == len(kept_ids)

    # -- stage 5: encoding repair → quality signals → retrieval →
    # packed training sequences (the round-4 surface, chained on the
    # same real outputs)
    from zzzarchived_arxiv_fulltext_spark.operators.quality_rules import (
        gopher_quality_signals,
    )
    from zzzarchived_arxiv_fulltext_spark.operators.sampling import (
        pack_sequences,
    )
    from zzzarchived_arxiv_fulltext_spark.operators.search import (
        bm25_search,
    )
    from zzzarchived_arxiv_fulltext_spark.operators.text_metrics import (
        fix_mojibake,
    )

    repaired = fix_mojibake(kept)
    assert repaired.where("repaired = 1").count() == 0  # clean corpus

    signals = {r["doc_id"]: r for r in
               gopher_quality_signals(repaired).collect()}
    assert all(s["alpha_word_frac"] == 1.0 for s in signals.values())

    hits = bm25_search(repaired, ["fox"], k=5).collect()
    en_rep = [i for i in cluster if keep[i]][0]
    assert en_rep in {r["doc_id"] for r in hits}   # English rep found
    assert "txt-2" not in {r["doc_id"] for r in hits}  # no 'fox'

    packed = pack_sequences(repaired, 16).collect()
    stream_tokens = sum(r["n_tokens"] for r in packed)
    doc_tokens = sum(len(r["text"].split()) for r in repaired.collect())
    assert stream_tokens == doc_tokens           # nothing lost/invented
    assert sum(1 for r in packed if not r["complete"]) <= 1


def test_mixed_format_corpus_to_extraction(spark, tmp_path):
    """The arXiv shape end to end: one raw corpus holding PDF, PS,
    TeX, HTML, and plain-text payloads → format router → span
    integrity gate → extraction job → per-format success accounting.
    Every format must reach 'succeeded' with its text recovered."""
    from pyspark.sql import functions as F

    from zzzarchived_arxiv_fulltext_spark.functions.pdf_text import (
        make_simple_pdf,
    )
    from zzzarchived_arxiv_fulltext_spark.functions.ps_text import (
        make_simple_ps,
    )
    from zzzarchived_arxiv_fulltext_spark.functions.tex_text import (
        make_simple_tex,
    )
    from zzzarchived_arxiv_fulltext_spark.operators.span_audit import (
        span_doc_flags,
    )
    from zzzarchived_arxiv_fulltext_spark.plans.extraction_job import (
        run_extraction,
    )
    from zzzarchived_arxiv_fulltext_spark.sources.ingest_router import (
        raw_to_spans,
    )
    from zzzarchived_arxiv_fulltext_spark.sources.tables import (
        SnapshotTable,
    )

    line = "the quick brown fox jumps over the lazy dog"
    payloads = {
        "pdf": make_simple_pdf([[line]]),
        "ps": make_simple_ps([[line]]),
        "tex": make_simple_tex([line]).encode(),
        "html": (b"<html><body><main><p>" + line.encode()
                 + b"</p></main></body></html>"),
        "text": line.encode(),
    }
    raw = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in payloads.items()],
        "doc_id string, payload binary")

    routed = raw_to_spans(raw)
    fmts = {r["doc_id"]: r["format"] for r in routed.collect()}
    assert fmts == {k: k for k in payloads}

    # integrity gate: the router must emit invariant-clean spans
    flags = span_doc_flags(routed)
    bad = flags.where(
        (F.col("offsets_not_dense") + F.col("bad_text_span")
         + F.col("bad_media_span") + F.col("unknown_kind")) > 0)
    assert bad.count() == 0

    out = SnapshotTable(str(tmp_path / "extracted"))
    run_extraction(spark, routed.select("doc_id", "spans"), out)
    got = {r["doc_id"]: r for r in out.read(spark).collect()}
    assert all(got[k]["status"] == "succeeded" for k in payloads)
    for k in payloads:
        assert "quick brown fox" in got[k]["plain_text"], k
