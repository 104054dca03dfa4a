"""spark-submit entry point for the STANDING streaming corpus-prep
service (the streaming twin of tools/run_corpus_prep.py).

Usage (local stand-in for a multi-executor cluster):

    spark-submit --master local[32] tools/run_stream_corpus_prep.py \
        --landing /path/to/landing_parquet_dir \
        --state /path/to/state_root \
        [--keep-langs en] [--min-tokens 25] [--near-threshold 0.4] \
        [--continuous]

Drains (or, with --continuous, follows) the landing directory through
the full funnel — quality gate, language filter, exact dedup vs the
committed hash index, near dedup vs the committed LSH bucket index,
PII redaction, split assignment — committing kept documents, funnel
rows, and all indexes under --state. Restart-safe: every append is
micro-batch-stamped (exactly-once under replay) and the stream
checkpoint lives in --state/checkpoint.
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from zzzarchived_arxiv_fulltext_spark.config import build_spark  # noqa: E402
from zzzarchived_arxiv_fulltext_spark.sources.tables import (  # noqa: E402
    SnapshotTable,
)
from zzzarchived_arxiv_fulltext_spark.streaming.stream_corpus_prep import (  # noqa: E402
    run_streaming_corpus_prep,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--landing", required=True)
    ap.add_argument("--state", required=True)
    ap.add_argument("--min-tokens", type=int, default=25)
    ap.add_argument("--max-avg-token-len", type=float, default=6.0)
    ap.add_argument("--keep-langs", default="en")
    ap.add_argument("--near-threshold", type=float, default=0.4)
    ap.add_argument("--continuous", action="store_true",
                    help="keep running instead of drain-and-exit")
    args = ap.parse_args()

    spark = build_spark(app_name="stream-corpus-prep")
    state = Path(args.state)
    tables = {n: SnapshotTable(str(state / n))
              for n in ("corpus", "funnel", "hash", "seen",
                        "bucket", "pairs")}
    query = run_streaming_corpus_prep(
        spark, args.landing, str(state / "checkpoint"),
        corpus_table=tables["corpus"], funnel_table=tables["funnel"],
        hash_table=tables["hash"], seen_table=tables["seen"],
        bucket_table=tables["bucket"], pairs_table=tables["pairs"],
        min_tokens=args.min_tokens,
        max_avg_token_len=args.max_avg_token_len,
        keep_langs=tuple(args.keep_langs.split(",")),
        near_threshold=args.near_threshold,
        available_now=not args.continuous,
    )
    if args.continuous:
        query.awaitTermination()
        return
    # explicit schemas: an empty landing dir commits no snapshots and
    # schemaless reads of empty tables raise by design
    funnel = tables["funnel"].read(spark, "doc_id long, stage string")
    corpus = tables["corpus"].read(
        spark, "doc_id long, text string, lang string, split string")
    from pyspark.sql import functions as F
    counts = {r["stage"]: r["n"] for r in funnel.groupBy("stage")
              .agg(F.count("*").alias("n")).collect()}
    print(json.dumps({"funnel": counts, "corpus_rows": corpus.count()}))


if __name__ == "__main__":
    main()
