"""spark-submit entry point for training-corpus preparation + dedup.

Usage (local stand-in for a multi-executor cluster):

    spark-submit --master local[32] tools/run_corpus_prep.py \
        --input /path/to/docs_parquet \
        --corpus /path/to/corpus_table \
        [--funnel /path/to/funnel_table] \
        [--pairs /path/to/pairs_table --keep /path/to/keep_table] \
        [--min-tokens 25] [--keep-langs en,de] [--near-threshold 0.4]

Runs the end-to-end prep funnel (quality gate → language filter →
exact dedup → MinHash near-dup removal → PII redaction → split
assignment) and commits the kept corpus as one snapshot; with
``--pairs``/``--keep`` it also runs the standalone dedup job
(duplicate-pair table + transitive keep-list). Input must provide
(doc_id, text, lang).
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from zzzarchived_arxiv_fulltext_spark.config import build_spark  # noqa: E402
from zzzarchived_arxiv_fulltext_spark.plans.corpus_prep import (  # noqa: E402
    run_corpus_prep,
)
from zzzarchived_arxiv_fulltext_spark.plans.dedup_job import (  # noqa: E402
    run_dedup,
)
from zzzarchived_arxiv_fulltext_spark.sources.tables import (  # noqa: E402
    SnapshotTable,
)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="parquet of (doc_id, text, lang)")
    p.add_argument("--corpus", required=True, help="output SnapshotTable dir")
    p.add_argument("--funnel", help="optional funnel SnapshotTable dir")
    p.add_argument("--pairs", help="optional duplicate-pairs table dir")
    p.add_argument("--keep", help="optional keep-list table dir (needs --pairs)")
    p.add_argument("--min-tokens", type=int, default=25)
    p.add_argument("--max-avg-token-len", type=float, default=6.0)
    p.add_argument("--keep-langs", default="en")
    p.add_argument("--near-threshold", type=float, default=0.4)
    args = p.parse_args(argv)
    if args.keep and not args.pairs:
        p.error("--keep requires --pairs")

    spark = build_spark(app_name="corpus-prep")
    docs = spark.read.parquet(args.input)

    counts = run_corpus_prep(
        spark,
        docs,
        SnapshotTable(args.corpus),
        SnapshotTable(args.funnel) if args.funnel else None,
        min_tokens=args.min_tokens,
        max_avg_token_len=args.max_avg_token_len,
        keep_langs=tuple(args.keep_langs.split(",")),
        near_threshold=args.near_threshold,
    )
    result = {"funnel_counts": counts}

    if args.pairs:
        snap = run_dedup(
            spark, docs,
            SnapshotTable(args.pairs),
            SnapshotTable(args.keep) if args.keep else None,
            threshold=args.near_threshold,
        )
        result["pairs_snapshot"] = snap

    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
