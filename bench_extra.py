"""Per-query isolation bench + plan capture (guide §1.1/§1.4).

NOT the driver metric — ``bench.py`` stays frozen. This tool times
individual battery queries in isolation against the noop sink, and
optionally dumps ``explain("formatted")`` for each to a directory
(the ``plans/r07/<query>_{before,after}.txt`` deliverable).

Usage:
  python bench_extra.py [--repeats 3] [--explain-dir plans/r07]
                        [--tag before] [query ...]

With no query names, times the full battery. Honors the same env
knobs as bench.py (SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS). Prints one
JSON object {query: {"min": s, "runs": [...]}} plus the calibration
number so runs are comparable across box-speed drift.
"""

import argparse
import json
import sys
import time
import os
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from zzzarchived_arxiv_fulltext_spark.config import build_spark
from zzzarchived_arxiv_fulltext_spark.queries import QUERIES


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", help="query names (default: all)")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--tag", default="before")
    ap.add_argument("--no-warmup", action="store_true")
    args = ap.parse_args()

    from bench import calibration_seconds
    calibration = calibration_seconds()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    names = args.queries or list(QUERIES)
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    spark = build_spark(app_name="bench_extra", master=f"local[{cpus}]",
                        shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    if not args.no_warmup:
        # absorb python-worker/JIT cold start on an arbitrary cheap query
        spark.sparkContext.setJobDescription("warmup")
        QUERIES[names[0]](spark, sf_dir).write.format("noop").mode(
            "overwrite").save()

    out = {}
    for name in names:
        fn = QUERIES[name]
        if args.explain_dir:
            d = Path(args.explain_dir)
            d.mkdir(parents=True, exist_ok=True)
            plan = fn(spark, sf_dir)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted"))
            (d / f"{name}_{args.tag}.txt").write_text(plan)
        runs = []
        for _ in range(args.repeats):
            spark.sparkContext.setJobDescription(f"{name}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        out[name] = {"min": min(runs), "runs": runs}
    print(json.dumps({
        "calibration_sec": round(calibration, 3),
        "sf_dir": sf_dir, "cpus": cpus,
        "queries": out,
        "total_min_sec": round(sum(v["min"] for v in out.values()), 2),
    }, indent=1))


if __name__ == "__main__":
    main()
