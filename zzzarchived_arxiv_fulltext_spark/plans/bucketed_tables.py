"""Bucketed tables: pre-shuffled storage for exchange-free joins.

The big recurring joins in a corpus pipeline — spans⋈metadata,
lineitem⋈orders-class fact joins, candidate⋈text fetches — shuffle
BOTH sides on the key every run. Bucketing pays that shuffle once at
WRITE time: ``bucketBy(n, key)`` hash-partitions rows into a fixed
number of per-partition files, and Spark's bucketed scan then feeds a
SortMergeJoin with NO Exchange on either side when both tables share
the (key, n_buckets) layout — the "co-locate joins via bucketing"
lever, pinned by ``tests/test_bucketed_tables.py`` on the physical
plan.

Rules of the layout (enforced here):
- both sides must use the SAME bucket count (Spark can join n vs k·n,
  but same-n is the predictable fast path);
- bucket columns must be the join key (subset joins re-shuffle);
- ``sortBy`` the key inside each bucket so the merge join also skips
  the per-task sort. Two preconditions for the sort elision: each
  bucket must be ONE file (``write_bucketed(sort=True)`` repartitions
  by the bucket key to guarantee it) and
  ``spark.sql.legacy.bucketedTableScan.outputOrdering=true`` (Spark
  3.0+ stopped trusting bucket sort order by default precisely
  because of the multi-file case). The Exchange elision needs
  neither.

At 100 TB: bucket count ≈ table_bytes / (target 256 MB–1 GB per
bucket-file per partition); the write is one extra shuffle, repaid on
the first join. Local tests use small counts — the PLAN SHAPE is the
contract, the arithmetic scales.
"""

from typing import Optional, Sequence, Union

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, bucket_col: str,
                   n_buckets: int, sort: bool = True,
                   mode: str = "overwrite") -> None:
    """Persist ``df`` as a parquet table bucketed (and bucket-sorted)
    by ``bucket_col`` into the session warehouse.

    ``overwrite`` also clears an ORPHAN location: a managed-table
    directory left by a previous session is invisible to this
    session's in-memory catalog, and a plain ``saveAsTable`` refuses
    it with LOCATION_ALREADY_EXISTS.
    """
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    spark = df.sparkSession
    if mode == "overwrite":
        import os
        import shutil

        spark.sql(f"DROP TABLE IF EXISTS `{table}`")
        wh = spark.conf.get("spark.sql.warehouse.dir", "")
        loc = os.path.join(wh.removeprefix("file:"), table.lower())
        if wh and os.path.isdir(loc):
            shutil.rmtree(loc, ignore_errors=True)
    if sort:
        # one file per bucket: Spark only trusts (and skips re-sorting
        # on) a bucket's sort order when the bucket is a SINGLE file,
        # and a multi-task write splits each bucket across tasks.
        # repartition uses the same murmur3 hash as the bucketing, so
        # every task holds exactly one bucket's rows.
        from pyspark.sql import functions as F

        df = df.repartition(n_buckets, F.col(bucket_col))
    writer = (df.write.format("parquet").mode(mode)
              .bucketBy(n_buckets, bucket_col))
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def co_located_join(spark: SparkSession, left: str, right: str,
                    on: Union[str, Sequence[str]],
                    how: str = "inner",
                    left_alias: Optional[str] = None,
                    right_alias: Optional[str] = None) -> DataFrame:
    """Join two bucketed tables on their bucket key.

    With matching (key, n_buckets) layouts the physical plan is
    scan → (optional sort) → SortMergeJoin with zero Exchange — the
    shuffle was paid at write time. Aliases resolve column-name
    collisions the usual way.
    """
    lf = spark.table(left)
    rf = spark.table(right)
    if left_alias:
        lf = lf.alias(left_alias)
    if right_alias:
        rf = rf.alias(right_alias)
    return lf.join(rf, on=on, how=how)
