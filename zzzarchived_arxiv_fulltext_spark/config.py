"""SparkSession construction with engine-appropriate defaults.

Tuned for the extraction workload (map-heavy, Arrow-batched pandas
UDFs over documents of wildly varying size):

- Arrow serialization on, with a *modest* records-per-batch cap:
  UDF cost is per-character, not per-row, so a batch of giant
  documents must stay small enough to bound executor-python memory
  (SURVEY.md §4 item 2).
- AQE on (runtime coalescing + skew-join splitting) — the anti-join
  resume path and the metrics aggregation benefit at scale.
"""

import os

from pyspark.sql import SparkSession

DEFAULT_ARROW_BATCH = 256


def build_spark(
    app_name: str = "arxiv-fulltext-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    arrow_batch: int = DEFAULT_ARROW_BATCH,
) -> SparkSession:
    """Build a SparkSession with the engine's tuned defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default
    all cores) so the same entry points serve tests, bench, and a real
    ``spark-submit`` (where ``master`` is left to the cluster manager).
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_GRAFT_CPUS" in os.environ:
        master = f"local[{os.environ['SPARK_GRAFT_CPUS']}]"
    if master is not None:
        builder = builder.master(master)
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))

    spark = (
        builder
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch))
        # keep scans prunable: never read more parquet than a split
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    return spark
