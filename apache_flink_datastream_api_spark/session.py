"""SparkSession factory (SURVEY.md §2.10 E1/E2).

The reference obtains a ``StreamExecutionEnvironment`` and occasionally forces
``setParallelism(1)`` for output ordering
(``chapter2/BasicStreamingOperations.java:37-42``). Our equivalent is a
SparkSession tuned for *scale-out* execution instead:

- AQE on (runtime coalescing of shuffle partitions, skew-join splitting,
  dynamic join-strategy switch) — on a 1000-executor cluster this is what
  keeps a 100 TB shuffle from dying on one hot key.
- Arrow execution enabled so any Pandas-UDF path is batch-columnar, never
  row-at-a-time pickling.
- UTC session timezone so window bucketing / epoch arithmetic is
  deterministic across driver and oracle.
- ``shuffle_partitions`` defaults to the local core count for tests; on a
  real cluster leave it to AQE's coalescing from a high initial value.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "flink-datastream-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or reuse) a SparkSession with scale-minded defaults."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        env_sp = os.environ.get("SPARK_SHUFFLE_PARTITIONS")
        shuffle_partitions = int(env_sp) if env_sp else (32 if cpus == "*" else int(cpus))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # AQE: coalesce post-shuffle partitions, split skewed ones, switch
        # sort-merge -> broadcast when runtime stats allow.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow for every pandas_udf / applyInPandas boundary.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Parquet scan sizing: 128 MiB splits keep ~1 task per HDFS-ish block
        # at 100 TB without tiny-task overhead at test scale.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # Broadcast threshold: dims like region/nation/supplier always fit.
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", os.environ.get("SPARK_UI", "false"))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark
