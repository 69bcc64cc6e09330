"""Streaming sources (SURVEY.md §2.1 S1/S2/S3).

- S1 file-monitor CSV: Flink's ``readFile(..., PROCESS_CONTINUOUSLY, 1000)``
  polls a directory; Spark's file stream source discovers new files per
  micro-batch — same per-file ingestion semantics for the reference's
  one-record-per-file generators. ``maxFilesPerTrigger`` plays the role of
  the poll interval's batching.
- S2 Kafka: ``format("kafka")`` + value-cast; gated because no broker
  exists in the test container.
- S3 synthetic generators: the reference spawns generator threads writing
  files/Kafka (``datasource/FileStreamDataGenerator.java:32-107``); the
  Spark-native equivalent is the ``rate`` source with derived columns —
  self-contained, no side threads, scales linearly with rowsPerSecond.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..schemas import AUDIT_TRAIL_SCHEMA


def file_monitor_csv(
    spark: SparkSession,
    directory: str,
    schema=AUDIT_TRAIL_SCHEMA,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """S1: stream a directory of CSV files with an explicit schema."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.csv(directory)


def kafka_lines(
    spark: SparkSession,
    topic: str,
    bootstrap_servers: str = "localhost:9092",
    starting_offsets: str = "latest",
) -> DataFrame:
    """S2: Kafka topic as a stream of string lines (value cast)."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
        .selectExpr("CAST(value AS STRING) AS value", "timestamp AS ingest_ts")
    )


# Generator domains from FileStreamDataGenerator.java:37-53 (public demo
# values, reproduced as data not code).
USERS = ("Tom", "Harry", "Bob")
OPERATIONS = ("Create", "Modify", "Query", "Delete")
ENTITIES = ("Customer", "SalesRep")
ACTIONS = ("Login", "ViewVideo", "ViewLink", "ViewReview", "Logout")


def _pick(col, choices) -> F.Column:
    arr = F.array(*[F.lit(c) for c in choices])
    return F.element_at(arr, (col % len(choices) + 1).cast("int"))


def rate_audit_stream(spark: SparkSession, rows_per_second: int = 10) -> DataFrame:
    """S3: self-contained audit-trail generator on the rate source,
    matching the reference generator's domains deterministically."""
    r = spark.readStream.format("rate").option("rowsPerSecond", rows_per_second).load()
    v = F.col("value")
    return r.select(
        v.cast("int").alias("id"),
        _pick(v, USERS).alias("user"),
        _pick(v * 7 + 3, ENTITIES).alias("entity"),
        _pick(v * 13 + 1, OPERATIONS).alias("operation"),
        F.unix_millis("timestamp").alias("timestamp_ms"),
        (v % 10 + 1).cast("int").alias("duration"),
        (v % 4 + 1).cast("int").alias("change_count"),
        F.col("timestamp").alias("event_ts"),
    )


def rate_browser_stream(spark: SparkSession, rows_per_second: int = 10) -> DataFrame:
    """S3: browser-events generator (chapter6 domains)."""
    r = spark.readStream.format("rate").option("rowsPerSecond", rows_per_second).load()
    v = F.col("value")
    return r.select(
        v.cast("int").alias("id"),
        _pick(v, USERS).alias("user"),
        _pick(v * 11 + 2, ACTIONS).alias("action"),
        F.unix_millis("timestamp").alias("timestamp_ms"),
        F.col("timestamp").alias("event_ts"),
    )
