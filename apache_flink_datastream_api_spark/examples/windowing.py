"""chapter3/WindowingOperations.java: sliding (10 s / 5 s) and per-user
session (5 s gap) windows over the audit stream (SURVEY.md §2.5 W3/W4).

The reference uses processing-time windows; Spark windows are event-time —
stamping arrival time at ingest (``current_timestamp``) is the
processing-time shim (§7 hard-part 3). These topologies take the ts column
to use, so tests drive them with deterministic event time instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.parse import parse_audit_trail


def stamp_ingest_time(df: DataFrame) -> DataFrame:
    """Processing-time shim: wall-clock arrival timestamp at ingest."""
    return df.withColumn("ingest_ts", F.current_timestamp())


def sliding_counts(parsed: DataFrame, ts_col: str = "event_ts") -> DataFrame:
    """10 s windows sliding by 5 s: count + min/max event ts (A3)."""
    return (
        parsed.groupBy(F.window(ts_col, "10 seconds", "5 seconds").alias("w"))
        .agg(
            F.count("*").alias("cnt"),
            F.min("timestamp_ms").alias("min_ts_ms"),
            F.max("timestamp_ms").alias("max_ts_ms"),
        )
        .select(F.unix_millis("w.start").alias("window_start_ms"),
                "cnt", "min_ts_ms", "max_ts_ms")
    )


def session_counts(parsed: DataFrame, ts_col: str = "event_ts") -> DataFrame:
    """Per-user session windows with a 5 s inactivity gap (W4)."""
    return (
        parsed.groupBy("user", F.session_window(ts_col, "5 seconds").alias("w"))
        .agg(F.count("*").alias("cnt"))
        .select(
            "user",
            F.unix_millis("w.start").alias("session_start_ms"),
            F.unix_millis("w.end").alias("session_end_ms"),
            "cnt",
        )
    )


def demo(spark: SparkSession, audit_dir: str):
    parsed = parse_audit_trail(spark.readStream.text(audit_dir))
    q1 = (
        sliding_counts(parsed)
        .writeStream.outputMode("update").format("console").start()
    )
    q2 = (
        session_counts(parsed)
        .writeStream.outputMode("update").format("console").start()
    )
    return q1, q2
