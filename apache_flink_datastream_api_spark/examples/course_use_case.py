"""chapter6/CourseUseCase.java capstone: browser-event stream → (A) 10 s
per-(user, action) windowed counts; (B) per-user session-duration state
machine with Logout reset (SURVEY.md §3 trace 3, §2.8 X2)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.parse import parse_browser_events
from ..streaming.state import session_durations


def action_counts_10s(parsed: DataFrame) -> DataFrame:
    """(A): count per (user, action) per 10 s tumbling window (W5/A4)."""
    return (
        parsed.groupBy("user", "action", F.window("event_ts", "10 seconds").alias("w"))
        .agg(F.count("*").alias("cnt"))
        .select("user", "action",
                F.unix_millis("w.start").alias("window_start_ms"), "cnt")
    )


def user_session_durations(parsed: DataFrame) -> DataFrame:
    """(B): emit (user, last_action, duration) per event; Logout clears."""
    sel = parsed.select(
        F.col("user").alias("user_key"),
        "action",
        F.col("timestamp_ms").alias("ts_ms"),
        F.col("id").alias("event_id"),
    )
    return session_durations(
        sel, logout_action="Logout", key_col="user_key",
        action_col="action", ts_ms_col="ts_ms",
    )


def demo(spark: SparkSession, browser_dir: str):
    parsed = parse_browser_events(spark.readStream.text(browser_dir))
    qa = (
        action_counts_10s(parsed)
        .writeStream.outputMode("update").format("console").start()
    )
    qb = (
        user_session_durations(parsed)
        .writeStream.outputMode("update").format("console").start()
    )
    return qa, qb
