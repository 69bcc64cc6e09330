"""chapter5/StatefulOperations.java: ValueState 2-Deletes-in-10 s alert
(SURVEY.md §2.8 X1).

The reference emits a ("No-Alerts", 0) sentinel for non-alerting records
and filters it downstream (P3); the Spark processor simply emits nothing —
sentinel and filter both disappear."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.parse import parse_audit_trail
from ..streaming.state import interval_alerts

ALERT_WINDOW_MS = 10_000


def delete_alerts(parsed: DataFrame) -> DataFrame:
    """Alert (user, ts_ms, diff_ms) for consecutive Deletes < 10 s apart."""
    deletes = parsed.where(F.col("operation") == "Delete").select(
        F.col("user").alias("user_key"),
        F.col("timestamp_ms").alias("ts_ms"),
        F.col("id").alias("event_id"),
    )
    return interval_alerts(
        deletes, ALERT_WINDOW_MS, key_col="user_key", ts_ms_col="ts_ms"
    )


def demo(spark: SparkSession, audit_dir: str):
    parsed = parse_audit_trail(spark.readStream.text(audit_dir))
    return (
        delete_alerts(parsed)
        .writeStream.outputMode("update")
        .format("console")
        .start()
    )
