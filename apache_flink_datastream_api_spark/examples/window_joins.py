"""chapter3/WindowJoins.java: tumbling-window equi-join of two streams on
user (SURVEY.md §2.6 J1).

The reference joins a file stream with a Kafka stream inside 5 s tumbling
windows, emitting (user, 1) per matched pair. Spark form: add the window
bucket to both sides and equi-join on (user, window) — the exact
window-bucket semantics (option b in the survey); the idiomatic
time-interval stream-stream join is covered in tests/test_streaming."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.parse import parse_audit_trail


def window_join(
    left: DataFrame, right: DataFrame, ts_col: str = "event_ts",
    window: str = "5 seconds",
) -> DataFrame:
    """One row (user, 1) per pair matched within the same tumbling window."""
    bucket = F.unix_millis(F.window(ts_col, window).getField("start"))
    a = left.select(F.col("user"), bucket.alias("w"))
    b = right.select(F.col("user").alias("b_user"), bucket.alias("b_w"))
    return (
        a.join(b, (a.user == b.b_user) & (a.w == b.b_w))
        .select("user", F.lit(1).alias("one"))
    )


def demo(spark: SparkSession, file_dir: str, kafka_topic: str, bootstrap: str):
    from ..streaming.sources import kafka_lines

    file_side = parse_audit_trail(spark.readStream.text(file_dir))
    kafka_side = parse_audit_trail(kafka_lines(spark, kafka_topic, bootstrap))
    return (
        window_join(file_side, kafka_side)
        .writeStream.format("console")
        .start()
    )
