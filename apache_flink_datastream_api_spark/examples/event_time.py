"""chapter4/EventTimeOperations.java: event time + watermark + late-data
side output + formatted sink (SURVEY.md §2.7 T1-T3, §2.9 K2).

Reference: punctuated watermark (max seen − 2 s), 1 s tumbling windows,
late rows to a side output, "ts = count" strings to an exactly-once Kafka
sink. Spark form: ``withWatermark`` on the parsed event time, the same
windows, ``LateDataCapture`` for the side output, and the formatted
strings to any sink (Kafka is at-least-once in Spark — documented in
``streaming.sinks``)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.parse import parse_audit_trail
from ..streaming.watermarks import LateDataCapture


def one_second_counts(parsed: DataFrame, delay: str = "2 seconds") -> DataFrame:
    """Watermarked 1 s tumbling counts (W2)."""
    return (
        parsed.withWatermark("event_ts", delay)
        .groupBy(F.window("event_ts", "1 second").alias("w"))
        .agg(F.count("*").alias("cnt"))
        .select(F.unix_millis("w.start").alias("window_start_ms"), "cnt")
    )


def format_kafka_value(counts: DataFrame) -> DataFrame:
    """The reference's '"<ts> = <count>"' sink payload."""
    return counts.select(
        F.concat(F.col("window_start_ms").cast("string"), F.lit(" = "),
                 F.col("cnt").cast("string")).alias("value")
    )


def demo(spark: SparkSession, audit_dir: str, checkpoint: str):
    """Windowed counts to console; late rows captured to a driver-side list
    (stand-in for the reference's side-output print)."""
    parsed = parse_audit_trail(spark.readStream.text(audit_dir))
    late_rows: list = []

    cap = LateDataCapture(
        delay_ms=2000,
        ts_col="event_ts",
        on_time=lambda df, _id: df.groupBy().count().show(),
        late=lambda df, _id: late_rows.extend(df.collect()),
    )
    q = (
        parsed.writeStream.foreachBatch(cap)
        .option("checkpointLocation", checkpoint)
        .start()
    )
    return q, late_rows
