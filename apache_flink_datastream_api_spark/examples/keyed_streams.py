"""chapter2/KeyedStreamOperations.java: keyBy(user) + running reduce of
duration — in Spark, a streaming groupBy aggregate in update mode (emits
the refreshed per-user total each micro-batch; SURVEY.md §2.4 A1)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.parse import parse_audit_trail


def running_duration_totals(parsed: DataFrame) -> DataFrame:
    return parsed.groupBy("user").agg(
        F.sum("duration").alias("total_duration"),
        F.count("*").alias("n_records"),
    )


def topology(lines: DataFrame) -> DataFrame:
    return running_duration_totals(parse_audit_trail(lines))


def demo(spark: SparkSession, audit_dir: str):
    lines = spark.readStream.text(audit_dir)
    return (
        topology(lines)
        .writeStream.outputMode("update")
        .format("console")
        .start()
    )
