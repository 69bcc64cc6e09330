"""chapter2/BasicStreamingOperations.java re-expressed.

Reference shape (SURVEY.md §3 trace 1): file-monitor CSV source → parse →
(A) 5 s tumbling count printed; (B) (ts, count) rows to a file sink. Two
sinks from one source — delivered single-pass via foreachBatch fan-out
instead of Flink's implicit multi-sink graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.parse import parse_audit_trail
from ..streaming.fanout import fanout_sinks


def five_second_counts(parsed: DataFrame, ts_col: str = "event_ts") -> DataFrame:
    """(A)+(B): record count per 5 s tumbling window."""
    return (
        parsed.groupBy(F.window(ts_col, "5 seconds").alias("w"))
        .agg(F.count("*").alias("cnt"))
        .select(F.unix_millis("w.start").alias("window_start_ms"), "cnt")
    )


def topology(lines: DataFrame) -> DataFrame:
    return five_second_counts(parse_audit_trail(lines))


def demo(spark: SparkSession, audit_dir: str, out_dir: str, checkpoint: str):
    """Stream a directory of quoted audit CSVs; print counts AND write
    them to files, reading the source once."""
    lines = spark.readStream.text(audit_dir)
    counts = topology(lines)

    def console_sink(batch: DataFrame, batch_id: int) -> None:
        print(f"--- batch {batch_id} ---")
        batch.orderBy("window_start_ms").show(truncate=False)

    def file_sink(batch: DataFrame, batch_id: int) -> None:
        batch.write.mode("append").csv(out_dir)

    return fanout_sinks(
        counts, [console_sink, file_sink], checkpoint, available_now=False
    )
