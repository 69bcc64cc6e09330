"""Event time, watermarks, late-data capture (SURVEY.md §2.7 T1-T3).

- T1 is implicit: Spark windows over a timestamp column are event-time.
- T2: ``with_event_time`` stamps epoch-millis → TimestampType and applies
  ``withWatermark`` — the equivalent of the reference's punctuated
  assigner with its 2 s buffer (the 10 s refresh interval is an artifact
  of Flink's API; Spark advances the watermark per micro-batch).
- T3 is the real gap: Spark silently DROPS rows later than the watermark;
  Flink routes them to a side output
  (``chapter4/EventTimeOperations.java:129-171``). ``LateDataCapture``
  reimplements Flink's semantics inside ``foreachBatch``: track
  max(event_ts) seen so far, and every row arriving with
  ts < max_seen - delay is tee'd to a late-rows sink while on-time rows
  continue to the user's handler. That is exactly the punctuated-watermark
  definition (watermark = max seen - delay), evaluated per micro-batch.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, functions as F


def with_event_time(
    df: DataFrame, ts_ms_col: str = "timestamp_ms", delay: str = "2 seconds"
) -> DataFrame:
    """T2: epoch-millis long → event_ts TimestampType + watermark."""
    return df.withColumn("event_ts", F.timestamp_millis(F.col(ts_ms_col))).withWatermark(
        "event_ts", delay
    )


class LateDataCapture:
    """T3: late-data side output for Structured Streaming via foreachBatch.

    Usage::

        cap = LateDataCapture(delay_ms=2000, ts_col="event_ts",
                              on_time=handle_batch, late=handle_late)
        q = df.writeStream.foreachBatch(cap).start()

    The watermark state lives on the driver (one long); at-scale this is
    fine — it is the same single watermark Flink's job manager tracks.
    """

    def __init__(
        self,
        delay_ms: int,
        ts_col: str,
        on_time: Callable[[DataFrame, int], None],
        late: Callable[[DataFrame, int], None],
    ) -> None:
        self.delay_ms = delay_ms
        self.ts_col = ts_col
        self.on_time = on_time
        self.late = late
        self.max_ts_ms: int | None = None

    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        ts_ms = F.unix_millis(F.col(self.ts_col))
        if self.max_ts_ms is not None:
            watermark = self.max_ts_ms - self.delay_ms
            late_rows = batch.where(ts_ms < F.lit(watermark))
            on_time_rows = batch.where(ts_ms >= F.lit(watermark))
        else:
            late_rows = batch.limit(0)
            on_time_rows = batch
        self.late(late_rows, batch_id)
        self.on_time(on_time_rows, batch_id)
        hi = batch.agg(F.max(ts_ms).alias("m")).collect()[0]["m"]
        if hi is not None:
            self.max_ts_ms = max(self.max_ts_ms or 0, int(hi))


def split_late_batch(
    df: DataFrame, ts_col: str, delay_ms: int, order_col: str
) -> tuple[DataFrame, DataFrame]:
    """Batch analog of T3 for testing: replay rows in ``order_col`` arrival
    order; a row is late iff an earlier-arriving row had
    ts > row.ts + delay (running-max watermark)."""
    from pyspark.sql import Window

    w = (
        Window.orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ts_ms = F.unix_millis(F.col(ts_col))
    with_wm = df.withColumn("_wm", F.max(ts_ms).over(w) - delay_ms)
    late = with_wm.where(F.col("_wm").isNotNull() & (ts_ms < F.col("_wm"))).drop("_wm")
    on_time = with_wm.where(F.col("_wm").isNull() | (ts_ms >= F.col("_wm"))).drop("_wm")
    return on_time, late
