"""Multi-sink single-pass topologies (SURVEY.md §7 hard-part 5).

A Flink job writes one dataflow to many sinks in a single pass
(``chapter2/BasicStreamingOperations.java``: console + file from one
source). Structured Streaming runs one query per sink, re-reading the
source — or ONE query whose ``foreachBatch`` fans each micro-batch out to
every sink, reading the source once.

``fanout_sinks`` implements the single-pass form: the batch is persisted,
written to every sink, then unpersisted — source scan cost is paid once
per micro-batch regardless of sink count.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame


def fanout_sinks(
    stream: DataFrame,
    sinks: list[Callable[[DataFrame, int], None]],
    checkpoint: str,
    available_now: bool = False,
):
    """Start one streaming query delivering each micro-batch to every sink."""

    def deliver(batch: DataFrame, batch_id: int) -> None:
        batch.persist()
        try:
            for sink in sinks:
                sink(batch, batch_id)
        finally:
            batch.unpersist()

    writer = stream.writeStream.foreachBatch(deliver).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
