"""Single-pass pipeline audit via the Observation API.

The e2e pipelines emit audit counts as query OUTPUT (a stage/count table,
``operators/pipeline.py``). When the output is the cleaned data itself, a
second aggregate over the corpus would double the scan — ``df.observe``
instead attaches metric expressions to the existing plan and collects
them as a side channel of the SAME action: zero extra scans, zero extra
shuffles, exactly one value per action regardless of cluster size.

Batch: ``audited(df, ...)`` + ``Observation.get`` after any action.
Streaming: the same ``observe`` call surfaces per-micro-batch metrics in
``StreamingQueryProgress.observedMetrics`` — the Flink-metrics-registry
analog, but computed inside the dataflow (no separate metrics operator).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation


def audited(df: DataFrame, name: str, **metrics: Column) -> tuple[DataFrame, Observation]:
    """Attach named metric aggregates to df's plan. Returns (df, obs);
    read ``obs.get`` after the first action on the returned frame."""
    obs = Observation(name)
    cols = [expr.alias(alias) for alias, expr in metrics.items()]
    return df.observe(obs, *cols), obs


def observe_stream(df: DataFrame, name: str, **metrics: Column) -> DataFrame:
    """Streaming variant: metrics land in every micro-batch's
    ``progress.observedMetrics[name]`` (Observation objects are
    batch-only; streaming takes a plain name)."""
    cols = [expr.alias(alias) for alias, expr in metrics.items()]
    return df.observe(name, *cols)
