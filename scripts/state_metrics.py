"""Measure streaming state-store footprint per scale leg (VERDICT r5 #4).

The sf0.1x/sf0.3/sf1 sweep measures wall-clock and exchanges; this
measures what the stateful queries HOLD: per state operator, the peak
``numRowsTotal`` / ``memoryUsedBytes`` across the replay's micro-batches
(captured by ``run_available_now`` via SPARK_GRAFT_STATE_METRICS_FILE),
plus rows evicted and rows dropped late. The invariant under test is the
j2 OOM fix turned into a number: watermark-bounded operators hold state
proportional to the watermark window (for raw-row buffers: window-span
DENSITY — a fixed fraction of the corpus set by watermark/calendar-range,
never the whole corpus; for windowed aggregates: the constant count of
open windows), and evict between micro-batches.

Orchestrator (writes scaling_runs/state_metrics.jsonl, one line per
query x leg, each query in its OWN JVM like the timing legs):

    python scripts/state_metrics.py

Runner (one query, one leg — used by the orchestrator):

    python scripts/state_metrics.py --run <query> <sf_dir> <out.jsonl>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "w3_sliding_stream",
    "w6_chained_windows_stream",
    "j2_join_then_window_stream",
    "j3_threeway_stream_join",
    "x4_debounce_stream",
    "x8_neardup_stream",
    # round 7: the append+watermark production twins — the row of interest
    # is sink_rows_per_batch (emitted ∝ sessions closed per trigger) next
    # to state eviction, vs complete mode's cumulative rewrite.
    "w4_session_append_stream",
    "x4_debounce_append_stream",
]

LEGS = [  # (label, dir, driver heap) — mirrors the timing legs
    ("0.1x", "testdata_scaled/sf0.1x", "8g"),
    ("0.3", "testdata_scaled/sf0.3", "8g"),
    ("1", "testdata_scaled/sf1", "16g"),
]

OUT = "scaling_runs/state_metrics.jsonl"


def run_one(query: str, sf_dir: str, out: str) -> None:
    from apache_flink_datastream_api_spark.registry import all_queries
    from apache_flink_datastream_api_spark.session import get_spark

    spark = get_spark(app_name=f"state_{query}")
    # force() semantics: the streaming replay happens inside fn; the
    # returned batch frame only needs materializing.
    all_queries()[query].fn(spark, sf_dir).write.mode(
        "overwrite").format("noop").save()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--run":
        run_one(sys.argv[2], sys.argv[3], sys.argv[4])
        return
    if os.path.exists(OUT):
        os.remove(OUT)
    for label, d, mem in LEGS:
        for q in QUERIES:
            env = dict(
                os.environ,
                SPARK_DRIVER_MEMORY=mem,
                SPARK_GRAFT_STATE_METRICS_FILE=os.path.abspath(OUT),
                SPARK_GRAFT_STATE_METRICS_LABEL=f"{q}@{label}",
            )
            print(f"[state] {q} @ sf{label}", flush=True)
            subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--run", q, d, OUT],
                env=env, check=True, timeout=1800,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            )
    # summarize to stdout
    for line in open(OUT):
        rec = json.loads(line)
        peak = max((o["peak_rows"] for o in rec["operators"]), default=0)
        print(f"{rec['label']}: batches={rec['n_batches']} "
              f"rows_in={rec['rows_in']} peak_rows={peak}")


if __name__ == "__main__":
    main()
