"""Sustained-throughput streaming bench (VERDICT r6 item 5).

The registry's bounded replays measure correctness-shaped latency; a
production sizing decision needs SUSTAINED rows/sec. This drives the
x-family stateful operators from the deterministic ``rate-micro-batch``
source (fixed rows per trigger — cadence does not drift when a batch
runs long) for ~60 s each and reports, from StreamingQueryProgress:

- achieved rows/sec (processed rows / summed trigger execution time),
- per-batch p50/p95 trigger latency,
- peak state rows.

Pairs measured side by side (SCALING.md throughput table):
- x1 interval alerts  — applyInPandasWithState (Python state runner)
- x4 debounce         — Python ValueState twin vs all-JVM session-window
                        append form (the scale path; quantifies
                        SCALING.md finding 3 in ops terms)
- x8 near-dup ingest  — all-JVM banded-MinHash bucket aggregation

Synthetic shape: event time advances 1 ms per row (watermarks progress,
state evicts); user_id cycles over 10k keys; x8 docs are 30
pseudo-random tokens from a 20k vocabulary.

Usage:
    python scripts/throughput_bench.py            # all pairs, ~60 s each
    SPARK_GRAFT_TPUT_SECS=20 python scripts/throughput_bench.py x4_jvm
"""

from __future__ import annotations

import json
import math
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

DURATION_S = int(os.environ.get("SPARK_GRAFT_TPUT_SECS", "60"))
ROWS_PER_BATCH = int(os.environ.get("SPARK_GRAFT_TPUT_ROWS_PER_BATCH", "100000"))
WARMUP_BATCHES = 3
N_USERS = 10_000
BASE_MS = 1_700_000_000_000

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scaling_runs", "throughput.jsonl")


def _rate(spark):
    return (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", ROWS_PER_BATCH)
        .option("startTimestamp", 0)
        .load()
    )


def _events(spark):
    """Rate rows shaped like the events stream: ms-granular advancing
    event time, cycling users, 5 event types."""
    return _rate(spark).select(
        F.col("value").alias("event_id"),
        (F.col("value") % N_USERS).alias("user_id"),
        F.element_at(
            F.array(*[F.lit(t) for t in
                      ("view", "click", "purchase", "error", "signup")]),
            (F.col("value") % 5 + 1).cast("int"),
        ).alias("event_type"),
        (F.lit(BASE_MS) + F.col("value")).alias("ts_ms"),
    )


def q_x1_python(spark):
    from apache_flink_datastream_api_spark.streaming.state import interval_alerts

    ev = _events(spark).where(F.col("event_type") == "error").select(
        "user_id", "ts_ms", "event_id")
    # per-user error spacing is 5*N_USERS ms = 50 s; alert on < 60 s gaps
    return interval_alerts(ev, 60_000), "update"


def q_x4_python(spark):
    from apache_flink_datastream_api_spark.operators.temporal import (
        DEBOUNCE_GAP_MS,
    )
    from apache_flink_datastream_api_spark.streaming.state import (
        debounced_events,
    )

    ev = _events(spark).select("user_id", "event_type", "ts_ms", "event_id")
    return debounced_events(ev, DEBOUNCE_GAP_MS), "update"


def q_x4_jvm(spark):
    from apache_flink_datastream_api_spark.operators.temporal import (
        DEBOUNCE_GAP_MS,
    )

    ev = (
        _events(spark)
        .withColumn("ts2", F.timestamp_millis("ts_ms"))
        .withWatermark("ts2", "10 minutes")
    )
    agg = (
        ev.groupBy(
            "user_id", "event_type",
            F.session_window("ts2", f"{DEBOUNCE_GAP_MS + 1} milliseconds"),
        )
        .agg(F.min("ts_ms").alias("ts_ms"))
        .select("user_id", "event_type", "ts_ms")
    )
    return agg, "append"


def q_x8_jvm(spark):
    from apache_flink_datastream_api_spark.streaming.queries import (
        neardup_bucket_state,
    )

    docs = _rate(spark).select(
        F.col("value").alias("doc_id"),
        F.expr(
            "concat_ws(' ', transform(sequence(0, 29), "
            "i -> concat('t', pmod(value * 31 + i * 7, 20000))))"
        ).alias("text"),
    )
    return neardup_bucket_state(docs), "update"


def q_j3_first_touch(spark):
    """The multi-stateful-operator chain (VERDICT r7 item 5): three
    windowed min-aggregations feeding two stream-stream window
    equi-joins in ONE append query — five state stores. Event-type must
    be derived independently of user_id here: ``value % 5`` is constant
    per user (N_USERS is a multiple of 5), which would starve the funnel
    of (view, click, purchase) triples; ``(value div N_USERS) % 5``
    gives every user all five types across a 100k-row batch. Windows are
    60 s of event time (~0.6 wall-s per window at 1 ms/row cadence) so
    windows close and rows flow through BOTH joins at steady state."""
    ev = _rate(spark).select(
        (F.col("value") % N_USERS).alias("user_id"),
        F.element_at(
            F.array(*[F.lit(t) for t in
                      ("view", "click", "purchase", "error", "signup")]),
            ((F.col("value") / N_USERS).cast("long") % 5 + 1).cast("int"),
        ).alias("event_type"),
        (F.lit(BASE_MS) + F.col("value")).alias("ts_ms"),
    )

    def firsts(t):
        return (
            ev.where(F.col("event_type") == t)
            .withColumn("ts2", F.timestamp_millis("ts_ms"))
            .withWatermark("ts2", "10 seconds")
            .groupBy("user_id", F.window("ts2", "60 seconds").alias("w"))
            .agg(F.min("ts_ms").alias(f"{t}_ms"))
        )

    vc = firsts("view").join(firsts("click"), ["user_id", "w"]).where(
        F.col("click_ms") >= F.col("view_ms"))
    vcp = vc.join(firsts("purchase"), ["user_id", "w"]).where(
        F.col("purchase_ms") >= F.col("click_ms"))
    out = vcp.select(
        "user_id", F.unix_millis("w.start").alias("bucket_ms"),
        "view_ms", "click_ms", "purchase_ms")
    return out, "append"


QUERIES = {
    "x1_python": q_x1_python,
    "x4_python": q_x4_python,
    "x4_jvm": q_x4_jvm,
    "x8_jvm": q_x8_jvm,
    "j3_ft_jvm": q_j3_first_touch,
}


def _pct(xs, p):
    xs = sorted(xs)
    return xs[min(len(xs) - 1, int(math.ceil(p / 100 * len(xs))) - 1)]


ROCKSDB = ("org.apache.spark.sql.execution.streaming.state."
           "RocksDBStateStoreProvider")


def run_one(spark, name) -> dict:
    """``name`` may carry a ``:rocksdb`` suffix: same query, RocksDB
    state-store provider — the backend a 100 TB deployment runs (state
    spills to local SSD instead of bounding at executor heap), so the
    table prices the provider swap, not just the operator."""
    base, _, provider = name.partition(":")
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    if provider == "rocksdb":
        spark.conf.set(key, ROCKSDB)
    try:
        return _run_one(spark, name, base)
    finally:
        if provider == "rocksdb":
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)


def _run_one(spark, name, base) -> dict:
    df, mode = QUERIES[base](spark)
    q = (
        df.writeStream.outputMode(mode)
        .format("noop")
        .option("checkpointLocation", tempfile.mkdtemp(
            prefix=f"tput_{name}_",
            dir="/dev/shm" if os.path.isdir("/dev/shm") else None))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        time.sleep(DURATION_S)
    finally:
        q.stop()
        q.awaitTermination(120)
    prog = [json.loads(p.json) for p in q.recentProgress]
    prog = [p for p in prog if p.get("numInputRows", 0) > 0][WARMUP_BATCHES:]
    if not prog:
        raise RuntimeError(f"{name}: no steady-state batches in {DURATION_S}s")
    rows = sum(p["numInputRows"] for p in prog)
    exec_ms = [p["durationMs"]["triggerExecution"] for p in prog]
    peak_state = max(
        (so.get("numRowsTotal", 0) for p in prog
         for so in p.get("stateOperators", [])),
        default=0,
    )
    return {
        "query": name,
        "batches": len(prog),
        "rows": rows,
        "rows_per_sec": round(rows / (sum(exec_ms) / 1000.0)),
        "batch_p50_ms": _pct(exec_ms, 50),
        "batch_p95_ms": _pct(exec_ms, 95),
        "peak_state_rows": peak_state,
        "rows_per_batch": ROWS_PER_BATCH,
        "duration_s": DURATION_S,
    }


def main() -> None:
    from apache_flink_datastream_api_spark.session import get_spark

    names = [a for a in sys.argv[1:] if not a.startswith("-")]
    if not names:
        names = list(QUERIES)
        if "--rocksdb" in sys.argv:
            names += [f"{n}:rocksdb" for n in QUERIES]

    spark = get_spark(app_name="throughput")
    results = []
    for name in names:
        print(f"[tput] {name} ({DURATION_S}s @ {ROWS_PER_BATCH} rows/batch)",
              flush=True)
        r = run_one(spark, name)
        results.append(r)
        print("  ", json.dumps(r), flush=True)
        with open(OUT, "a") as f:
            f.write(json.dumps(r) + "\n")
    print("\n| query | rows/sec | batch p50 ms | p95 ms | peak state rows |")
    print("|---|---|---|---|---|")
    for r in results:
        print(f"| `{r['query']}` | {r['rows_per_sec']:,} | {r['batch_p50_ms']}"
              f" | {r['batch_p95_ms']} | {r['peak_state_rows']:,} |")


if __name__ == "__main__":
    main()
