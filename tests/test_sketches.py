"""Accuracy pinning for the approximate (sketch) operators: no cross-engine
oracle can hash-match sketch output, so correctness = bounded relative
error against the exact operator on the same data."""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_flink_datastream_api_spark.operators.sketches import (
    sketch_daily_uniques,
    sketch_value_percentiles,
)
from apache_flink_datastream_api_spark.sources.tables import load_table

from .conftest import SF_DIR


def test_hll_uniques_within_rsd(spark):
    approx = {
        (r.day_ms, r.event_type): r.approx_uniques
        for r in sketch_daily_uniques(spark, SF_DIR).collect()
    }
    exact = {
        (r.day_ms, r.event_type): r.n
        for r in load_table(spark, SF_DIR, "events")
        .groupBy(F.unix_millis(F.date_trunc("day", "ts")).alias("day_ms"), "event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert approx.keys() == exact.keys()
    for k, n in exact.items():
        # 2% rsd → 10% is a generous 5-sigma bound, deterministic in practice
        assert abs(approx[k] - n) <= max(2, 0.1 * n), (k, approx[k], n)


def test_approx_percentiles_bracket_exact(spark):
    """Approx percentiles return an actual element near the requested
    rank; value-distance is meaningless in a sparse tail, so assert each
    approx value lies between the exact percentiles at q ± 2.5 ranks
    (rank-based error, the sketch's actual guarantee)."""
    approx = {
        r.event_type: (r.p50, r.p95, r.p99)
        for r in sketch_value_percentiles(spark, SF_DIR).collect()
    }
    exact = {
        r.event_type: (r.lo50, r.hi50, r.lo95, r.hi95, r.lo99, r.hi99)
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(
            F.expr("percentile(value, 0.475)").alias("lo50"),
            F.expr("percentile(value, 0.525)").alias("hi50"),
            F.expr("percentile(value, 0.925)").alias("lo95"),
            F.expr("percentile(value, 0.975)").alias("hi95"),
            F.expr("percentile(value, 0.965)").alias("lo99"),
            F.expr("max(value)").alias("hi99"),
        )
        .collect()
    }
    for et, (a50, a95, a99) in approx.items():
        lo50, hi50, lo95, hi95, lo99, hi99 = exact[et]
        assert lo50 <= a50 <= hi50, (et, a50, lo50, hi50)
        assert lo95 <= a95 <= hi95, (et, a95, lo95, hi95)
        assert lo99 <= a99 <= hi99, (et, a99, lo99, hi99)


def test_hll_rollup_merge_consistent_and_accurate(spark):
    """The union of per-day sketches must estimate exactly what a single
    direct sketch over the raw data estimates (HLL union(sketch(A),
    sketch(B)) == sketch(A ∪ B) for a fixed lgConfigK), and land within
    the configured error of the exact distinct."""
    from apache_flink_datastream_api_spark.operators.sketches import (
        HLL_LGK,
        sketch_rollup_uniques,
    )

    rolled = {
        r.event_type: r.approx_uniques
        for r in sketch_rollup_uniques(spark, SF_DIR).collect()
    }
    ev = load_table(spark, SF_DIR, "events")
    direct = {
        r.event_type: r.est
        for r in ev.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id", F.lit(HLL_LGK))
            ).alias("est")
        )
        .collect()
    }
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert rolled.keys() == direct.keys() == exact.keys()
    for et in exact:
        assert rolled[et] == direct[et], (et, rolled[et], direct[et])
        assert abs(rolled[et] - exact[et]) <= max(2, 0.05 * exact[et])
