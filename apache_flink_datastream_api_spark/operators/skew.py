"""Skew-handling: salted two-phase aggregation.

At 100 TB a handful of hot keys (one power user, one boilerplate document)
can pin a single reducer for hours. Two mitigations exist in this engine:

1. AQE skew-join splitting (on by default in ``session.get_spark``) —
   handles skewed JOIN partitions at runtime.
2. This module: explicit salting for AGGREGATIONS, where AQE cannot split
   a hot group. Phase 1 groups on (key, salt) — hot keys fan out over
   ``n_salts`` reducers; phase 2 merges the per-salt partials. Both phases
   get map-side combine, so the extra shuffle moves only
   |keys| × n_salts rows.

The salted plan is semantically identical to the direct groupBy — the
registry query's oracle is the PLAIN group-by, which is exactly the point:
same answer, skew-proof plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..registry import QuerySpec
from ..sources.bucketing import bucketed_join, write_bucketed
from ..sources.tables import load_table


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[Column, Column]],
    n_salts: int = 8,
) -> DataFrame:
    """Two-phase aggregation with key salting.

    ``aggs``: output_name -> (phase1_agg_expr, phase2_merge_expr), where
    phase 2 refers to the phase-1 output column by its output name, e.g.
    ``{"cnt": (F.count("*"), F.sum("cnt"))}``.
    """
    # Salt must vary WITHIN a key (a key-derived salt would not fan out a
    # hot key at all); partition id does, and costs nothing to compute.
    salt = F.spark_partition_id() % n_salts
    phase1 = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(*[expr.alias(name) for name, (expr, _) in aggs.items()])
    )
    return phase1.groupBy(*keys).agg(
        *[merge.alias(name) for name, (_, merge) in aggs.items()]
    )


def skew_salted_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event totals via the salted two-phase plan; answer is
    identical to a plain groupBy (the oracle)."""
    e = load_table(spark, sf_dir, "events")
    return salted_agg(
        e,
        ["user_id"],
        {
            "n_events": (F.count("*"), F.sum("n_events")),
            "total_value": (
                F.sum(F.col("value").cast("decimal(18,4)")),
                F.sum("total_value").cast("double"),
            ),
        },
        n_salts=8,
    )


SKEW_ORACLE = """
SELECT user_id, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
FROM events GROUP BY 1
"""


def bucketed_join_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders ⋈ customer with BOTH sides pre-bucketed on the join key: the
    SortMergeJoin zips aligned buckets with zero exchange on either input
    (pinned in tests/test_scale_patterns.py). At 100 TB, bucketing the
    fact table once amortizes its shuffle across every downstream join on
    the same key — the co-location strategy behind hourly fact⋈fact jobs.
    The oracle is the plain join: same answer, shuffle-free plan."""
    o = load_table(spark, sf_dir, "orders").selectExpr(
        "o_custkey AS custkey", "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").selectExpr(
        "c_custkey AS custkey", "c_mktsegment"
    )
    write_bucketed(o, "bjr_orders", "custkey", 8)
    write_bucketed(c, "bjr_customer", "custkey", 8)
    j = bucketed_join(spark, "bjr_orders", "bjr_customer", "custkey",
                      force_sort_merge=True)
    return j.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue"),
    )


BUCKETED_JOIN_ORACLE = """
SELECT c_mktsegment, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY 1
"""


SPECS = [
    QuerySpec("skew_salted_user_totals", skew_salted_user_totals, SKEW_ORACLE,
              "salted two-phase agg == plain groupBy", ("scale",)),
    QuerySpec("bucketed_join_roundtrip", bucketed_join_roundtrip,
              BUCKETED_JOIN_ORACLE,
              "pre-bucketed co-located join: zero-exchange SMJ == plain join",
              ("scale", "io", "sink")),
]
