"""Temporal join operators over ``events`` (driver-mandated extension
beyond the reference surface; the reference's only join is the windowed
equi-join at ``chapter3/WindowJoins.java:110-144``, already covered by
``j1_window_join``).

Spark has no native AS-OF or interval join, so these are compositions of
built-in operators chosen for their 100 TB shape:

- as-of join     union-tag both sides and take a running ``last(...,
                 ignorenulls)`` over one window partitioned by the key.
                 ONE shuffle on the key, zero join blow-up: the classic
                 join-then-rank formulation materializes |purchases| ×
                 |prior clicks| intermediate rows (quadratic per hot key),
                 while this is strictly linear in input size. This is the
                 pattern to keep at scale.
- interval join  equi-join on the key plus a range predicate. Catalyst
                 plans a hash join on the equality key and evaluates the
                 range as a post-join filter, so it never degenerates to
                 the cartesian a pure range condition would cost. At
                 100 TB, bucket both sides by (key, coarse time bucket).
- quantiles      exact linear-interpolation percentiles (Spark
                 ``percentile`` ≡ DuckDB ``quantile_cont``), map-side
                 partial agg per group.
- pivot          ``groupBy().pivot(values=...)`` with the value list
                 pinned: one shuffle, no extra distinct-values job, fixed
                 output schema (at scale an unpinned pivot is an extra
                 full scan plus an unbounded-width schema hazard).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..registry import QuerySpec
from ..sources.tables import load_table

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


# --- as-of join: each purchase ↔ latest click at or before it --------------

def asof_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase event, the same user's most recent click with
    click.ts <= purchase.ts (NULLs when the user never clicked before).

    Single-shuffle union pattern: tag clicks 0 / purchases 1, sort within
    user by (ts, tag) so a same-instant click sorts first (inclusive
    as-of), and carry the last non-null click forward.
    """
    ev = load_table(spark, sf_dir, "events")
    base = ev.where(F.col("event_type").isin("click", "purchase")).select(
        "user_id",
        F.unix_millis("ts").alias("ts_ms"),
        "event_id",
        (F.col("event_type") == "purchase").cast("int").alias("is_purchase"),
    )
    tagged = base.select(
        "*",
        F.when(F.col("is_purchase") == 0, F.col("event_id")).alias("click_id"),
        F.when(F.col("is_purchase") == 0, F.col("ts_ms")).alias("click_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_ms", "is_purchase")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tagged.select(
            "user_id", "ts_ms", "event_id", "is_purchase",
            F.last("click_id", ignorenulls=True).over(w).alias("asof_click_id"),
            F.last("click_ts", ignorenulls=True).over(w).alias("asof_click_ts_ms"),
        )
        .where(F.col("is_purchase") == 1)
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts_ms").alias("purchase_ts_ms"),
            "asof_click_id",
            "asof_click_ts_ms",
            (F.col("ts_ms") - F.col("asof_click_ts_ms")).alias("gap_ms"),
        )
    )


# Oracle: DuckDB's native ASOF LEFT JOIN (greatest c.ts with p.ts >= c.ts).
ASOF_ORACLE = """
WITH clicks AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'
), purchases AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id AS purchase_id,
       p.user_id,
       epoch_ms(p.ts) AS purchase_ts_ms,
       c.event_id AS asof_click_id,
       epoch_ms(c.ts) AS asof_click_ts_ms,
       epoch_ms(p.ts) - epoch_ms(c.ts) AS gap_ms
FROM purchases p ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND p.ts >= c.ts
"""


# --- interval (range) join: errors in the hour before each purchase --------

RANGE_MS = 3_600_000


def range_join_purchase_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count error events by the same user in [purchase.ts - 1h,
    purchase.ts). Hash equi-join on user_id; the time range is a residual
    filter, not the join condition."""
    ev = load_table(spark, sf_dir, "events")
    purch = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.unix_millis("ts").alias("purchase_ts_ms"),
    )
    err = ev.where(F.col("event_type") == "error").select(
        F.col("user_id").alias("err_user"), F.unix_millis("ts").alias("err_ts_ms")
    )
    joined = purch.join(
        err,
        (F.col("user_id") == F.col("err_user"))
        & (F.col("err_ts_ms") >= F.col("purchase_ts_ms") - RANGE_MS)
        & (F.col("err_ts_ms") < F.col("purchase_ts_ms")),
        "left",
    )
    return joined.groupBy("purchase_id", "user_id", "purchase_ts_ms").agg(
        F.count("err_ts_ms").alias("n_errors")
    )


RANGE_ORACLE = f"""
SELECT p.event_id AS purchase_id,
       p.user_id,
       epoch_ms(p.ts) AS purchase_ts_ms,
       COUNT(e.ts) AS n_errors
FROM events p LEFT JOIN events e
  ON e.user_id = p.user_id
 AND e.event_type = 'error'
 AND epoch_ms(e.ts) >= epoch_ms(p.ts) - {RANGE_MS}
 AND epoch_ms(e.ts) < epoch_ms(p.ts)
WHERE p.event_type = 'purchase'
GROUP BY 1, 2, 3
"""


# --- exact percentiles per group -------------------------------------------

def event_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p25/p50/p90 of value per event_type. Spark's ``percentile``
    and DuckDB's ``quantile_cont`` share linear-interpolation semantics;
    round(6) absorbs last-ulp arithmetic differences. At 100 TB swap for
    ``approx_percentile`` (t-digest sketch, map-side combinable) — same
    plan shape, bounded memory."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.25)"), 6).alias("p25"),
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
    )


QUANTILES_ORACLE = """
SELECT event_type,
       round(quantile_cont(value, 0.25), 6) AS p25,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.9), 6) AS p90
FROM events GROUP BY 1
"""


# --- moving aggregate over an explicit row frame ---------------------------

def user_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user 5-event moving sum/average of value, ordered by event
    time. The frame sum goes through DECIMAL so both engines accumulate
    exactly (sliding-window float subtraction/segment-tree strategies
    differ between engines); the average is one double division at the
    end. One shuffle on user_id; the sort rides the same exchange."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_ms")
        .rowsBetween(-4, Window.currentRow)
    )
    base = ev.select(
        "user_id", F.unix_millis("ts").alias("ts_ms"),
        F.col("value").cast("decimal(18,6)").alias("v"),
    )
    return base.select(
        "user_id", "ts_ms",
        F.sum("v").over(w).cast("double").alias("msum5"),
        (F.sum("v").over(w).cast("double") / F.count("*").over(w)).alias("mavg5"),
    )


MOVING_AVG_ORACLE = """
WITH base AS (
  SELECT user_id, epoch_ms(ts) AS ts_ms, CAST(value AS DECIMAL(18,6)) AS v
  FROM events
)
SELECT user_id, ts_ms,
       CAST(SUM(v) OVER w AS DOUBLE) AS msum5,
       CAST(SUM(v) OVER w AS DOUBLE)
         / COUNT(*) OVER w AS mavg5
FROM base
WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
"""


# --- pivot: per-user event-type count matrix -------------------------------

def event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    pivoted = (
        ev.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .count()
    )
    return pivoted.select(
        "user_id",
        *[
            F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}")
            for t in EVENT_TYPES
        ],
    )


PIVOT_ORACLE = "SELECT user_id, " + ", ".join(
    f"COUNT(*) FILTER (WHERE event_type = '{t}') AS n_{t}" for t in EVENT_TYPES
) + " FROM events GROUP BY 1"


SPECS = [
    QuerySpec("asof_join_purchase_click", asof_purchase_click, ASOF_ORACLE,
              "as-of join via single-shuffle union+last_value", ("temporal", "join")),
    QuerySpec("range_join_purchase_errors", range_join_purchase_errors, RANGE_ORACLE,
              "interval join: errors in the hour before each purchase", ("temporal", "join")),
    QuerySpec("event_value_quantiles", event_value_quantiles, QUANTILES_ORACLE,
              "exact linear-interpolation percentiles per group", ("agg",)),
    QuerySpec("event_type_pivot", event_type_pivot, PIVOT_ORACLE,
              "pinned-values pivot count matrix", ("agg",)),
    QuerySpec("user_moving_avg", user_moving_avg, MOVING_AVG_ORACLE,
              "5-event moving sum/avg over an explicit row frame", ("window",)),
]
