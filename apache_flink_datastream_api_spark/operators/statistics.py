"""Classical statistics + training-label construction, integer-exact.

Extends the rank-statistics family (operators/behavior.py: Mann-Whitney U,
KS, CUSUM, weighted median) with the remaining tests an analytics team
reaches for: Spearman rank correlation, the Mann-Kendall trend test,
distribution-drift by total variation distance, max drawdown, and
Gini-Simpson diversity — plus churn-label construction (the supervised-
learning counterpart of the event-stream analytics; reference analog is
the keyed per-user state rollups of ``chapter6/CourseUseCase.java:82-95``,
re-expressed as leakage-safe observation/holdout windows).

House rules (see registry.py docstring): every statistic is computed from
exact integer/DECIMAL sums so a 32-partition Spark aggregation and the
single-threaded DuckDB oracle agree bit-for-bit; the ONLY float arithmetic
is a final scalar expression over already-exact BIGINTs, written with
IDENTICAL operation order on both engines (IEEE-754 +,×,÷,sqrt,floor are
correctly rounded, so identical inputs + identical order ⇒ identical
bits).

Scale notes (100 TB):
- Spearman: tie-averaged ranks come from the value-sharded two-pass
  distributed rank (7th user of the q_revenue_gini machinery) — the rank
  map is built over DISTINCT values (grouped rollup), never a global
  window over the fact table; the small-domain side (50 quantity levels)
  broadcasts, the large-domain side joins on its own shuffle key.
- Mann-Kendall / drawdown / CUSUM family: the pairwise/window pass runs
  over the DAILY aggregate — calendar-bounded (≤ |days| rows) no matter
  how many trillions of facts produced it, so the |days|² sign join and
  the single-partition running max are driver-scale BY CONSTRUCTION.
- TVD drift / Simpson: one grouped rollup each; band and (lang, source)
  domains are fixed-size, the per-band compare is map-side after one
  shuffle.
- churn labels: two keyed rollups on the same shuffle key (user_id) and
  one equi-join — no fact self-join, no window over raw events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..registry import QuerySpec
from ..sources.tables import load_table

SPECS: list[QuerySpec] = []

DAY_MS = 86_400_000


# --- Spearman rank correlation ----------------------------------------------
# rho between lineitem quantity and extended price, with tie-averaged
# ranks kept integer by the classic x2 scaling: r2 = 2*(#less) + #tied + 1
# (twice the average rank of a tie group). All five moment sums are exact;
# rho itself is one deterministic double expression over them.

_Q_SHARD = 10          # quantity in 1..50 -> ~5 shards (broadcast side anyway)
_P_SHARD = 100_000     # price cents: $1000-wide rank shards (~110 shards)


def _tie_rank2(values: DataFrame, shard_size: int) -> DataFrame:
    """Map of distinct value -> (cnt, r2 = 2*tie-averaged global rank).

    Two-pass sharded rank over the DISTINCT-value rollup: in-shard
    cumulative counts + a broadcast prefix-sum of shard totals. The
    orderBy window is per-shard, so no single-partition sort ever sees
    more than one shard's distinct values.
    """
    g = values.groupBy("v").agg(F.count("*").alias("cnt")).withColumn(
        "shard", F.expr(f"v div {shard_size}"))
    w_in = Window.partitionBy("shard").orderBy("v").rowsBetween(
        Window.unboundedPreceding, -1)
    local = g.withColumn("less_in", F.coalesce(F.sum("cnt").over(w_in), F.lit(0)))
    w_sh = Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)
    bases = (
        g.groupBy("shard").agg(F.sum("cnt").alias("c"))
        .withColumn("base", F.coalesce(F.sum("c").over(w_sh), F.lit(0)))
        .select("shard", "base")
    )
    return local.join(F.broadcast(bases), "shard").selectExpr(
        "v", "cnt", "2 * (base + less_in) + cnt + 1 AS r2")


def q_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    rows = load_table(spark, sf_dir, "lineitem").selectExpr(
        "CAST(round(l_quantity) AS BIGINT) AS xv",
        "CAST(round(l_extendedprice * 100) AS BIGINT) AS yv",
    )
    rx = _tie_rank2(rows.selectExpr("xv AS v"), _Q_SHARD).selectExpr(
        "v AS xv", "r2 AS r2x")
    ry = _tie_rank2(rows.selectExpr("yv AS v"), _P_SHARD).selectExpr(
        "v AS yv", "r2 AS r2y")
    joined = rows.join(F.broadcast(rx), "xv").join(ry, "yv")
    sums = joined.agg(
        F.count("*").alias("n"),
        F.sum(F.expr("CAST(r2x AS DECIMAL(38,0))")).cast("long").alias("sx"),
        F.sum(F.expr("CAST(r2y AS DECIMAL(38,0))")).cast("long").alias("sy"),
        F.sum(F.expr("CAST(r2x AS DECIMAL(38,0)) * r2x")).cast("long").alias("sxx"),
        F.sum(F.expr("CAST(r2y AS DECIMAL(38,0)) * r2y")).cast("long").alias("syy"),
        F.sum(F.expr("CAST(r2x AS DECIMAL(38,0)) * r2y")).cast("long").alias("sxy"),
    )
    return sums.selectExpr(
        "n",
        "CAST(floor((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
        " * 1000000.0 / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)"
        " * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))) AS BIGINT)"
        " AS rho_micro",
    )


Q_SPEARMAN_ORACLE = """
WITH rows_ AS (
  SELECT CAST(round(l_quantity) AS BIGINT) AS xv,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS yv
  FROM lineitem
), gx AS (
  SELECT xv AS v, COUNT(*) AS cnt FROM rows_ GROUP BY 1
), rx AS (
  SELECT v AS xv,
         2 * (SUM(cnt) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
              AND CURRENT ROW) - cnt) + cnt + 1 AS r2x
  FROM gx
), gy AS (
  SELECT yv AS v, COUNT(*) AS cnt FROM rows_ GROUP BY 1
), ry AS (
  SELECT v AS yv,
         2 * (SUM(cnt) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
              AND CURRENT ROW) - cnt) + cnt + 1 AS r2y
  FROM gy
), joined AS (
  SELECT r2x, r2y FROM rows_ JOIN rx USING (xv) JOIN ry USING (yv)
), sums AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(CAST(r2x AS HUGEINT)) AS BIGINT) AS sx,
         CAST(SUM(CAST(r2y AS HUGEINT)) AS BIGINT) AS sy,
         CAST(SUM(CAST(r2x AS HUGEINT) * r2x) AS BIGINT) AS sxx,
         CAST(SUM(CAST(r2y AS HUGEINT) * r2y) AS BIGINT) AS syy,
         CAST(SUM(CAST(r2x AS HUGEINT) * r2y) AS BIGINT) AS sxy
  FROM joined
)
SELECT n,
       CAST(floor((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
        * 1000000.0 / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
        * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))) AS BIGINT)
       AS rho_micro
FROM sums
"""


# --- Mann-Kendall trend test -------------------------------------------------
# Is daily order revenue trending? S = sum over day pairs (i<j) of
# sign(x_j - x_i); ties correction Var(S)*18 = n(n-1)(2n+5) - sum t(t-1)(2t+5).
# The |days|^2 pair join runs over the calendar-bounded daily aggregate
# (broadcast nested loop is allowlisted for exactly this reason), never
# over raw orders. z is the usual continuity-corrected normal score.

def q_mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load_table(spark, sf_dir, "orders")
        .selectExpr(
            f"unix_millis(o_orderdate) - pmod(unix_millis(o_orderdate), {DAY_MS})"
            " AS day_ms",
            "CAST(round(o_totalprice * 100) AS BIGINT) AS cents",
        )
        .groupBy("day_ms")
        .agg(F.sum(F.expr("CAST(cents AS DECIMAL(28,0))")).cast("long").alias("x"))
    )
    a = daily.selectExpr("day_ms AS da", "x AS xa")
    b = daily.selectExpr("day_ms AS db", "x AS xb")
    s_row = (
        b.join(F.broadcast(a), F.col("da") < F.col("db"))
        .agg(F.sum(F.expr(
            "CASE WHEN xb > xa THEN 1 WHEN xb < xa THEN -1 ELSE 0 END"
        )).alias("s"))
    )
    n_row = daily.agg(F.count("*").alias("n"))
    tie_row = (
        daily.groupBy("x").agg(F.count("*").alias("t"))
        .agg(F.sum(F.expr(
            "CAST(t AS DECIMAL(28,0)) * (t - 1) * (2 * t + 5)"
        )).cast("long").alias("tie18"))
    )
    return (
        s_row.crossJoin(F.broadcast(n_row)).crossJoin(F.broadcast(tie_row))
        .selectExpr(
            "n AS n_days",
            "s AS s_stat",
            "CAST(n AS BIGINT) * (n - 1) * (2 * n + 5) - tie18 AS var18",
            "CASE WHEN n * CAST(n - 1 AS BIGINT) * (2 * n + 5) - tie18 = 0 THEN 0"
            " ELSE CAST(floor((CASE WHEN s > 0 THEN s - 1 WHEN s < 0 THEN s + 1"
            " ELSE 0 END) * 1000.0 / sqrt((n * CAST(n - 1 AS BIGINT) * (2 * n + 5)"
            " - tie18) / 18.0)) AS BIGINT) END AS z_milli",
        )
    )


Q_MANN_KENDALL_ORACLE = f"""
WITH daily AS (
  SELECT epoch_ms(o_orderdate) - epoch_ms(o_orderdate) % {DAY_MS} AS day_ms,
         CAST(SUM(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS HUGEINT))
              AS BIGINT) AS x
  FROM orders GROUP BY 1
), s_row AS (
  SELECT CAST(SUM(CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1 ELSE 0 END)
              AS BIGINT) AS s
  FROM daily a JOIN daily b ON a.day_ms < b.day_ms
), n_row AS (
  SELECT COUNT(*) AS n FROM daily
), tie_row AS (
  SELECT CAST(SUM(CAST(t AS HUGEINT) * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie18
  FROM (SELECT COUNT(*) AS t FROM daily GROUP BY x)
)
SELECT n AS n_days,
       s AS s_stat,
       CAST(n AS BIGINT) * (n - 1) * (2 * n + 5) - tie18 AS var18,
       CASE WHEN n * CAST(n - 1 AS BIGINT) * (2 * n + 5) - tie18 = 0 THEN 0
       ELSE CAST(floor((CASE WHEN s > 0 THEN s - 1 WHEN s < 0 THEN s + 1
            ELSE 0 END) * 1000.0 / sqrt((n * CAST(n - 1 AS BIGINT) * (2 * n + 5)
            - tie18) / 18.0)) AS BIGINT) END AS z_milli
FROM s_row, n_row, tie_row
"""


# --- distribution drift: total variation distance ----------------------------
# Did the event-value distribution shift between the first and second half
# of the time range? TVD = 1/2 * sum_bands |p - q|, kept exact as
# sum |c1*n2 - c2*n1| over $5 value bands; only the final ratio divides
# (integer div, DECIMAL-widened so 100x the rows still can't overflow).

_BAND_CENTS = 500


def q_tvd_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").selectExpr(
        "unix_millis(ts) AS ts_ms",
        "CAST(round(value * 100) AS BIGINT) AS cents",
    )
    bounds = ev.agg(
        F.min("ts_ms").alias("mn"), F.max("ts_ms").alias("mx"))
    banded = ev.crossJoin(F.broadcast(bounds)).selectExpr(
        f"cents div {_BAND_CENTS} AS band",
        "CAST(ts_ms >= (mn + mx) div 2 AS INT) AS late",
    )
    g = banded.groupBy("band").agg(
        F.sum(F.expr("1 - late")).alias("c1"),
        F.sum("late").alias("c2"),
    )
    tot = g.agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2"))
    return (
        g.crossJoin(F.broadcast(tot))
        .agg(
            F.count("*").alias("n_bands"),
            F.max("n1").alias("n1"),
            F.max("n2").alias("n2"),
            F.sum(F.expr(
                "abs(CAST(c1 AS DECIMAL(38,0)) * n2 - CAST(c2 AS DECIMAL(38,0)) * n1)"
            )).alias("num"),
        )
        .selectExpr(
            "n_bands", "n1", "n2",
            "CAST(CAST(num AS DECIMAL(38,0)) * 1000000"
            " div (2 * CAST(n1 AS DECIMAL(38,0)) * n2) AS BIGINT) AS tvd_micro",
        )
    )


Q_TVD_ORACLE = f"""
WITH ev AS (
  SELECT epoch_ms(ts) AS ts_ms, CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
), bounds AS (
  SELECT MIN(ts_ms) AS mn, MAX(ts_ms) AS mx FROM ev
), banded AS (
  SELECT cents // {_BAND_CENTS} AS band,
         CAST(ts_ms >= (mn + mx) // 2 AS INT) AS late
  FROM ev CROSS JOIN bounds
), g AS (
  SELECT band, SUM(1 - late) AS c1, SUM(late) AS c2 FROM banded GROUP BY 1
), tot AS (
  SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2 FROM g
)
SELECT COUNT(*) AS n_bands, MAX(n1) AS n1, MAX(n2) AS n2,
       CAST(SUM(abs(CAST(c1 AS HUGEINT) * n2 - CAST(c2 AS HUGEINT) * n1))
            * 1000000 // (2 * CAST(MAX(n1) AS HUGEINT) * MAX(n2)) AS BIGINT)
       AS tvd_micro
FROM g CROSS JOIN tot
"""


# --- max drawdown over the daily revenue series ------------------------------
# Largest peak-to-trough drop of daily order revenue: running max minus
# current, argmax with earliest-day tie-break. Both windows run over the
# calendar-bounded daily aggregate (same justification as CUSUM).

def q_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load_table(spark, sf_dir, "orders")
        .selectExpr(
            f"unix_millis(o_orderdate) - pmod(unix_millis(o_orderdate), {DAY_MS})"
            " AS day_ms",
            "CAST(round(o_totalprice * 100) AS BIGINT) AS cents",
        )
        .groupBy("day_ms")
        .agg(F.sum(F.expr("CAST(cents AS DECIMAL(28,0))")).cast("long").alias("x"))
    )
    w = Window.orderBy("day_ms").rowsBetween(Window.unboundedPreceding, 0)
    dd = daily.withColumn("peak", F.max("x").over(w)).withColumn(
        "dd", F.col("peak") - F.col("x"))
    best = Window.orderBy(F.desc("dd"), "day_ms")
    return (
        dd.withColumn("rk", F.row_number().over(best))
        .where(F.col("rk") == 1)
        .selectExpr(
            "day_ms AS trough_day_ms",
            "peak AS peak_cents",
            "x AS trough_cents",
            "dd AS drawdown_cents",
        )
    )


Q_DRAWDOWN_ORACLE = f"""
WITH daily AS (
  SELECT epoch_ms(o_orderdate) - epoch_ms(o_orderdate) % {DAY_MS} AS day_ms,
         CAST(SUM(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS HUGEINT))
              AS BIGINT) AS x
  FROM orders GROUP BY 1
), dd AS (
  SELECT day_ms, x,
         MAX(x) OVER (ORDER BY day_ms ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) AS peak
  FROM daily
)
SELECT day_ms AS trough_day_ms, peak AS peak_cents, x AS trough_cents,
       peak - x AS drawdown_cents
FROM dd
ORDER BY peak - x DESC, day_ms
LIMIT 1
"""


# --- Gini-Simpson diversity of the corpus source mix -------------------------
# Per language: how concentrated is the source mix? Gini-Simpson
# 1 - sum p_i^2 and the "effective number of sources" n^2 / sum c_i^2,
# both exact integer ratios (the log-free diversity family — entropy
# needs ln, whose rounding is NOT portable across engines; 1/sum p^2 is).

def q_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = (
        load_table(spark, sf_dir, "documents")
        .groupBy("lang", "source").agg(F.count("*").alias("c"))
    )
    per_lang = g.groupBy("lang").agg(
        F.count("*").alias("n_sources"),
        F.sum("c").alias("n_docs"),
        F.sum(F.expr("CAST(c AS DECIMAL(38,0)) * c")).alias("ssq"),
    )
    return per_lang.selectExpr(
        "lang", "n_sources", "n_docs",
        "CAST((CAST(n_docs AS DECIMAL(38,0)) * n_docs - ssq) * 1000000"
        " div (CAST(n_docs AS DECIMAL(38,0)) * n_docs) AS BIGINT)"
        " AS gini_simpson_micro",
        "CAST(CAST(n_docs AS DECIMAL(38,0)) * n_docs * 1000 div ssq AS BIGINT)"
        " AS effective_sources_milli",
    )


Q_SIMPSON_ORACLE = """
WITH g AS (
  SELECT lang, source, COUNT(*) AS c FROM documents GROUP BY 1, 2
), per_lang AS (
  SELECT lang, COUNT(*) AS n_sources, CAST(SUM(c) AS BIGINT) AS n_docs,
         SUM(CAST(c AS HUGEINT) * c) AS ssq
  FROM g GROUP BY 1
)
SELECT lang, n_sources, n_docs,
       CAST((CAST(n_docs AS HUGEINT) * n_docs - ssq) * 1000000
            // (CAST(n_docs AS HUGEINT) * n_docs) AS BIGINT)
       AS gini_simpson_micro,
       CAST(CAST(n_docs AS HUGEINT) * n_docs * 1000 // ssq AS BIGINT)
       AS effective_sources_milli
FROM per_lang
"""


# --- churn-label construction ------------------------------------------------
# Leakage-safe supervised labels: features from the first 70% of the time
# range (observation window), label = "came back" in the last 30%
# (holdout). Population = users active in the observation window. Two
# keyed rollups on the same user_id shuffle key + one equi-join; the only
# nested loop is the broadcast of the 1-row time bounds.

def pipeline_churn_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").selectExpr(
        "user_id", "event_type", "unix_millis(ts) AS ts_ms")
    bounds = ev.agg(F.min("ts_ms").alias("mn"), F.max("ts_ms").alias("mx")) \
        .selectExpr("mn + (mx - mn) * 7 div 10 AS t_split")
    stamped = ev.crossJoin(F.broadcast(bounds))
    obs = (
        stamped.where("ts_ms < t_split")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events_obs"),
            F.expr(f"COUNT(DISTINCT ts_ms div {DAY_MS})").alias("active_days"),
            F.countDistinct("event_type").alias("n_types"),
            F.expr(f"CAST((MAX(t_split) - MAX(ts_ms)) div {DAY_MS} AS BIGINT)")
            .alias("recency_days"),
        )
    )
    fut = stamped.where("ts_ms >= t_split").select("user_id").distinct() \
        .withColumn("returned", F.lit(1))
    return (
        obs.join(fut, "user_id", "left")
        .selectExpr(
            "user_id", "n_events_obs", "active_days", "n_types",
            "recency_days", "CAST(coalesce(returned, 0) AS INT) AS label",
        )
    )


Q_CHURN_ORACLE = f"""
WITH ev AS (
  SELECT user_id, event_type, epoch_ms(ts) AS ts_ms FROM events
), bounds AS (
  SELECT MIN(ts_ms) + (MAX(ts_ms) - MIN(ts_ms)) * 7 // 10 AS t_split FROM ev
), stamped AS (
  SELECT * FROM ev CROSS JOIN bounds
), obs AS (
  SELECT user_id, COUNT(*) AS n_events_obs,
         COUNT(DISTINCT ts_ms // {DAY_MS}) AS active_days,
         COUNT(DISTINCT event_type) AS n_types,
         CAST((MAX(t_split) - MAX(ts_ms)) // {DAY_MS} AS BIGINT) AS recency_days
  FROM stamped WHERE ts_ms < t_split GROUP BY 1
), fut AS (
  SELECT DISTINCT user_id, 1 AS returned
  FROM stamped WHERE ts_ms >= t_split
)
SELECT obs.user_id, n_events_obs, active_days, n_types, recency_days,
       CAST(coalesce(returned, 0) AS INT) AS label
FROM obs LEFT JOIN fut ON obs.user_id = fut.user_id
"""


SPECS += [
    QuerySpec("q_spearman_corr", q_spearman_corr, Q_SPEARMAN_ORACLE,
              "tie-averaged Spearman rho via value-sharded distributed ranks",
              ("analytics", "stats", "rank")),
    QuerySpec("q_mann_kendall_trend", q_mann_kendall_trend, Q_MANN_KENDALL_ORACLE,
              "Mann-Kendall trend test over the daily revenue series",
              ("analytics", "stats")),
    QuerySpec("q_tvd_drift", q_tvd_drift, Q_TVD_ORACLE,
              "total-variation drift between first/second-half value bands",
              ("analytics", "stats", "drift")),
    QuerySpec("q_max_drawdown", q_max_drawdown, Q_DRAWDOWN_ORACLE,
              "max peak-to-trough drawdown of daily revenue",
              ("analytics", "timeseries")),
    QuerySpec("q_simpson_diversity", q_simpson_diversity, Q_SIMPSON_ORACLE,
              "log-free Gini-Simpson diversity of the per-lang source mix",
              ("analytics", "text", "stats")),
    QuerySpec("pipeline_churn_labels", pipeline_churn_labels, Q_CHURN_ORACLE,
              "leakage-safe churn-label construction (70/30 time split)",
              ("pipeline", "trainprep")),
]
