"""Deeper TPC-H shapes + analytic window functions.

Extends the relational corpus (operators/relational.py) with the remaining
TPC-H query shapes expressible directly over the driver's simplified star
schema (Q8 is in operators/relational.py — no partsupp needed); the
partsupp-dependent Q2/Q9/Q11/Q16/Q20 live in operators/partsupp.py over a
deterministic DERIVED supplier-part catalog (hash-assigned supplier×part pairs with
synthesized supplycost/availqty — driver-oracle-checked since r7). Also
here: the analytic-function surface (ntile, percent_rank, cume_dist,
first_value) the reference hand-builds with ValueState (SURVEY.md §2.5
note, §2.8).

Scale notes mirror relational.py: dims broadcast explicitly, fact-fact
joins shuffle on their join key once, every aggregate is partial
(map-side) first, and double outputs come from exact DECIMAL arithmetic so
a 32-partition Spark sum and a single-thread DuckDB sum agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..registry import QuerySpec
from ..functions.localdf import local_literal_df
from ..sources.tables import load_table


def _dec(col: str, prec: int = 18, scale: int = 2):
    return F.col(col).cast(f"decimal({prec},{scale})")


_REV = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))"


def _revenue():
    return _dec("l_extendedprice") * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))


# --- Q7: volume shipping between nation pairs ------------------------------
# Reference analog: keyed windowed reduce over a join (SURVEY.md §2.4 A4 +
# §2.6 J1 generalized). Two broadcast dim joins (supplier, customer are
# small), one fact-fact join lineitem⋈orders on orderkey.

def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01")) & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    sn = s.join(F.broadcast(n1), s.s_nationkey == n1.s_nk).select("s_suppkey", "supp_nation")
    cn = c.join(F.broadcast(n2), c.c_nationkey == n2.c_nk).select("c_custkey", "cust_nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(sn), l.l_suppkey == sn.s_suppkey)
        .join(F.broadcast(cn), o.o_custkey == cn.c_custkey)
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
    )


TPCH_Q7_ORACLE = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l_shipdate) AS l_year,
       CAST(SUM({_REV}) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND n1.n_name <> n2.n_name
GROUP BY supp_nation, cust_nation, l_year
"""


# --- Q10: returned-item revenue per customer (top 20) ----------------------

def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01")) & (F.col("o_orderdate") < F.lit("1996-07-01"))
    )
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


TPCH_Q10_ORACLE = f"""
SELECT c_custkey, c_name, c_acctbal, n_name,
       CAST(SUM({_REV}) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# --- Q13: customer order-count distribution --------------------------------
# Two-level aggregation over a left-outer join: the classic "distribution"
# shape. First groupBy shuffles on c_custkey (same key as the join → AQE
# reuses the exchange), second groupBy is tiny.

def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


TPCH_Q13_ORACLE = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT OUTER JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
"""


# --- Q15: top supplier(s) by revenue ---------------------------------------
# Aggregate → global max → equality filter. The max is computed over the
# aggregated (100-row at sf1, ~1M-row at sf10k) table, joined back via a
# broadcast of a single-row max — no second shuffle of the fact table.
# Revenue equality is compared on the exact DECIMAL, not the double.

def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01")) & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    s = load_table(spark, sf_dir, "supplier")
    rev = l.groupBy("l_suppkey").agg(F.sum(_revenue()).alias("total_revenue_dec"))
    mx = rev.agg(F.max("total_revenue_dec").alias("mx"))
    return (
        rev.join(F.broadcast(mx), rev.total_revenue_dec == mx.mx)
        .join(F.broadcast(s), rev.l_suppkey == s.s_suppkey)
        .select(
            "s_suppkey", "s_name",
            F.col("total_revenue_dec").cast("double").alias("total_revenue"),
        )
    )


TPCH_Q15_ORACLE = f"""
WITH rev AS (
  SELECT l_suppkey, SUM({_REV}) AS total_revenue_dec
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(total_revenue_dec AS DOUBLE) AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue_dec = (SELECT MAX(total_revenue_dec) FROM rev)
"""


# --- Q17: small-quantity revenue vs per-part average -----------------------
# Correlated per-part average decorrelated into a self-aggregate + join.
# The quantity < 0.2*avg comparison is cross-multiplied into exact integer
# arithmetic (qty*cnt*5 < sum) so no float boundary ambiguity exists.
# At scale: one shuffle of lineitem by partkey for the aggregate; the
# (part-sized) aggregate then broadcasts back against lineitem.

def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#3")
    l = load_table(spark, sf_dir, "lineitem")
    lp = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    stats = lp.groupBy(F.col("l_partkey").alias("agg_partkey")).agg(
        F.sum(_dec("l_quantity")).alias("qty_sum"),
        F.count("*").alias("qty_cnt"),
    )
    small = lp.join(F.broadcast(stats), lp.l_partkey == stats.agg_partkey).where(
        _dec("l_quantity") * F.col("qty_cnt") * F.lit(5) < F.col("qty_sum")
    )
    return small.agg(
        F.sum(_dec("l_extendedprice")).cast("double").alias("small_qty_revenue"),
        F.count("*").alias("small_qty_lines"),
    )


TPCH_Q17_ORACLE = """
WITH lp AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#3'
), stats AS (
  SELECT l_partkey AS agg_partkey,
         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty_sum,
         COUNT(*) AS qty_cnt
  FROM lp GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS small_qty_revenue,
       COUNT(*) AS small_qty_lines
FROM lp JOIN stats ON l_partkey = agg_partkey
WHERE CAST(l_quantity AS DECIMAL(18,2)) * qty_cnt * 5 < qty_sum
"""


# --- Q22-style: wealthy customers with no urgent orders --------------------
# Scalar subquery (global average over positive balances) + anti join.
# The above-average comparison cross-multiplies through DECIMAL exactly as
# q_above_nation_avg does (relational.py). The anti side filters to urgent
# orders (every customer has *some* order in the driver data — an
# unconditional NOT EXISTS would be vacuously empty).

def q22_idle_wealthy(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    pos = c.where(F.col("c_acctbal") > 0).agg(
        F.sum(_dec("c_acctbal")).alias("bal_sum"), F.count("*").alias("bal_cnt")
    )
    rich = c.join(F.broadcast(pos)).where(
        _dec("c_acctbal") * F.col("bal_cnt") > F.col("bal_sum")
    )
    idle = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return idle.groupBy("c_nationkey").agg(
        F.count("*").alias("numcust"),
        F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
    )


Q22_ORACLE = """
SELECT c_nationkey, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer c
WHERE CAST(c_acctbal AS DECIMAL(18,2))
      * (SELECT COUNT(*) FROM customer WHERE c_acctbal > 0)
      > (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c.c_custkey AND o_orderpriority = '1-URGENT')
GROUP BY c_nationkey
"""


# --- Analytic window functions: ntile / percent_rank / cume_dist / first ---
# The reference hand-builds per-key ordered-history logic with ValueState
# (SURVEY.md §2.8); these are the declarative analytics that subsume it in
# batch. One shuffle on the partition key; ordering ties broken by custkey
# so every function is deterministic.

def q_balance_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.ntile(4).over(w).alias("bal_quartile"),
        F.percent_rank().over(w).alias("bal_pct_rank"),
        F.cume_dist().over(w).alias("bal_cume_dist"),
        F.first("c_custkey").over(w).alias("poorest_custkey"),
    )


Q_QUARTILES_ORACLE = """
SELECT c_custkey, c_nationkey,
       ntile(4)       OVER w AS bal_quartile,
       percent_rank() OVER w AS bal_pct_rank,
       cume_dist()    OVER w AS bal_cume_dist,
       first_value(c_custkey) OVER w AS poorest_custkey
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
"""


# --- GROUPING SETS: arbitrary (non-hierarchical) grouping combinations -----
# rollup/cube (relational.py) are the hierarchical/full-lattice cases; this
# pins arbitrary set lists — still one shuffle, Spark expands the sets with
# a grouping-id column instead of rescanning per level.

def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_linestatus"], []],
            "l_returnflag", "l_linestatus",
        )
        .agg(
            F.sum(_dec("l_extendedprice")).cast("double").alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


Q_GROUPING_SETS_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
"""


# --- RANGE window frame: time-based moving sum per user --------------------
# user_moving_avg (temporal.py) pins ROWS frames; this pins RANGE frames,
# where the frame is defined by the ORDER BY *value* (trailing 1 h of event
# time) — ties all enter the frame together, so no ordering ambiguity, and
# the sum is DECIMAL-exact.

def q_range_moving_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_millis("ts"))
        .rangeBetween(-3_600_000, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.unix_millis("ts").alias("ts_ms"),
        F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double")
        .alias("trailing_1h_value"),
    )


Q_RANGE_MOVING_SUM_ORACLE = """
SELECT event_id, user_id, epoch_ms(ts) AS ts_ms,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
           PARTITION BY user_id ORDER BY epoch_ms(ts)
           RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS trailing_1h_value
FROM events
"""


# --- time-hierarchy rollup (hypertable continuous-aggregate shape) ---------
# Hour, day, and all-time aggregates per event_type from ONE scan and ONE
# Expand+shuffle (grouping sets over derived time buckets) — the
# continuous-aggregate maintenance query a time-series store runs. NULL
# grouping level is disambiguated by an explicit grain column (grouping()
# bitmask), since hour=NULL is also a legitimate value domain at coarser
# grains.

def q_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").selectExpr(
        "event_type",
        "CAST(floor(unix_millis(ts) / 3600000) AS BIGINT) * 3600000 AS hour_ms",
        "CAST(floor(unix_millis(ts) / 86400000) AS BIGINT) * 86400000 AS day_ms",
        "CAST(value AS DECIMAL(18,6)) AS v",
    )
    return (
        e.groupingSets(
            [["event_type", "day_ms", "hour_ms"], ["event_type", "day_ms"],
             ["event_type"]],
            "event_type", "day_ms", "hour_ms",
        )
        .agg(
            F.expr("CAST(grouping(day_ms) * 2 + grouping(hour_ms) AS INT)").alias(
                "grain"
            ),
            F.count("*").alias("cnt"),
            F.sum("v").cast("double").alias("total"),
        )
        .select("event_type", "day_ms", "hour_ms", "grain", "cnt", "total")
    )


Q_TIME_ROLLUP_ORACLE = """
SELECT event_type, day_ms, hour_ms,
       CAST(GROUPING(day_ms) * 2 + GROUPING(hour_ms) AS INT) AS grain,
       COUNT(*) AS cnt,
       CAST(SUM(v) AS DOUBLE) AS total
FROM (
  SELECT event_type,
         CAST(floor(epoch_ms(ts) / 3600000) AS BIGINT) * 3600000 AS hour_ms,
         CAST(floor(epoch_ms(ts) / 86400000) AS BIGINT) * 86400000 AS day_ms,
         CAST(value AS DECIMAL(18,6)) AS v
  FROM events
)
GROUP BY GROUPING SETS ((event_type, day_ms, hour_ms), (event_type, day_ms),
                        (event_type))
"""


SPECS = [
    QuerySpec("q_time_rollup", q_time_rollup, Q_TIME_ROLLUP_ORACLE,
              "hour/day/all-time continuous-aggregate rollup, one Expand pass",
              ("analytics", "rollup", "timeseries")),
    QuerySpec("tpch_q7_nation_volume", tpch_q7, TPCH_Q7_ORACLE,
              "nation-pair shipping volume by year; 2 broadcast dims + fact-fact join",
              ("relational", "join")),
    QuerySpec("tpch_q10_returned_items", tpch_q10, TPCH_Q10_ORACLE,
              "returned-item revenue per customer, top 20", ("relational", "join")),
    QuerySpec("tpch_q13_order_distribution", tpch_q13, TPCH_Q13_ORACLE,
              "order-count distribution via outer join + double aggregation",
              ("relational", "join")),
    QuerySpec("tpch_q15_top_supplier", tpch_q15, TPCH_Q15_ORACLE,
              "argmax via broadcast single-row max, decimal-exact equality",
              ("relational", "join")),
    QuerySpec("tpch_q17_small_qty_revenue", tpch_q17, TPCH_Q17_ORACLE,
              "correlated per-part avg decorrelated, cross-multiplied compare",
              ("relational", "join")),
    QuerySpec("q22_idle_wealthy_customers", q22_idle_wealthy, Q22_ORACLE,
              "scalar-subquery threshold + anti join per nation", ("relational", "join")),
    QuerySpec("q_balance_quartiles", q_balance_quartiles, Q_QUARTILES_ORACLE,
              "ntile/percent_rank/cume_dist/first_value analytics", ("relational", "window")),
    QuerySpec("q_grouping_sets", q_grouping_sets, Q_GROUPING_SETS_ORACLE,
              "arbitrary GROUPING SETS, single-shuffle expansion", ("relational",)),
    QuerySpec("q_range_moving_sum", q_range_moving_sum, Q_RANGE_MOVING_SUM_ORACLE,
              "RANGE window frame: trailing 1 h moving sum per user",
              ("relational", "window")),
]


# --- time-series gap filling ------------------------------------------------
# Dense monthly series per priority: calendar months come from a
# sequence() explode (no generator UDF, no driver loop), orders left-join
# onto it, missing months zero-filled. The month spine is derived from the
# data's own min/max — two tiny aggregates broadcast by AQE.

def q_monthly_order_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        F.date_trunc("MONTH", "o_orderdate").alias("month"), "o_orderpriority"
    )
    bounds = o.agg(
        F.min("month").alias("lo"), F.max("month").alias("hi")
    )
    spine = bounds.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 month)")).alias("month")
    ).crossJoin(o.select("o_orderpriority").distinct())
    counts = o.groupBy("month", "o_orderpriority").agg(F.count("*").alias("cnt"))
    return (
        spine.join(counts, ["month", "o_orderpriority"], "left")
        .select(
            F.unix_millis("month").alias("month_ms"),
            "o_orderpriority",
            F.coalesce("cnt", F.lit(0)).alias("n_orders"),
        )
    )


Q_MONTHLY_SERIES_ORACLE = """
WITH o AS (
  SELECT date_trunc('month', o_orderdate) AS month, o_orderpriority FROM orders
), bounds AS (
  SELECT min(month) AS lo, max(month) AS hi FROM o
), spine AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS month, p.o_orderpriority
  FROM bounds CROSS JOIN (SELECT DISTINCT o_orderpriority FROM o) p
), counts AS (
  SELECT month, o_orderpriority, COUNT(*) AS cnt FROM o GROUP BY 1, 2
)
SELECT epoch_ms(s.month) AS month_ms, s.o_orderpriority,
       COALESCE(c.cnt, 0) AS n_orders
FROM spine s LEFT JOIN counts c
  ON s.month = c.month AND s.o_orderpriority = c.o_orderpriority
"""


# --- argmax per group -------------------------------------------------------
# Per-group argmax — the aggregate form of q_top_order_per_customer's
# row_number ranking, with no window sort. o_totalprice HAS exact ties at
# sf0.1 (90 same-status pairs), so ties are broken explicitly: among the
# extreme-price rows, the largest orderkey wins — a rule both engines can
# state identically (a bare max_by/arg_max tie is engine-nondeterministic,
# and DuckDB's arg_max cannot take a composite ordering value).

def q_priciest_order_per_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    stats = o.groupBy("o_orderstatus").agg(
        F.max("o_totalprice").alias("max_price"),
        F.min("o_totalprice").alias("min_price"),
    )
    return (
        o.join(F.broadcast(stats), "o_orderstatus")
        .groupBy("o_orderstatus", "max_price", "min_price")
        .agg(
            F.max(F.when(F.col("o_totalprice") == F.col("max_price"), F.col("o_orderkey")))
            .alias("max_orderkey"),
            F.max(F.when(F.col("o_totalprice") == F.col("min_price"), F.col("o_orderkey")))
            .alias("min_orderkey"),
        )
        .select("o_orderstatus", "max_orderkey", "min_orderkey", "max_price", "min_price")
    )


Q_ARGMAX_ORACLE = """
WITH stats AS (
  SELECT o_orderstatus, MAX(o_totalprice) AS max_price, MIN(o_totalprice) AS min_price
  FROM orders GROUP BY o_orderstatus
)
SELECT o.o_orderstatus,
       MAX(CASE WHEN o_totalprice = max_price THEN o_orderkey END) AS max_orderkey,
       MAX(CASE WHEN o_totalprice = min_price THEN o_orderkey END) AS min_orderkey,
       max_price, min_price
FROM orders o JOIN stats s ON o.o_orderstatus = s.o_orderstatus
GROUP BY o.o_orderstatus, max_price, min_price
"""


SPECS += [
    QuerySpec("q_monthly_order_series", q_monthly_order_series, Q_MONTHLY_SERIES_ORACLE,
              "zero-filled calendar series via sequence explode", ("relational",)),
    QuerySpec("q_priciest_order_per_status", q_priciest_order_per_status, Q_ARGMAX_ORACLE,
              "max_by/min_by single-pass argmax aggregates", ("relational",)),
]


# --- portable second-moment statistics ---------------------------------------
# Sample variance / correlation / regression slope per group WITHOUT
# engine-native var_samp/corr (whose float accumulation is partition-order
# dependent): all moments are computed as EXACT integer sums over
# hundredth-scaled values (Spark DECIMAL(38,0), DuckDB HUGEINT — both
# exact int128-class arithmetic), then combined with the textbook
# n·Σxy − Σx·Σy identities and ONE final cast-to-double + round(6).
# Distributed sums of integers are order-independent, so a 1000-executor
# partial-agg plan agrees bit-for-bit with a single thread. Magnitudes:
# cents² ≤ 1e14, ×1e12 rows × n ≈ 1e38 — inside 38-digit headroom even at
# 100 TB group sizes.

def q_portable_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Hot path stays in LONG codegen: x ≤ 50 and y ≤ 5e7 cents, so every
    # per-row product fits a 64-bit long. Accumulators are sized to their
    # true 100 TB headroom instead of a blanket DECIMAL(38,0):
    #   Σx, Σx²      → BIGINT   (≤ 2.5e15 at 1e12 rows/group)
    #   Σy           → DECIMAL(28,0) via per-row (18,0)  (≤ 5e19)
    #   Σy², Σxy     → DECIMAL(38,0) via per-row (28,0)  (≤ 2.5e27)
    # ~35% faster than all-Decimal128 per-row multiplies, bit-identical.
    li = load_table(spark, sf_dir, "lineitem").selectExpr(
        "l_returnflag",
        "CAST(l_quantity AS BIGINT) AS x",
        "CAST(round(l_extendedprice * 100) AS BIGINT) AS y",
    )
    m = li.groupBy("l_returnflag").agg(
        F.count("*").cast("decimal(38,0)").alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.expr("CAST(y AS DECIMAL(18,0))")).alias("sy"),
        F.sum(F.expr("x * x")).alias("sxx"),
        F.sum(F.expr("CAST(y * y AS DECIMAL(28,0))")).alias("syy"),
        F.sum(F.expr("CAST(x * y AS DECIMAL(28,0))")).alias("sxy"),
    )
    # Final combination runs on ~|groups| rows — widen everything to
    # DECIMAL(38,0) there, where sx² etc. would overflow a long at scale.
    m = m.selectExpr(
        "l_returnflag", "n",
        "CAST(sx AS DECIMAL(38,0)) AS sx", "CAST(sy AS DECIMAL(38,0)) AS sy",
        "CAST(sxx AS DECIMAL(38,0)) AS sxx", "CAST(syy AS DECIMAL(38,0)) AS syy",
        "CAST(sxy AS DECIMAL(38,0)) AS sxy",
    )
    return m.selectExpr(
        "l_returnflag",
        "CAST(n AS BIGINT) AS n_items",
        "round(CAST(n * sxx - sx * sx AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE), 6) AS var_qty",
        "round(CAST(n * syy - sy * sy AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE) / 10000.0, 6) AS var_price",
        "round(CAST(n * sxy - sx * sy AS DOUBLE)"
        " / sqrt(CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS corr_qty_price",
        "round(CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE) / 100.0, 6) AS slope_price_per_qty",
    )


Q_PORTABLE_STATS_ORACLE = """
WITH m AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS HUGEINT) AS n,
         SUM(CAST(l_quantity AS HUGEINT)) AS sx,
         SUM(CAST(round(l_extendedprice * 100) AS HUGEINT)) AS sy,
         SUM(CAST(l_quantity AS HUGEINT) * CAST(l_quantity AS HUGEINT)) AS sxx,
         SUM(CAST(round(l_extendedprice * 100) AS HUGEINT) * CAST(round(l_extendedprice * 100) AS HUGEINT)) AS syy,
         SUM(CAST(l_quantity AS HUGEINT) * CAST(round(l_extendedprice * 100) AS HUGEINT)) AS sxy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag,
       CAST(n AS BIGINT) AS n_items,
       round(CAST(n * sxx - sx * sx AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE), 6) AS var_qty,
       round(CAST(n * syy - sy * sy AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE) / 10000.0, 6) AS var_price,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / sqrt(CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS corr_qty_price,
       round(CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE) / 100.0, 6) AS slope_price_per_qty
FROM m
"""


# --- fixed-width histogram ---------------------------------------------------
# Value-distribution histogram over events.value (width-50 buckets):
# bucket id from ONE IEEE division+floor (bit-identical across engines —
# no accumulation), then a plain codegen'd count/min/max groupBy. The
# canonical "describe a 100 TB column" primitive: single scan, partial
# aggs, ~10 output rows.

HIST_WIDTH = 50


def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.selectExpr(f"CAST(floor(value / {HIST_WIDTH}) AS BIGINT) AS bucket", "value")
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
        .selectExpr(f"CAST(bucket * {HIST_WIDTH} AS DOUBLE) AS bucket_lo", "n", "lo", "hi")
    )


Q_VALUE_HISTOGRAM_ORACLE = f"""
SELECT CAST(bucket * {HIST_WIDTH} AS DOUBLE) AS bucket_lo, COUNT(*) AS n,
       MIN(value) AS lo, MAX(value) AS hi
FROM (SELECT CAST(floor(value / {HIST_WIDTH}) AS BIGINT) AS bucket, value FROM events)
GROUP BY bucket
"""


SPECS += [
    QuerySpec("q_portable_stats", q_portable_stats, Q_PORTABLE_STATS_ORACLE,
              "exact-integer-moment variance/corr/slope, order-independent",
              ("analytics", "stats")),
    QuerySpec("q_value_histogram", q_value_histogram, Q_VALUE_HISTOGRAM_ORACLE,
              "fixed-width histogram with per-bucket min/max",
              ("analytics", "stats")),
]


# --- rolling distinct users (WAU) --------------------------------------------
# 7-day rolling COUNT DISTINCT per day — the rolling-MAU/WAU shape. COUNT
# DISTINCT isn't a window function over RANGE frames in either engine, so
# the portable (and scale-right) plan is: reduce the log to distinct
# (day, user) pairs FIRST (one shuffle, massive reduction at 100 TB),
# broadcast the tiny day spine, range-join pairs onto it, then count
# distinct per anchor day. The fact table is scanned once.

WAU_WINDOW_DAYS = 7


def q_rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").selectExpr(
        "CAST(floor(unix_millis(ts) / 86400000) AS BIGINT) AS day", "user_id"
    )
    daily = ev.distinct()
    days = daily.select("day").distinct()
    anchors = days.selectExpr("day AS anchor_day")
    rolled = daily.join(
        F.broadcast(anchors),
        (F.col("day") <= F.col("anchor_day"))
        & (F.col("day") > F.col("anchor_day") - WAU_WINDOW_DAYS),
    )
    wau = rolled.groupBy("anchor_day").agg(
        F.countDistinct("user_id").alias("wau")
    )
    dau = daily.groupBy("day").agg(F.count("*").alias("dau"))
    return (
        wau.join(dau, wau.anchor_day == dau.day)
        .selectExpr("anchor_day * 86400000 AS day_ms", "dau", "wau")
    )


Q_ROLLING_WAU_ORACLE = f"""
WITH daily AS (
  SELECT DISTINCT CAST(floor(epoch_ms(ts) / 86400000) AS BIGINT) AS day, user_id
  FROM events
), anchors AS (SELECT DISTINCT day AS anchor_day FROM daily),
wau AS (
  SELECT anchor_day, COUNT(DISTINCT user_id) AS wau
  FROM daily JOIN anchors
    ON day <= anchor_day AND day > anchor_day - {WAU_WINDOW_DAYS}
  GROUP BY anchor_day
),
dau AS (SELECT day, COUNT(*) AS dau FROM daily GROUP BY day)
SELECT anchor_day * 86400000 AS day_ms, dau, wau
FROM wau JOIN dau ON anchor_day = day
"""


# --- top-N per group ---------------------------------------------------------
# Top 3 orders per priority by price — the generic "top-N per key" (vs the
# single-row argmax of q_priciest_order_per_status). row_number over ONE
# shuffle on the group key with an explicit (price DESC, key) tie-break;
# at scale Spark's WindowGroupLimit pushes the rank filter into the sort,
# so no partition materializes more than N + heap.

TOPN_PER_GROUP = 3


def q_top3_orders_per_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.select(
            "o_orderpriority",
            "o_orderkey",
            F.col("o_totalprice").cast("double").alias("price"),
            F.row_number().over(w).alias("rank"),
        )
        .where(F.col("rank") <= TOPN_PER_GROUP)
    )


Q_TOP3_ORACLE = f"""
SELECT o_orderpriority, o_orderkey, CAST(o_totalprice AS DOUBLE) AS price, rank
FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey) AS rank
  FROM orders
)
WHERE rank <= {TOPN_PER_GROUP}
"""


SPECS += [
    QuerySpec("q_rolling_wau", q_rolling_wau, Q_ROLLING_WAU_ORACLE,
              "7-day rolling distinct users: distinct-first + broadcast day spine",
              ("analytics", "timeseries")),
    QuerySpec("q_top3_orders_per_priority", q_top3_orders_per_priority,
              Q_TOP3_ORACLE,
              "top-N per group via rank-limited window", ("analytics", "window")),
]


# --- 3-step ordered pattern (CEP funnel) -------------------------------------
# The batch analog of Flink CEP's `A followedBy B followedBy C`: per user,
# the earliest view, the earliest click STRICTLY AFTER that view, and the
# earliest purchase strictly after that click. Two conditional-min
# cascades — each step is a broadcast of the previous step's (user, ts)
# frontier back onto the events scan (the frontier is ≤1 row/user, tiny
# vs the log; at cluster scale it stays a shuffle-free broadcast until
# the user count itself is huge, at which point AQE picks a shuffled
# join on the same plan). Epoch-ms integers throughout.

def q_funnel_3step(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").selectExpr(
        "user_id", "event_type", "unix_millis(ts) AS ts_ms"
    )
    s1 = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts_ms").alias("t1"))
    )
    s2 = (
        ev.where(F.col("event_type") == "click")
        .join(F.broadcast(s1), "user_id")
        .where(F.col("ts_ms") > F.col("t1"))
        .groupBy("user_id", "t1")
        .agg(F.min("ts_ms").alias("t2"))
    )
    s3 = (
        ev.where(F.col("event_type") == "purchase")
        .join(F.broadcast(s2), "user_id")
        .where(F.col("ts_ms") > F.col("t2"))
        .groupBy("user_id", "t1", "t2")
        .agg(F.min("ts_ms").alias("t3"))
    )
    return s3.selectExpr(
        "user_id", "t1 AS view_ms", "t2 AS click_ms", "t3 AS purchase_ms",
        "t3 - t1 AS total_lag_ms"
    )


Q_FUNNEL_3STEP_ORACLE = """
WITH ev AS (
  SELECT user_id, event_type, epoch_ms(ts) AS ts_ms FROM events
), s1 AS (
  SELECT user_id, MIN(ts_ms) AS t1 FROM ev WHERE event_type = 'view' GROUP BY user_id
), s2 AS (
  SELECT e.user_id, s1.t1, MIN(e.ts_ms) AS t2
  FROM ev e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'click' AND e.ts_ms > s1.t1
  GROUP BY e.user_id, s1.t1
), s3 AS (
  SELECT e.user_id, s2.t1, s2.t2, MIN(e.ts_ms) AS t3
  FROM ev e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'purchase' AND e.ts_ms > s2.t2
  GROUP BY e.user_id, s2.t1, s2.t2
)
SELECT user_id, t1 AS view_ms, t2 AS click_ms, t3 AS purchase_ms,
       t3 - t1 AS total_lag_ms
FROM s3
"""


SPECS += [
    QuerySpec("q_funnel_3step", q_funnel_3step, Q_FUNNEL_3STEP_ORACLE,
              "CEP-style strictly-ordered 3-step pattern via conditional-min cascade",
              ("analytics", "cep")),
]


# --- event-type co-occurrence matrix ----------------------------------------
# The recommender / feature-engineering "users who did A also did B"
# co-occurrence count. Shape chosen for scale: collect_set per user
# (ONE shuffle, map-side partial set-merge) then a map-side generator
# expression enumerating the sorted within-user pairs — NOT the naive
# distinct + self-join, which shuffles the distinct table twice more and
# explodes skewed users inside the join. With a k-type vocabulary the
# per-user fan-out is capped at k(k-1)/2; the final pair rollup is tiny.


def q_event_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every unordered pair of event types (a < b): how many users
    performed both."""
    ev = load_table(spark, sf_dir, "events")
    sets = ev.groupBy("user_id").agg(
        F.sort_array(F.collect_set("event_type")).alias("types")
    )
    pairs = sets.select(
        F.explode(
            F.expr(
                "flatten(transform(types, (x, i) -> "
                "transform(slice(types, i + 2, size(types)), "
                "y -> struct(x AS type_a, y AS type_b))))"
            )
        ).alias("p")
    ).select("p.type_a", "p.type_b")
    return pairs.groupBy("type_a", "type_b").agg(F.count("*").alias("n_users"))


Q_COOCCURRENCE_ORACLE = """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events)
SELECT a.event_type AS type_a, b.event_type AS type_b, COUNT(*) AS n_users
FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type
GROUP BY 1, 2
"""


SPECS += [
    QuerySpec("q_event_cooccurrence", q_event_cooccurrence, Q_COOCCURRENCE_ORACLE,
              "users-who-did-A-also-did-B pair counts via per-user set + generator",
              ("analytics", "cooccurrence")),
]


# --- Markov transition matrix over the event stream -------------------------
# Ordered clickstream bigrams: for each (from_type, to_type), how many
# times a user's event of type A was immediately followed by type B.
# The sequence dependency is ONE lead() over ONE exchange on user_id
# (the window sort rides the shuffle); the pair rollup that follows is a
# k^2-row aggregate. n_from_total (the row-normalizer for transition
# probabilities) is a window over the k^2-row result — driver-scale,
# deliberately not a second pass over events.


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition counts per (from, to) pair, with the
    per-from totals needed to normalize into transition probabilities."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    base = ev.select(
        "user_id", F.unix_millis("ts").alias("ts_ms"), "event_id", "event_type"
    )
    counts = (
        base.withColumn("next_type", F.lead("event_type").over(w))
        .where(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count("*").alias("n_trans"))
    )
    wf = Window.partitionBy("from_type")
    return counts.select(
        "from_type", "to_type", "n_trans",
        F.sum("n_trans").over(wf).alias("n_from_total"),
    )


Q_TRANSITIONS_ORACLE = """
WITH base AS (
  SELECT user_id, epoch_ms(ts) AS ts_ms, event_id, event_type FROM events
), t AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) AS to_type
  FROM base
), c AS (
  SELECT from_type, to_type, COUNT(*) AS n_trans
  FROM t WHERE to_type IS NOT NULL GROUP BY 1, 2
)
SELECT from_type, to_type, n_trans,
       CAST(SUM(n_trans) OVER (PARTITION BY from_type) AS BIGINT) AS n_from_total
FROM c
"""


# --- Gini concentration via distributed rank --------------------------------
# Revenue-concentration Gini over order totals: G = 2·Σ(rank·x)/(n·Σx)
# − (n+1)/n. The rank-weighted sum needs every row's GLOBAL ascending
# rank — the anti-pattern is row_number() over an unpartitioned window
# (all 100 TB through one task). Instead: deterministic fixed-width VALUE
# shards (floor(cents / width)) are totally ordered, so global rank =
# in-shard row_number + Σ(earlier shard sizes). The shard bases are a
# driver-scale cumsum broadcast back — same two-pass sharded prefix-sum
# machinery as pipeline_pack_sequences. Σ(rank·x) is tie-ORDER-invariant
# (equal x contribute x·Σranks either way), so any tie-break gives the
# same Gini; products accumulate in DECIMAL because rank·cents overflows
# a long beyond ~1e11 rows.


GINI_SHARD_CENTS = 5_000_000


def q_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-row Gini coefficient of order revenue (0 = equal,
    1 = concentrated), with exact n and total in integer cents."""
    o = load_table(spark, sf_dir, "orders").selectExpr(
        "o_orderkey", "CAST(round(o_totalprice * 100) AS BIGINT) AS cents"
    )
    sharded = o.selectExpr(
        "o_orderkey", "cents",
        f"CAST(floor(cents / {GINI_SHARD_CENTS}) AS BIGINT) AS shard",
    )
    in_shard = Window.partitionBy("shard").orderBy("cents", "o_orderkey")
    local = sharded.withColumn("local_rank", F.row_number().over(in_shard))
    shard_w = Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)
    bases = (
        sharded.groupBy("shard").agg(F.count("*").alias("n"))
        .withColumn("base", F.coalesce(F.sum("n").over(shard_w), F.lit(0)))
        .select("shard", "base")
    )
    ranked = local.join(F.broadcast(bases), "shard").selectExpr(
        "cents", "base + local_rank AS rnk"
    )
    return ranked.agg(
        F.count("*").alias("n"),
        F.sum(F.expr("CAST(cents AS DECIMAL(18,0))")).alias("t"),
        F.sum(F.expr("CAST(rnk AS DECIMAL(18,0)) * cents")).alias("s"),
    ).selectExpr(
        "CAST(n AS BIGINT) AS n_orders",
        "CAST(t AS BIGINT) AS total_cents",
        "round(CAST(2 * s AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(t AS DOUBLE))"
        " - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE), 6) AS gini",
    )


Q_GINI_ORACLE = """
WITH r AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         row_number() OVER (ORDER BY CAST(round(o_totalprice * 100) AS BIGINT),
                            o_orderkey) AS rnk
  FROM orders
)
SELECT COUNT(*) AS n_orders,
       CAST(SUM(CAST(cents AS HUGEINT)) AS BIGINT) AS total_cents,
       round(CAST(2 * SUM(CAST(rnk AS HUGEINT) * cents) AS DOUBLE)
             / (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(CAST(cents AS HUGEINT)) AS DOUBLE))
             - (CAST(COUNT(*) AS DOUBLE) + 1.0) / CAST(COUNT(*) AS DOUBLE), 6) AS gini
FROM r
"""


SPECS += [
    QuerySpec("q_event_transitions", q_event_transitions, Q_TRANSITIONS_ORACLE,
              "Markov transition counts between consecutive event types per user",
              ("analytics", "clickstream")),
    QuerySpec("q_revenue_gini", q_revenue_gini, Q_GINI_ORACLE,
              "Gini concentration via sharded two-pass distributed rank",
              ("analytics", "rank")),
]


# --- global-decile feature binning ------------------------------------------
# ML feature-prep: bucket a numeric column by its own global deciles.
# Two stages: (1) all 9 boundaries from the two-pass sharded EXACT
# quantile (exact_quantiles below — no percentile sort buffer, memory-
# bounded at any scale, 2.5 s -> 0.6 s at sf0.1); (2) the floored
# integer boundaries fold into the bin CASE as literals and every row
# bins map-side by integer comparison — never a double equality at a
# bucket edge. Fact table is scanned three times (shard counts + ranked
# fetch + bin pass), all light; no single-buffer sort anywhere.


def q_decile_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bin lineitem prices into global deciles; per bucket: row count,
    min/max/sum in integer cents."""
    li = load_table(spark, sf_dir, "lineitem").selectExpr(
        "CAST(round(l_extendedprice * 100) AS BIGINT) AS cents"
    )
    # Boundaries via the two-pass sharded EXACT quantile (see
    # exact_quantiles below): no single-buffer percentile sort — 2.5 s
    # -> 0.6 s at sf0.1 and memory-bounded at any scale. The floored
    # integer boundaries fold into the bin CASE as LITERALS, so the bin
    # pass is a pure map-side projection (no broadcast join left).
    import math
    bs = exact_quantiles(li, "cents", [k / 10 for k in range(1, 10)],
                         shard_width=1 << 16)
    b = [int(math.floor(x)) for x in bs]
    binned = li.selectExpr(
        "cents",
        "CASE "
        + " ".join(f"WHEN cents <= {b[k - 1]}L THEN {k - 1}" for k in range(1, 10))
        + " ELSE 9 END AS decile",
    )
    return binned.groupBy("decile").agg(
        F.count("*").alias("n"),
        F.min("cents").alias("min_cents"),
        F.max("cents").alias("max_cents"),
        F.sum(F.expr("CAST(cents AS DECIMAL(18,0))")).cast("long").alias("sum_cents"),
    )


Q_DECILE_ORACLE = (
    "WITH c AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents"
    " FROM lineitem),\nb AS (SELECT "
    + ", ".join(
        f"CAST(floor(quantile_cont(cents, {k}/10.0)) AS BIGINT) AS b{k}"
        for k in range(1, 10)
    )
    + " FROM c),\nbinned AS (SELECT cents, CASE "
    + " ".join(f"WHEN cents <= b{k} THEN {k - 1}" for k in range(1, 10))
    + " ELSE 9 END AS decile FROM c, b)\n"
    "SELECT decile, COUNT(*) AS n, MIN(cents) AS min_cents,"
    " MAX(cents) AS max_cents,"
    " CAST(SUM(CAST(cents AS HUGEINT)) AS BIGINT) AS sum_cents"
    " FROM binned GROUP BY 1"
)


SPECS += [
    QuerySpec("q_decile_binning", q_decile_binning, Q_DECILE_ORACLE,
              "global-decile feature binning with integer-floored boundaries",
              ("analytics", "binning")),
]


# --- hour-of-week activity heatmap ------------------------------------------
# The dashboard "when are my users active" matrix: (day-of-week, hour)
# cells with counts and exact value sums. Day-of-week comes from pure
# epoch-ms arithmetic — (floor(ts/86400000) + 4) % 7, anchored on
# 1970-01-01 being a Thursday — NOT from an engine dow() function, whose
# week-origin and locale semantics differ across engines. Single scan,
# one 168-key aggregate, all integer.


def q_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (dow, hour) cell: event count and exact cents total.
    dow 0 = Sunday."""
    ev = load_table(spark, sf_dir, "events")
    return ev.selectExpr(
        "CAST((floor(unix_millis(ts) / 86400000) + 4) % 7 AS BIGINT) AS dow",
        "CAST(floor(unix_millis(ts) / 3600000) % 24 AS BIGINT) AS hour",
        "CAST(round(value * 100) AS BIGINT) AS cents",
    ).groupBy("dow", "hour").agg(
        F.count("*").alias("n_events"),
        F.sum("cents").alias("sum_cents"),
    )


Q_HOUR_HEATMAP_ORACLE = """
SELECT CAST((floor(epoch_ms(ts) / 86400000) + 4) % 7 AS BIGINT) AS dow,
       CAST(floor(epoch_ms(ts) / 3600000) % 24 AS BIGINT) AS hour,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
FROM events GROUP BY 1, 2
"""


SPECS += [
    QuerySpec("q_hour_heatmap", q_hour_heatmap, Q_HOUR_HEATMAP_ORACLE,
              "hour-of-week activity matrix from portable epoch arithmetic",
              ("analytics", "dashboard")),
]


# --- banding (range-dimension) join -----------------------------------------
# Join a fact against an irregular [lo, hi) band dimension — price tiers,
# SLA buckets, duration bands. The dim is tiny and data-driven, so the
# right physical plan is a BROADCAST non-equi join (nested-loop against
# ≤ dozens of broadcast rows ≈ a map-side CASE); when the bands are
# static literals Catalyst would fold an equivalent CASE, and when the
# dim is large the scale path is interval alignment to a grid +
# equi-join. The fact side never shuffles before the final k-row agg.

PRICE_TIERS = [
    ("budget", 0, 8_000_000),
    ("mid", 8_000_000, 15_000_000),
    ("premium", 15_000_000, 30_000_000),
    ("luxury", 30_000_000, 10**15),
]


def q_price_tier_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order count + exact revenue per price tier via a broadcast
    range-band join."""
    o = load_table(spark, sf_dir, "orders").selectExpr(
        "o_orderkey", "CAST(round(o_totalprice * 100) AS BIGINT) AS cents"
    )
    tiers = local_literal_df(spark, PRICE_TIERS, "tier string, lo long, hi long")
    j = o.join(
        F.broadcast(tiers),
        (F.col("cents") >= F.col("lo")) & (F.col("cents") < F.col("hi")),
    )
    return j.groupBy("tier").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.expr("CAST(cents AS DECIMAL(18,0))")).cast("long").alias("revenue_cents"),
    )


_TIER_VALUES = ", ".join(f"('{t}', {lo}, {hi})" for t, lo, hi in PRICE_TIERS)

Q_PRICE_TIER_ORACLE = f"""
WITH tiers(tier, lo, hi) AS (VALUES {_TIER_VALUES}),
o AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders)
SELECT tier, COUNT(*) AS n_orders,
       CAST(SUM(CAST(cents AS HUGEINT)) AS BIGINT) AS revenue_cents
FROM o JOIN tiers ON cents >= lo AND cents < hi
GROUP BY tier
"""


# --- Lorenz / Pareto decile table -------------------------------------------
# "The top 10% of customers drive X% of revenue": per-customer revenue,
# customers ranked by revenue, revenue share per customer-decile. Third
# user of the value-sharded two-pass distributed rank (with
# q_revenue_gini and q_session_concurrency) — by now the house pattern
# for global order statistics without a single-partition window. Decile
# ids use true integer division (`div`), never a cast of a double ratio.
# |customers| and total revenue enter as ONE broadcast one-row aggregate.

LORENZ_SHARD_CENTS = 10_000_000


def q_pareto_lorenz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per customer-revenue decile (0 = top spenders): customer count,
    exact revenue cents, and share of total revenue."""
    rev = load_table(spark, sf_dir, "orders").groupBy("o_custkey").agg(
        F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")).alias("rev")
    )
    tot = rev.agg(
        F.count("*").alias("n"),
        F.sum(F.expr("CAST(rev AS DECIMAL(28,0))")).cast("long").alias("total"),
    )
    sharded = rev.selectExpr(
        "o_custkey", "rev", f"CAST(floor(rev / {LORENZ_SHARD_CENTS}) AS BIGINT) AS shard"
    )
    in_shard = Window.partitionBy("shard").orderBy("rev", "o_custkey")
    local = sharded.withColumn("lr", F.row_number().over(in_shard))
    shard_w = Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)
    bases = (
        sharded.groupBy("shard").agg(F.count("*").alias("c"))
        .withColumn("base", F.coalesce(F.sum("c").over(shard_w), F.lit(0)))
        .select("shard", "base")
    )
    ranked = (
        local.join(F.broadcast(bases), "shard")
        .crossJoin(F.broadcast(tot))
        .selectExpr("rev", "n", "total", "base + lr AS rnk_asc")
    )
    return (
        ranked.selectExpr(
            "rev", "total", "((n - rnk_asc) * 10) div n AS decile"
        )
        .groupBy("decile")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(F.expr("CAST(rev AS DECIMAL(28,0))")).cast("long").alias("revenue_cents"),
            F.first("total").alias("t"),
        )
        .selectExpr(
            "decile", "n_customers", "revenue_cents",
            "round(CAST(revenue_cents AS DOUBLE) / t, 6) AS revenue_share",
        )
    )


Q_LORENZ_ORACLE = """
WITH rev AS (
  SELECT o_custkey, SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev
  FROM orders GROUP BY 1
), tot AS (
  SELECT COUNT(*) AS n, CAST(SUM(CAST(rev AS HUGEINT)) AS BIGINT) AS total FROM rev
), ranked AS (
  SELECT rev, n, total,
         row_number() OVER (ORDER BY rev, o_custkey) AS rnk_asc
  FROM rev, tot
)
SELECT ((n - rnk_asc) * 10) // n AS decile,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(rev AS HUGEINT)) AS BIGINT) AS revenue_cents,
       round(CAST(CAST(SUM(CAST(rev AS HUGEINT)) AS BIGINT) AS DOUBLE)
             / ANY_VALUE(total), 6) AS revenue_share
FROM ranked GROUP BY 1
"""


SPECS += [
    QuerySpec("q_price_tier_join", q_price_tier_join, Q_PRICE_TIER_ORACLE,
              "broadcast range-band join against an irregular tier dimension",
              ("analytics", "join")),
    QuerySpec("q_pareto_lorenz", q_pareto_lorenz, Q_LORENZ_ORACLE,
              "customer-revenue Lorenz deciles via value-sharded distributed rank",
              ("analytics", "rank")),
]


# --- month-over-month revenue bridge ----------------------------------------
# The SaaS-finance waterfall: decompose each month's revenue movement
# into new / expansion / contraction / churned, by customer. Customer-
# month revenue aggregates once (shuffle 1, map-side combine), then ONE
# window pass per customer (lag revenue, lag/lead month — shuffle 2 on
# o_custkey) classifies inflows and projects churn into the month AFTER
# last activity. All amounts integer cents; a month gap (pm < m-1)
# counts as 'new' again, mirroring the churn row emitted at pm+1.


def q_revenue_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (month, class ∈ new/expansion/contraction/churned): customer
    count and exact cents amount."""
    o = load_table(spark, sf_dir, "orders").selectExpr(
        "o_custkey",
        "CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT) AS m",
        "CAST(round(o_totalprice * 100) AS BIGINT) AS cents",
    )
    cm = o.groupBy("o_custkey", "m").agg(F.sum("cents").alias("rev"))
    wc = Window.partitionBy("o_custkey").orderBy("m")
    lagged = cm.select(
        "o_custkey", "m", "rev",
        F.lag("m").over(wc).alias("pm"),
        F.lag("rev").over(wc).alias("prev"),
        F.lead("m").over(wc).alias("nm"),
    )
    inflow = lagged.selectExpr(
        "m",
        "CASE WHEN pm IS NULL OR pm < m - 1 THEN 'new' "
        "WHEN rev >= prev THEN 'expansion' ELSE 'contraction' END AS cls",
        "CASE WHEN pm IS NULL OR pm < m - 1 THEN rev "
        "WHEN rev >= prev THEN rev - prev ELSE prev - rev END AS amt",
    )
    churn = lagged.where(
        F.col("nm").isNull() | (F.col("nm") > F.col("m") + 1)
    ).selectExpr("m + 1 AS m", "'churned' AS cls", "rev AS amt")
    return inflow.unionByName(churn).groupBy("m", "cls").agg(
        F.count("*").alias("n_customers"),
        F.sum("amt").alias("amount_cents"),
    )


Q_REVENUE_BRIDGE_ORACLE = """
WITH o AS (
  SELECT o_custkey,
         CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT) AS m,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), cm AS (SELECT o_custkey, m, SUM(cents) AS rev FROM o GROUP BY 1, 2),
lagged AS (
  SELECT o_custkey, m, rev,
         lag(m) OVER w AS pm, lag(rev) OVER w AS prev, lead(m) OVER w AS nm
  FROM cm WINDOW w AS (PARTITION BY o_custkey ORDER BY m)
), inflow AS (
  SELECT m,
         CASE WHEN pm IS NULL OR pm < m - 1 THEN 'new'
              WHEN rev >= prev THEN 'expansion' ELSE 'contraction' END AS cls,
         CASE WHEN pm IS NULL OR pm < m - 1 THEN rev
              WHEN rev >= prev THEN rev - prev ELSE prev - rev END AS amt
  FROM lagged
), churn AS (
  SELECT m + 1 AS m, 'churned' AS cls, rev AS amt
  FROM lagged WHERE nm IS NULL OR nm > m + 1
)
SELECT m, cls, COUNT(*) AS n_customers, CAST(SUM(amt) AS BIGINT) AS amount_cents
FROM (SELECT * FROM inflow UNION ALL SELECT * FROM churn) GROUP BY 1, 2
"""


SPECS += [
    QuerySpec("q_revenue_bridge", q_revenue_bridge, Q_REVENUE_BRIDGE_ORACLE,
              "MoM revenue waterfall: new/expansion/contraction/churned per month",
              ("analytics", "finance")),
]


# --- market-basket co-purchase pairs ----------------------------------------
# "Frequently bought together": for every unordered part pair, in how
# many orders both appear; top 20. Same generator-not-self-join shape as
# q_event_cooccurrence but over a LARGE key domain: collect_set per
# order (one shuffle), map-side pair explode bounded by basket size
# squared (TPC-H baskets ≤ 7 lines — human-basket scale), pair rollup,
# then TakeOrdered with a full (count, pa, pb) tie-break so the top-20
# cut is deterministic. The naive basket self-join would shuffle the
# line table twice more and square the skewed baskets inside the join.


def q_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top 20 co-purchased part pairs by distinct order count."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    baskets = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("parts")
    )
    pairs = baskets.select(
        F.explode(
            F.expr(
                "flatten(transform(parts, (x, i) -> "
                "transform(slice(parts, i + 2, size(parts)), "
                "y -> struct(x AS pa, y AS pb))))"
            )
        ).alias("p")
    ).select("p.pa", "p.pb")
    return (
        pairs.groupBy("pa", "pb")
        .agg(F.count("*").alias("n_orders"))
        .orderBy(F.desc("n_orders"), F.asc("pa"), F.asc("pb"))
        .limit(20)
    )


Q_COPURCHASE_ORACLE = """
WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
p AS (
  SELECT a.l_partkey AS pa, b2.l_partkey AS pb
  FROM b a JOIN b b2
    ON a.l_orderkey = b2.l_orderkey AND a.l_partkey < b2.l_partkey
)
SELECT pa, pb, COUNT(*) AS n_orders FROM p GROUP BY 1, 2
ORDER BY n_orders DESC, pa ASC, pb ASC LIMIT 20
"""


# --- group-size distribution ------------------------------------------------
# The "how big are my groups" histogram (lines per order, events per
# session, chunks per doc): double aggregation — sizes, then counts of
# sizes. Second agg input is |orders| rows, output |distinct sizes|;
# the fraction normalizer is a broadcast one-row sum over the TINY
# distribution table, not a third pass over the fact.


def q_basket_size_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of lineitem counts per order with corpus fractions."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    sizes = li.groupBy("l_orderkey").agg(F.count("*").alias("n_lines"))
    dist = sizes.groupBy("n_lines").agg(F.count("*").alias("n_orders"))
    tot = dist.agg(F.sum("n_orders").alias("t"))
    return dist.crossJoin(F.broadcast(tot)).selectExpr(
        "n_lines", "n_orders",
        "round(CAST(n_orders AS DOUBLE) / t, 6) AS frac_orders",
    )


Q_BASKET_SIZE_ORACLE = """
WITH s AS (SELECT l_orderkey, COUNT(*) AS n_lines FROM lineitem GROUP BY 1),
d AS (SELECT n_lines, COUNT(*) AS n_orders FROM s GROUP BY 1),
t AS (SELECT SUM(n_orders) AS t FROM d)
SELECT n_lines, n_orders, round(CAST(n_orders AS DOUBLE) / t, 6) AS frac_orders
FROM d, t
"""


SPECS += [
    QuerySpec("q_copurchase_pairs", q_copurchase_pairs, Q_COPURCHASE_ORACLE,
              "frequently-bought-together pairs via basket generator, top-20",
              ("analytics", "basket")),
    QuerySpec("q_basket_size_dist", q_basket_size_dist, Q_BASKET_SIZE_ORACLE,
              "group-size histogram (lines per order) with fractions",
              ("analytics", "distribution")),
]


# --- winsorized (outlier-clamped) statistics --------------------------------
# Robust-stats cleaning: clamp each group's values to its own [p01, p99]
# before averaging — the standard defense against sensor glitches and
# fat-finger amounts. Per-group bounds come from ONE array-percentile
# aggregate (k rows), broadcast back; the clamp + mean is a second scan,
# map-side. Bounds are floored/ceiled to integer cents so the clamp
# comparisons are exact integer logic; the mean is exact DECIMAL sum /
# count with one final rounded division.


def q_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event type: n, clamped-row count, and the winsorized mean
    (values clamped to the type's own [p01, p99])."""
    ev = load_table(spark, sf_dir, "events").selectExpr(
        "event_type", "CAST(round(value * 100) AS BIGINT) AS cents"
    )
    bounds = ev.groupBy("event_type").agg(
        F.expr(
            "CAST(floor(percentile(cents, array(0.01, 0.99))[0]) AS BIGINT)"
        ).alias("lo"),
        F.expr(
            "CAST(ceil(percentile(cents, array(0.01, 0.99))[1]) AS BIGINT)"
        ).alias("hi"),
    )
    clamped = ev.join(F.broadcast(bounds), "event_type").selectExpr(
        "event_type",
        "CASE WHEN cents < lo THEN lo WHEN cents > hi THEN hi ELSE cents END AS w",
        "CASE WHEN cents < lo OR cents > hi THEN 1 ELSE 0 END AS clamped",
    )
    return clamped.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("clamped").alias("n_clamped"),
        F.expr(
            "round(CAST(SUM(CAST(w AS DECIMAL(18,0))) AS DOUBLE)"
            " / COUNT(*) / 100.0, 6)"
        ).alias("winsorized_mean"),
    )


Q_WINSORIZED_ORACLE = """
WITH ev AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents FROM events
), b AS (
  SELECT event_type,
         CAST(floor(quantile_cont(cents, 0.01)) AS BIGINT) AS lo,
         CAST(ceil(quantile_cont(cents, 0.99)) AS BIGINT) AS hi
  FROM ev GROUP BY 1
), c AS (
  SELECT ev.event_type,
         CASE WHEN cents < lo THEN lo WHEN cents > hi THEN hi ELSE cents END AS w,
         CASE WHEN cents < lo OR cents > hi THEN 1 ELSE 0 END AS clamped
  FROM ev JOIN b USING (event_type)
)
SELECT event_type, COUNT(*) AS n, CAST(SUM(clamped) AS BIGINT) AS n_clamped,
       round(CAST(SUM(CAST(w AS HUGEINT)) AS DOUBLE) / COUNT(*) / 100.0, 6)
         AS winsorized_mean
FROM c GROUP BY 1
"""


# --- order fulfillment lag --------------------------------------------------
# Supply-chain SLA: days from order placement to the LAST line shipment,
# percentiles per priority class. Lineitem reduces to one row per order
# BEFORE the join (aggregate-then-join — the q18 lesson), the join keys
# on orderkey, and day lags are exact integer epoch arithmetic with
# floored percentiles.


def q_fulfillment_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per order priority: order count, p50/p90/max days from order date
    to last shipment."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    li = load_table(spark, sf_dir, "lineitem").groupBy("l_orderkey").agg(
        F.max("l_shipdate").alias("last_ship")
    )
    lag = o.join(li, o.o_orderkey == li.l_orderkey).selectExpr(
        "o_orderpriority",
        "CAST(floor((unix_millis(last_ship) - unix_millis(o_orderdate))"
        " / 86400000) AS BIGINT) AS lag_days",
    )
    return lag.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.expr("CAST(floor(percentile(lag_days, 0.5)) AS BIGINT)").alias("p50_days"),
        F.expr("CAST(floor(percentile(lag_days, 0.9)) AS BIGINT)").alias("p90_days"),
        F.max("lag_days").alias("max_days"),
    )


Q_FULFILLMENT_ORACLE = """
WITH li AS (
  SELECT l_orderkey, MAX(l_shipdate) AS last_ship FROM lineitem GROUP BY 1
), l AS (
  SELECT o_orderpriority,
         CAST(floor((epoch_ms(last_ship) - epoch_ms(o_orderdate))
              / 86400000) AS BIGINT) AS lag_days
  FROM orders o JOIN li ON o.o_orderkey = li.l_orderkey
)
SELECT o_orderpriority, COUNT(*) AS n_orders,
       CAST(floor(quantile_cont(lag_days, 0.5)) AS BIGINT) AS p50_days,
       CAST(floor(quantile_cont(lag_days, 0.9)) AS BIGINT) AS p90_days,
       MAX(lag_days) AS max_days
FROM l GROUP BY 1
"""


SPECS += [
    QuerySpec("q_winsorized_stats", q_winsorized_stats, Q_WINSORIZED_ORACLE,
              "groupwise p01/p99-clamped robust means with clamp counts",
              ("analytics", "robust")),
    QuerySpec("q_fulfillment_lag", q_fulfillment_lag, Q_FULFILLMENT_ORACLE,
              "order-to-last-shipment lag percentiles per priority",
              ("analytics", "sla")),
]


# --- deterministic A/B experiment readout -----------------------------------
# Experiment analysis without an assignment service: variant = portable
# hash of user_id mod 2 — deterministic, engine-portable (the same md5
# prefix family as the dedup operators), uniformly splitting. Per-user
# metrics reduce FIRST (one shuffle on user_id), variants assign
# map-side on the reduced table, and the readout is a 2-row aggregate of
# exact integers with one rounded division per rate. (On driver data
# this is an A/A test — the two variants should read statistically
# alike; the operator is the shape, the thresholds are config.)

AB_CONVERT_MIN_PURCHASES = 15


def q_ab_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per hash-assigned variant: users, converters (>= threshold
    purchases), event totals, conversion rate, events/user."""
    from ..functions.hashing import portable_hash64

    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum((F.col("event_type") == "purchase").cast("int")).alias("n_purchases"),
    ).selectExpr(
        "user_id", "n_events",
        f"CAST(n_purchases >= {AB_CONVERT_MIN_PURCHASES} AS INT) AS converted",
    )
    assigned = per_user.withColumn(
        "variant",
        F.pmod(portable_hash64(F.col("user_id").cast("string")), F.lit(2)).cast("bigint"),
    )
    return assigned.groupBy("variant").agg(
        F.count("*").alias("n_users"),
        F.sum("converted").alias("n_converted"),
        F.sum("n_events").alias("n_events"),
        F.expr("round(CAST(SUM(converted) AS DOUBLE) / COUNT(*), 6)").alias(
            "conversion_rate"
        ),
        F.expr("round(CAST(SUM(n_events) AS DOUBLE) / COUNT(*), 6)").alias(
            "events_per_user"
        ),
    )


def _ab_oracle() -> str:
    from ..functions.hashing import portable_hash64_sql

    h = portable_hash64_sql("CAST(user_id AS VARCHAR)")
    return f"""
WITH pu AS (
  SELECT user_id, COUNT(*) AS n_events,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              >= {AB_CONVERT_MIN_PURCHASES} AS INT) AS converted
  FROM events GROUP BY 1
), a AS (
  SELECT *, ((({h}) % 2) + 2) % 2 AS variant FROM pu
)
SELECT variant, COUNT(*) AS n_users, CAST(SUM(converted) AS BIGINT) AS n_converted,
       CAST(SUM(n_events) AS BIGINT) AS n_events,
       round(CAST(SUM(converted) AS DOUBLE) / COUNT(*), 6) AS conversion_rate,
       round(CAST(SUM(n_events) AS DOUBLE) / COUNT(*), 6) AS events_per_user
FROM a GROUP BY 1
"""


SPECS += [
    QuerySpec("q_ab_readout", q_ab_readout, _ab_oracle(),
              "hash-assigned A/B variant readout with exact counting metrics",
              ("analytics", "experiment")),
]


# --- daily value percentile bands -------------------------------------------
# The monitoring staple: p50/p90/p99 per day (latency bands, order-value
# bands). ONE array-percentile buffer per group serves all three
# percentiles (the q_decile_binning lesson), boundaries floored to
# integer cents before the BIGINT cast. At 100 TB swap percentile for
# approx_percentile — same plan, t-digest memory bound.


def q_daily_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per day: event count and floored p50/p90/p99 of value in cents."""
    day_ms = 86_400_000
    ev = load_table(spark, sf_dir, "events").selectExpr(
        f"CAST(floor(unix_millis(ts) / {day_ms}) AS BIGINT) AS day",
        "CAST(round(value * 100) AS BIGINT) AS cents",
    )
    p = "percentile(cents, array(0.5, 0.9, 0.99))"
    return ev.groupBy("day").agg(
        F.count("*").alias("n"),
        F.expr(f"CAST(floor({p}[0]) AS BIGINT)").alias("p50_cents"),
        F.expr(f"CAST(floor({p}[1]) AS BIGINT)").alias("p90_cents"),
        F.expr(f"CAST(floor({p}[2]) AS BIGINT)").alias("p99_cents"),
    ).selectExpr(f"day * {day_ms} AS day_ms", "n", "p50_cents", "p90_cents",
                 "p99_cents")


Q_DAILY_BANDS_ORACLE = """
WITH e AS (
  SELECT CAST(floor(epoch_ms(ts) / 86400000) AS BIGINT) AS day,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
)
SELECT day * 86400000 AS day_ms, COUNT(*) AS n,
       CAST(floor(quantile_cont(cents, 0.5)) AS BIGINT) AS p50_cents,
       CAST(floor(quantile_cont(cents, 0.9)) AS BIGINT) AS p90_cents,
       CAST(floor(quantile_cont(cents, 0.99)) AS BIGINT) AS p99_cents
FROM e GROUP BY day
"""


# --- quantity-weighted average ----------------------------------------------
# The weighted-aggregate primitive (volume-weighted price, token-
# weighted loss): sum(w*x)/sum(w) from exact integer products (DECIMAL
# accumulators sized for 1e12-row groups), ONE rounded double division
# at the end. Part dim broadcasts; the fact table shuffles once on the
# brand rollup.


def q_weighted_avg_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per brand: line count, total quantity, quantity-weighted average
    extended price."""
    li = load_table(spark, sf_dir, "lineitem").selectExpr(
        "l_partkey",
        "CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c",
        "CAST(l_quantity AS BIGINT) AS qty",
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum("qty").alias("total_qty"),
            F.expr(
                "round(CAST(SUM(CAST(price_c * qty AS DECIMAL(28,0))) AS DOUBLE)"
                " / SUM(qty) / 100.0, 6)"
            ).alias("qty_weighted_avg_price"),
        )
    )


Q_WEIGHTED_AVG_ORACLE = """
SELECT p_brand, COUNT(*) AS n_lines,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
       round(CAST(SUM(CAST(round(l_extendedprice * 100) AS HUGEINT)
                      * CAST(l_quantity AS HUGEINT)) AS DOUBLE)
             / SUM(CAST(l_quantity AS BIGINT)) / 100.0, 6)
         AS qty_weighted_avg_price
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY 1
"""


SPECS += [
    QuerySpec("q_daily_value_bands", q_daily_value_bands, Q_DAILY_BANDS_ORACLE,
              "daily p50/p90/p99 value bands, one percentile buffer per day",
              ("analytics", "monitoring")),
    QuerySpec("q_weighted_avg_price", q_weighted_avg_price, Q_WEIGHTED_AVG_ORACLE,
              "quantity-weighted average price per brand, exact products",
              ("analytics", "agg")),
]


# --- distributed EXACT quantiles (no percentile buffer) ---------------------
# Spark's ``percentile`` buffers and sorts the whole column inside ONE
# aggregation buffer — memory-unbounded at scale (the reason the decile
# docstring said "swap for approx_percentile at 100 TB"). This removes
# that tradeoff: exact quantiles from the value-sharded rank machinery.
#   pass 1: per-shard counts (a tiny aggregate) -> driver prefix sums
#           locate, for every target rank, its (shard, in-shard offset);
#   pass 2: ONE filtered scan of just the needed shards; in-shard
#           row_number picks the ranked values (<= 2 per target).
# Interpolation (pos = p·(n−1), linear between neighbors — the
# percentile / quantile_cont definition) happens on the driver over
# exact integers. Wall-clock at sf0.1: 2.5 s -> ~0.6 s; at 100 TB the
# sort buffer simply never exists.

def exact_quantiles(df: DataFrame, col: str, probs: list[float],
                    shard_width: int) -> list[float]:
    """Exact linear-interpolation quantiles of an integer column."""
    sharded = df.selectExpr(f"{col} AS v", f"{col} div {shard_width} AS shard")
    counts = sorted(
        (r.shard, r.cnt)
        for r in sharded.groupBy("shard").agg(F.count("*").alias("cnt")).collect()
    )
    n = sum(c for _, c in counts)
    bases: dict[int, int] = {}
    run = 0
    for s, c in counts:
        bases[s] = run
        run += c
    # global 1-indexed ranks needed (floor and ceil neighbors per prob)
    need: set[int] = set()
    for p in probs:
        pos = p * (n - 1)
        lo = int(pos) + 1
        need.add(lo)
        need.add(min(lo + 1, n))
    # rank -> owning shard via the prefix sums
    targets: dict[tuple[int, int], int] = {}   # (shard, offset) -> rank
    shards_sorted = [s for s, _ in counts]
    import bisect
    base_list = [bases[s] for s in shards_sorted]
    for r in need:
        i = bisect.bisect_right(base_list, r - 1) - 1
        s = shards_sorted[i]
        targets[(s, r - bases[s])] = r
    wanted_shards = sorted({s for s, _ in targets})
    w = Window.partitionBy("shard").orderBy("v")
    hit_pred = " OR ".join(f"(shard = {s} AND rn = {o})" for s, o in targets)
    hit_rows = (
        sharded.where(F.col("shard").isin(wanted_shards))
        .withColumn("rn", F.row_number().over(w))
        .where(F.expr(hit_pred))
        .select("shard", "rn", "v")
        .collect()
    )
    by_rank = {targets[(r.shard, r.rn)]: r.v for r in hit_rows}
    out = []
    for p in probs:
        pos = p * (n - 1)
        lo = int(pos) + 1
        hi = min(lo + 1, n)
        frac = pos - int(pos)
        v1, v2 = by_rank[lo], by_rank[hi]
        out.append(v1 + frac * (v2 - v1))
    return out


# --- hierarchical share-of-parent rollup -------------------------------------
# Revenue share of each nation WITHIN its region and of each region
# within the world — the drill-down tree every BI layer renders. Facts
# aggregate per nation FIRST (one shuffle after two broadcast dim hops);
# the parent totals come from windows over the ~25-row aggregated
# rollup, never the fact table. Shares are exact integer micros.

def q_share_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").selectExpr(
        "o_custkey", "CAST(round(o_totalprice * 100) AS BIGINT) AS cents")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    per_nation = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.sum(F.expr("CAST(cents AS DECIMAL(28,0))")).cast("long")
             .alias("nation_rev_cents"))
    )
    w_r = Window.partitionBy("r_name")
    return per_nation.select(
        "r_name", "n_name", "nation_rev_cents",
        F.sum("nation_rev_cents").over(w_r).alias("region_rev_cents"),
    ).selectExpr(
        "r_name", "n_name", "nation_rev_cents", "region_rev_cents",
        "CAST(CAST(nation_rev_cents AS DECIMAL(38,0)) * 1000000"
        " div region_rev_cents AS BIGINT) AS share_of_region_micro",
    )


Q_SHARE_PARENT_ORACLE = """
WITH per_nation AS (
  SELECT r_name, n_name,
         CAST(SUM(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS HUGEINT))
              AS BIGINT) AS nation_rev_cents
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY 1, 2
)
SELECT r_name, n_name, nation_rev_cents,
       CAST(SUM(nation_rev_cents) OVER (PARTITION BY r_name) AS BIGINT)
         AS region_rev_cents,
       CAST(CAST(nation_rev_cents AS HUGEINT) * 1000000
            // SUM(nation_rev_cents) OVER (PARTITION BY r_name) AS BIGINT)
         AS share_of_region_micro
FROM per_nation
"""


SPECS += [
    QuerySpec("q_share_of_parent", q_share_of_parent, Q_SHARE_PARENT_ORACLE,
              "nation-within-region revenue shares from one aggregated rollup",
              ("analytics", "rollup")),
]


# --- market-basket 3-itemsets (apriori level 3) ------------------------------
# The next apriori level over q_copurchase_pairs: top part TRIPLES by
# distinct-order support. Same generator-not-self-join discipline — the
# sorted basket array explodes its own i<j<k triples map-side, so triple
# volume is bounded by B^3 of the basket SIZE (TPC-H <= 7 lines -> <= 35
# triples), never by a three-way fact join. Mega-baskets above
# TRIPLE_MAX_BASKET are excluded identically on both engines — the
# standard frequent-itemset guard: a 10k-line institutional order would
# contribute 1.6e11 triples and zero retail signal.

TRIPLE_MAX_BASKET = 25
TRIPLE_TOP = 10


def q_basket_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    baskets = (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("parts"))
        .where(f"size(parts) BETWEEN 3 AND {TRIPLE_MAX_BASKET}")
    )
    triples = baskets.select(
        F.explode(F.expr(
            "flatten(transform(parts, (x, i) -> "
            "flatten(transform(slice(parts, i + 2, size(parts)), (y, j) -> "
            "transform(slice(parts, i + j + 3, size(parts)), "
            "z -> struct(x AS pa, y AS pb, z AS pc))))))"
        )).alias("t")
    ).select("t.pa", "t.pb", "t.pc")
    top = (
        triples.groupBy("pa", "pb", "pc")
        .agg(F.count("*").alias("support"))
        .orderBy(F.desc("support"), "pa", "pb", "pc")
        .limit(TRIPLE_TOP)
    )
    w = Window.orderBy(F.desc("support"), "pa", "pb", "pc")
    return top.withColumn("rnk", F.row_number().over(w))


Q_BASKET_TRIPLES_ORACLE = f"""
WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
sized AS (
  SELECT l_orderkey FROM b GROUP BY 1
  HAVING COUNT(*) BETWEEN 3 AND {TRIPLE_MAX_BASKET}
), bs AS (
  SELECT b.l_orderkey, l_partkey FROM b JOIN sized USING (l_orderkey)
), t AS (
  SELECT x.l_partkey AS pa, y.l_partkey AS pb, z.l_partkey AS pc
  FROM bs x
  JOIN bs y ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
  JOIN bs z ON y.l_orderkey = z.l_orderkey AND y.l_partkey < z.l_partkey
), agg AS (
  SELECT pa, pb, pc, COUNT(*) AS support FROM t GROUP BY 1, 2, 3
)
SELECT pa, pb, pc, support,
       row_number() OVER (ORDER BY support DESC, pa, pb, pc) AS rnk
FROM agg
ORDER BY rnk LIMIT {TRIPLE_TOP}
"""


SPECS += [
    QuerySpec("q_basket_triples", q_basket_triples, Q_BASKET_TRIPLES_ORACLE,
              "top 3-itemsets by support, basket-bounded map-side generation",
              ("analytics", "basket")),
]


# --- CUPED variance-reduced experiment readout ------------------------------
# The standard production upgrade to q_ab_readout: adjust each user's
# experiment-period metric Y by their PRE-period metric X
# (Yadj = Y - theta*(X - mean(X)), theta = cov(X,Y)/var(X)) so
# between-user variance that existed before the experiment stops
# polluting the uplift estimate. Periods split at a fixed experiment
# start (Jan 16); variant is the same portable-hash assignment as
# q_ab_readout (A/A on driver data — the adjusted means should agree).
#
# Exactness: every aggregate is an exact BIGINT sum over whole currency
# units (n*Sxy and Sx*Sy stay ~3000x under int64 at sf0.1; a 100 TB run
# lifts these four moments to DECIMAL(38) — same plan), and every float
# is derived AFTER aggregation from those integers through one shared
# scalar expression string, so both engines evaluate the identical IEEE
# expression tree — no accumulation-order divergence.
#
# Scale: one user_id shuffle for per-user reduction, one variant
# aggregation, a 1-row global-moments broadcast. theta is the classic
# "driver-scale scalar derived from distributed moments".

CUPED_SPLIT_MS = 1_705_363_200_000  # 2024-01-16 00:00 UTC

_CUPED_THETA = (
    "(CAST(g_n * gsum_xy - gsum_x * gsum_y AS DOUBLE)"
    " / CAST(g_n * gsum_xx - gsum_x * gsum_x AS DOUBLE))"
)
_CUPED_COLS = (
    "round(CAST(sum_y AS DOUBLE) / CAST(n_users AS DOUBLE), 6) AS mean_y",
    f"round({_CUPED_THETA}, 6) AS theta",
    f"round((CAST(sum_y AS DOUBLE) - {_CUPED_THETA} * (CAST(sum_x AS DOUBLE)"
    " - CAST(n_users AS DOUBLE)"
    " * (CAST(gsum_x AS DOUBLE) / CAST(g_n AS DOUBLE))))"
    " / CAST(n_users AS DOUBLE), 6) AS adj_mean_y",
)


def q_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import portable_hash64

    ev = load_table(spark, sf_dir, "events").selectExpr(
        "user_id",
        f"CASE WHEN unix_millis(ts) < {CUPED_SPLIT_MS}"
        " THEN CAST(floor(value) AS BIGINT) ELSE 0 END AS x",
        f"CASE WHEN unix_millis(ts) >= {CUPED_SPLIT_MS}"
        " THEN CAST(floor(value) AS BIGINT) ELSE 0 END AS y",
    )
    per_user = ev.groupBy("user_id").agg(
        F.sum("x").alias("x"), F.sum("y").alias("y"))
    g = per_user.agg(
        F.count("*").alias("g_n"),
        F.sum("x").alias("gsum_x"),
        F.sum("y").alias("gsum_y"),
        F.sum(F.expr("x * x")).alias("gsum_xx"),
        F.sum(F.expr("x * y")).alias("gsum_xy"),
    )
    v = per_user.withColumn(
        "variant",
        F.pmod(portable_hash64(F.col("user_id").cast("string")), F.lit(2))
        .cast("bigint"),
    ).groupBy("variant").agg(
        F.count("*").alias("n_users"),
        F.sum("x").alias("sum_x"),
        F.sum("y").alias("sum_y"),
    )
    return v.crossJoin(F.broadcast(g)).selectExpr(
        "variant", "n_users", "sum_x", "sum_y", *_CUPED_COLS)


def _cuped_oracle() -> str:
    from ..functions.hashing import portable_hash64_sql

    h = portable_hash64_sql("CAST(user_id AS VARCHAR)")
    return f"""
WITH pu AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN epoch_ms(ts) < {CUPED_SPLIT_MS}
                  THEN CAST(floor(value) AS BIGINT) ELSE 0 END) AS BIGINT) AS x,
         CAST(SUM(CASE WHEN epoch_ms(ts) >= {CUPED_SPLIT_MS}
                  THEN CAST(floor(value) AS BIGINT) ELSE 0 END) AS BIGINT) AS y
  FROM events GROUP BY 1
), g AS (
  SELECT COUNT(*) AS g_n,
         CAST(SUM(x) AS BIGINT) AS gsum_x,
         CAST(SUM(y) AS BIGINT) AS gsum_y,
         CAST(SUM(x * x) AS BIGINT) AS gsum_xx,
         CAST(SUM(x * y) AS BIGINT) AS gsum_xy
  FROM pu
), v AS (
  SELECT ((({h}) % 2) + 2) % 2 AS variant,
         COUNT(*) AS n_users,
         CAST(SUM(x) AS BIGINT) AS sum_x,
         CAST(SUM(y) AS BIGINT) AS sum_y
  FROM pu GROUP BY 1
)
SELECT variant, n_users, sum_x, sum_y,
       {", ".join(_CUPED_COLS)}
FROM v, g
"""


SPECS += [
    QuerySpec("q_cuped_adjustment", q_cuped_adjustment, _cuped_oracle(),
              "CUPED pre-period covariate adjustment, exact moments + shared IEEE exprs",
              ("analytics", "experiment")),
]


# --- FIFO lot allocation --------------------------------------------------------
# FIFO inventory matching as a cumulative-interval overlap join — the
# set-based form of the row-at-a-time "walk lots until demand is filled"
# loop (which cannot distribute). Receipts (l_returnflag = 'N') and
# issues ('R'/'A') per part each get a cumulative-quantity interval
# [lo, hi) via a per-part running sum ordered by (shipdate, orderkey,
# linenumber); an issue consumes exactly the lots whose interval
# overlaps its own, and the allocated quantity is the interval
# intersection length. Shapes: two partitioned window sums + one
# part-keyed equi-join with a range post-filter (per-part lot counts are
# small, so the join fan-out is bounded); everything downstream is one
# rollup. At 100 TB the join stays keyed on l_partkey — no global sort,
# no driver loop, skewed hot parts split by AQE.

_FIFO_ORD = "l_shipdate, l_orderkey, l_linenumber"


def q_fifo_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").selectExpr(
        "l_partkey AS pk", "CAST(l_quantity AS BIGINT) AS qty",
        "l_returnflag", "l_shipdate", "l_orderkey", "l_linenumber")

    def cum(df: DataFrame) -> DataFrame:
        w = (
            Window.partitionBy("pk")
            .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        return df.withColumn(
            "lo", F.coalesce(F.sum("qty").over(w), F.lit(0))
        ).selectExpr("pk", "lo", "lo + qty AS hi")

    sup = cum(li.where("l_returnflag = 'N'"))
    dem = cum(li.where("l_returnflag IN ('R', 'A')"))
    d = dem.selectExpr("pk", "lo AS d_lo", "hi AS d_hi")
    pairs = sup.join(
        d,
        (sup.pk == d.pk) & (sup.lo < d.d_hi) & (d.d_lo < sup.hi),
    ).select(
        sup.pk.alias("pk"),
        F.expr("least(hi, d_hi) - greatest(lo, d_lo)").alias("alloc"),
    )
    totals = (
        li.groupBy("pk")
        .agg(
            F.sum(F.expr("CASE WHEN l_returnflag = 'N' THEN qty ELSE 0 END"))
            .alias("supply_qty"),
            F.sum(F.expr("CASE WHEN l_returnflag IN ('R', 'A') THEN qty ELSE 0 END"))
            .alias("demand_qty"),
        )
    )
    return (
        pairs.groupBy("pk")
        .agg(F.count("*").alias("n_allocations"),
             F.sum("alloc").alias("qty_allocated"))
        .join(totals, "pk")
        .selectExpr(
            "pk AS l_partkey", "n_allocations", "qty_allocated",
            "supply_qty", "demand_qty",
            "demand_qty - qty_allocated AS qty_unfilled",
            "supply_qty - qty_allocated AS qty_leftover",
        )
    )


Q_FIFO_ALLOCATION_ORACLE = f"""
WITH li AS (
  SELECT l_partkey AS pk, CAST(l_quantity AS BIGINT) AS qty,
         l_returnflag, l_shipdate, l_orderkey, l_linenumber
  FROM lineitem
), sup AS (
  SELECT pk, COALESCE(SUM(qty) OVER (PARTITION BY pk
           ORDER BY {_FIFO_ORD}
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS lo,
         COALESCE(SUM(qty) OVER (PARTITION BY pk
           ORDER BY {_FIFO_ORD}
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + qty AS hi
  FROM li WHERE l_returnflag = 'N'
), dem AS (
  SELECT pk, COALESCE(SUM(qty) OVER (PARTITION BY pk
           ORDER BY {_FIFO_ORD}
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS d_lo,
         COALESCE(SUM(qty) OVER (PARTITION BY pk
           ORDER BY {_FIFO_ORD}
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + qty AS d_hi
  FROM li WHERE l_returnflag IN ('R', 'A')
), pairs AS (
  SELECT s.pk, LEAST(s.hi, d.d_hi) - GREATEST(s.lo, d.d_lo) AS alloc
  FROM sup s JOIN dem d ON s.pk = d.pk AND s.lo < d.d_hi AND d.d_lo < s.hi
), totals AS (
  SELECT pk,
         CAST(SUM(CASE WHEN l_returnflag = 'N' THEN qty ELSE 0 END) AS BIGINT)
           AS supply_qty,
         CAST(SUM(CASE WHEN l_returnflag IN ('R', 'A') THEN qty ELSE 0 END)
           AS BIGINT) AS demand_qty
  FROM li GROUP BY 1
)
SELECT p.pk AS l_partkey, COUNT(*) AS n_allocations,
       CAST(SUM(p.alloc) AS BIGINT) AS qty_allocated,
       t.supply_qty, t.demand_qty,
       t.demand_qty - CAST(SUM(p.alloc) AS BIGINT) AS qty_unfilled,
       t.supply_qty - CAST(SUM(p.alloc) AS BIGINT) AS qty_leftover
FROM pairs p JOIN totals t ON t.pk = p.pk
GROUP BY p.pk, t.supply_qty, t.demand_qty
"""


SPECS += [
    QuerySpec("q_fifo_allocation", q_fifo_allocation, Q_FIFO_ALLOCATION_ORACLE,
              "FIFO lot matching via cumulative-interval overlap join",
              ("analytics", "relational", "interval")),
]


# --- ABC-XYZ inventory classification matrix -------------------------------------
# The planner's 2-D segmentation: ABC = cumulative revenue share (A: top
# 70%, B: next 20%, C: tail), XYZ = demand variability as the squared
# coefficient of variation of weekly order quantities (X steady, Y
# swinging, Z erratic). Everything integer: revenue in cents, the
# cumulative share threshold test multiplies through by the total
# (no division), and cv² in ppm is (n·Σq² − (Σq)²) · 1e6 div (Σq)².
# Shapes: two keyed rollups + one ordered prefix-sum over the part
# aggregate (|parts| rows — TakeOrdered-scale, not fact-scale) + a 9-cell
# matrix rollup.

XYZ_X_PPM = 100_000   # cv² <= 0.1 -> X
XYZ_Y_PPM = 400_000   # cv² <= 0.4 -> Y, else Z


def q_abc_xyz_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").selectExpr(
        "l_partkey AS pk",
        "CAST(round(l_extendedprice * 100) AS BIGINT) AS cents",
        "CAST(l_quantity AS BIGINT) AS qty",
        f"unix_millis(CAST(l_shipdate AS TIMESTAMP)) div {7 * 86_400_000}"
        " AS wk",
    )
    weekly = li.groupBy("pk", "wk").agg(F.sum("qty").alias("q"))
    var = (
        weekly.groupBy("pk")
        .agg(F.count("*").alias("n"), F.sum("q").alias("sq"),
             F.sum(F.expr("q * q")).alias("sqq"))
        .where("sq > 0")
        .selectExpr(
            "pk", "(n * sqq - sq * sq) * 1000000 div (sq * sq) AS cv2_ppm")
    )
    rev = li.groupBy("pk").agg(F.sum("cents").alias("cents"))
    total = rev.agg(F.sum("cents").alias("total"))
    wcum = Window.orderBy(F.desc("cents"), "pk").rowsBetween(
        Window.unboundedPreceding, 0)
    abc = (
        rev.withColumn("cum", F.sum("cents").over(wcum))
        .crossJoin(F.broadcast(total))
        .selectExpr(
            "pk", "cents",
            "CASE WHEN cum * 100 <= total * 70 THEN 'A'"
            " WHEN cum * 100 <= total * 90 THEN 'B' ELSE 'C' END AS abc")
    )
    cls = abc.join(var, "pk").selectExpr(
        "pk", "cents", "abc",
        f"CASE WHEN cv2_ppm <= {XYZ_X_PPM} THEN 'X'"
        f" WHEN cv2_ppm <= {XYZ_Y_PPM} THEN 'Y' ELSE 'Z' END AS xyz")
    return (
        cls.groupBy("abc", "xyz")
        .agg(F.count("*").alias("n_parts"), F.sum("cents").alias("revenue_cents"))
    )


Q_ABC_XYZ_ORACLE = f"""
WITH li AS (
  SELECT l_partkey AS pk,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
         CAST(l_quantity AS BIGINT) AS qty,
         epoch_ms(CAST(l_shipdate AS TIMESTAMP)) // {7 * 86_400_000} AS wk
  FROM lineitem
), weekly AS (
  SELECT pk, wk, CAST(SUM(qty) AS BIGINT) AS q FROM li GROUP BY 1, 2
), var AS (
  SELECT pk, (COUNT(*) * CAST(SUM(q * q) AS BIGINT)
              - CAST(SUM(q) AS BIGINT) * CAST(SUM(q) AS BIGINT)) * 1000000
             // (CAST(SUM(q) AS BIGINT) * CAST(SUM(q) AS BIGINT)) AS cv2_ppm
  FROM weekly GROUP BY 1 HAVING SUM(q) > 0
), rev AS (
  SELECT pk, CAST(SUM(cents) AS BIGINT) AS cents FROM li GROUP BY 1
), total AS (
  SELECT CAST(SUM(cents) AS BIGINT) AS total FROM rev
), abc AS (
  SELECT pk, cents,
         CASE WHEN CAST(SUM(cents) OVER (ORDER BY cents DESC, pk
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                * 100 <= total * 70 THEN 'A'
              WHEN CAST(SUM(cents) OVER (ORDER BY cents DESC, pk
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                * 100 <= total * 90 THEN 'B' ELSE 'C' END AS abc
  FROM rev CROSS JOIN total
), cls AS (
  SELECT a.pk, a.cents, a.abc,
         CASE WHEN v.cv2_ppm <= {XYZ_X_PPM} THEN 'X'
              WHEN v.cv2_ppm <= {XYZ_Y_PPM} THEN 'Y' ELSE 'Z' END AS xyz
  FROM abc a JOIN var v ON v.pk = a.pk
)
SELECT abc, xyz, COUNT(*) AS n_parts,
       CAST(SUM(cents) AS BIGINT) AS revenue_cents
FROM cls GROUP BY 1, 2
"""


SPECS += [
    QuerySpec("q_abc_xyz_matrix", q_abc_xyz_matrix, Q_ABC_XYZ_ORACLE,
              "ABC revenue x XYZ variability classification matrix",
              ("analytics", "inventory")),
]


# --- stratified matching uplift (coarsened exact matching) ------------------------
# The observational-causal counterpart of q_ab_readout / q_cuped_adjustment:
# estimate the "treatment" effect by COMPARING ONLY WITHIN STRATA of a
# pre-period covariate (coarsened exact matching with quintile bins of
# first-half activity), then weight strata by their treated counts (the
# ATT weighting). Strata where either arm is empty are reported but
# excluded from the estimate — exactly the common-support rule. All
# integer: per-stratum means in micros via exact cent/count sums; the
# pooled ATT re-derives from the per-stratum integers. Shapes: one
# keyed per-user rollup, quintile bounds from an ordered prefix over the
# |users| aggregate, and a 5-row stratum table.

CEM_BINS = 5


def q_uplift_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import portable_hash64

    ev = load_table(spark, sf_dir, "events").selectExpr(
        "user_id", "unix_millis(ts) AS ts_ms", "event_type",
        "CAST(round(value * 100) AS BIGINT) AS cents")
    mid = ev.agg(F.expr("(MIN(ts_ms) + MAX(ts_ms)) div 2 AS mid_ms"))
    per_user = (
        ev.crossJoin(F.broadcast(mid))
        .groupBy("user_id")
        .agg(
            F.sum(F.expr("CASE WHEN ts_ms < mid_ms THEN 1 ELSE 0 END"))
            .alias("pre_n"),
            F.sum(F.expr(
                "CASE WHEN ts_ms >= mid_ms AND event_type = 'purchase'"
                " THEN cents ELSE 0 END")).alias("post_cents"),
        )
        .withColumn("treated", F.pmod(
            portable_hash64(F.col("user_id").cast("string")), F.lit(2)))
    )
    n_users = per_user.agg(F.count("*").alias("nu"))
    wq = Window.orderBy("pre_n", "user_id")
    binned = (
        per_user.withColumn("rn", F.row_number().over(wq))
        .crossJoin(F.broadcast(n_users))
        .selectExpr(
            "user_id", "treated", "post_cents",
            f"least(CAST((rn - 1) * {CEM_BINS} div nu AS INT),"
            f" {CEM_BINS - 1}) AS stratum",
        )
    )
    return (
        binned.groupBy("stratum")
        .agg(
            F.sum(F.expr("CASE WHEN treated = 1 THEN 1 ELSE 0 END")).alias("t_n"),
            F.sum(F.expr("CASE WHEN treated = 0 THEN 1 ELSE 0 END")).alias("c_n"),
            F.sum(F.expr("CASE WHEN treated = 1 THEN post_cents ELSE 0 END"))
            .alias("t_cents"),
            F.sum(F.expr("CASE WHEN treated = 0 THEN post_cents ELSE 0 END"))
            .alias("c_cents"),
        )
        .selectExpr(
            "stratum", "t_n", "c_n",
            "CASE WHEN t_n > 0 AND c_n > 0 THEN"
            " (t_cents * c_n - c_cents * t_n) * 1000000 div (t_n * c_n)"
            " ELSE NULL END AS uplift_micro_cents",
            "CAST(t_n > 0 AND c_n > 0 AS INT) AS on_support",
        )
    )


from ..functions.hashing import portable_hash64_sql  # noqa: E402

Q_UPLIFT_MATCHING_ORACLE = f"""
WITH ev AS (
  SELECT user_id, epoch_ms(ts) AS ts_ms, event_type,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
), mid AS (
  SELECT (MIN(ts_ms) + MAX(ts_ms)) // 2 AS mid_ms FROM ev
), per_user AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN ts_ms < mid_ms THEN 1 ELSE 0 END) AS BIGINT)
           AS pre_n,
         CAST(SUM(CASE WHEN ts_ms >= mid_ms AND event_type = 'purchase'
                  THEN cents ELSE 0 END) AS BIGINT) AS post_cents,
         ({portable_hash64_sql("CAST(user_id AS VARCHAR)")}) % 2 AS treated
  FROM ev CROSS JOIN mid GROUP BY user_id
), n_users AS (
  SELECT COUNT(*) AS nu FROM per_user
), binned AS (
  SELECT user_id, treated, post_cents,
         least(CAST((row_number() OVER (ORDER BY pre_n, user_id) - 1)
                    * {CEM_BINS} // nu AS INT), {CEM_BINS - 1}) AS stratum
  FROM per_user CROSS JOIN n_users
), agg AS (
  SELECT stratum,
         CAST(SUM(CASE WHEN treated = 1 THEN 1 ELSE 0 END) AS BIGINT) AS t_n,
         CAST(SUM(CASE WHEN treated = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c_n,
         CAST(SUM(CASE WHEN treated = 1 THEN post_cents ELSE 0 END) AS BIGINT)
           AS t_cents,
         CAST(SUM(CASE WHEN treated = 0 THEN post_cents ELSE 0 END) AS BIGINT)
           AS c_cents
  FROM binned GROUP BY 1
)
SELECT stratum, t_n, c_n,
       CASE WHEN t_n > 0 AND c_n > 0 THEN
         (t_cents * c_n - c_cents * t_n) * 1000000 // (t_n * c_n)
       ELSE NULL END AS uplift_micro_cents,
       CAST(t_n > 0 AND c_n > 0 AS INT) AS on_support
FROM agg
"""


SPECS += [
    QuerySpec("q_uplift_matching", q_uplift_matching, Q_UPLIFT_MATCHING_ORACLE,
              "coarsened-exact-matching uplift by pre-period strata",
              ("analytics", "causal")),
]


# --- sequential pattern mining: brand -> brand order transitions -------------------
# The ORDERED counterpart of q_copurchase_lift (same basket) and
# q_event_transitions (event types): which brand do customers buy NEXT?
# Each order is reduced to its dominant brand (max revenue, brand-name
# tie-break), consecutive orders per customer form transitions via one
# keyed lag, and each transition's lift against the independence
# baseline n·c(a→b) / (c(a→*)·c(*→b)) is exact integer ppm. Top-20 by
# support via orderBy+limit (TakeOrderedAndProject). Shapes: argmax per
# order (one rollup + window over per-order brand groups), per-customer
# lag (keyed window), one transition rollup — every step keyed, nothing
# quadratic.

SEQ_TOP = 20


def q_brand_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").selectExpr(
        "l_orderkey", "l_partkey",
        "CAST(round(l_extendedprice * 100) AS BIGINT) AS cents")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    ob = (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_orderkey", "p_brand")
        .agg(F.sum("cents").alias("cents"))
    )
    wdom = Window.partitionBy("l_orderkey").orderBy(
        F.desc("cents"), "p_brand")
    dom = (
        ob.withColumn("r", F.row_number().over(wdom))
        .where("r = 1")
        .selectExpr("l_orderkey", "p_brand AS brand")
    )
    orders = load_table(spark, sf_dir, "orders").selectExpr(
        "o_orderkey", "o_custkey", "unix_millis(CAST(o_orderdate AS TIMESTAMP)) AS od_ms")
    seq = dom.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
    wlag = Window.partitionBy("o_custkey").orderBy("od_ms", "o_orderkey")
    # trans fans out 4 ways (tot, ma, mb, and the final join base), each
    # re-planning the fact join + two windows; it is brand x brand rows,
    # so pin it (r10, guide §2.4; same-JVM alternating A/B at sf0.1:
    # 2.75/2.79/2.59/2.33 -> 2.27/2.59/2.17/2.19, every pair).
    trans = (
        seq.withColumn("next_brand", F.lead("brand").over(wlag))
        .where("next_brand IS NOT NULL")
        .groupBy(F.col("brand").alias("b1"),
                 F.col("next_brand").alias("b2"))
        .agg(F.count("*").alias("support"))
    ).localCheckpoint(eager=True)
    tot = trans.agg(F.sum("support").alias("n"))
    ma = trans.groupBy("b1").agg(F.sum("support").alias("ca"))
    mb = trans.groupBy("b2").agg(F.sum("support").alias("cb"))
    return (
        trans.join(F.broadcast(ma), "b1").join(F.broadcast(mb), "b2")
        .crossJoin(F.broadcast(tot))
        .selectExpr("b1", "b2", "support",
                    "n * support * 1000000 div (ca * cb) AS lift_ppm")
        .orderBy(F.desc("support"), "b1", "b2")
        .limit(SEQ_TOP)
    )


Q_BRAND_SEQUENCE_ORACLE = f"""
WITH li AS (
  SELECT l_orderkey, l_partkey,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem
), ob AS (
  SELECT l_orderkey, p_brand, CAST(SUM(cents) AS BIGINT) AS cents
  FROM li JOIN part ON l_partkey = p_partkey
  GROUP BY 1, 2
), dom AS (
  SELECT l_orderkey, p_brand AS brand FROM (
    SELECT l_orderkey, p_brand,
           row_number() OVER (PARTITION BY l_orderkey
                              ORDER BY cents DESC, p_brand) AS r
    FROM ob) WHERE r = 1
), seq AS (
  SELECT o.o_custkey, epoch_ms(CAST(o.o_orderdate AS TIMESTAMP)) AS od_ms,
         o.o_orderkey, d.brand
  FROM dom d JOIN orders o ON d.l_orderkey = o.o_orderkey
), trans AS (
  SELECT brand AS b1,
         lead(brand) OVER (PARTITION BY o_custkey
                           ORDER BY od_ms, o_orderkey) AS b2
  FROM seq
), t AS (
  SELECT b1, b2, COUNT(*) AS support FROM trans
  WHERE b2 IS NOT NULL GROUP BY 1, 2
), tot AS (
  SELECT CAST(SUM(support) AS BIGINT) AS n FROM t
), ma AS (
  SELECT b1, CAST(SUM(support) AS BIGINT) AS ca FROM t GROUP BY 1
), mb AS (
  SELECT b2, CAST(SUM(support) AS BIGINT) AS cb FROM t GROUP BY 1
)
SELECT t.b1, t.b2, t.support,
       n * t.support * 1000000 // (ca * cb) AS lift_ppm
FROM t JOIN ma USING (b1) JOIN mb USING (b2) CROSS JOIN tot
ORDER BY t.support DESC, t.b1, t.b2 LIMIT {SEQ_TOP}
"""


SPECS += [
    QuerySpec("q_brand_sequence", q_brand_sequence, Q_BRAND_SEQUENCE_ORACLE,
              "next-brand sequential transitions with independence lift",
              ("analytics", "basket", "sequence")),
]
