"""TPC-H completions over a DERIVED partsupp catalog (Q2/Q9/Q11/Q16/Q20).

The driver's star schema omits ``partsupp``, which blocks the five TPC-H
queries whose plan shapes have no substitute elsewhere in the corpus:
Q2 (correlated per-group min over a catalog), Q9 (fact x catalog composite-
key join feeding a profit measure), Q11 (group share vs a global scalar),
Q16 (anti-join + multi-column COUNT DISTINCT), Q20 (nested semi-join chain
gated by an aggregate threshold).

partsupp is reconstructed from the fact table itself: in dbgen, lineitem
draws its (partkey, suppkey) pairs FROM partsupp, so here the catalog is
the set of DISTINCT observed pairs — which makes every fact-to-catalog
join self-consistent by construction. The two attribute columns
(``ps_availqty``, ``ps_supplycost_c``, cost in integer cents) are
deterministic integer functions of the key pair, computed with identical
arithmetic on both engines, so every downstream aggregate hash-matches
exactly.

Scale shape: the derived catalog is ~|distinct pairs| (order of the part
count x 4 in dbgen terms, far below lineitem), built by one map-side-
combinable DISTINCT. Q9's composite-key join is the one genuine fact-fact
shuffle, exactly as it would be against a real partsupp at 100 TB; every
dimension path broadcasts.

Reference anchor: the reference engine has no relational surface at all
(SURVEY.md §2.4 — its aggregates are sum/min/max/count reduces, e.g.
src/main/java/com/flinklearn/realtime/chapter2/KeyedStreamOperations.java);
this module exists for engine-parity with the classic warehouse workload,
per the round-1 plan of carrying TPC-H end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..registry import QuerySpec
from ..sources.tables import load_table

SPECS: list[QuerySpec] = []


# --- the derived catalog -----------------------------------------------------

# Attribute recipes (pure positive-integer arithmetic, BIGINT on both
# engines): availability 1..9999, supply cost $100.00..$999.99 in cents.
_PS_AVAILQTY = "(ps_partkey * 31 + ps_suppkey * 17) % 9999 + 1"
_PS_COST_C = "(ps_partkey * 7919 + ps_suppkey * 104729) % 90000 + 10000"


def derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reconstructed catalog: one row per observed (part, supplier) pair."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.select(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .distinct()
        .selectExpr(
            "ps_partkey",
            "ps_suppkey",
            f"{_PS_AVAILQTY} AS ps_availqty",
            f"{_PS_COST_C} AS ps_supplycost_c",
        )
    )


PARTSUPP_SQL = f"""
  SELECT ps_partkey, ps_suppkey,
         {_PS_AVAILQTY} AS ps_availqty,
         {_PS_COST_C} AS ps_supplycost_c
  FROM (SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
        FROM lineitem)
"""


# --- Q2: minimum-cost supplier (correlated min over the catalog) -------------
# The classic "supplier who can supply this part cheapest in this region"
# lookup. Spark shape: the region-restricted catalog is built once (all
# dimension joins broadcast), qualifying parts semi-restrict it, and the
# correlated scalar subquery becomes a per-part window MIN — one shuffle
# on ps_partkey, no join-back. Ties at the minimum are all kept, exactly
# like the classic = (SELECT MIN ...) form.

Q2_REGION = "EUROPE"
Q2_TYPE = "LARGE"
Q2_SIZE_LO, Q2_SIZE_HI = 10, 14


def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = derived_partsupp(spark, sf_dir)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == Q2_REGION)
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_type") == Q2_TYPE)
        & F.col("p_size").between(Q2_SIZE_LO, Q2_SIZE_HI)
    )
    regional = (
        ps.join(F.broadcast(s), ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    qual = regional.join(
        F.broadcast(p), F.col("ps_partkey") == F.col("p_partkey")
    )
    w = Window.partitionBy("ps_partkey")
    return (
        qual.withColumn("min_cost_c", F.min("ps_supplycost_c").over(w))
        .where(F.col("ps_supplycost_c") == F.col("min_cost_c"))
        .select(
            "s_acctbal", "s_name", "n_name",
            F.col("ps_partkey").alias("p_partkey"),
            "p_brand", "p_type", "ps_supplycost_c",
        )
    )


TPCH_Q2_ORACLE = f"""
WITH partsupp AS ({PARTSUPP_SQL}),
regional AS (
  SELECT ps_partkey, ps_supplycost_c, s_name, s_acctbal, n_name
  FROM partsupp
  JOIN supplier ON ps_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = '{Q2_REGION}'
)
SELECT s_acctbal, s_name, n_name, ps_partkey AS p_partkey,
       p_brand, p_type, ps_supplycost_c
FROM regional JOIN part ON ps_partkey = p_partkey
WHERE p_type = '{Q2_TYPE}' AND p_size BETWEEN {Q2_SIZE_LO} AND {Q2_SIZE_HI}
  AND ps_supplycost_c = (SELECT MIN(r2.ps_supplycost_c) FROM regional r2
                         WHERE r2.ps_partkey = regional.ps_partkey)
"""


# --- Q9: product-type profit by nation and year ------------------------------
# The profit measure needs the catalog's supply cost per (part, supplier)
# — the one join in TPC-H keyed on the composite fact key. All per-row
# arithmetic stays in 64-bit integer "hundredths of a cent" units
# (price_c·(100−disc_c) ≤ 1e9, 100·cost_c·qty ≤ 1e9 — long codegen, no
# Decimal128 per row); accumulation widens to DECIMAL(28,0), and the
# single post-agg conversion is integer→double (exact below 2^53, i.e.
# through sf well beyond the bench) followed by one correctly-rounded
# division — bit-identical on both engines.

Q9_NAME_PAT = "%widget%"


def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = derived_partsupp(spark, sf_dir)
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    p = load_table(spark, sf_dir, "part").where(
        F.col("p_name").like(Q9_NAME_PAT)
    )
    cents = load_table(spark, sf_dir, "lineitem").selectExpr(
        "l_orderkey", "l_partkey", "l_suppkey",
        "CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c",
        "CAST(round(l_discount * 100) AS BIGINT) AS disc_c",
        "CAST(round(l_quantity) AS BIGINT) AS qty",
    )
    amount = F.expr(
        "CAST(price_c * (100 - disc_c) - 100 * ps_supplycost_c * qty"
        " AS DECIMAL(28,0))"
    )
    j = (
        cents.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            ps,
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        )
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
    )
    return (
        j.groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.sum(amount).alias("s_amt"))
        .selectExpr(
            "nation", "o_year",
            "CAST(s_amt AS DOUBLE) / 10000 AS sum_profit",
        )
    )


TPCH_Q9_ORACLE = f"""
WITH partsupp AS ({PARTSUPP_SQL}),
cents AS (
  SELECT l_orderkey, l_partkey, l_suppkey,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
         CAST(round(l_discount * 100) AS BIGINT) AS disc_c,
         CAST(round(l_quantity) AS BIGINT) AS qty
  FROM lineitem
)
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(price_c * (100 - disc_c) - 100 * ps_supplycost_c * qty)
            AS DOUBLE) / 10000 AS sum_profit
FROM cents
JOIN part ON l_partkey = p_partkey AND p_name LIKE '{Q9_NAME_PAT}'
JOIN partsupp ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1, 2
"""


# --- Q11: important stock (group share vs a global scalar) -------------------
# Per-part stock value within one region, kept when it exceeds twice the
# MEAN part value. (Classic Q11 scopes to one nation; the driver's tiny-sf
# supplier table has sparse nationkeys, so the region scope keeps the
# query non-degenerate at every scale.) The classic query's share cutoff is fraction/SF —
# i.e. proportional to 1/|parts| — so the scale-free form compares each
# part to the mean directly: value·n_parts > 2·total, exact integers
# (a fixed fraction of the total goes degenerate as the catalog grows).
# The global (total, count) is a 1-row aggregate broadcast back over the
# per-part rollup (the corpus's standard scalar-subquery shape,
# allowlisted in the plan-hygiene suite).

Q11_REGION = "ASIA"
Q11_MEAN_MULT = 2


def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = derived_partsupp(spark, sf_dir)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(
        F.col("r_name") == Q11_REGION
    )
    national = (
        ps.join(F.broadcast(s), ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("ps_partkey",
                F.expr("ps_supplycost_c * ps_availqty").alias("v_c"))
    )
    per_part = national.groupBy("ps_partkey").agg(
        F.sum("v_c").alias("value_c")
    )
    totals = per_part.agg(
        F.sum("value_c").alias("total_c"),
        F.count("*").alias("n_parts"),
    )
    return (
        per_part.crossJoin(F.broadcast(totals))
        .where(F.col("value_c") * F.col("n_parts")
               > Q11_MEAN_MULT * F.col("total_c"))
        .select("ps_partkey", "value_c")
    )


TPCH_Q11_ORACLE = f"""
WITH partsupp AS ({PARTSUPP_SQL}),
national AS (
  SELECT ps_partkey, ps_supplycost_c * ps_availqty AS v_c
  FROM partsupp
  JOIN supplier ON ps_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = '{Q11_REGION}'
),
per_part AS (
  SELECT ps_partkey, CAST(SUM(v_c) AS BIGINT) AS value_c
  FROM national GROUP BY 1
),
totals AS (
  SELECT CAST(SUM(value_c) AS BIGINT) AS total_c,
         COUNT(*) AS n_parts
  FROM per_part
)
SELECT ps_partkey, value_c
FROM per_part, totals
WHERE value_c * n_parts > {Q11_MEAN_MULT} * total_c
"""


# --- Q16: parts/supplier relationship (anti-join + COUNT DISTINCT) -----------
# How many distinct suppliers can provide each qualifying (brand, type,
# size) bucket, excluding a flagged supplier set. The classic flag is a
# comment LIKE '%Customer%Complaints%' (no comment column here) — the
# stand-in is a deterministic key rule, same anti-join plan shape: the
# flagged set broadcasts, the catalog never shuffles for it; the only
# shuffle is the COUNT DISTINCT's two-phase aggregate.

Q16_EXCL_BRAND = "Brand#13"
Q16_EXCL_TYPE = "PROMO"
Q16_SIZES = (1, 9, 14, 19, 23, 36, 45, 49)


def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = derived_partsupp(spark, sf_dir)
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != Q16_EXCL_BRAND)
        & (F.col("p_type") != Q16_EXCL_TYPE)
        & F.col("p_size").isin(*Q16_SIZES)
    )
    flagged = (
        load_table(spark, sf_dir, "supplier")
        .where("s_suppkey % 10 = 3")
        .select("s_suppkey")
    )
    return (
        ps.join(F.broadcast(p), F.col("ps_partkey") == F.col("p_partkey"))
        .join(F.broadcast(flagged),
              F.col("ps_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
    )


TPCH_Q16_ORACLE = f"""
WITH partsupp AS ({PARTSUPP_SQL})
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT ps_suppkey) AS supplier_cnt
FROM partsupp JOIN part ON ps_partkey = p_partkey
WHERE p_brand <> '{Q16_EXCL_BRAND}' AND p_type <> '{Q16_EXCL_TYPE}'
  AND p_size IN {Q16_SIZES}
  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier
                         WHERE s_suppkey % 10 = 3)
GROUP BY 1, 2, 3
"""


# --- Q20: potential part promotion (nested semi-join chain) ------------------
# Suppliers in one nation holding excess stock (availqty > half the 1997
# shipped quantity) of name-qualified parts. Plan: the year's shipped
# quantity rolls up per composite key FIRST (map-side combinable), the
# catalog joins it and the broadcast part filter, the surviving supplier
# keys DISTINCT down to driver scale, and the supplier dimension is
# semi-joined last — the fact table is touched exactly once. The excess-
# stock predicate is exact integers (2·availqty > qty). With availqty
# uniform in 1..9999 and one supplier-year's shipped quantity rarely
# above 100, most stocked pairs qualify — the discriminating filters are
# the part-name pattern and the nation, as in the classic query.

Q20_NATION = "NATION_5"
Q20_NAME_PAT = "small%"
Q20_YEAR_LO, Q20_YEAR_HI = "1997-01-01", "1998-01-01"


def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = derived_partsupp(spark, sf_dir)
    p = load_table(spark, sf_dir, "part").where(
        F.col("p_name").like(Q20_NAME_PAT)
    ).select("p_partkey")
    qty = (
        load_table(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= F.lit(Q20_YEAR_LO))
            & (F.col("l_shipdate") < F.lit(Q20_YEAR_HI))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.expr("CAST(round(l_quantity) AS BIGINT)")).alias("q"))
    )
    cand = (
        ps.join(F.broadcast(p), F.col("ps_partkey") == F.col("p_partkey"))
        .join(
            qty,
            (F.col("ps_partkey") == F.col("l_partkey"))
            & (F.col("ps_suppkey") == F.col("l_suppkey")),
        )
        .where(F.col("ps_availqty") * 2 > F.col("q"))
        .select("ps_suppkey")
        .distinct()
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").where(
        F.col("n_name") == Q20_NATION
    )
    return (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(cand, F.col("s_suppkey") == F.col("ps_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", "n_name")
    )


TPCH_Q20_ORACLE = f"""
WITH partsupp AS ({PARTSUPP_SQL}),
qty AS (
  SELECT l_partkey, l_suppkey,
         CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS q
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{Q20_YEAR_LO}'
    AND l_shipdate < TIMESTAMP '{Q20_YEAR_HI}'
  GROUP BY 1, 2
),
cand AS (
  SELECT DISTINCT ps_suppkey
  FROM partsupp
  JOIN part ON ps_partkey = p_partkey AND p_name LIKE '{Q20_NAME_PAT}'
  JOIN qty ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
  WHERE ps_availqty * 2 > q
)
SELECT s_suppkey, s_name, n_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = '{Q20_NATION}'
  AND s_suppkey IN (SELECT ps_suppkey FROM cand)
"""


SPECS += [
    QuerySpec("tpch_q2_min_cost_supplier", tpch_q2, TPCH_Q2_ORACLE,
              "correlated per-part min over the derived catalog, all ties kept",
              ("relational", "tpch", "partsupp")),
    QuerySpec("tpch_q9_product_profit", tpch_q9, TPCH_Q9_ORACLE,
              "profit by nation x year via the composite-key catalog join",
              ("relational", "tpch", "partsupp")),
    QuerySpec("tpch_q11_important_stock", tpch_q11, TPCH_Q11_ORACLE,
              "per-part stock value above a fraction of the national total",
              ("relational", "tpch", "partsupp")),
    QuerySpec("tpch_q16_supplier_part_counts", tpch_q16, TPCH_Q16_ORACLE,
              "anti-join flagged suppliers, COUNT DISTINCT per part bucket",
              ("relational", "tpch", "partsupp")),
    QuerySpec("tpch_q20_promotion_candidates", tpch_q20, TPCH_Q20_ORACLE,
              "excess-stock suppliers via nested semi-join chain",
              ("relational", "tpch", "partsupp")),
]
