"""One-pass table profiling — the data-quality snapshot a pipeline runs
before training on a new corpus drop (driver-mandated LLM-pipeline
extension; no reference file:line).

Per column: null count, exact distinct count, numeric min/max — computed
in ONE aggregate over ONE scan. Spark plans the multi-column
COUNT(DISTINCT) via a single Expand (rows × #profiled columns) feeding one
partial+final aggregate, so the table is read once no matter how many
columns are profiled; the wide one-row result is then unpivoted with
``stack``. At 100 TB the same plan holds — Expand cost scales linearly
with profiled-column count, and the exact distincts can be swapped for
``approx_count_distinct`` (HLL, no Expand) when ±2% is acceptable; that
approximate variant lives in operators/sketches.py.

Timestamps are profiled as epoch-millis (exact in a double up to 2^53);
string columns get NULL min/max (collation-portable numerics only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..registry import QuerySpec
from ..sources.tables import load_table

# (column, spark numeric-projection expr, duckdb numeric-projection expr)
_EVENT_COLS = [
    ("event_id", "CAST(event_id AS DOUBLE)", "CAST(event_id AS DOUBLE)"),
    ("ts", "CAST(unix_millis(ts) AS DOUBLE)", "CAST(epoch_ms(ts) AS DOUBLE)"),
    ("user_id", "CAST(user_id AS DOUBLE)", "CAST(user_id AS DOUBLE)"),
    ("event_type", None, None),
    ("value", "value", "value"),
    ("props", None, None),
]


def profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    aggs = [F.count("*").alias("n_rows")]
    for c, num_s, _ in _EVENT_COLS:
        aggs.append(F.count_if(F.col(c).isNull()).alias(f"nn_{c}"))
        aggs.append(F.countDistinct(c).alias(f"nd_{c}"))
        if num_s:
            aggs.append(F.min(F.expr(num_s)).alias(f"mn_{c}"))
            aggs.append(F.max(F.expr(num_s)).alias(f"mx_{c}"))
    row = e.agg(*aggs)
    cells = ", ".join(
        f"'{c}', nn_{c}, nd_{c}, "
        + (f"mn_{c}, mx_{c}" if num_s else "CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)")
        for c, num_s, _ in _EVENT_COLS
    )
    return row.selectExpr(
        "n_rows",
        f"stack({len(_EVENT_COLS)}, {cells}) AS (column, n_nulls, n_distinct, min_num, max_num)",
    ).select("column", "n_rows", "n_nulls", "n_distinct", "min_num", "max_num")


PROFILE_EVENTS_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS column, COUNT(*) AS n_rows,
       COUNT(*) - COUNT({c}) AS n_nulls,
       COUNT(DISTINCT {c}) AS n_distinct,
       {f"MIN({num_d})" if num_d else "CAST(NULL AS DOUBLE)"} AS min_num,
       {f"MAX({num_d})" if num_d else "CAST(NULL AS DOUBLE)"} AS max_num
FROM events"""
    for c, _, num_d in _EVENT_COLS
)


SPECS = [
    QuerySpec("profile_events", profile_events, PROFILE_EVENTS_ORACLE,
              "one-pass per-column profile: nulls, exact distincts, min/max",
              ("profiling", "quality")),
]


# --- referential-integrity audit --------------------------------------------
# The other pre-training data-quality gate: count FK orphans for every
# edge of the star schema in one declarative plan (4 left joins against
# deduped key projections, one union of one-row aggregates — no driver
# .count() actions). Each join carries only the key column (pruned scan);
# Catalyst/AQE picks broadcast for dims that fit and shuffle-hash
# otherwise, which is exactly the right behavior at 100 TB where
# `orders` as a parent is NOT broadcastable — nothing in the plan
# assumes it is.


def _fk_check(name, child: DataFrame, key: str, parent: DataFrame,
              pkey: str) -> DataFrame:
    pk = parent.select(F.col(pkey).alias(key)).distinct()
    joined = child.select(key).join(pk.withColumn("__hit", F.lit(1)), key, "left")
    return joined.agg(
        F.lit(name).alias("fk"),
        F.count("*").alias("n_rows"),
        F.sum(F.when(F.col("__hit").isNull(), 1).otherwise(0)).alias("n_orphans"),
    )


def q_fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per FK edge: child row count and orphan count (child rows
    whose key has no match in the parent table)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cust = load_table(spark, sf_dir, "customer")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    return (
        _fk_check("orders.o_custkey->customer", orders, "o_custkey", cust, "c_custkey")
        .unionByName(_fk_check("lineitem.l_orderkey->orders", li, "l_orderkey",
                               orders, "o_orderkey"))
        .unionByName(_fk_check("lineitem.l_partkey->part", li, "l_partkey",
                               part, "p_partkey"))
        .unionByName(_fk_check("lineitem.l_suppkey->supplier", li, "l_suppkey",
                               supp, "s_suppkey"))
    )


Q_FK_AUDIT_ORACLE = """
SELECT 'orders.o_custkey->customer' AS fk, COUNT(*) AS n_rows,
       COUNT(*) FILTER (WHERE NOT EXISTS (
           SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) AS n_orphans
FROM orders o
UNION ALL
SELECT 'lineitem.l_orderkey->orders', COUNT(*),
       COUNT(*) FILTER (WHERE NOT EXISTS (
           SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
FROM lineitem l
UNION ALL
SELECT 'lineitem.l_partkey->part', COUNT(*),
       COUNT(*) FILTER (WHERE NOT EXISTS (
           SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
FROM lineitem l
UNION ALL
SELECT 'lineitem.l_suppkey->supplier', COUNT(*),
       COUNT(*) FILTER (WHERE NOT EXISTS (
           SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey))
FROM lineitem l
"""


SPECS += [
    QuerySpec("q_fk_integrity_audit", q_fk_integrity_audit, Q_FK_AUDIT_ORACLE,
              "FK orphan counts for every star-schema edge, one declarative plan",
              ("profile", "quality")),
]


# --- declarative expectation suite -------------------------------------------
# The "assert before you train/serve" contract check (Great-Expectations
# shape, distilled): every rule is a conditional count in ONE aggregate
# over ONE scan — adding a rule adds a column to the partial aggregate,
# not a pass over the table — then `stack` unpivots the one-row result
# into (rule, n_violations, n_checked). The single FK rule is a separate
# broadcast-dim anti-join count (the full star-schema audit is
# q_fk_integrity_audit). All-zero violations IS the expected steady
# state; the value is the plan shape and the wiring.

def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    one = o.agg(
        F.count("*").alias("n"),
        F.sum(F.expr("CAST(o_totalprice <= 0 AS BIGINT)")).alias("v_price"),
        F.sum(F.expr(
            "CAST(o_orderstatus NOT IN ('O', 'F', 'P') AS BIGINT)")).alias("v_status"),
        F.sum(F.expr(
            "CAST(o_orderpriority NOT IN ('1-URGENT', '2-HIGH', '3-MEDIUM',"
            " '4-NOT SPECIFIED', '5-LOW') AS BIGINT)")).alias("v_prio"),
        F.sum(F.expr(
            "CAST(o_orderdate < TIMESTAMP '1992-01-01 00:00:00'"
            " OR o_orderdate >= TIMESTAMP '2005-01-01 00:00:00' AS BIGINT)"
        )).alias("v_date"),
        F.sum(F.expr("CAST(o_custkey IS NULL AS BIGINT)")).alias("v_nullkey"),
    )
    rules = one.selectExpr(
        "stack(5,"
        " 'totalprice_positive', v_price,"
        " 'status_in_domain', v_status,"
        " 'priority_in_domain', v_prio,"
        " 'orderdate_in_range', v_date,"
        " 'custkey_not_null', v_nullkey) AS (rule, n_violations)",
        "n AS n_checked",
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    fk = (
        o.join(F.broadcast(cust), o.o_custkey == cust.c_custkey, "left_anti")
        .agg(F.count("*").alias("n_violations"))
        .crossJoin(F.broadcast(o.agg(F.count("*").alias("n_checked"))))
        .selectExpr("'custkey_fk_exists' AS rule", "n_violations", "n_checked")
    )
    return rules.unionByName(fk)


DQ_EXPECTATIONS_ORACLE = """
WITH n AS (SELECT COUNT(*) AS n FROM orders)
SELECT 'totalprice_positive' AS rule,
       CAST(COUNT(*) FILTER (WHERE o_totalprice <= 0) AS BIGINT) AS n_violations,
       MAX(n.n) AS n_checked
FROM orders CROSS JOIN n
UNION ALL
SELECT 'status_in_domain',
       CAST(COUNT(*) FILTER (WHERE o_orderstatus NOT IN ('O', 'F', 'P')) AS BIGINT),
       MAX(n.n)
FROM orders CROSS JOIN n
UNION ALL
SELECT 'priority_in_domain',
       CAST(COUNT(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH',
            '3-MEDIUM', '4-NOT SPECIFIED', '5-LOW')) AS BIGINT),
       MAX(n.n)
FROM orders CROSS JOIN n
UNION ALL
SELECT 'orderdate_in_range',
       CAST(COUNT(*) FILTER (WHERE o_orderdate < TIMESTAMP '1992-01-01'
            OR o_orderdate >= TIMESTAMP '2005-01-01') AS BIGINT),
       MAX(n.n)
FROM orders CROSS JOIN n
UNION ALL
SELECT 'custkey_not_null',
       CAST(COUNT(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT),
       MAX(n.n)
FROM orders CROSS JOIN n
UNION ALL
SELECT 'custkey_fk_exists',
       CAST(COUNT(*) FILTER (WHERE NOT EXISTS (
           SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) AS BIGINT),
       MAX(n.n)
FROM orders o CROSS JOIN n
"""


SPECS += [
    QuerySpec("dq_expectations", dq_expectations, DQ_EXPECTATIONS_ORACLE,
              "one-scan declarative expectation suite with per-rule counts",
              ("profile", "quality")),
]


# --- functional-dependency audit ----------------------------------------------
# Schema-discovery profiling (the Metanome/Deequ FD check): for each
# candidate A -> B, does every A-group hold exactly one B? Violations are
# how denormalization drift, bad backfills, and broken natural keys
# surface in a lake. Each candidate is one groupBy(lhs) with a distinct
# count — map-side partial agg, one shuffle per FD on its own lhs key —
# then a one-row summary; candidates union into the audit table. At
# 100 TB you run exactly this shape, one pass per lhs (or share a pass
# per lhs via multiple countDistincts when lhs coincide).

def dq_functional_deps(spark: SparkSession, sf_dir: str) -> DataFrame:
    def fd(df: DataFrame, lhs: str, rhs: str) -> DataFrame:
        return (
            df.groupBy(lhs)
            .agg(F.countDistinct(rhs).alias("ndv"))
            .agg(
                F.count("*").alias("n_groups"),
                F.sum(F.expr("CASE WHEN ndv > 1 THEN 1 ELSE 0 END"))
                .cast("long").alias("n_violating_groups"),
                F.max("ndv").alias("max_rhs_distinct"),
            )
            .selectExpr(
                f"'{lhs}->{rhs}' AS fd", "n_groups", "n_violating_groups",
                "max_rhs_distinct",
            )
        )

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        fd(o, "o_orderkey", "o_custkey")          # true key FD: 0 violations
        .unionAll(fd(li, "l_orderkey", "l_returnflag"))   # drifts per line
        .unionAll(fd(li, "l_partkey", "l_extendedprice"))  # price varies w/ qty
        .unionAll(fd(o, "o_custkey", "o_orderpriority"))   # never functional
    )


DQ_FUNCTIONAL_DEPS_ORACLE = """
SELECT 'o_orderkey->o_custkey' AS fd, COUNT(*) AS n_groups,
       CAST(SUM(CASE WHEN ndv > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violating_groups,
       MAX(ndv) AS max_rhs_distinct
FROM (SELECT o_orderkey, COUNT(DISTINCT o_custkey) AS ndv
      FROM orders GROUP BY 1)
UNION ALL
SELECT 'l_orderkey->l_returnflag', COUNT(*),
       CAST(SUM(CASE WHEN ndv > 1 THEN 1 ELSE 0 END) AS BIGINT), MAX(ndv)
FROM (SELECT l_orderkey, COUNT(DISTINCT l_returnflag) AS ndv
      FROM lineitem GROUP BY 1)
UNION ALL
SELECT 'l_partkey->l_extendedprice', COUNT(*),
       CAST(SUM(CASE WHEN ndv > 1 THEN 1 ELSE 0 END) AS BIGINT), MAX(ndv)
FROM (SELECT l_partkey, COUNT(DISTINCT l_extendedprice) AS ndv
      FROM lineitem GROUP BY 1)
UNION ALL
SELECT 'o_custkey->o_orderpriority', COUNT(*),
       CAST(SUM(CASE WHEN ndv > 1 THEN 1 ELSE 0 END) AS BIGINT), MAX(ndv)
FROM (SELECT o_custkey, COUNT(DISTINCT o_orderpriority) AS ndv
      FROM orders GROUP BY 1)
"""


SPECS += [
    QuerySpec("dq_functional_deps", dq_functional_deps,
              DQ_FUNCTIONAL_DEPS_ORACLE,
              "FD discovery audit: violations per candidate A->B dependency",
              ("profile", "quality")),
]


# --- k-anonymity audit --------------------------------------------------------
# The privacy-governance twin of pipeline_user_erasure: before a table
# with quasi-identifiers ships to a training run, measure its
# k-anonymity — every (nation, mktsegment) equivalence class of size
# < K is a re-identification risk. Output: one row per risky class plus
# its size, and corpus-level counts (classes, risky classes, exposed
# individuals) repeated per row for the one-glance readout. One rollup
# shuffle on the quasi-identifier tuple; at 100 TB this is a plain
# map-side-combined groupBy.

KANON_K = 10


def dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        "c_nationkey", "c_mktsegment")
    classes = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count("*").alias("class_size"))
    totals = classes.agg(
        F.count("*").alias("n_classes"),
        F.sum(F.expr(f"CAST(class_size < {KANON_K} AS BIGINT)"))
        .alias("n_risky_classes"),
        F.sum(F.expr(f"CASE WHEN class_size < {KANON_K} THEN class_size "
                     "ELSE 0 END")).alias("n_exposed"),
    )
    return (
        classes.where(f"class_size < {KANON_K}")
        .crossJoin(F.broadcast(totals))
        .select("c_nationkey", "c_mktsegment", "class_size",
                "n_classes", "n_risky_classes", "n_exposed")
    )


DQ_K_ANONYMITY_ORACLE = f"""
WITH classes AS (
  SELECT c_nationkey, c_mktsegment, COUNT(*) AS class_size
  FROM customer GROUP BY 1, 2
), totals AS (
  SELECT COUNT(*) AS n_classes,
         CAST(SUM(CAST(class_size < {KANON_K} AS BIGINT)) AS BIGINT)
           AS n_risky_classes,
         CAST(SUM(CASE WHEN class_size < {KANON_K} THEN class_size
                  ELSE 0 END) AS BIGINT) AS n_exposed
  FROM classes
)
SELECT c_nationkey, c_mktsegment, class_size,
       n_classes, n_risky_classes, n_exposed
FROM classes, totals
WHERE class_size < {KANON_K}
"""


SPECS += [
    QuerySpec("dq_k_anonymity", dq_k_anonymity, DQ_K_ANONYMITY_ORACLE,
              "quasi-identifier equivalence-class k-anonymity audit",
              ("profile", "governance", "audit")),
]


# --- l-diversity audit (the release gate after k-anonymity) -----------------
# k-anonymity (above) only bounds CLASS SIZE; a class of 50 people who all
# share one salary band still leaks the sensitive value. Distinct
# l-diversity is the standard next gate: within every quasi-identifier
# class (nation × market segment), the sensitive attribute (account
# balance, bucketed to 5000-currency bands like a published salary band)
# must take at least L distinct values. Emit the risky classes with
# their diversity, the dominant band's share (homogeneity-attack
# exposure, exact ppm), and the corpus rollup broadcast onto each row —
# the same report shape as dq_k_anonymity so the two run as one suite.
#
# Scale: two keyed aggregations (class×band, then class) + a 1-row
# broadcast — no window, no skew risk beyond the natural QI classes.

LDIV_L = 3


def dq_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").selectExpr(
        "c_nationkey", "c_mktsegment",
        "CAST(floor(c_acctbal / 5000.0) AS BIGINT) AS band")
    per_band = cust.groupBy("c_nationkey", "c_mktsegment", "band").agg(
        F.count("*").alias("n"))
    classes = per_band.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count("*").alias("l_diversity"),
        F.sum("n").alias("class_size"),
        F.max("n").alias("dominant_n"),
    ).selectExpr(
        "c_nationkey", "c_mktsegment", "l_diversity", "class_size",
        "dominant_n * 1000000 div class_size AS dominant_ppm")
    totals = classes.agg(
        F.count("*").alias("n_classes"),
        F.sum(F.expr(f"CAST(l_diversity < {LDIV_L} AS BIGINT)"))
        .alias("n_risky_classes"),
    )
    return (
        classes.where(f"l_diversity < {LDIV_L}")
        .crossJoin(F.broadcast(totals))
        .select("c_nationkey", "c_mktsegment", "l_diversity", "class_size",
                "dominant_ppm", "n_classes", "n_risky_classes")
    )


DQ_L_DIVERSITY_ORACLE = f"""
WITH per_band AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(floor(c_acctbal / 5000.0) AS BIGINT) AS band, COUNT(*) AS n
  FROM customer GROUP BY 1, 2, 3
), classes AS (
  SELECT c_nationkey, c_mktsegment,
         COUNT(*) AS l_diversity,
         CAST(SUM(n) AS BIGINT) AS class_size,
         CAST(MAX(n) * 1000000 // SUM(n) AS BIGINT) AS dominant_ppm
  FROM per_band GROUP BY 1, 2
), totals AS (
  SELECT COUNT(*) AS n_classes,
         CAST(SUM(CAST(l_diversity < {LDIV_L} AS BIGINT)) AS BIGINT)
           AS n_risky_classes
  FROM classes
)
SELECT c_nationkey, c_mktsegment, l_diversity, class_size, dominant_ppm,
       n_classes, n_risky_classes
FROM classes, totals
WHERE l_diversity < {LDIV_L}
"""


SPECS += [
    QuerySpec("dq_l_diversity", dq_l_diversity, DQ_L_DIVERSITY_ORACLE,
              "distinct l-diversity of sensitive bands within QI classes",
              ("profile", "governance", "audit")),
]


# --- t-closeness ----------------------------------------------------------------
# The third leg of the re-identification trio (k-anonymity: class too
# small; l-diversity: class too uniform; t-CLOSENESS: class distribution
# too FAR from the population's, so membership itself leaks the sensitive
# attribute). Distance is the Earth Mover's Distance over the ordered
# acctbal bands — for ordered categories EMD(p, q) =
# sum_j |cum_p(j) - cum_q(j)| / (m - 1). Everything stays integer: the
# cumulative difference is scaled by class_size * N (both sums of
# counts), so t_ppm = 1e6 * sum|.| / (class_size * N * (m-1)) is exact
# integer division on both engines. Shapes: one grouped count, a
# broadcast band-spine completion (missing bands MUST contribute zero
# rows or the cumulative walk skips them), one per-class ordered window
# over <= m band rows — class-partitioned, never global.

TCLOSE_T_PPM = 250_000  # flag classes with EMD > 0.25


def dq_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").selectExpr(
        "c_nationkey", "c_mktsegment",
        "CAST(floor(c_acctbal / 5000.0) AS BIGINT) AS band")
    per_band = cust.groupBy("c_nationkey", "c_mktsegment", "band").agg(
        F.count("*").alias("cnt"))
    gband = cust.groupBy("band").agg(F.count("*").alias("g"))
    classes = per_band.groupBy("c_nationkey", "c_mktsegment").agg(
        F.sum("cnt").alias("class_size"))
    nrow = gband.agg(F.sum("g").alias("n_total"),
                     F.count("*").alias("m_bands"))
    # band spine: every class x every global band, zero-filled
    spine = classes.crossJoin(F.broadcast(gband))
    filled = (
        spine.join(per_band, ["c_nationkey", "c_mktsegment", "band"], "left")
        .withColumn("cnt", F.coalesce(F.col("cnt"), F.lit(0)))
    )
    w = (
        Window.partitionBy("c_nationkey", "c_mktsegment")
        .orderBy("band")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = (
        filled.crossJoin(F.broadcast(nrow))
        .withColumn("cum_c", F.sum("cnt").over(w))
        .withColumn("cum_g", F.sum("g").over(w))
        .withColumn("dev", F.expr("abs(cum_c * n_total - cum_g * class_size)"))
    )
    return (
        cum.groupBy("c_nationkey", "c_mktsegment", "class_size",
                    "n_total", "m_bands")
        .agg(F.sum("dev").alias("emd_scaled"))
        .selectExpr(
            "c_nationkey", "c_mktsegment", "class_size",
            "emd_scaled * 1000000 div (class_size * n_total * (m_bands - 1))"
            " AS t_ppm",
        )
        .selectExpr(
            "c_nationkey", "c_mktsegment", "class_size", "t_ppm",
            f"CAST(t_ppm > {TCLOSE_T_PPM} AS INT) AS risky",
        )
    )


DQ_T_CLOSENESS_ORACLE = f"""
WITH cust AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(floor(c_acctbal / 5000.0) AS BIGINT) AS band
  FROM customer
), per_band AS (
  SELECT c_nationkey, c_mktsegment, band, COUNT(*) AS cnt
  FROM cust GROUP BY 1, 2, 3
), gband AS (
  SELECT band, COUNT(*) AS g FROM cust GROUP BY 1
), classes AS (
  SELECT c_nationkey, c_mktsegment, CAST(SUM(cnt) AS BIGINT) AS class_size
  FROM per_band GROUP BY 1, 2
), nrow AS (
  SELECT CAST(SUM(g) AS BIGINT) AS n_total, COUNT(*) AS m_bands FROM gband
), filled AS (
  SELECT c.c_nationkey, c.c_mktsegment, c.class_size, b.band, b.g,
         COALESCE(p.cnt, 0) AS cnt
  FROM classes c CROSS JOIN gband b
  LEFT JOIN per_band p
    ON p.c_nationkey = c.c_nationkey AND p.c_mktsegment = c.c_mktsegment
   AND p.band = b.band
), cum AS (
  SELECT c_nationkey, c_mktsegment, class_size, n_total, m_bands,
         abs(SUM(cnt) OVER (PARTITION BY c_nationkey, c_mktsegment
               ORDER BY band ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             * n_total
           - SUM(g) OVER (PARTITION BY c_nationkey, c_mktsegment
               ORDER BY band ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             * class_size) AS dev
  FROM filled CROSS JOIN nrow
), agg AS (
  SELECT c_nationkey, c_mktsegment, class_size,
         CAST(SUM(dev) AS BIGINT) * 1000000
           // (class_size * MAX(n_total) * (MAX(m_bands) - 1)) AS t_ppm
  FROM cum GROUP BY 1, 2, 3
)
SELECT c_nationkey, c_mktsegment, class_size, CAST(t_ppm AS BIGINT) AS t_ppm,
       CAST(t_ppm > {TCLOSE_T_PPM} AS INT) AS risky
FROM agg
"""


SPECS += [
    QuerySpec("dq_t_closeness", dq_t_closeness, DQ_T_CLOSENESS_ORACLE,
              "t-closeness EMD audit over ordered sensitive bands, integer-exact",
              ("profile", "governance")),
]


# --- join-key skew profiler ----------------------------------------------------------
# The diagnostic that decides WHEN the skew toolkit (AQE skew-join,
# skew_salted_user_totals' salting) is needed: profile a prospective
# shuffle key's distribution BEFORE the join. Two readouts in one
# relation: the top-5 hottest keys with their exact share of rows (the
# rows that would land on one reducer), and the 32-bucket hash-partition
# histogram's max/mean imbalance in ppm (what AQE would see). All
# integer counts; the bucket hash is the portable md5 family so both
# engines bucket identically. One grouped rollup per readout.

SKEW_BUCKETS = 32
SKEW_TOP = 5


def profile_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import portable_hash64

    li = load_table(spark, sf_dir, "lineitem").selectExpr(
        "l_suppkey AS k")
    n_row = li.agg(F.count("*").alias("n"))
    hot = (
        li.groupBy("k").agg(F.count("*").alias("cnt"))
        .crossJoin(F.broadcast(n_row))
        .selectExpr("'hot_key' AS kind", "k AS key", "cnt",
                    "cnt * 1000000 div n AS share_ppm")
        .orderBy(F.desc("cnt"), "key")
        .limit(SKEW_TOP)
    )
    buckets = (
        li.select(F.pmod(portable_hash64(F.col("k").cast("string")),
                         F.lit(SKEW_BUCKETS)).alias("b"))
        .groupBy("b").agg(F.count("*").alias("cnt"))
    )
    imbalance = (
        buckets.agg(F.max("cnt").alias("mx"), F.sum("cnt").alias("tot"),
                    F.count("*").alias("nb"))
        .selectExpr(
            "'bucket_imbalance' AS kind", "CAST(nb AS BIGINT) AS key",
            "mx AS cnt", "mx * nb * 1000000 div tot AS share_ppm")
    )
    return hot.unionAll(imbalance)


from ..functions.hashing import portable_hash64_sql  # noqa: E402

PROFILE_KEY_SKEW_ORACLE = f"""
WITH li AS (
  SELECT l_suppkey AS k FROM lineitem
), n_row AS (
  SELECT COUNT(*) AS n FROM li
), hot AS (
  SELECT 'hot_key' AS kind, k AS key, COUNT(*) AS cnt,
         COUNT(*) * 1000000 // MAX(n) AS share_ppm
  FROM li CROSS JOIN n_row GROUP BY k
  ORDER BY cnt DESC, key LIMIT {SKEW_TOP}
), buckets AS (
  SELECT ({portable_hash64_sql('CAST(k AS VARCHAR)')}) % {SKEW_BUCKETS} AS b,
         COUNT(*) AS cnt
  FROM li GROUP BY 1
)
SELECT kind, key, cnt, share_ppm FROM hot
UNION ALL
SELECT 'bucket_imbalance', CAST(COUNT(*) AS BIGINT), CAST(MAX(cnt) AS BIGINT),
       CAST(MAX(cnt) AS BIGINT) * COUNT(*) * 1000000
         // CAST(SUM(cnt) AS BIGINT)
FROM buckets
"""


SPECS += [
    QuerySpec("profile_key_skew", profile_key_skew, PROFILE_KEY_SKEW_ORACLE,
              "pre-join shuffle-key skew profile: hot keys + bucket imbalance",
              ("profile", "skew")),
]
