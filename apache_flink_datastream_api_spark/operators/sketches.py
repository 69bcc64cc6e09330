"""Sketch-based approximate aggregates (driver-mandated scale extension;
no reference file:line — the reference has only exact sum/min/max/count,
SURVEY.md §2.4).

These are the 100 TB replacements for their exact counterparts:

- ``approx_count_distinct`` — HyperLogLog++: fixed ~kilobytes of state per
  group vs an exact distinct's shuffle of every key; map-side combinable,
  so the shuffle carries sketches, not rows.
- ``approx_percentile`` — a mergeable quantile sketch with bounded error;
  the exact ``percentile`` materializes every value per group.

Sketch internals (hash functions, merge order) are engine-specific, so no
DuckDB oracle can hash-match: these are registered rows-only, and
``tests/test_sketches.py`` pins accuracy against the exact operators
(relative error well inside the configured rsd / accuracy bounds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.hashing import salted_hash64, salted_hash64_sql
from ..registry import QuerySpec
from ..sources.tables import load_table

RSD = 0.02           # HLL target relative standard deviation
PCT_ACCURACY = 10_000  # approx_percentile accuracy knob


def sketch_daily_uniques(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per day per event_type via HLL++ (approximate) —
    the scale path for cardinality over 100 TB of events."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"), "event_type")
        .agg(F.approx_count_distinct("user_id", rsd=RSD).alias("approx_uniques"))
        .select(F.unix_millis("day").alias("day_ms"), "event_type", "approx_uniques")
    )


def sketch_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p95/p99 of value per event_type via the mergeable percentile
    sketch (bounded-memory replacement for exact percentile)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.percentile_approx("value", 0.5, PCT_ACCURACY).alias("p50"),
        F.percentile_approx("value", 0.95, PCT_ACCURACY).alias("p95"),
        F.percentile_approx("value", 0.99, PCT_ACCURACY).alias("p99"),
    )


HLL_LGK = 14  # Datasketches lgConfigK: 2^14 buckets, ~0.8% RSE


def sketch_rollup_uniques(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-aggregatable cardinality: persistable binary HLL sketches
    (``hll_sketch_agg``) built per (day, event_type), then UNIONED up to
    per-type totals without rescanning the raw data
    (``hll_union_agg`` + ``hll_sketch_estimate``).

    This is the 100 TB rollup-of-uniques pattern: daily sketch rows are
    ~KB each and materializable (e.g. into a metrics table); any coarser
    rollup (weekly, all-time, cross-dimension) is a cheap union over
    sketch rows instead of a full re-shuffle of user_ids.
    ``approx_count_distinct`` (sketch_daily_uniques) cannot do this — its
    sketch never leaves the aggregate."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").alias("day"), "event_type"
    ).agg(F.hll_sketch_agg("user_id", F.lit(HLL_LGK)).alias("sk"))
    return (
        daily.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_uniques"),
            F.count("*").alias("n_daily_sketches"),
        )
    )


# --- count-min sketch heavy hitters -----------------------------------------
# Unlike HLL/percentile sketches, a CMS built from a portable hash family
# is pure integer arithmetic — DuckDB replicates it exactly, so this
# sketch IS hash-checked against an oracle, estimates included.

CMS_D, CMS_W = 3, 256  # depth (hash rows) x width (buckets per row)
CMS_TOPK = 10


def sketch_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k heavy hitters by count-min sketch estimate.

    The sketch is d×w counters (here 3×256 = 768 cells, ~6 KB): each
    event increments one bucket per hash row; estimate(k) = min over rows
    (≥ true count, inflated only by collisions). At 100 TB the shuffle
    carries 768 partial cells per map task instead of one row per key —
    the bounded-memory path to frequency estimates when key cardinality
    explodes. Candidate keys here are the exact distinct (also giving
    ``exact_cnt`` so the oracle pins estimate accuracy, not just shape);
    in production the candidate set comes from a sample or prior window.
    """
    ev = load_table(spark, sf_dir, "events")
    key = F.col("user_id").cast("string")

    def jb(j: int):
        return F.struct(
            F.lit(j).alias("j"),
            F.pmod(salted_hash64(key, j), F.lit(CMS_W)).alias("bucket"),
        )

    rows = F.explode(F.array(*[jb(j) for j in range(CMS_D)])).alias("jb")
    sketch = (
        ev.select(rows)
        .select("jb.j", "jb.bucket")
        .groupBy("j", "bucket")
        .agg(F.count("*").alias("c"))
    )
    cand = ev.groupBy("user_id").agg(F.count("*").alias("exact_cnt"))
    cand_jb = cand.select(
        "user_id", "exact_cnt", rows
    ).select("user_id", "exact_cnt", "jb.j", "jb.bucket")
    est = (
        cand_jb.join(F.broadcast(sketch), ["j", "bucket"])
        .groupBy("user_id", "exact_cnt")
        .agg(F.min("c").alias("est_cnt"))
    )
    return est.orderBy(F.desc("est_cnt"), "user_id").limit(CMS_TOPK)


def _cms_bucket_duck(j: str) -> str:
    h = salted_hash64_sql("CAST(user_id AS VARCHAR)", j)
    return f"({h} % {CMS_W})"


SKETCH_CMS_ORACLE = f"""
WITH js AS (SELECT unnest(range(0, {CMS_D})) AS j),
cells AS (
  SELECT j, {_cms_bucket_duck('j')} AS bucket, COUNT(*) AS c
  FROM events CROSS JOIN js GROUP BY 1, 2
),
cand AS (
  SELECT user_id, COUNT(*) AS exact_cnt FROM events GROUP BY 1
),
est AS (
  SELECT cand.user_id, cand.exact_cnt, MIN(cells.c) AS est_cnt
  FROM cand CROSS JOIN js
  JOIN cells ON cells.j = js.j AND cells.bucket = {_cms_bucket_duck('js.j')}
  GROUP BY 1, 2
)
SELECT user_id, exact_cnt, est_cnt FROM est
ORDER BY est_cnt DESC, user_id LIMIT {CMS_TOPK}
"""


SPECS = [
    QuerySpec("sketch_daily_uniques", sketch_daily_uniques, None,
              "HLL++ approximate distinct users per day (accuracy pinned in tests)",
              ("sketch", "approx")),
    QuerySpec("sketch_value_percentiles", sketch_value_percentiles, None,
              "mergeable approximate percentiles (accuracy pinned in tests)",
              ("sketch", "approx")),
    QuerySpec("sketch_rollup_uniques", sketch_rollup_uniques, None,
              "binary HLL sketches rolled up via hll_union_agg — "
              "re-aggregatable uniques (merge-consistency pinned in tests)",
              ("sketch", "approx")),
    QuerySpec("sketch_heavy_hitters_cms", sketch_heavy_hitters_cms,
              SKETCH_CMS_ORACLE,
              "count-min sketch top-k heavy hitters, portable hash family "
              "— estimates hash-checked exactly against the oracle",
              ("sketch", "approx")),
]
