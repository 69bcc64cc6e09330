"""Bucketed (co-located) joins — the shuffle-elimination strategy for
repeated big-big joins at 100 TB.

A join between two tables bucketed on the join key with the same bucket
count needs NO exchange: each task zips bucket i with bucket i. For a fact
table joined every hour against the same dimension/fact, pre-bucketing
amortizes the shuffle to zero. (``plans.inspect`` + tests assert the
Exchange disappears.)

Local note: bucketed tables must live in the session catalog
(``saveAsTable``); the warehouse dir is disposable output, never source
data.
"""

from __future__ import annotations

import shutil
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist df as a bucketed (and optionally sorted) catalog table.

    Drops any previous table AND its warehouse location first — a fresh
    session does not know about last session's managed table, and
    saveAsTable refuses to reuse an orphaned location.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    if warehouse:
        shutil.rmtree(f"{warehouse.rstrip('/')}/{table_name}", ignore_errors=True)
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str,
    force_sort_merge: bool = False,
) -> DataFrame:
    """Join two same-bucketed catalog tables on the bucket key — planner
    elides both shuffle exchanges (sort-merge join over aligned buckets).

    ``force_sort_merge`` adds a merge hint: at toy scale the planner would
    rather broadcast (correct for small tables); the hint exposes the
    co-located big-big path the bucketing exists for.
    """
    left = spark.table(left_table)
    if force_sort_merge:
        left = left.hint("merge")
    return left.join(spark.table(right_table), on)
