"""CSV-line parsers (SURVEY.md §2.2 P1).

The reference parses quoted CSV lines positionally into a POJO
(``chapter2/AuditTrail.java:15-30``: strip ``"``, split on ``,``, cast).
Spark-first equivalent: a column expression pipeline — quote-strip with
``regexp_replace``, parse with ``from_csv`` against an explicit schema, and
convert epoch-millis to ``TimestampType``. Everything stays inside
whole-stage codegen; no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

AUDIT_CSV_SCHEMA = (
    "id INT, user STRING, entity STRING, operation STRING, "
    "timestamp_ms BIGINT, duration INT, change_count INT"
)

BROWSER_CSV_SCHEMA = "id INT, user STRING, action STRING, timestamp_ms BIGINT"


def _strip_quotes(col: Column) -> Column:
    return F.regexp_replace(col, '"', "")


def parse_audit_trail(df: DataFrame, value_col: str = "value") -> DataFrame:
    """``DataStream<String>`` of audit CSV lines → typed columns.

    Output: id, user, entity, operation, timestamp_ms, duration,
    change_count, event_ts (TimestampType from epoch millis).
    """
    parsed = F.from_csv(_strip_quotes(F.col(value_col)), AUDIT_CSV_SCHEMA)
    return (
        df.withColumn("_r", parsed)
        .select("_r.*")
        .withColumn("event_ts", F.timestamp_millis(F.col("timestamp_ms")))
    )


def parse_browser_events(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Browser-events CSV lines → typed columns (FIXTURES.md §2)."""
    parsed = F.from_csv(_strip_quotes(F.col(value_col)), BROWSER_CSV_SCHEMA)
    return (
        df.withColumn("_r", parsed)
        .select("_r.*")
        .withColumn("event_ts", F.timestamp_millis(F.col("timestamp_ms")))
    )
