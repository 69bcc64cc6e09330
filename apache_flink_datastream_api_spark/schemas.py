"""Explicit record schemas (SURVEY.md §1).

The reference hand-codes its schemas positionally in POJO constructors
(``chapter2/AuditTrail.java:18-29``); streaming file sources in Spark require
explicit schemas anyway, so every record shape gets a StructType here.
Timestamps are epoch-millis longs in the reference; we carry both the raw
``*_ms`` long and a proper ``TimestampType`` column where useful.
"""

from __future__ import annotations

from pyspark.sql import types as T

# audit_trail: CSV (id, user, entity, operation, timestamp_ms, duration,
# change_count) — FIXTURES.md §1, chapter2/AuditTrail.java:6-12.
AUDIT_TRAIL_SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType()),
        T.StructField("user", T.StringType()),
        T.StructField("entity", T.StringType()),
        T.StructField("operation", T.StringType()),
        T.StructField("timestamp_ms", T.LongType()),
        T.StructField("duration", T.IntegerType()),
        T.StructField("change_count", T.IntegerType()),
    ]
)

# browser_events: CSV (id, user, action, timestamp_ms) — FIXTURES.md §2.
BROWSER_EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType()),
        T.StructField("user", T.StringType()),
        T.StructField("action", T.StringType()),
        T.StructField("timestamp_ms", T.LongType()),
    ]
)

# Driver testdata `events` table (TESTDATA.md / FIXTURES.md §4) — the
# stand-in stream table for correctness checks.
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
)

ALL_TABLES = TPCH_TABLES + ("events", "documents", "embeddings")
