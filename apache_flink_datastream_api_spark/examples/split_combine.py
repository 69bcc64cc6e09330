"""chapter2/StreamSplitAndCombine.java: ProcessFunction side-output split
+ connect/CoMap merge (SURVEY.md §2.3 U1/U2).

Structured Streaming has no side outputs: the split is two filters over
one parsed frame; the CoMap's normalize-and-tag merge is unionByName."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.parse import parse_audit_trail


def split(parsed: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Customer records as full rows; SalesRep side output as (user, 1)."""
    customers = parsed.where(F.col("entity") == "Customer")
    salesreps = parsed.where(F.col("entity") != "Customer").select(
        "user", F.lit(1).alias("one")
    )
    return customers, salesreps


def combine(customers: DataFrame, salesreps: DataFrame) -> DataFrame:
    """Tag each side and merge (the CoMapFunction's normalization)."""
    s1 = customers.select(
        F.lit("Stream-1").alias("tag"), "user", F.lit(1).alias("one")
    )
    s2 = salesreps.select(F.lit("Stream-2").alias("tag"), "user", "one")
    return s1.unionByName(s2)


def topology(lines: DataFrame) -> DataFrame:
    return combine(*split(parse_audit_trail(lines)))


def demo(spark: SparkSession, audit_dir: str):
    lines = spark.readStream.text(audit_dir)
    return topology(lines).writeStream.format("console").start()
