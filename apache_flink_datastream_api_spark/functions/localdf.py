"""Small constant DataFrames built from JVM literals.

``spark.createDataFrame(python_rows)`` parallelizes through the
Python-pickle RDD path at ``defaultParallelism`` slices: every consumer
action scans 32 near-empty partitions through Python workers — measured
r9 at ~0.2 s per frame per action at local[32] (and it is pure overhead
at any scale: a constant frame never needs an RDD). For the bounded
driver-side constants the operators ship into plans (probe lists,
tier tables, trained weights, per-round trajectory rows), build the
frame as a literal struct array exploded over a 1-row single-partition
range instead: the plan is pure JVM expressions, one task, zero Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

# Above this many rows the literal plan stops being cheap: each row adds
# |fields| py4j Column constructions at build time and the whole
# explode(array(struct...)) tree is re-analyzed by Catalyst on EVERY
# consumer action. Measured r9->r10: a 320-row x 4-field frame inside
# pipeline_stratified_split cost ~5 s per invocation (8x the query's
# budget) — and the row count there grows with source cardinality, so it
# only gets worse at scale. Past the cap, fall back to a SINGLE-slice
# pickled-RDD frame: one Python task per action (vs defaultParallelism
# near-empty ones from plain createDataFrame), no literal tree.
LITERAL_MAX_ROWS = 64


def local_literal_df(spark: SparkSession, rows, schema: str) -> DataFrame:
    """``spark.createDataFrame(rows, schema)`` for SMALL constant row
    lists (<= LITERAL_MAX_ROWS rows, simple comma-free field types —
    bigint, int, string, double, array<...>), built entirely from JVM
    literals; larger row lists degrade to a 1-slice createDataFrame.

    ``schema`` is the same DDL string createDataFrame took:
    ``"name type, name type"``. Values may be None (typed null) and
    Python lists (array literals). Field types containing a top-level
    comma (decimal(p,s), map/struct) are NOT supported — assert below.
    """
    fields = []
    for part in schema.split(","):
        name, typ = part.strip().split(None, 1)
        assert "(" not in typ and "," not in typ, (
            "local_literal_df supports only comma-free field types; "
            f"got {typ!r}")
        fields.append((name, typ))
    rows = list(rows)
    for row in rows:
        assert len(row) == len(fields), (
            f"row arity {len(row)} != schema arity {len(fields)}: {row!r}")
    one = spark.range(0, 1, 1, 1)
    if not rows:
        return one.select(
            *[F.lit(None).cast(t).alias(n) for n, t in fields]
        ).limit(0)
    if len(rows) > LITERAL_MAX_ROWS:
        return spark.createDataFrame(
            spark.sparkContext.parallelize(rows, 1), schema)
    structs = [
        F.struct(
            *[F.lit(v).cast(t).alias(n) for (n, t), v in zip(fields, row)]
        )
        for row in rows
    ]
    return one.select(F.explode(F.array(*structs)).alias("_r")).select("_r.*")
