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


def local_literal_df(spark: SparkSession, rows, schema: str) -> DataFrame:
    """``spark.createDataFrame(rows, schema)`` for SMALL constant row
    lists (hundreds of rows, simple comma-free field types — bigint,
    int, string, double, array<...>), built entirely from JVM literals.

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
    one = spark.range(0, 1, 1, 1)
    if not rows:
        return one.select(
            *[F.lit(None).cast(t).alias(n) for n, t in fields]
        ).limit(0)
    structs = [
        F.struct(
            *[F.lit(v).cast(t).alias(n) for (n, t), v in zip(fields, row)]
        )
        for row in rows
    ]
    return one.select(F.explode(F.array(*structs)).alias("_r")).select("_r.*")
