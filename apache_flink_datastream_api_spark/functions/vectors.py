"""Vector math as JVM-side column expressions (no UDFs).

Dot products fold left-to-right over the array in both Spark
(``aggregate(zip_with(...))``) and DuckDB (``list_sum(list_transform(...))``),
in double precision — verified bitwise-identical on the testdata, which is
what lets cosine queries use exact oracle compare.

At 100 TB embedding scale the same expressions apply; for very high
dimensions a Pandas-UDF (numpy dot over Arrow batches) becomes faster than
codegen'd folds — swap the expression, keep the plan.
"""

from __future__ import annotations

DOT_SPARK = (
    "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), "
    "cast(0 as double), (s, v) -> s + v)"
)

DOT_DUCK = (
    "list_sum(list_transform(generate_series(1, len({a})), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
)


def dot_spark(a: str, b: str) -> str:
    return DOT_SPARK.format(a=a, b=b)


def dot_duck(a: str, b: str) -> str:
    return DOT_DUCK.format(a=a, b=b)


def norm_spark(a: str) -> str:
    return f"sqrt({dot_spark(a, a)})"


def norm_duck(a: str) -> str:
    return f"sqrt({dot_duck(a, a)})"
