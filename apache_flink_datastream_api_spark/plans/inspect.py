"""Plan inspection utilities.

The reference has no optimizer (SURVEY.md §4) — operator order is execution
order. Here Catalyst does the planning, and these helpers make its choices
*assertable*: tests pin that filters reach the parquet scan, projections
prune columns, and dimension joins broadcast. A plan regression (e.g. a
filter trapped behind a UDF, a broadcast falling back to sort-merge-join)
fails CI instead of silently costing 10× at 100 TB.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def explain_string(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (what df.explain prints)."""
    try:
        jvm = df.sparkSession._jvm
        return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)
    except Exception:
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain(mode=mode)
        return buf.getvalue()


def assert_pushed_filter(df: DataFrame, column: str) -> None:
    """Assert a predicate on `column` reached the parquet scan."""
    plan = explain_string(df)
    pushed = [
        line for line in plan.splitlines() if "PushedFilters" in line and column in line
    ]
    assert pushed, f"no pushed filter on {column}; plan:\n{plan}"


def scan_blocks(df: DataFrame) -> list[dict[str, str]]:
    """Parse formatted explain into one dict per parquet scan
    (keys: Location / PushedFilters / ReadSchema / Output where present)."""
    plan = explain_string(df)
    blocks: list[dict[str, str]] = []
    current: dict[str, str] | None = None
    for line in plan.splitlines():
        stripped = line.strip()
        if "Scan parquet" in stripped:
            current = {}
            blocks.append(current)
        elif current is not None and ": " in stripped:
            key, _, val = stripped.partition(": ")
            if key in ("Location", "PushedFilters", "ReadSchema", "Output"):
                current[key] = val
        elif current is not None and not stripped:
            current = None
    return blocks


def assert_read_schema_excludes(df: DataFrame, relation_hint: str, column: str) -> None:
    """Assert the scan of the relation whose Location contains
    `relation_hint` does NOT read `column` (column pruning worked)."""
    blocks = [b for b in scan_blocks(df) if relation_hint in b.get("Location", "")]
    assert blocks, f"no parquet scan of {relation_hint} in plan:\n{explain_string(df)}"
    for b in blocks:
        assert column not in b.get("ReadSchema", ""), (
            f"column {column} not pruned from {relation_hint} scan: {b}"
        )


def assert_broadcast_join(df: DataFrame) -> None:
    plan = explain_string(df)
    assert "BroadcastHashJoin" in plan, f"expected a broadcast join; plan:\n{plan}"


def assert_no_cartesian(df: DataFrame) -> None:
    plan = explain_string(df)
    assert "CartesianProduct" not in plan, f"cartesian product in plan:\n{plan}"


def exchange_count(df: DataFrame) -> int:
    """Number of distinct shuffle Exchange nodes in the physical plan.

    Counts detail-section headers ``(n) Exchange`` so each node is counted
    once (formatted mode prints every node twice: tree + details).
    ReusedExchange does not match — a reused shuffle is free.
    """
    import re

    return len(re.findall(r"\(\d+\) Exchange\b", explain_string(df)))


def codegen_stage_count(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans (wider = more fused execution)."""
    plan = explain_string(df, "simple")
    return plan.count("WholeStageCodegen")
