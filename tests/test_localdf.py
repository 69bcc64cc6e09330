"""local_literal_df size contract (VERDICT r9 item 1).

The literal-struct plan is only cheap for tiny frames: every row adds
|fields| Column constructions and the whole explode(array(...)) tree is
re-analyzed by Catalyst per consumer action. r9 shipped a 320-row frame
through it and regressed pipeline_stratified_split 8x. These tests pin:

- small frames (<= LITERAL_MAX_ROWS) stay pure-JVM literal plans
  (no Python scan node),
- large frames degrade to a SINGLE-slice RDD frame (bounded Python
  cost per action, no literal tree),
- both paths return identical data, and
- mismatched row arity is rejected instead of silently zip-truncated
  (ADVICE r9).
"""

from __future__ import annotations

import pytest

from apache_flink_datastream_api_spark.functions.localdf import (
    LITERAL_MAX_ROWS,
    local_literal_df,
)

SCHEMA = "k string, v bigint"


def _rows(n: int) -> list[tuple[str, int]]:
    return [(f"s{i}", i * 7) for i in range(n)]


def test_small_frame_is_literal_plan_no_python(spark):
    df = local_literal_df(spark, _rows(LITERAL_MAX_ROWS), SCHEMA)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" not in plan and "Scan" not in plan, plan
    assert df.count() == LITERAL_MAX_ROWS


def test_large_frame_falls_back_to_single_slice_rdd(spark):
    df = local_literal_df(spark, _rows(LITERAL_MAX_ROWS + 1), SCHEMA)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in plan, plan
    # ONE slice: the plain createDataFrame path scans defaultParallelism
    # near-empty pickled partitions per action (pure overhead).
    assert df.rdd.getNumPartitions() == 1
    assert df.count() == LITERAL_MAX_ROWS + 1


@pytest.mark.parametrize("n", [0, 3, LITERAL_MAX_ROWS + 1])
def test_both_paths_agree_with_createdataframe(spark, n):
    rows = _rows(n)
    got = sorted(local_literal_df(spark, rows, SCHEMA).collect())
    ref = sorted(spark.createDataFrame(rows, SCHEMA).collect()) if rows else []
    assert got == ref
    schema = local_literal_df(spark, rows, SCHEMA).schema
    assert [f.name for f in schema.fields] == ["k", "v"]
    assert [f.dataType.simpleString() for f in schema.fields] == [
        "string", "bigint"]


def test_row_arity_mismatch_rejected(spark):
    with pytest.raises(AssertionError, match="arity"):
        local_literal_df(spark, [("a", 1), ("b",)], SCHEMA)
