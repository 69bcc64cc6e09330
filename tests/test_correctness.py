"""Registry-wide oracle check: every query with an oracle must match DuckDB
bit-for-bit (the driver's t2 gate, run locally at a smaller sf)."""

from __future__ import annotations

import pytest

from apache_flink_datastream_api_spark.registry import all_queries

from .conftest import SF_DIR, assert_matches_oracle

SPECS = list(all_queries().values())


@pytest.mark.parametrize("spec", [s for s in SPECS if s.oracle], ids=lambda s: s.name)
def test_oracle_match(spark, oracle_con, spec):
    assert_matches_oracle(spec.fn(spark, SF_DIR), oracle_con, spec.oracle)


@pytest.mark.parametrize("spec", [s for s in SPECS if s.oracle is None], ids=lambda s: s.name)
def test_rows_only(spark, spec):
    df = spec.fn(spark, SF_DIR)
    assert df.schema is not None
    assert df.count() >= 0


def test_bench_headline_queries_registered():
    """Every bench headline entry must resolve in the registry — a rename
    or removal would otherwise only surface when the driver runs bench."""
    import bench

    specs = all_queries()
    missing = [n for n in bench.HEADLINE if n not in specs]
    assert not missing, missing
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE), "duplicate headline"
