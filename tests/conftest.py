from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

from apache_flink_datastream_api_spark.schemas import ALL_TABLES
from apache_flink_datastream_api_spark.session import get_spark

# Small by default for fast iteration; CI/driver correctness runs at sf0.01.
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def oracle_con():
    con = duckdb.connect()
    for t in ALL_TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Mirror the driver's compare: columns sorted by name, rows sorted."""
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def assert_matches_oracle(spark_df, oracle_con, sql: str, check_exact: bool = True):
    got = normalize(spark_df.toPandas())
    want = normalize(oracle_con.sql(sql).df())
    assert list(got.columns) == list(want.columns), (
        f"column mismatch: spark={list(got.columns)} oracle={list(want.columns)}"
    )
    assert len(got) == len(want), f"row count: spark={len(got)} oracle={len(want)}"
    # The driver's value-hash is dtype-sensitive (1175 != 1175.0): a dtype
    # KIND mismatch (int vs float vs object) is a real failure even when the
    # values compare equal. check_dtype=False below only tolerates width
    # differences (int32 vs int64), which the hash does not distinguish.
    gk = [got[c].dtype.kind for c in got.columns]
    wk = [want[c].dtype.kind for c in want.columns]
    assert gk == wk, (
        f"dtype-kind mismatch: spark={gk} oracle={wk} cols={list(got.columns)}"
    )
    pd.testing.assert_frame_equal(
        got, want, check_dtype=False, check_exact=check_exact, atol=0, rtol=0
    )
