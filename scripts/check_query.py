"""Strict single-query verify loop (the per-operator step of the round
workflow): run one or more registry queries against their DuckDB oracles
at a given sf with the SAME normalization + dtype-kind check as
driver_sim, but without paying the full-registry sweep.

Usage: python scripts/check_query.py <query> [<query> ...] [--sf SF_DIR]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

sys.path.insert(0, ".")

SF_DIR = "/root/testdata/sf0.01"
names = []
args = sys.argv[1:]
while args:
    a = args.pop(0)
    if a == "--sf":
        SF_DIR = args.pop(0)
    else:
        names.append(a)

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main() -> int:
    from apache_flink_datastream_api_spark.registry import all_queries

    specs = all_queries()
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .appName("check-query").getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

    rc = 0
    for name in names:
        spec = specs[name]
        t0 = time.time()
        got = spec.fn(spark, SF_DIR).toPandas()
        if spec.oracle is None:
            print(f"[rows-only] {name}: {len(got)} rows ({time.time()-t0:.1f}s)")
            continue
        want = con.sql(spec.oracle).df()
        g, w = norm(got), norm(want)
        try:
            assert list(g.columns) == list(w.columns), \
                f"cols {list(g.columns)} != {list(w.columns)}"
            assert len(g) == len(w), f"rows {len(g)} != {len(w)}"
            gk = [g[c].dtype.kind for c in g.columns]
            wk = [w[c].dtype.kind for c in w.columns]
            assert gk == wk, f"DTYPE kinds spark={gk} != oracle={wk}"
            pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=True)
            print(f"[match] {name}: {len(g)} rows ({time.time()-t0:.1f}s)")
        except Exception as ex:
            rc = 1
            print(f"[FAIL ] {name}: {str(ex)[:500]}")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
