"""Registry-wide oracle dtype audit (DuckDB-only, fast — no Spark needed).

Runs every oracle_sql() entry at sf0.001 and flags any result column whose
DuckDB type is HUGEINT or DECIMAL: those become float64/object in pandas and
break the driver's dtype-sensitive value hash against Spark's int64/float64,
even when the values are identical (round-1 verdict: 47 such queries).

Usage: python scripts/oracle_dtype_sweep.py [sf_dir]
Exit 0 = clean, 1 = offenders found (listed with column + type).
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, ".")
import __spark_entry__ as e  # noqa: E402
from apache_flink_datastream_api_spark.schemas import ALL_TABLES as TABLES  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

BAD_PREFIXES = ("HUGEINT", "UHUGEINT", "DECIMAL")


def main() -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

    oracles = e.oracle_sql()
    offenders: dict[str, list[tuple[str, str]]] = {}
    errors: dict[str, str] = {}
    for name, sql in sorted(oracles.items()):
        try:
            rel = con.sql(sql)
            bad = [
                (col, str(typ))
                for col, typ in zip(rel.columns, rel.types)
                if str(typ).upper().startswith(BAD_PREFIXES)
            ]
            if bad:
                offenders[name] = bad
        except Exception as ex:  # noqa: BLE001
            errors[name] = str(ex)[:200]

    for name, bad in offenders.items():
        cols = ", ".join(f"{c}:{t}" for c, t in bad)
        print(f"DTYPE  {name}: {cols}")
    for name, err in errors.items():
        print(f"ERROR  {name}: {err}")
    print(f"\n{len(offenders)} dtype-weak, {len(errors)} errored, {len(oracles)} oracles total")
    return 1 if offenders or errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
