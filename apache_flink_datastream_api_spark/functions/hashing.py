"""Portable 64-bit hashing, identical in Spark SQL and DuckDB.

Why not ``xxhash64``/``hash``: Spark's Murmur3/xxHash and DuckDB's ``hash()``
produce different values, so oracle-checked operators (MinHash, SimHash,
fingerprinting) need a hash both engines compute identically. We take the
first 15 hex chars of md5 (60 bits — fits a signed BIGINT):

- Spark : ``cast(conv(substr(md5(x), 1, 15), 16, 10) as bigint)``
- DuckDB: ``CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT)``

Hash families (for MinHash) are derived by salting the input string
(``concat(x, '#', i)``) instead of the usual ``(a*h + b) mod p`` arithmetic,
which would overflow 64-bit integers without 128-bit math and is not
portable across engines.

Scale note: md5 is ~3× slower than xxhash64 but still JVM-native and
vectorized; at 100 TB you would switch the *production* dedup path to
``F.xxhash64`` (same plan shape) and keep this portable family only for
cross-engine verification. The plan — explode → hash → min-agg → band join —
is identical either way.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

HEX_DIGITS = 15  # 60 bits < 2^63, safe for signed BIGINT in both engines


def portable_hash64(col: Column | str) -> Column:
    """60-bit deterministic hash of a string column (Spark side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, HEX_DIGITS), 16, 10).cast("long")


def portable_hash64_sql(expr: str) -> str:
    """The same hash as ``portable_hash64`` in DuckDB SQL."""
    return f"CAST(concat('0x', substr(md5({expr}), 1, {HEX_DIGITS})) AS BIGINT)"


def salted_hash64(col: Column | str, salt: int) -> Column:
    """Member *salt* of the portable hash family (Spark side)."""
    c = F.col(col) if isinstance(col, str) else col
    return portable_hash64(F.concat(c, F.lit(f"#{salt}")))


def salted_hash64_sql(expr: str, salt: str) -> str:
    """Member *salt* (a SQL expression) of the hash family (DuckDB side)."""
    return portable_hash64_sql(f"concat({expr}, '#', {salt})")


# --- arithmetic hash family (one md5, n derived members) -------------------
#
# Salting re-runs md5 per member — n× the hashing cost. For MinHash we
# instead md5 ONCE and derive members as
#     h_i = (A_i * (h & (2^30-1)) + B_i * (h >> 30) + C_i) mod (2^61 - 1)
# Splitting h into 30-bit halves keeps every product < 2^60, so the sum
# stays < 2^62: no 64-bit overflow in either engine (DuckDB would raise on
# overflow, Spark would silently wrap — both avoided). A/B/C come from a
# fixed LCG so the family is identical everywhere.

MERSENNE61 = (1 << 61) - 1
_LO_MASK = (1 << 30) - 1


def hash_family(n: int) -> list[tuple[int, int, int]]:
    """n deterministic (A, B, C) constant triples (A, B < 2^30)."""
    out = []
    x = 123456789
    def step() -> int:
        nonlocal x
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        return x >> 16
    for _ in range(n):
        a = step() % _LO_MASK + 1
        b = step() % _LO_MASK + 1
        c = step() % MERSENNE61
        out.append((a, b, c))
    return out


def family_member_spark(h_expr: str, abc: tuple[int, int, int]) -> str:
    a, b, c = abc
    return (
        f"(({a} * ({h_expr} & {_LO_MASK}) + {b} * shiftright({h_expr}, 30) + {c})"
        f" % {MERSENNE61})"
    )


def family_member_duck(h_expr: str, abc: tuple[int, int, int]) -> str:
    a, b, c = abc
    return (
        f"(({a} * ({h_expr} & {_LO_MASK}) + {b} * ({h_expr} >> 30) + {c})"
        f" % {MERSENNE61})"
    )
