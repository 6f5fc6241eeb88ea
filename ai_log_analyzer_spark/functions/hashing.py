"""Portable deterministic hashing shared by dedup/similarity operators.

All content hashes are md5-derived so the Spark DataFrame expressions
and the DuckDB oracle SQL compute IDENTICAL values (Spark's xxhash64 /
DuckDB's hash() are engine-specific and never comparable):

    hash32(s)  = int(md5(s)[:8], 16)          -- 32-bit unsigned in a long
    Spark:   conv(substring(md5(s),1,8),16,10) :: long
    DuckDB:  ('0x' || substr(md5(s),1,8))     :: BIGINT
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hash32(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def hash32_sql(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}), 1, 8))::BIGINT)"
