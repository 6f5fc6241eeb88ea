"""Deterministic splitting / sampling for training-data pipelines.

Both ops key on the md5-derived ``hash32`` of the stringified id plus a
salt, so (a) assignment is a pure function of (id, salt) — stable
across runs, partitionings and cluster sizes, exactly what a training
pipeline needs for reproducible splits — and (b) the DuckDB oracle is
exact.  At 100 TB both are stateless projections: no shuffle, no join,
fully codegen'd except the md5 call itself.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .hashing import hash32, hash32_sql

SPLITS = (("train", 80), ("val", 10), ("test", 10))


def _bucket(id_col: Column, salt: str) -> Column:
    return F.pmod(hash32(F.concat(id_col.cast("string"), F.lit(f"|{salt}"))),
                  F.lit(100))


def split_assign(id_col: Column, salt: str = "split-v1") -> Column:
    """'train' | 'val' | 'test' per id (80/10/10, hash-bucketed)."""
    b = _bucket(id_col, salt)
    expr, lo = None, 0
    for name, width in SPLITS:
        hi = lo + width
        cond = b < hi if hi < 100 else F.lit(True)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo = hi
    return expr


def in_sample(id_col: Column, pct: int, salt: str = "sample-v1") -> Column:
    """Deterministic pct% sample membership flag."""
    return _bucket(id_col, salt) < pct


def _bucket_sql(id_expr: str, salt: str) -> str:
    salted = f"{id_expr}::VARCHAR || '|{salt}'"
    # hash32 is non-negative, so plain % == pmod
    return f"({hash32_sql(salted)} % 100)"


def split_assign_sql(id_expr: str, salt: str = "split-v1") -> str:
    b = _bucket_sql(id_expr, salt)
    expr, lo = "CASE", 0
    for name, width in SPLITS[:-1]:
        lo += width
        expr += f" WHEN {b} < {lo} THEN '{name}'"
    expr += f" ELSE '{SPLITS[-1][0]}' END"
    return expr


def in_sample_sql(id_expr: str, pct: int, salt: str = "sample-v1") -> str:
    return f"{_bucket_sql(id_expr, salt)} < {pct}"
