"""Skew-handling utilities (SURVEY.md §4.2; north rule: "salted keys
for skewed hot templates").

Log template distributions are Zipfian — a handful of template_ids can
dominate a shuffle.  ``salted_agg`` splits each hot key across S salt
buckets for the partial aggregation, then re-aggregates the S partials:
two small shuffles instead of one skewed one.  Catalyst's map-side
partial aggregation already mitigates count-style skew; salting is the
explicit, plan-visible form the north rule asks for, and it matters for
high-cardinality aggregates (collect/distinct) where partials can't
collapse hot keys.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT = 16


def with_salt(df: DataFrame, salt: int = DEFAULT_SALT,
              entropy_col: str | None = None) -> DataFrame:
    """Adds a ``_salt`` column in [0, salt): deterministic from
    ``entropy_col`` when given (reproducible runs), else random."""
    if entropy_col is not None:
        s = F.pmod(F.hash(F.col(entropy_col)), F.lit(salt))
    else:
        s = (F.rand() * salt).cast("int")
    return df.withColumn("_salt", s)


def salted_agg(df: DataFrame, keys: Sequence[str], aggs: dict[str, Column],
               salt: int = DEFAULT_SALT,
               entropy_col: str | None = None) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column name → a *partial* aggregate expression;
    supported merges: sum-like partials re-summed in phase 2.  For
    count use F.count(...), it re-merges via sum.
    """
    salted = with_salt(df, salt=salt, entropy_col=entropy_col)
    phase1 = salted.groupBy(*keys, "_salt").agg(
        *[expr.alias(f"__p_{name}") for name, expr in aggs.items()])
    return phase1.groupBy(*keys).agg(
        *[F.sum(f"__p_{name}").alias(name) for name in aggs])


def salted_count(df: DataFrame, keys: Sequence[str],
                 salt: int = DEFAULT_SALT,
                 entropy_col: str | None = None,
                 out: str = "cnt") -> DataFrame:
    return salted_agg(df, keys, {out: F.count(F.lit(1))},
                      salt=salt, entropy_col=entropy_col)
