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


def skew_profile(df: DataFrame, key_col: str) -> DataFrame:
    """Shuffle-skew pre-flight audit: one summary row quantifying how
    skewed a prospective shuffle key is, and the salt factor that
    would level it.

    A shuffle's wall-clock is its hottest partition; before keying a
    100-TB groupBy/join on a column, measure the key histogram:

      n_keys, n_rows       — grid size vs stream size
      max_count/min_count  — hottest/coldest key
      top1_share_ppm       — hottest key's share of all rows (exact
                             integer ppm)
      rec_salts            — ceil(max_count / avg_count): how many salt
                             buckets split the hottest key down to the
                             average, i.e. the S to pass to salted_agg
                             (1 = no salting needed)

    Cost: one map-side-combining groupBy onto the key grid, then a
    bounded fold of grid-sized input — the same two-exchange shape as
    every counts query here; nothing scales with the hot key itself."""
    counts = df.groupBy(F.col(key_col).alias("k")) \
        .agg(F.count(F.lit(1)).alias("c"))
    return (counts.agg(F.count(F.lit(1)).alias("n_keys"),
                       F.sum("c").alias("n_rows"),
                       F.max("c").alias("max_count"),
                       F.min("c").alias("min_count"))
            .select("n_keys", "n_rows", "max_count", "min_count",
                    F.expr("max_count * 1000000 div n_rows")
                    .alias("top1_share_ppm"),
                    # ceil(max/avg) = ceil(max*n_keys/n_rows)
                    F.expr("(max_count * n_keys + n_rows - 1) div n_rows")
                    .alias("rec_salts")))


def skew_profile_sql(table: str, key_expr: str) -> str:
    return f"""
WITH counts AS (
  SELECT {key_expr} AS k, count(*) AS c FROM {table} GROUP BY 1
)
SELECT count(*) AS n_keys, sum(c)::BIGINT AS n_rows,
       max(c) AS max_count, min(c) AS min_count,
       (max(c) * 1000000 // sum(c))::BIGINT AS top1_share_ppm,
       ((max(c) * count(*) + sum(c) - 1) // sum(c))::BIGINT AS rec_salts
FROM counts
"""
