"""Planner statistics — the numbers a cost-based optimizer plans from.

Catalyst's CBO and AQE consume per-column NDV/null/min-max statistics
and join-selectivity estimates; at 100 TB those statistics are
themselves distributed jobs, and collecting them wrong (a global
COUNT(DISTINCT) per column as separate passes, or a join-selectivity
probe that shuffles the fact table) costs more than the plans they
improve.  Two operators:

- ``table_stats_profile``: ANALYZE TABLE ... COMPUTE STATISTICS FOR
  COLUMNS, as one job: per requested column, rows / non-null count /
  exact NDV / min / max (numeric columns; values widened to long for a
  uniform schema).  All columns profile in ONE pass over the table:
  each aggregate is a column of the same single groupBy-less agg, so
  the scan is shared and every partial folds map-side.  Exact NDV via
  count(distinct) is intentional at audit grain — the HLL/KMV sketches
  in functions/sketches.py are the streaming/approximate variant; this
  is the referee.  (Spark plans multi-distinct aggs via expand; at
  true 100-TB grain you'd swap each to approx_count_distinct — the
  audit keeps exactness for the oracle.)

- ``join_filter_audit``: should a runtime filter (DPP / bloom
  pre-filter) be pushed into a fact-table scan for a given join?
  Measures it on the key-distinct grain: distinct build-side keys,
  distinct probe-side keys, their exact intersection, and the ppm of
  probe-side ROWS whose key survives the build-side filter — i.e. the
  fraction of the fact scan a pushed filter keeps.  Cost: both sides
  collapse to distinct keys FIRST (map-side partial distinct), so the
  only shuffled payload is the key grids, never fact rows; the row
  survival count rides the same key-grid join back onto per-key row
  counts.  selectivity_ppm ≈ 1e6 → the filter is useless;
  ≪ 1e6 → push it.

No counterpart in the reference; task-spec 100-TB-efficiency extras.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_stats_profile(df: DataFrame,
                        cols: Sequence[str]) -> DataFrame:
    """One-pass per-column statistics: (col_name, n_rows,
    n_nonnull, ndv, min_val, max_val) — numeric columns only, widened to long."""
    # r6 (ADVICE): reject non-numeric columns loudly — the silent long
    # cast turned a string column into n_nonnull=0 / NULL min/max,
    # i.e. misleading planner statistics instead of an error
    numeric = {"tinyint", "smallint", "int", "bigint", "long", "float",
               "double", "decimal", "boolean", "date", "timestamp",
               "timestamp_ntz"}
    dtypes = dict(df.dtypes)
    bad = [c for c in cols
           if dtypes.get(c, "?").split("(")[0] not in numeric]
    if bad:
        raise ValueError(
            f"table_stats_profile: non-numeric columns {bad} (dtypes "
            f"{[dtypes.get(c) for c in bad]}) — the long-cast profile "
            f"would silently report 0/NULL statistics for them")
    aggs = []
    for c in cols:
        col = F.col(c).cast("long")
        aggs += [F.count(F.lit(1)).alias(f"{c}__n"),
                 F.count(col).alias(f"{c}__nn"),
                 F.countDistinct(col).alias(f"{c}__ndv"),
                 F.min(col).alias(f"{c}__mn"),
                 F.max(col).alias(f"{c}__mx")]
    one = df.agg(*aggs)
    # unpivot the single wide row into one row per column — stack() is
    # a projection over the 1-row agg result, cost-free
    stacked = ", ".join(
        f"'{c}', {c}__n, {c}__nn, {c}__ndv, {c}__mn, {c}__mx"
        for c in cols)
    return one.selectExpr(
        f"stack({len(cols)}, {stacked}) as "
        f"(col_name, n_rows, n_nonnull, ndv, min_val, max_val)")


def table_stats_profile_sql(table: str, cols: Sequence[str]) -> str:
    parts = [
        f"SELECT '{c}' AS col_name, count(*) AS n_rows, "
        f"count({c}) AS n_nonnull, "
        f"count(DISTINCT ({c})::BIGINT) AS ndv, "
        f"min(({c})::BIGINT) AS min_val, max(({c})::BIGINT) AS max_val "
        f"FROM {table}"
        for c in cols]
    return " UNION ALL ".join(parts)


def join_filter_audit(probe: DataFrame, build: DataFrame,
                      probe_key: str, build_key: str) -> DataFrame:
    """Runtime-filter payoff audit (module docstring).  One summary
    row: ndv_probe, ndv_build, ndv_common, probe_rows,
    surviving_rows, selectivity_ppm."""
    pk = (probe.groupBy(F.col(probe_key).cast("long").alias("k"))
          .agg(F.count(F.lit(1)).alias("c")))
    bk = (build.select(F.col(build_key).cast("long").alias("k"))
          .distinct())
    nb = bk.agg(F.count(F.lit(1)).alias("ndv_build"))
    hit = F.col("_hit").isNotNull()
    joined = pk.join(bk.withColumn("_hit", F.lit(1)), "k", "left")
    return (joined.agg(
        F.count(F.lit(1)).alias("ndv_probe"),
        F.sum(F.when(hit, 1).otherwise(0)).alias("ndv_common"),
        F.sum("c").alias("probe_rows"),
        F.sum(F.when(hit, F.col("c")).otherwise(0))
        .alias("surviving_rows"))
        .crossJoin(F.broadcast(nb))
        .select("ndv_probe", "ndv_build", "ndv_common", "probe_rows",
                "surviving_rows",
                F.expr("surviving_rows * 1000000 div probe_rows")
                .alias("selectivity_ppm")))


def join_filter_audit_sql(probe_table: str, build_table: str,
                          probe_key: str, build_key: str) -> str:
    return f"""
WITH pk AS (
  SELECT ({probe_key})::BIGINT AS k, count(*) AS c
  FROM {probe_table} GROUP BY 1
), bk AS (
  SELECT DISTINCT ({build_key})::BIGINT AS k FROM {build_table}
), joined AS (
  SELECT pk.k, pk.c, bk.k IS NOT NULL AS hit
  FROM pk LEFT JOIN bk ON pk.k = bk.k
)
SELECT count(*) AS ndv_probe,
       (SELECT count(*) FROM bk) AS ndv_build,
       sum(CASE WHEN hit THEN 1 ELSE 0 END)::BIGINT AS ndv_common,
       sum(c)::BIGINT AS probe_rows,
       sum(CASE WHEN hit THEN c ELSE 0 END)::BIGINT AS surviving_rows,
       (sum(CASE WHEN hit THEN c ELSE 0 END) * 1000000
        // sum(c))::BIGINT AS selectivity_ppm
FROM joined
"""
