"""Data contracts — constraint validation at ingest grain.

The dbt-test / Delta-CHECK-constraint layer a production table carries:
violations must be COUNTED (quarantine + alert thresholds), not just
detected, and at 100 TB the validation pass has to be as cheap as a
scan.  Two operators:

- ``fk_integrity_audit``: referential integrity across the star
  schema's foreign-key edges (lineitem→orders, orders→customer,
  customer→nation, supplier→nation).  Per edge: child rows, distinct
  child keys, dangling keys (present in the child, absent from the
  parent), dangling rows, and exact dangling ppm.  Shape per edge:
  the child collapses to a per-key count grid FIRST (map-side
  partials), the parent to a distinct-key grid, and a left join on the
  grids counts the orphans — fact rows never shuffle, the same
  grid-only discipline as stats.join_filter_audit.  Parent key grids
  of dimension tables are broadcast-sized; the grid join stays a
  shuffle join only for fact→fact edges.

- ``data_contract_audit``: per-rule violation counts over a frozen
  rule set (value ≥ 0, event_type ∈ the producer enum, ts within the
  contract window, user_id within id-space bounds, props parses as a
  JSON object).  ONE pass: every rule is a conditional sum of the same
  groupBy-less aggregate, unpivoted with stack() — adding a rule adds
  a column to the scan, never a second scan.

A zero-violation result is the PASS state, and the synthetic corpus
passes by construction; the hand-computed pytest fixtures inject
violations of every rule to pin the counting.  No counterpart in the
reference; task-spec operational extras.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FK_EDGES = [
    # (edge name, child table, child key, parent table, parent key)
    ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
]

CONTRACT_TYPES = ("click", "error", "purchase", "signup", "view")
TS_LO, TS_HI = "2024-01-01", "2026-01-01"
UID_LO, UID_HI = 0, 1_000_000


def fk_integrity_audit(tables: dict[str, DataFrame],
                       edges=FK_EDGES) -> DataFrame:
    """One row per FK edge: edge, child_rows, n_child_keys,
    dangling_keys, dangling_rows, dangling_ppm (module docstring)."""
    outs = []
    for name, child_t, child_k, parent_t, parent_k in edges:
        ck = (tables[child_t]
              .groupBy(F.col(child_k).cast("long").alias("k"))
              .agg(F.count(F.lit(1)).alias("c")))
        pk = (tables[parent_t]
              .select(F.col(parent_k).cast("long").alias("k")).distinct()
              .withColumn("_hit", F.lit(1)))
        miss = F.col("_hit").isNull()
        agg = ck.join(pk, "k", "left").agg(
            F.sum("c").alias("child_rows"),
            F.count(F.lit(1)).alias("n_child_keys"),
            F.sum(F.when(miss, 1).otherwise(0)).alias("dangling_keys"),
            F.sum(F.when(miss, F.col("c")).otherwise(0))
            .alias("dangling_rows"))
        outs.append(agg.select(
            F.lit(name).alias("edge"), "*",
            F.expr("dangling_rows * 1000000 div child_rows")
            .alias("dangling_ppm")))
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def fk_integrity_audit_sql(edges=FK_EDGES) -> str:
    parts = []
    for name, child_t, child_k, parent_t, parent_k in edges:
        parts.append(f"""
SELECT '{name}' AS edge, sum(c)::BIGINT AS child_rows,
       count(*) AS n_child_keys,
       sum(CASE WHEN hit IS NULL THEN 1 ELSE 0 END)::BIGINT
         AS dangling_keys,
       sum(CASE WHEN hit IS NULL THEN c ELSE 0 END)::BIGINT
         AS dangling_rows,
       (sum(CASE WHEN hit IS NULL THEN c ELSE 0 END) * 1000000
        // sum(c))::BIGINT AS dangling_ppm
FROM (SELECT ck.k, ck.c, pk.hit
      FROM (SELECT ({child_k})::BIGINT AS k, count(*) AS c
            FROM {child_t} GROUP BY 1) ck
      LEFT JOIN (SELECT DISTINCT ({parent_k})::BIGINT AS k, 1 AS hit
                 FROM {parent_t}) pk ON ck.k = pk.k)""")
    return " UNION ALL ".join(parts)


def _rules_sql(ts_col: str = "ts"):
    """(rule name, DuckDB violation SQL) — plain strings, buildable at
    import time with no Spark session (oracle generation runs first)."""
    types = ", ".join(f"'{t}'" for t in CONTRACT_TYPES)
    return [
        ("value_nonnegative", "value < 0"),
        ("type_in_enum", f"event_type NOT IN ({types})"),
        ("ts_in_window",
         f"{ts_col} < TIMESTAMP '{TS_LO}' OR "
         f"{ts_col} >= TIMESTAMP '{TS_HI}'"),
        ("user_id_in_range",
         f"user_id < {UID_LO} OR user_id >= {UID_HI}"),
        ("props_json_object", "json_extract(props, '$.k') IS NULL"),
    ]


def _rules_spark(ts_col: str = "ts"):
    """(rule name, Spark violation predicate) — mirrors _rules_sql;
    requires an active session, so only built inside the operator."""
    return [
        ("value_nonnegative", F.col("value") < 0),
        ("type_in_enum", ~F.col("event_type").isin(*CONTRACT_TYPES)),
        ("ts_in_window",
         (F.col(ts_col) < F.lit(TS_LO).cast("timestamp_ntz")) |
         (F.col(ts_col) >= F.lit(TS_HI).cast("timestamp_ntz"))),
        ("user_id_in_range",
         (F.col("user_id") < UID_LO) | (F.col("user_id") >= UID_HI)),
        ("props_json_object",
         F.get_json_object(F.col("props"), "$.k").isNull()),
    ]


def data_contract_audit(events: DataFrame,
                        ts_col: str = "ts") -> DataFrame:
    """One row per contract rule: rule, n_rows, violations,
    violation_ppm — all rules in ONE scan (module docstring).  NULLs
    in a checked column count as violations (a violated NOT NULL is a
    violated contract), via coalesce(pred, true)."""
    rules = _rules_spark(ts_col)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for name, pred in rules:
        aggs.append(F.sum(F.when(F.coalesce(pred, F.lit(True)), 1)
                          .otherwise(0)).alias(f"__v_{name}"))
    one = events.agg(*aggs)
    stacked = ", ".join(f"'{name}', __n, __v_{name}"
                        for name, _p in rules)
    return (one.selectExpr(
        f"stack({len(rules)}, {stacked}) as (rule, n_rows, violations)")
        .select("*", F.expr("violations * 1000000 div n_rows")
                .alias("violation_ppm")))


def data_contract_audit_sql(table: str = "events") -> str:
    rules = _rules_sql()
    parts = [
        f"SELECT '{name}' AS rule, count(*) AS n_rows, "
        f"sum(CASE WHEN coalesce({sql}, TRUE) THEN 1 ELSE 0 END)::BIGINT"
        f" AS violations, "
        f"(sum(CASE WHEN coalesce({sql}, TRUE) THEN 1 ELSE 0 END) "
        f"* 1000000 // count(*))::BIGINT AS violation_ppm "
        f"FROM {table}"
        for name, sql in rules]
    return " UNION ALL ".join(parts)


def load_tables(spark: SparkSession, sf_dir: str,
                names) -> dict[str, DataFrame]:
    return {n: spark.read.parquet(f"{sf_dir}/{n}.parquet") for n in names}
