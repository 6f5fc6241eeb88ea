"""Data-layout planning for 100-TB log/corpus stores.

Physical-design operators — the steps a petabyte log store runs BEFORE
any of the query operators in this package, because they decide how
much data those queries ever touch (and, for ``delta_bitwidth_audit``,
how many bytes it occupies at rest):

- ``zorder_layout``: multi-dimensional clustering audit.  Events are
  assigned to files under two layouts — the naive ingestion layout
  (files cut by time range) and a Z-order (Morton) layout interleaving
  the user-hash and hour dimensions — and the per-file min/max extents
  of BOTH predicate dimensions are reported.  Min/max extents are
  exactly what parquet row-group / file-footer pruning skips on: a
  point predicate on dimension x scans only files whose [min_x, max_x]
  covers it, so the sum of per-file widths IS the expected scan
  fraction under uniform point lookups.  Time-cut files each span the
  full user range (width_x = 64: user lookups scan every file); the
  Z-order files bound both widths at 8 of 64, cutting either lookup's
  expected scan ~8× — the standard Delta/Iceberg OPTIMIZE ZORDER
  argument, here measured rather than asserted.

  The Morton key is built with exact integer arithmetic only
  ((dim div 2^i) % 2 bit extraction recombined at 4^i), identical in
  Spark and DuckDB — no engine bit intrinsics, so the oracle is
  value-exact.  At scale the whole operator is one projection plus one
  64-file-per-layout aggregate: a single shuffle of (layout, file_id)
  pre-aggregated map-side to ≤128 groups.

- ``compaction_plan``: the small-files maintenance pass (Delta/Iceberg
  ``OPTIMIZE`` bin-packing): roll a partition directory's file listing
  in file order, cutting a new compaction group every time the running
  byte total crosses ``target_bytes`` — per-directory windowed prefix
  sums (every directory plans in parallel; no global window), one
  shuffle keyed by directory.  Small files are THE operational failure
  mode of a 100-TB parquet store (a 10⁶-file table pays listing +
  footer + task-schedule cost per file); the plan output is the merge
  manifest a maintenance job executes.

- ``range_partition_bounds``: exact equi-depth range-partition
  boundaries (k tiles over (value, event_id)) for sorted writes.
  Spark's own RangePartitioner SAMPLES, so two jobs that must agree on
  boundaries (a write and a later bucketed read, or an incremental
  append) can drift; this computes the exact NTILE tiling with a
  distributed rank instead: fixed value-range buckets from one min/max
  agg, per-bucket counts cumulated on the driver (tiny), within-bucket
  row_number — the same range-bucketed prefix-sum shape as
  packing.pack_manifest / sampling.shard_assign, never a global
  single-task window.  Tile assignment reproduces NTILE's exact
  semantics (first N % k tiles get one extra row) so the DuckDB
  ``ntile()`` window is a value-exact oracle.  Output is k rows:
  tile, row count, and min/max value in integer cents.

- ``delta_bitwidth_audit``: storage-encoding audit — the exact bit
  width parquet's DELTA_BINARY_PACKED would spend per timestamp value
  under the current write order, per row-group-sized block (see its
  docstring).  Bit widths come from ``length(bin(x))`` — exact integer
  binary expansion in both engines, no float log2.

No counterpart in the reference (its pipeline stops at log parsing);
this is a task-spec 100-TB-efficiency extra.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

GRID_BITS = 6                      # 64×64 grid → 12-bit Morton key
GRID = 1 << GRID_BITS
N_FILES = 64                       # files per layout
US_PER_HOUR = 3_600_000_000


def _morton(x: Column, y: Column) -> Column:
    """Interleave two GRID_BITS-wide non-negative ints: bit i of x →
    bit 2i, bit i of y → bit 2i+1.  Pure integer arithmetic (div/%/*)
    so Spark and DuckDB agree bit-for-bit."""
    z = F.lit(0).cast("long")
    for i in range(GRID_BITS):
        p2, p4 = 1 << i, 1 << (2 * i)
        z = (z + ((x.cast("long") / F.lit(p2)).cast("long") % 2) * F.lit(p4)
               + ((y.cast("long") / F.lit(p2)).cast("long") % 2)
               * F.lit(2 * p4))
    return z


def _morton_sql(x: str, y: str) -> str:
    terms = []
    for i in range(GRID_BITS):
        p2, p4 = 1 << i, 1 << (2 * i)
        terms.append(f"(({x}) // {p2}) % 2 * {p4}")
        terms.append(f"(({y}) // {p2}) % 2 * {2 * p4}")
    return " + ".join(terms)


def zorder_layout(events: DataFrame,
                  ts_col: str = "ts", key_col: str = "user_id") -> DataFrame:
    """Per-(layout, file) clustering stats: n_rows and min/max/width of
    the user-bucket (x) and hour-bucket (y) predicate dimensions under
    the time-cut vs Z-order file layouts (module docstring)."""
    # testdata ts is TIMESTAMP_NTZ; session tz is pinned UTC (conf.py)
    # so the cast reads the naive value as UTC — exactly DuckDB's
    # epoch_us() on the same naive timestamp
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    x = F.pmod(F.col(key_col).cast("long"), F.lit(GRID))
    y = F.pmod(F.expr(f"unix_micros(cast({ts_col} as timestamp)) "
                      f"div {US_PER_HOUR}"), F.lit(GRID))
    base = events.select(us.alias("_us"), x.alias("x"), y.alias("y"))
    # corpus time bounds for the time-cut layout (tiny broadcast agg)
    mm = base.agg(F.min("_us").alias("lo"), F.max("_us").alias("hi"))
    z = _morton(F.col("x"), F.col("y"))
    laid = (base.crossJoin(F.broadcast(mm))
            .withColumn("file_time",
                        F.expr(f"((_us - lo) * {N_FILES}) div "
                               f"(hi - lo + 1)"))
            .withColumn("file_z",
                        (z / F.lit(GRID * GRID // N_FILES)).cast("long")))
    stacked = (laid.select(F.lit("time").alias("layout"),
                           F.col("file_time").alias("file_id"), "x", "y")
               .unionByName(
                   laid.select(F.lit("zorder").alias("layout"),
                               F.col("file_z").alias("file_id"), "x", "y")))
    return (stacked.groupBy("layout", "file_id")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.min("x").alias("min_x"), F.max("x").alias("max_x"),
                 F.min("y").alias("min_y"), F.max("y").alias("max_y"))
            .withColumn("width_x", F.col("max_x") - F.col("min_x") + 1)
            .withColumn("width_y", F.col("max_y") - F.col("min_y") + 1))


def zorder_layout_sql(table: str = "events", ts_expr: str = "ts",
                      key_expr: str = "user_id") -> str:
    z = _morton_sql("x", "y")
    return f"""
WITH base AS (
  SELECT epoch_us({ts_expr}) AS us,
         ((({key_expr})::BIGINT % {GRID}) + {GRID}) % {GRID} AS x,
         ((epoch_us({ts_expr}) // {US_PER_HOUR}) % {GRID} + {GRID})
           % {GRID} AS y
  FROM {table}
), mm AS (
  SELECT min(us) AS lo, max(us) AS hi FROM base
), laid AS (
  SELECT x, y,
         ((us - lo) * {N_FILES}) // (hi - lo + 1) AS file_time,
         ({z}) // {GRID * GRID // N_FILES} AS file_z
  FROM base, mm
), stacked AS (
  SELECT 'time' AS layout, file_time AS file_id, x, y FROM laid
  UNION ALL
  SELECT 'zorder' AS layout, file_z AS file_id, x, y FROM laid
)
SELECT layout, file_id, count(*) AS n_rows,
       min(x) AS min_x, max(x) AS max_x,
       min(y) AS min_y, max(y) AS max_y,
       max(x) - min(x) + 1 AS width_x,
       max(y) - min(y) + 1 AS width_y
FROM stacked GROUP BY layout, file_id
"""


DOCS_PER_FILE = 20
TARGET_BYTES = 2_000     # test-corpus scale; production: 128 MB-1 GB


def compaction_plan(docs: DataFrame, source_col: str = "source",
                    id_col: str = "doc_id", bytes_col: str = "n_chars",
                    docs_per_file: int = DOCS_PER_FILE,
                    target_bytes: int = TARGET_BYTES) -> DataFrame:
    """Small-files compaction manifest (module docstring).  Synthetic
    file listing: every ``docs_per_file`` consecutive doc_ids within a
    source = one file with bytes = sum(bytes_col).  Output one row per
    file: source, file_idx, n_docs, bytes, is_small, grp (the
    compaction group the maintenance job merges it into)."""
    files = (docs.select(F.col(source_col).alias("source"),
                         F.expr(f"{id_col} div {docs_per_file}")
                         .alias("file_idx"),
                         F.col(bytes_col).cast("long").alias("b"))
             .groupBy("source", "file_idx")
             .agg(F.count(F.lit(1)).alias("n_docs"),
                  F.sum("b").alias("bytes")))
    # per-directory prefix sum: window partitioned by source — every
    # directory plans independently and in parallel; group = how many
    # target multiples the running total BEFORE this file has crossed
    w = (Window.partitionBy("source").orderBy("file_idx")
         .rowsBetween(Window.unboundedPreceding, -1))
    cum_before = F.coalesce(F.sum("bytes").over(w), F.lit(0))
    return (files.withColumn("is_small",
                             F.col("bytes") < F.lit(target_bytes))
            .withColumn("_cum", cum_before)
            # `div` = exact integral division (a directory's running
            # byte total can exceed the 2^53 double-exact range)
            .withColumn("grp", F.expr(f"_cum div {target_bytes}"))
            .drop("_cum"))


def compaction_plan_sql(table: str = "documents",
                        source_expr: str = "source",
                        id_expr: str = "doc_id",
                        bytes_expr: str = "n_chars",
                        docs_per_file: int = DOCS_PER_FILE,
                        target_bytes: int = TARGET_BYTES) -> str:
    return f"""
WITH files AS (
  SELECT {source_expr} AS source,
         ({id_expr}) // {docs_per_file} AS file_idx,
         count(*) AS n_docs,
         sum(({bytes_expr})::BIGINT)::BIGINT AS bytes
  FROM {table} GROUP BY 1, 2
)
SELECT source, file_idx, n_docs, bytes,
       bytes < {target_bytes} AS is_small,
       (coalesce(sum(bytes) OVER (PARTITION BY source ORDER BY file_idx
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        // {target_bytes})::BIGINT AS grp
FROM files
"""


def range_partition_bounds(events: DataFrame, value_col: str = "value",
                           id_col: str = "event_id", k: int = 16,
                           n_buckets: int | None = None) -> DataFrame:
    """Exact equi-depth k-tile boundaries over (value, id) — NTILE
    semantics via a distributed rank (module docstring).  Output:
    tile (1..k), n_rows, lo_cents, hi_cents."""
    spark = events.sparkSession
    if n_buckets is None:
        n_buckets = spark.sparkContext.defaultParallelism * 4
    vals = (events.select(F.col(value_col).cast("double").alias("v"),
                          F.col(id_col).cast("long").alias("i"))
            .where(F.col("v").isNotNull()))
    mm = vals.agg(F.min("v").alias("lo"), F.max("v").alias("hi")).collect()[0]
    if mm.lo is None:
        return spark.createDataFrame(
            [], "tile long, n_rows long, lo_cents long, hi_cents long")
    span = max(float(mm.hi) - float(mm.lo), 0.0)
    width = (span / n_buckets) or 1.0
    # internal only — bucket boundaries need no oracle parity, just
    # monotonicity in v (floor is monotone) and one consistent job
    bucket = F.least(F.floor((F.col("v") - F.lit(float(mm.lo)))
                             / F.lit(width)).cast("long"),
                     F.lit(n_buckets - 1))
    vals = vals.withColumn("_b", bucket)
    totals = {r._b: r.c for r in
              vals.groupBy("_b").agg(F.count(F.lit(1)).alias("c")).collect()}
    base, acc = {}, 0
    for b in sorted(totals):
        base[b] = acc
        acc += int(totals[b])
    n = acc
    base_df = spark.createDataFrame(
        [(int(b), int(o)) for b, o in base.items()], "_b long, _base long")
    w = Window.partitionBy("_b").orderBy("v", "i")
    rank = (F.col("_base") + F.row_number().over(w)).alias("r")  # 1-based
    ranked = vals.join(F.broadcast(base_df), "_b").select("v", rank)
    # exact NTILE(k): first n%k tiles hold n//k + 1 rows, rest n//k
    q, rem = n // k, n % k
    cut = rem * (q + 1)
    tile = F.when(F.col("r") <= F.lit(cut),
                  F.expr(f"(r - 1) div {q + 1}") + 1) \
            .otherwise(F.lit(rem) + F.expr(f"(r - 1 - {cut}) div {max(q, 1)}")
                       + 1)
    cents = F.round(F.col("v") * 100).cast("long")
    return (ranked.withColumn("tile", tile.cast("long"))
            .groupBy("tile")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.min(cents).alias("lo_cents"),
                 F.max(cents).alias("hi_cents")))


def range_partition_bounds_sql(table: str = "events",
                               value_expr: str = "value",
                               id_expr: str = "event_id",
                               k: int = 16) -> str:
    return f"""
WITH ranked AS (
  SELECT ({value_expr})::DOUBLE AS v,
         ntile({k}) OVER (ORDER BY ({value_expr})::DOUBLE,
                          ({id_expr})::BIGINT) AS tile
  FROM {table} WHERE {value_expr} IS NOT NULL
)
SELECT tile::BIGINT AS tile, count(*) AS n_rows,
       min(round(v * 100)::BIGINT) AS lo_cents,
       max(round(v * 100)::BIGINT) AS hi_cents
FROM ranked GROUP BY tile
"""


ROWS_PER_BLOCK = 1000


def delta_bitwidth_audit(events: DataFrame, ts_col: str = "ts",
                         id_col: str = "event_id",
                         rows_per_block: int = ROWS_PER_BLOCK) -> DataFrame:
    """Storage-encoding audit: how many bits per value would parquet's
    DELTA_BINARY_PACKED spend on the timestamp column if rows are
    written in id order, per row-group-sized block?

    Delta encoding stores successive differences bit-packed at the
    block's max delta width; a time-ordered log table needs ~20-30
    bits/value instead of 64 — but ONLY if the write order preserves
    time locality.  This measures it: per block (``rows_per_block``
    consecutive ids), the max |Δ microseconds| between adjacent rows,
    the bit width that delta needs (length of the binary expansion —
    exact in both engines via bin()/length, no float log2), the 64-bit
    raw width, and the exact savings ppm.  A shuffled write order shows
    up immediately as delta_bits ≈ raw_bits.

    Per-block lag windows partition on the block key — every block
    computes in parallel, one exchange, never a global sort."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    base = events.select(F.col(id_col).cast("long").alias("i"),
                         us.alias("us")) \
        .withColumn("blk", F.expr(f"i div {rows_per_block}"))
    w = Window.partitionBy("blk").orderBy("i")
    delta = F.abs(F.col("us") - F.lag("us").over(w))
    per = (base.withColumn("d", delta)
           .groupBy("blk")
           .agg(F.count(F.lit(1)).alias("n_rows"),
                F.coalesce(F.max("d"), F.lit(0)).alias("max_abs_delta_us"),
                F.max("us").alias("max_us")))
    return per.select(
        "blk", "n_rows", "max_abs_delta_us",
        F.length(F.bin(F.col("max_abs_delta_us"))).cast("long")
        .alias("delta_bits"),
        F.lit(64).cast("long").alias("raw_bits"),
        F.expr("(64 - length(bin(max_abs_delta_us))) * 1000000 div 64")
        .alias("savings_ppm"))


def delta_bitwidth_audit_sql(table: str = "events", ts_expr: str = "ts",
                             id_expr: str = "event_id",
                             rows_per_block: int = ROWS_PER_BLOCK) -> str:
    return f"""
WITH base AS (
  SELECT ({id_expr})::BIGINT AS i, epoch_us({ts_expr}) AS us,
         ({id_expr})::BIGINT // {rows_per_block} AS blk
  FROM {table}
), lagged AS (
  SELECT blk, us,
         abs(us - lag(us) OVER (PARTITION BY blk ORDER BY i)) AS d
  FROM base
), per AS (
  SELECT blk, count(*) AS n_rows,
         coalesce(max(d), 0)::BIGINT AS max_abs_delta_us
  FROM lagged GROUP BY blk
)
SELECT blk, n_rows, max_abs_delta_us,
       length(bin(max_abs_delta_us))::BIGINT AS delta_bits,
       64::BIGINT AS raw_bits,
       ((64 - length(bin(max_abs_delta_us))) * 1000000 // 64)::BIGINT
         AS savings_ppm
FROM per
"""
