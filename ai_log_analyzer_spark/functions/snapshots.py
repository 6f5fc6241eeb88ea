"""Crawl-snapshot diff: what changed between two crawls of the same
URL space — the incremental-ingestion primitive (Common Crawl publishes
monthly snapshots; a training pipeline reprocesses only `added` +
`changed` pages and tombstones `removed` ones instead of re-running the
whole curation DAG over 10¹² rows).

Shape: ONE full-outer equi-join on the canonical url (both sides
pre-projected to (url, fingerprint) — fixed-width join payload, the fat
text column never enters the shuffle), then a four-way codegen CASE on
null-ness + fingerprint equality.  Url keys are unique per side (crawl
snapshots are keyed scans), so the join has no fan-out; key skew does
not exist by construction.  At 100 TB this is exactly two column-pruned
scans + one shuffle.

No counterpart in the reference (log pipeline); task-spec extra for the
training-data path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import fingerprint

STATUSES = ("added", "removed", "changed", "unchanged")


def snapshot_diff(old: DataFrame, new: DataFrame,
                  url_col: str = "url",
                  text_col: str = "text") -> DataFrame:
    """(url, status) for every url in either snapshot: 'added' (new
    only), 'removed' (old only), 'changed' (both, content fingerprint
    differs), 'unchanged'.  Fingerprints are the shared
    whitespace-normalized md5 kernel (functions/text.fingerprint), so
    formatting-only edits do not count as changes."""
    o = old.select(F.col(url_col).alias("url"),
                   fingerprint(F.col(text_col)).alias("_fp_old"))
    n = new.select(F.col(url_col).alias("url"),
                   fingerprint(F.col(text_col)).alias("_fp_new"))
    j = o.join(n, "url", "full_outer")
    status = (F.when(F.col("_fp_old").isNull(), F.lit("added"))
               .when(F.col("_fp_new").isNull(), F.lit("removed"))
               .when(F.col("_fp_old") != F.col("_fp_new"),
                     F.lit("changed"))
               .otherwise(F.lit("unchanged")))
    return j.select("url", status.alias("status"))


def snapshot_diff_counts(old: DataFrame, new: DataFrame,
                         url_col: str = "url",
                         text_col: str = "text") -> DataFrame:
    """(status, n_urls) rollup of ``snapshot_diff``."""
    return (snapshot_diff(old, new, url_col, text_col)
            .groupBy("status").agg(F.count("*").alias("n_urls")))


def snapshot_diff_sql(old_cte: str, new_cte: str,
                      fp_sql) -> str:
    """DuckDB mirror: ``old_cte``/``new_cte`` are CTE names with columns
    (url, text); ``fp_sql`` is the fingerprint SQL builder
    (functions/text.fingerprint_sql)."""
    return f"""
o AS (SELECT url AS url_o, {fp_sql('text')} AS fp_old FROM {old_cte}),
n AS (SELECT url AS url_n, {fp_sql('text')} AS fp_new FROM {new_cte}),
d AS (
  SELECT coalesce(url_o, url_n) AS url,
         CASE WHEN url_o IS NULL THEN 'added'
              WHEN url_n IS NULL THEN 'removed'
              WHEN fp_old <> fp_new THEN 'changed'
              ELSE 'unchanged' END AS status
  FROM o FULL OUTER JOIN n ON url_o = url_n
)"""


# ---------------------------------------------------------------------------
# SCD2 page-version intervals (Kimball type-2 slowly-changing dimension)
# ---------------------------------------------------------------------------
# A 10^12-doc crawl table isn't one snapshot — it's every snapshot, and
# "what did this url say when the model trained" needs validity
# intervals, not rows.  SCD2 collapses a page's observation history
# into runs of identical content: one row per (page, content-run) with
# [valid_from, valid_to) and an is_current flag — the warehouse-
# standard temporal compaction (Kimball & Ross, The Data Warehouse
# Toolkit).
#
# Scale shape: everything is windows PARTITIONED BY the page key —
# one shuffle co-locates each page's (bounded) history, then
# change-flag, running-sum version numbering, per-version min/max and
# the next-version lead all run within the partition; no global
# window, no join back to the corpus.


def scd2_versions(obs: DataFrame, key_col: str = "page_key",
                  ts_col: str = "snap_ts",
                  fp_col: str = "fp") -> DataFrame:
    """(page_key, version_no, fp, valid_from, valid_to, is_current,
    n_obs) from an observation log (page_key, snap_ts, fp).

    A version = a maximal run of consecutive observations with the
    same fingerprint; version_no = running sum of change flags (1-
    based), valid_to = the next version's valid_from (NULL on the
    current version).  Requires distinct (key, ts) observations —
    ordering uses (ts, fp) so equal-ts rows of a replayed log stay
    stable."""
    w = Window.partitionBy("page_key").orderBy("snap_ts", "fp")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rows = (obs.select(F.col(key_col).alias("page_key"),
                       F.col(ts_col).alias("snap_ts"),
                       F.col(fp_col).alias("fp"))
            .withColumn("_prev", F.lag("fp").over(w))
            .withColumn("_chg",
                        F.when(F.col("_prev").isNull() |
                               (F.col("_prev") != F.col("fp")),
                               F.lit(1)).otherwise(F.lit(0)))
            .withColumn("version_no",
                        F.sum("_chg").over(wsum).cast("long")))
    vers = (rows.groupBy("page_key", "version_no")
            .agg(F.min("fp").alias("fp"),
                 F.min("snap_ts").alias("valid_from"),
                 F.count("*").cast("long").alias("n_obs")))
    wv = Window.partitionBy("page_key").orderBy("version_no")
    return (vers.withColumn("valid_to",
                            F.lead("valid_from").over(wv))
            .withColumn("is_current", F.col("valid_to").isNull())
            .select("page_key", "version_no", "fp", "valid_from",
                    "valid_to", "is_current", "n_obs"))


def scd2_versions_sql(obs_cte: str) -> str:
    """Oracle over a CTE named ``obs_cte`` with columns
    (page_key, snap_ts, fp): same flags, running sum and leads."""
    return f"""
flagged AS (
  SELECT page_key, snap_ts, fp,
         CASE WHEN lag(fp) OVER w IS NULL
                OR lag(fp) OVER w <> fp THEN 1 ELSE 0 END AS _chg
  FROM {obs_cte}
  WINDOW w AS (PARTITION BY page_key ORDER BY snap_ts, fp)),
numbered AS (
  SELECT *, sum(_chg) OVER (PARTITION BY page_key
                            ORDER BY snap_ts, fp
                            ROWS UNBOUNDED PRECEDING)::BIGINT AS version_no
  FROM flagged),
vers AS (
  SELECT page_key, version_no, min(fp) AS fp,
         min(snap_ts) AS valid_from, count(*)::BIGINT AS n_obs
  FROM numbered GROUP BY 1, 2),
scd2 AS (
  SELECT page_key, version_no, fp, valid_from,
         lead(valid_from) OVER (PARTITION BY page_key
                                ORDER BY version_no) AS valid_to,
         lead(valid_from) OVER (PARTITION BY page_key
                                ORDER BY version_no) IS NULL AS is_current,
         n_obs
  FROM vers)"""
