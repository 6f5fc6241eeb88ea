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

from pyspark.sql import DataFrame
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
