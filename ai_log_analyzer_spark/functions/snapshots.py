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


# ---------------------------------------------------------------------------
# Kaplan-Meier page-version survival: HOW LONG does a page version live
# before its content changes?  The recrawl-interval policy question —
# freshness_decay assumes an exponential lifetime; the KM estimator
# MEASURES the lifetime distribution nonparametrically, censoring
# correctly: a version still current at the last observation hasn't
# died, it's censored, and dropping (or death-counting) those rows
# biases the curve toward fast-changing pages (Cho & Garcia-Molina
# 2003 studied exactly this on crawl data).
#
# Scale shape: version lifetimes come from scd2_versions (windows
# partitioned by page key), the censor horizon is a same-key groupBy
# join at page grain, and EVERYTHING after is computed on the bucketed
# duration GRID — one groupBy(dur_bucket) with map-side partials, then
# cumulative windows over grid rows only (the percentile_gate /
# length_ks pattern: never a window over corpus rows).  Risk sets and
# death counts are exact integers; the survival product is the one
# float, computed as exp(Σ ln((n−d)/n)) over the grid in bucket order
# and rounded to 6 dp (IEEE-identical in both engines at that grid).


def km_survival(obs: DataFrame, key_col: str = "page_key",
                ts_col: str = "snap_ts", fp_col: str = "fp",
                bucket_s: int = 86400) -> DataFrame:
    """(dur_bucket, n_at_risk, n_died, n_censored, survival) — the
    Kaplan-Meier estimate of version lifetime, bucketed to
    ``bucket_s`` seconds.

    A non-current version dies at ``valid_to`` (duration = valid_to −
    valid_from); the current version is right-censored at the page's
    last observation.  At each bucket t: n_at_risk = versions with
    duration ≥ t (deaths AND same-bucket censorings stay in the risk
    set — the standard tie convention), and

        S(t) = Π_{u ≤ t} (n_at_risk(u) − n_died(u)) / n_at_risk(u)

    S hits exactly 0.0 when a bucket kills its whole risk set."""
    vers = scd2_versions(obs, key_col, ts_col, fp_col)
    last = (obs.groupBy(F.col(key_col).alias("page_key"))
            .agg(F.max(ts_col).alias("_last")))
    sec = lambda c: F.unix_timestamp(F.col(c)).cast("long")
    v = (vers.join(last, "page_key")
         .select(F.when(F.col("is_current"), 0).otherwise(1)
                 .cast("long").alias("died"),
                 (F.when(F.col("is_current"), sec("_last"))
                  .otherwise(sec("valid_to")) - sec("valid_from"))
                 .alias("dur_s"))
         .withColumn("dur_bucket",
                     F.expr(f"dur_s div {bucket_s}").cast("long")))
    g = (v.groupBy("dur_bucket")
         .agg(F.sum("died").cast("long").alias("n_died"),
              F.count("*").cast("long").alias("_n")))
    tot = g.agg(F.sum("_n").cast("long").alias("_tot"))
    w_prev = (Window.orderBy("dur_bucket")
              .rowsBetween(Window.unboundedPreceding, -1))
    w_cum = (Window.orderBy("dur_bucket")
             .rowsBetween(Window.unboundedPreceding, 0))
    # grid-only windows: unpartitioned by design, bounded by the
    # distinct-duration-bucket count, never corpus rows
    risk = (g.crossJoin(F.broadcast(tot))
            .withColumn("n_at_risk",
                        (F.col("_tot")
                         - F.coalesce(F.sum("_n").over(w_prev), F.lit(0)))
                        .cast("long"))
            .withColumn("_f", (F.col("n_at_risk") - F.col("n_died"))
                        / F.col("n_at_risk")))
    surv = (risk
            .withColumn("_dead", F.max((F.col("_f") == 0).cast("int"))
                        .over(w_cum))
            .withColumn("_lnsum", F.sum(
                F.when(F.col("_f") > 0, F.log("_f")).otherwise(F.lit(0.0)))
                .over(w_cum)))
    return (surv.select(
        "dur_bucket", "n_at_risk", "n_died",
        (F.col("_n") - F.col("n_died")).cast("long").alias("n_censored"),
        F.round(F.when(F.col("_dead") == 1, F.lit(0.0))
                .otherwise(F.exp("_lnsum")), 6).alias("survival")))


def km_survival_sql(obs_cte: str, bucket_s: int = 86400) -> str:
    """DuckDB oracle continuing from an ``obs_cte`` relation
    (page_key, snap_ts, fp): identical scd2 chain, censor horizon,
    integer risk sets and exp-sum-ln survival; final relation
    ``km_out``."""
    return f"""{scd2_versions_sql(obs_cte)},
km_last AS (
  SELECT page_key, max(snap_ts) AS _last FROM {obs_cte} GROUP BY 1),
km_v AS (
  SELECT (CASE WHEN s.is_current THEN 0 ELSE 1 END)::BIGINT AS died,
         ((CASE WHEN s.is_current
                THEN epoch(date_trunc('second', l._last))
                ELSE epoch(date_trunc('second', s.valid_to)) END)::BIGINT
          - epoch(date_trunc('second', s.valid_from))::BIGINT)
           // {bucket_s} AS dur_bucket
  FROM scd2 s JOIN km_last l USING (page_key)),
km_g AS (
  SELECT dur_bucket, sum(died)::BIGINT AS n_died,
         count(*)::BIGINT AS _n
  FROM km_v GROUP BY 1),
km_r AS (
  SELECT dur_bucket, n_died, _n,
         ((SELECT sum(_n) FROM km_g)
          - coalesce(sum(_n) OVER (ORDER BY dur_bucket
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING), 0))::BIGINT
           AS n_at_risk
  FROM km_g),
km_out AS (
  SELECT dur_bucket, n_at_risk, n_died,
         (_n - n_died)::BIGINT AS n_censored,
         round(CASE WHEN max((n_at_risk = n_died)::INT)
                          OVER wc = 1 THEN 0.0
               ELSE exp(sum(CASE WHEN n_at_risk > n_died
                                 THEN ln((n_at_risk - n_died)::DOUBLE
                                         / n_at_risk)
                                 ELSE 0.0 END) OVER wc) END, 6)
           AS survival
  FROM km_r
  WINDOW wc AS (ORDER BY dur_bucket
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))"""
