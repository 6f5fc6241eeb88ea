"""Crawl scheduling: budget apportionment and politeness waves.

A production crawler (and a recrawl/refresh pipeline feeding an LLM
corpus) must answer two planning questions before a single fetch:

1. **How many fetches does each domain get** out of a fixed global
   budget?  ``budget_apportion`` solves this with the largest-remainder
   (Hamilton) method over an integer weight per domain — exact integer
   arithmetic end to end, so Σ alloc == budget ALWAYS (floats would
   drop or invent fetches at the rounding edge) and every engine
   reproduces the identical allocation.

2. **In what order do a domain's URLs fetch** under a per-domain
   concurrency cap?  ``frontier_waves`` assigns each URL its politeness
   WAVE: position within the domain's priority order, integer-divided
   by the cap — wave k fetches only after wave k-1, never more than
   ``concurrency`` in flight per domain (RFC 9309 politeness is
   per-host; this is its scheduling dual).

Scale shapes:

- ``budget_apportion`` ranks remainders WITHOUT a global sort: the
  remainder axis is range-bucketed (same distributed-prefix-sum
  pattern as ``packing.pack_manifest``), per-bucket counts make a
  driver-side cumulative base over n_buckets rows, and the within-
  bucket ``row_number`` window partitions by bucket — no
  single-partition exchange at any domain count.  Everything else is
  one groupBy(domain) with map-side partials plus two scalar
  broadcasts.
- ``frontier_waves`` is one window partitioned by domain — a mega
  domain degrades to one large (still single-pass) partition; AQE
  skew handling or salt-then-restitch applies if a domain alone
  outgrows an executor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def budget_apportion(weights: DataFrame, budget: int,
                     domain_col: str = "domain",
                     weight_col: str = "weight",
                     n_buckets: int | None = None) -> DataFrame:
    """(domain, weight, base_alloc, extra, alloc) — largest-remainder
    apportionment of ``budget`` fetches proportional to ``weight``.

    Exact rule (all integer; tot = Σ weight over weight > 0 rows):

        base(d)  = (budget · w_d) div tot
        rem(d)   = (budget · w_d) mod tot
        leftover = budget − Σ base        (< #domains by construction)
        extra(d) = 1 iff rank of (rem desc, domain asc) ≤ leftover

    The budget·w product runs in a DECIMAL(38,0) lane (int64 would
    overflow past budget·w ≈ 9·10¹⁸; rem and base themselves fit
    long).  Zero/negative-weight domains are excluded (no allocation).
    Invariant: Σ alloc == budget exactly."""
    spark = weights.sparkSession
    if n_buckets is None:
        n_buckets = spark.sparkContext.defaultParallelism * 4
    w = (weights.select(F.col(domain_col).cast("long").alias("domain"),
                        F.col(weight_col).cast("long").alias("weight"))
         .where(F.col("weight") > 0)
         .groupBy("domain").agg(F.sum("weight").alias("weight")))
    tot_df = w.agg(F.sum("weight").alias("_tot"))
    shares = (w.crossJoin(F.broadcast(tot_df))
              .select(
                  "domain", "weight",
                  F.expr(f"(CAST(weight AS DECIMAL(38,0)) * {budget}) "
                         f"div _tot").cast("long").alias("base_alloc"),
                  F.expr(f"CAST((CAST(weight AS DECIMAL(38,0)) * {budget}) "
                         f"% _tot AS BIGINT)").alias("_rem"),
                  F.col("_tot"))
              .localCheckpoint(eager=True))
    row = shares.agg(F.sum("base_alloc").alias("sb"),
                     F.max("_tot").alias("tot")).collect()
    if not row or row[0].sb is None:
        return spark.createDataFrame(
            [], "domain long, weight long, base_alloc long, "
                "extra long, alloc long")
    leftover = budget - int(row[0].sb)
    tot = int(row[0].tot)
    # rank remainders distributed: range-bucket the remainder axis
    # (rem ∈ [0, tot)), count per bucket, cumulative count of HIGHER
    # buckets via a tiny driver pass, row_number only within bucket
    width = max(-(-tot // n_buckets), 1)            # ceil
    b = shares.withColumn("_b", F.expr(f"_rem div {width}"))
    counts = {r._b: r.c for r in
              b.groupBy("_b").agg(F.count("*").alias("c")).collect()}
    higher, acc = {}, 0
    for bk in sorted(counts, reverse=True):         # high rem → rank 1
        higher[bk] = acc
        acc += int(counts[bk])
    base_df = spark.createDataFrame(
        [(int(k), int(v)) for k, v in higher.items()],
        "_b long, _above long")
    win = Window.partitionBy("_b").orderBy(F.desc("_rem"), F.asc("domain"))
    ranked = (b.join(F.broadcast(base_df), "_b")
              .withColumn("_rank", F.col("_above") + F.row_number().over(win)))
    return (ranked.select(
        "domain", "weight", "base_alloc",
        F.when(F.col("_rank") <= leftover, 1).otherwise(0)
         .cast("long").alias("extra"))
        .withColumn("alloc", F.col("base_alloc") + F.col("extra")))


def budget_apportion_sql(weights_cte: str, budget: int) -> str:
    """DuckDB oracle over ``weights_cte`` (domain, weight): identical
    integer rule, remainder rank via plain row_number (the oracle may
    sort globally; the engine must not)."""
    return f"""w AS (
  SELECT domain::BIGINT AS domain, sum(weight)::BIGINT AS weight
  FROM ({weights_cte}) WHERE weight > 0 GROUP BY 1),
tot AS (SELECT sum(weight)::HUGEINT AS t FROM w),
sh AS (
  SELECT domain, weight,
         ((weight::HUGEINT * {budget}) // t.t)::BIGINT AS base_alloc,
         ((weight::HUGEINT * {budget}) % t.t)::BIGINT AS rem
  FROM w, tot t),
lo AS (SELECT {budget} - sum(base_alloc) AS leftover FROM sh),
rk AS (
  SELECT domain, weight, base_alloc,
         row_number() OVER (ORDER BY rem DESC, domain ASC) AS rnk
  FROM sh)
SELECT domain, weight, base_alloc,
       (CASE WHEN rnk <= lo.leftover THEN 1 ELSE 0 END)::BIGINT AS extra,
       (base_alloc +
        CASE WHEN rnk <= lo.leftover THEN 1 ELSE 0 END)::BIGINT AS alloc
FROM rk, lo"""


def frontier_waves(urls: DataFrame, concurrency: int = 4,
                   domain_col: str = "domain",
                   url_col: str = "url",
                   priority_col: str = "priority") -> DataFrame:
    """(url, domain, position, wave) — per-domain politeness schedule:
    URLs fetch in (priority desc, url asc) order, at most
    ``concurrency`` per domain per wave.

        position(u) = rank of u within its domain (0-based)
        wave(u)     = position div concurrency

    One window partitioned by domain — the frontier's natural key; a
    wave is a deterministic function of the row set, so reruns and
    resumes schedule identically."""
    if concurrency < 1:
        raise ValueError("concurrency must be >= 1")
    win = (Window.partitionBy(domain_col)
           .orderBy(F.desc(priority_col), F.asc(url_col)))
    pos = (F.row_number().over(win) - 1).cast("long")
    return (urls.select(F.col(url_col).alias("url"),
                        F.col(domain_col).alias("domain"),
                        F.col(priority_col).alias("priority"))
            .withColumn("position", pos)
            .withColumn("wave", F.expr(f"position div {concurrency}"))
            .drop("priority"))


def frontier_waves_sql(urls_cte: str, concurrency: int = 4) -> str:
    """DuckDB oracle over ``urls_cte`` (url, domain, priority)."""
    return f"""fw AS (
  SELECT url, domain,
         (row_number() OVER (PARTITION BY domain
                             ORDER BY priority DESC, url ASC) - 1)::BIGINT
           AS position
  FROM ({urls_cte}))
SELECT url, domain, position, (position // {concurrency})::BIGINT AS wave
FROM fw"""


# ---------------------------------------------------------------------------
# Recrawl allocation: the crawl-side composition capstone.  A recrawl
# scheduler spends a fixed fetch budget where the corpus is STALE:
# each host's weight is its stale page mass (pages × (1 − freshness)),
# freshness from the exact integer half-life decay, and the budget is
# split by the exact largest-remainder rule.  Pure composition of two
# shipped kernels — no new math, one extra broadcast join to restore
# the host name from the apportionment's integer key.


def recrawl_allocation(pages, budget: int = 10_000,
                       ts_col: str = "warc_ts", host_col: str = "host",
                       halflife_s: int = 86400):
    """(host, n_pages, weight, alloc) — fetch budget per host ∝ stale
    mass n_pages · (10⁶ − mean_fresh_ppm); Σ alloc == budget exactly
    (largest-remainder).  Hosts with zero stale mass (a fully fresh
    host) get no allocation.

    Scale shape: freshness_scores is one groupBy(host); everything
    after runs on the host-grain table (apportionment windows over
    n_buckets rows, host-name restore is a broadcast join)."""
    from .hashing import hash32
    from .temporal import freshness_scores
    fr = freshness_scores(pages, ts_col=ts_col, key_col=host_col,
                          halflife_s=halflife_s)
    w = fr.select(F.col("host"), F.col("n_pages"),
                  (F.col("n_pages")
                   * (F.lit(1_000_000) - F.col("mean_fresh_ppm")))
                  .cast("long").alias("weight"),
                  hash32(F.col("host")).cast("long").alias("_hid"))
    alloc = budget_apportion(w.select(F.col("_hid").alias("domain"),
                                      "weight"), budget)
    return (w.join(F.broadcast(alloc.select("domain", "alloc")),
                   w["_hid"] == F.col("domain"), "left")
            .select("host", "n_pages", "weight",
                    F.coalesce(F.col("alloc"), F.lit(0)).cast("long")
                    .alias("alloc")))


def recrawl_allocation_sql(pages_cte: str, budget: int = 10_000,
                           halflife_s: int = 86400) -> str:
    """DuckDB oracle: identical freshness → stale-mass → apportionment
    chain (naive remainder window)."""
    from .hashing import hash32_sql
    from .temporal import freshness_sql
    hid = hash32_sql("host")
    # budget_apportion_sql is "CTEs + bare SELECT"; nest it as a
    # parenthesized WITH-subquery so it composes under this WITH chain
    inner = ("WITH "
             + budget_apportion_sql("SELECT hid AS domain, weight FROM rw",
                                    budget))
    return f"""
WITH {freshness_sql(pages_cte, halflife_s=halflife_s).lstrip()},
rw AS (
  SELECT host, n_pages,
         (n_pages * (1000000 - mean_fresh_ppm))::BIGINT AS weight,
         {hid}::BIGINT AS hid
  FROM fr),
ra AS ({inner})
SELECT r.host, r.n_pages, r.weight,
       coalesce(a.alloc, 0)::BIGINT AS alloc
FROM rw r LEFT JOIN ra a ON r.hid = a.domain
"""
