"""Temporal join / rollup operators the reference engine family ships
but vanilla Spark SQL lacks as primitives: as-of join, banded range
join, and the hypertable-style multi-granularity rollup.

All three are expressed as compositions of existing DataFrame ops (the
task-spec's preferred strategy (a)) — no Python UDFs, no mapInPandas —
so Catalyst sees the whole plan and every one of them survives a 100×
scale-up:

- ``asof_join``: ONE shuffle+sort per key (the tag-union + ordered
  last_value(ignorenulls) pattern) — never a per-row probe, never a
  range-exploded join.  This is how kdb's ``aj`` / Flink's temporal
  join semantics map onto a shuffle-sort engine.
- ``range_join_count``: time-bucketized equi-join (each probe row
  expands to exactly ``ceil(span/bucket)+1`` candidate buckets) — the
  standard trick that turns an O(n·m) theta-join into an equi-join
  with bounded fan-out.
- ``hypertable_rollup``: GROUPING SETS — one scan, one shuffle, all
  granularities; partial aggregation happens map-side for every
  grouping set simultaneously.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, key: str, ts: str,
              value_cols: list[str],
              tie_col: str) -> DataFrame:
    """For every left row, attach the LATEST right row with
    ``right.ts <= left.ts`` for the same ``key`` (NULLs when no prior
    right row exists).  Ties on ``ts`` are broken by ``tie_col``
    (largest wins) so the result is deterministic even with duplicate
    timestamps.

    Scale shape: both inputs are tag-unioned and processed with ONE
    window per key — a single hash exchange on ``key`` plus an in-
    partition sort by (ts, side, tie).  Right rows sort BEFORE left
    rows at equal ts (side 0 < 1), so a right row stamped exactly at
    the left row's ts IS visible to it ("at or before" semantics).
    ``last_value(..., ignorenulls=True)`` then carries each right
    row's payload forward to every later left row.  No join fan-out,
    no range explosion, no per-row lookup — O(n log n) per partition,
    the canonical MPP as-of plan.  Skewed keys (one mega-user) are the
    only hazard; at web scale, pre-split hot keys by coarse time range
    and as-of within the range (the carried value crosses ranges only
    at the first row, patchable with a second tiny pass)."""
    lcols = [F.col(key), F.col(ts), F.lit(1).alias("_side"),
             F.col(tie_col).alias("_tie"),
             *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_r_{c}")
               for c in value_cols],
             *[F.col(c) for c in left.columns if c not in (key, ts)]]
    rcols = [F.col(key), F.col(ts), F.lit(0).alias("_side"),
             F.col(tie_col).alias("_tie"),
             *[F.col(c).alias(f"_r_{c}") for c in value_cols],
             *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
               for c in left.columns if c not in (key, ts)]]
    u = left.select(*lcols).unionByName(right.select(*rcols))
    w = (Window.partitionBy(key).orderBy(F.col(ts), F.col("_side"), F.col("_tie"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = u.select(
        "*", *[F.last(F.when(F.col("_side") == 0, F.col(f"_r_{c}")),
                      ignorenulls=True).over(w).alias(f"asof_{c}")
               for c in value_cols])
    keep = [key, ts, *[c for c in left.columns if c not in (key, ts)],
            *[f"asof_{c}" for c in value_cols]]
    return carried.filter(F.col("_side") == 1).select(*keep)


def range_join_count(left: DataFrame, right: DataFrame, key: str, ts: str,
                     span_s: int, left_id: str) -> DataFrame:
    """(left row, n_in_range): count right rows for the same ``key``
    with ``left.ts < right.ts <= left.ts + span_s`` — a banded range
    join turned into an equi-join.

    Scale shape: both sides get integer bucket = floor(epoch/span);
    each LEFT row probes exactly two buckets (b, b+1 — any right ts in
    the window lives in one of them), so the join is an equi-join on
    (key, bucket) with fan-out 2, then the exact interval predicate
    filters in-place.  The exchange keys are fixed-width ints; skew is
    bounded by per-(key, span) event density, which AQE's skew-join
    splits.  Never a theta-join, never a cartesian."""
    lb = F.floor(F.unix_timestamp(F.col(ts)) / span_s).cast("long")
    probe = (left
             .select(F.col(left_id).alias("_lid"), F.col(key), F.col(ts).alias("_lts"),
                     F.explode(F.array(lb, lb + 1)).alias("_bkt")))
    build = (right
             .select(F.col(key), F.col(ts).alias("_rts"))
             .withColumn("_bkt", F.floor(F.unix_timestamp(F.col("_rts")) / span_s)
                         .cast("long")))
    hits = (probe.join(build, [key, "_bkt"])
            .filter((F.col("_rts") > F.col("_lts")) &
                    (F.col("_rts") <= F.col("_lts") + F.expr(f"INTERVAL {span_s} SECOND")))
            .groupBy("_lid").agg(F.count("*").alias("n_in_range")))
    return (left.select(F.col(left_id).alias("_lid"), F.col(key), F.col(ts))
            .join(hits, "_lid", "left")
            .select(F.col("_lid").alias(left_id), key, ts,
                    F.coalesce("n_in_range", F.lit(0)).alias("n_in_range")))


def hypertable_rollup(df: DataFrame, ts: str, group_col: str,
                      value_milli: Column) -> DataFrame:
    """TimescaleDB-style continuous-aggregate rollup: per group_col
    counts + exact milli-unit value sums at BOTH hour and day
    granularity, in ONE pass via GROUPING SETS.

    (group, day, hour, grain, n_events, sum_value) where grain is
    'hour' or 'day' and hour is NULL on day rows.  The value sum is
    accumulated in exact integer milli-units (order-independent) and
    scaled back at the end, so the DuckDB oracle hashes identically.

    Scale shape: GROUPING SETS compiles to a single Expand + one hash
    aggregate — each input row is expanded to one record per grouping
    set, partially aggregated map-side, and shuffled once on the
    compound grouping key.  At 100 TB this beats two separate
    aggregations (two scans, two shuffles) and is exactly how a
    hypertable's multi-level continuous aggregates materialize."""
    base = df.select(
        F.col(group_col).alias("grp"),
        F.date_trunc("DAY", F.col(ts)).alias("day"),
        F.date_trunc("HOUR", F.col(ts)).alias("hour"),
        value_milli.alias("_vm"))
    base.createOrReplaceTempView("_rollup_in")
    return base.sparkSession.sql("""
        SELECT grp, day, hour,
               CASE WHEN grouping(hour) = 1 THEN 'day' ELSE 'hour' END AS grain,
               count(*) AS n_events,
               -- 1000.0 is a DECIMAL literal in Spark SQL, so the division
               -- is exact decimal; cast the rounded result to DOUBLE so the
               -- output type matches DuckDB's (double) for value-hash parity
               CAST(round(sum(_vm) / 1000.0, 3) AS DOUBLE) AS sum_value
        FROM _rollup_in
        GROUP BY GROUPING SETS ((grp, day, hour), (grp, day))
    """)


# ---------------------------------------------------------------------------
# Crawl freshness decay.  Recrawl schedulers and training-data mixers
# weight pages by age with an exponential half-life; keeping the decay
# in EXACT integers (power-of-two halving via a bit shift, integer
# division) makes the score reproducible across engines, partitionings
# and cluster sizes — no libm pow in the hot path.


def freshness_scores(df: DataFrame, ts_col: str = "warc_ts",
                     key_col: str = "host",
                     halflife_s: int = 86400) -> DataFrame:
    """(host, n_pages, mean_fresh_ppm, min_age_s, max_age_s) per key:
    freshness = 1e6 div 2^(age div halflife) per page (age measured
    from the corpus' newest capture — deterministic in the data),
    aggregated to an exact-integer per-host mean.

    Scale shape: the corpus max timestamp is a 1-row broadcast; decay
    is a zero-shuffle integer projection; the rollup is ONE
    partial-aggregable groupBy(host)."""
    ep = F.unix_timestamp(F.col(ts_col)).cast("long")
    mx = df.agg(F.max(ep).alias("_max_ep"))
    aged = (df.select(F.col(key_col).alias("host"), ep.alias("_ep"))
            .crossJoin(F.broadcast(mx))
            .withColumn("age_s", F.col("_max_ep") - F.col("_ep"))
            .withColumn(
                "fresh_ppm",
                F.expr(f"1000000 div (shiftleft(cast(1 as bigint), "
                       f"cast(least(age_s div {halflife_s}, 62) as int)))")
                .cast("long")))
    return (aged.groupBy("host")
            .agg(F.count("*").cast("long").alias("n_pages"),
                 F.sum("fresh_ppm").alias("_sum"),
                 F.min("age_s").cast("long").alias("min_age_s"),
                 F.max("age_s").cast("long").alias("max_age_s"))
            .select("host", "n_pages",
                    F.expr("_sum div n_pages").cast("long")
                    .alias("mean_fresh_ppm"),
                    "min_age_s", "max_age_s"))


def freshness_sql(pages: str, ts_expr: str = "warc_ts",
                  key_expr: str = "host", halflife_s: int = 86400) -> str:
    """DuckDB oracle: identical integer decay (shift + div)."""
    return f"""
fr_aged AS (
  SELECT {key_expr} AS host,
         (SELECT max(epoch({ts_expr})::BIGINT) FROM {pages})
           - epoch({ts_expr})::BIGINT AS age_s
  FROM {pages}),
fr AS (
  SELECT host, count(*)::BIGINT AS n_pages,
         (sum(1000000 // (1::BIGINT << least(age_s // {halflife_s}, 62)))
          // count(*))::BIGINT AS mean_fresh_ppm,
         min(age_s)::BIGINT AS min_age_s,
         max(age_s)::BIGINT AS max_age_s
  FROM fr_aged GROUP BY host)"""


def interarrival_stats(events: DataFrame, key_col: str = "user_id",
                       ts_col: str = "ts", tie_col: str = "event_id",
                       min_gaps: int = 3,
                       regular_cv2_ppm: int = 250_000) -> DataFrame:
    """(key, n_gaps, mean_gap_s, cv2_ppm, is_regular) — machine-traffic
    detection via inter-arrival-time regularity: humans produce bursty
    (Poisson-ish, CV² ≈ 1) request streams, schedulers and bots produce
    near-constant gaps (CV² → 0).  Flagging keys whose squared
    coefficient of variation falls below ``regular_cv2_ppm`` is the
    classic telemetry heuristic for cron traffic / monitoring probes /
    scraper fleets — the log-pipeline twin of the content-side spam
    gates.

    All arithmetic is exact integer: per-key gap seconds via ONE lag
    window (ties broken by ``tie_col`` so reruns schedule identically),
    then

        cv2_ppm = (n·Σd² − (Σd)²) · 10⁶ div (Σd)²

    with the sum lanes in DECIMAL(38,0) (the ``shard_checksums``
    overflow lesson: n·Σd²·10⁶ exceeds int64 for second-scale gaps well
    below web scale; decimal 38 holds ~10³⁸).  Keys with fewer than
    ``min_gaps`` gaps or an all-zero gap sum are not scored (CV² of a
    constant-zero stream is undefined; such keys are duplicates of one
    timestamp, not a schedule).

    Scale shape: ONE hash exchange on ``key_col`` + in-partition sort
    for the lag window, then a partial-aggregable groupBy over the same
    key — AQE reuses the exchange.  Only (key, gap) longs survive the
    shuffle; no driver state."""
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col).asc(),
                                            F.col(tie_col).asc())
    sec = F.unix_timestamp(F.col(ts_col)).cast("long")
    gaps = (events.select(F.col(key_col).alias("key"),
                          (sec - F.lag(sec).over(w)).alias("gap_s"))
            .where(F.col("gap_s").isNotNull()))
    d = F.col("gap_s").cast("decimal(19,0)")
    agg = gaps.groupBy("key").agg(
        F.count("*").cast("long").alias("n_gaps"),
        F.sum(d).alias("s1"),
        F.sum(d * d).alias("s2"))
    n = F.col("n_gaps").cast("decimal(38,0)")
    cv2 = F.expr("((n_gaps * s2 - s1 * s1) * 1000000) div (s1 * s1)")
    return (agg.where((F.col("n_gaps") >= min_gaps) & (F.col("s1") > 0))
            .select("key", "n_gaps",
                    F.expr("s1 div n_gaps").cast("long").alias("mean_gap_s"),
                    cv2.cast("long").alias("cv2_ppm"))
            .withColumn("is_regular",
                        (F.col("cv2_ppm") < regular_cv2_ppm).cast("int")))


def interarrival_sql(events: str, key_expr: str = "user_id",
                     ts_expr: str = "ts", tie_expr: str = "event_id",
                     min_gaps: int = 3,
                     regular_cv2_ppm: int = 250_000) -> str:
    """DuckDB oracle: identical lag + integer folds (HUGEINT lanes —
    int128 ⊇ the Spark side's DECIMAL(38,0))."""
    return f"""
ia_gaps AS (
  SELECT key, gap_s FROM (
    SELECT {key_expr} AS key,
           epoch(date_trunc('second', {ts_expr}))::BIGINT
             - lag(epoch(date_trunc('second', {ts_expr}))::BIGINT) OVER (
                 PARTITION BY {key_expr}
                 ORDER BY {ts_expr} ASC, {tie_expr} ASC) AS gap_s
    FROM {events}) WHERE gap_s IS NOT NULL),
ia AS (
  SELECT key, count(*)::BIGINT AS n_gaps,
         sum(gap_s::HUGEINT) AS s1,
         sum(gap_s::HUGEINT * gap_s::HUGEINT) AS s2
  FROM ia_gaps GROUP BY key),
ia_out AS (
  SELECT key, n_gaps,
         (s1 // n_gaps)::BIGINT AS mean_gap_s,
         ((n_gaps * s2 - s1 * s1) * 1000000 // (s1 * s1))::BIGINT
           AS cv2_ppm,
         (((n_gaps * s2 - s1 * s1) * 1000000 // (s1 * s1))
            < {regular_cv2_ppm})::INT AS is_regular
  FROM ia WHERE n_gaps >= {min_gaps} AND s1 > 0)"""


def rate_burst_stats(events: DataFrame, key_col: str = "user_id",
                     ts_col: str = "ts", window_s: int = 60,
                     burst_threshold: int = 10) -> DataFrame:
    """(key, n_events, max_burst, n_burst_events, is_abusive) —
    trailing-window rate-limit screening: for every event, the number
    of the key's events in the closed trailing ``window_s``-second
    window; a key is flagged when any window exceeds
    ``burst_threshold``.  The classic DDoS / scraper / token-bucket
    abuse gate on request logs, expressed as ONE range-frame window —
    no self-join, no per-event candidate explosion.

    Scale shape: one hash exchange on ``key_col`` + in-partition sort
    (shared by the range frame and the fold — AQE reuses the
    exchange), then a partial-aggregable groupBy over the same key.
    The range frame is computed in a single pass over each partition's
    sorted run (two pointers), so a hot key costs O(events), not
    O(events · window).  Second-truncated integer timestamps keep both
    engines' frame bounds identical (no sub-second rounding drift —
    the ``interarrival_stats`` lesson)."""
    w = (Window.partitionBy(key_col)
         .orderBy(F.unix_timestamp(F.col(ts_col)).cast("long"))
         .rangeBetween(-(window_s - 1), 0))
    burst = F.count("*").over(w)
    per_ev = events.select(F.col(key_col).alias("key"),
                           burst.cast("long").alias("burst"))
    return (per_ev.groupBy("key")
            .agg(F.count("*").cast("long").alias("n_events"),
                 F.max("burst").alias("max_burst"),
                 F.sum((F.col("burst") > burst_threshold).cast("long"))
                 .alias("n_burst_events"))
            .withColumn("is_abusive",
                        (F.col("max_burst") > burst_threshold).cast("int")))


def rate_burst_sql(events: str, key_expr: str = "user_id",
                   ts_expr: str = "ts", window_s: int = 60,
                   burst_threshold: int = 10) -> str:
    """DuckDB oracle: identical range frame over the second-truncated
    epoch; final relation ``rb_out``."""
    return f"""
rb_ev AS (
  SELECT {key_expr} AS key,
         count(*) OVER (PARTITION BY {key_expr}
                        ORDER BY epoch(date_trunc('second', {ts_expr}))::BIGINT
                        RANGE BETWEEN {window_s - 1} PRECEDING
                              AND CURRENT ROW)::BIGINT AS burst
  FROM {events}),
rb_out AS (
  SELECT key, count(*)::BIGINT AS n_events,
         max(burst)::BIGINT AS max_burst,
         sum((burst > {burst_threshold})::BIGINT)::BIGINT AS n_burst_events,
         (max(burst) > {burst_threshold})::INT AS is_abusive
  FROM rb_ev GROUP BY key)"""


# ---------------------------------------------------------------------------
# Ordered multi-step funnel: of the users who did step 1, how many went
# on to do step 2 strictly later, then step 3 strictly after that — the
# canonical product/telemetry conversion query every log-analytics
# engine ships.  Greedy earliest-match is exact here (exchange
# argument: if ANY in-order assignment of events to steps exists, the
# one that takes the earliest qualifying event at each step exists
# too), so the per-user answer is a single fold over the user's
# time-sorted events.
#
# Scale shape: ONE hash exchange on the user key (groupBy collect_list
# of only the funnel-relevant events — the isin filter prunes the rest
# at the scan), the fold is a JVM higher-order `aggregate` over each
# user's sorted array (no Python, no per-step join round-trips, no
# k-fold re-shuffle), and the stage table is produced by a single
# conditional-sum aggregation — grid-sized output, k rows.  A user's
# array is bounded by their own funnel-event count; a runaway hot key
# (bot) is exactly what rate_burst_stats screens upstream.


def funnel_stages(events: DataFrame, steps: tuple[str, ...] = (),
                  key_col: str = "user_id", ts_col: str = "ts",
                  type_col: str = "event_type") -> DataFrame:
    """(stage_no, step, n_users, conv_ppm) — users reaching each funnel
    stage in strict event-time order, with exact-integer conversion
    ppm relative to stage 1.  Ties at the same second do NOT advance
    the funnel (strict >): second-truncated timestamps keep both
    engines' comparisons identical."""
    if len(steps) < 2:
        raise ValueError("funnel needs >= 2 steps")
    k = len(steps)
    sec = F.unix_timestamp(F.col(ts_col)).cast("long")
    rel = (events.where(F.col(type_col).isin(list(steps)))
           .select(F.col(key_col).alias("key"), sec.alias("t"),
                   F.col(type_col).alias("e")))
    per = (rel.groupBy("key")
           .agg(F.sort_array(F.collect_list(F.struct("t", "e")))
                .alias("seq")))
    steps_arr = F.array(*[F.lit(s) for s in steps])
    init = F.struct(F.lit(0).cast("int").alias("stage"),
                    F.lit(-(1 << 62)).cast("long").alias("t"))
    def _merge(acc, x):
        nxt = F.element_at(steps_arr, acc["stage"] + 1)
        adv = ((acc["stage"] < k) & (x["e"] == nxt) & (x["t"] > acc["t"]))
        return F.when(adv, F.struct((acc["stage"] + 1).cast("int")
                                    .alias("stage"),
                                    x["t"].alias("t"))).otherwise(acc)
    reached = per.select(F.aggregate("seq", init, _merge)["stage"]
                         .alias("reached"))
    agg = reached.agg(*[F.sum((F.col("reached") >= i).cast("long"))
                        .alias(f"n{i}") for i in range(1, k + 1)])
    stack_args = []
    for i, s in enumerate(steps, start=1):
        stack_args += [F.lit(i), F.lit(s), F.col(f"n{i}")]
    return (agg.select(F.stack(F.lit(k), *stack_args)
                       .alias("stage_no", "step", "n_users"), F.col("n1"))
            .select(F.col("stage_no").cast("int"), "step",
                    F.col("n_users").cast("long"),
                    F.when(F.col("n1") > 0,
                           F.expr("n_users * 1000000 div n1"))
                    .otherwise(F.lit(0)).cast("long").alias("conv_ppm")))


def funnel_sql(events: str, steps: tuple[str, ...],
               key_expr: str = "user_id", ts_expr: str = "ts",
               type_expr: str = "event_type") -> str:
    """DuckDB oracle: sequential earliest-match CTE chain (t_{i} = min
    ts of step i strictly after t_{i-1}) — provably the same greedy
    assignment; final relation ``fn_out``."""
    t = f"epoch(date_trunc('second', {ts_expr}))::BIGINT"
    ctes = [f"""fn_ev AS (
  SELECT {key_expr} AS key, {t} AS t, {type_expr} AS e
  FROM {events}
  WHERE {type_expr} IN ({", ".join(f"'{s}'" for s in steps)})),
fn_1 AS (
  SELECT key, min(t) AS t1 FROM fn_ev WHERE e = '{steps[0]}' GROUP BY 1)"""]
    for i in range(2, len(steps) + 1):
        ctes.append(f"""fn_{i} AS (
  SELECT e.key, min(e.t) AS t{i}
  FROM fn_ev e JOIN fn_{i-1} p USING (key)
  WHERE e.e = '{steps[i-1]}' AND e.t > p.t{i-1} GROUP BY 1)""")
    rows = ",\n    ".join(
        f"({i}, '{s}', (SELECT count(*) FROM fn_{i}))"
        for i, s in enumerate(steps, start=1))
    return ",\n".join(ctes) + f""",
fn_n(stage_no, step, n_users) AS (VALUES
    {rows}),
fn_out AS (
  SELECT stage_no::INT AS stage_no, step,
         n_users::BIGINT AS n_users,
         (CASE WHEN first_value(n_users)
                      OVER (ORDER BY stage_no) > 0
               THEN n_users * 1000000
                    // first_value(n_users) OVER (ORDER BY stage_no)
               ELSE 0 END)::BIGINT AS conv_ppm
  FROM fn_n)"""


# ---------------------------------------------------------------------------
# Cohort retention: group users by their FIRST-activity period, then
# for each (cohort, period-offset) count how many came back — the
# other canonical telemetry table next to the funnel, and the one
# product/ops teams read daily.
#
# Scale shape: activity collapses to distinct (user, period) FIRST
# (one exchange, map-side partial distinct — the raw event stream dies
# at its own scan), the first-activity groupBy and the activity⨝first
# join both ride the SAME user-key partitioning, and the final
# (cohort, offset) aggregate is grid-sized.  Cohort sizes are a
# per-cohort aggregate of the user-grain table, broadcast back onto
# the grid.  Exact integer ppm; no floats anywhere.


def retention_cohorts(events: DataFrame, key_col: str = "user_id",
                      ts_col: str = "ts",
                      bucket_s: int = 86400) -> DataFrame:
    """(cohort_period, period_offset, n_active, n_cohort,
    retention_ppm) — classic triangle retention at ``bucket_s``-second
    period grain.  cohort_period = the user's first active period
    (epoch seconds div bucket); retention_ppm is exact-integer
    n_active·10⁶ div n_cohort, and the offset-0 row is the cohort
    itself (ppm = 10⁶ by construction)."""
    act = (events.select(
        F.col(key_col).alias("key"),
        F.expr(f"unix_timestamp({ts_col}) div {bucket_s}")
        .cast("long").alias("p")).distinct())
    first = act.groupBy("key").agg(F.min("p").alias("cohort"))
    grid = (act.join(first, "key")
            .groupBy(F.col("cohort").alias("cohort_period"),
                     (F.col("p") - F.col("cohort")).alias("period_offset"))
            .agg(F.countDistinct("key").cast("long").alias("n_active")))
    sizes = (first.groupBy(F.col("cohort").alias("cohort_period"))
             .agg(F.count("*").cast("long").alias("n_cohort")))
    return (grid.join(F.broadcast(sizes), "cohort_period")
            .select("cohort_period", "period_offset", "n_active",
                    "n_cohort",
                    F.expr("n_active * 1000000 div n_cohort")
                    .cast("long").alias("retention_ppm")))


def retention_sql(events: str, key_expr: str = "user_id",
                  ts_expr: str = "ts", bucket_s: int = 86400) -> str:
    """DuckDB oracle: identical distinct→first→join→grid chain; final
    relation ``rt_out``."""
    p = f"epoch(date_trunc('second', {ts_expr}))::BIGINT // {bucket_s}"
    return f"""
rt_act AS (
  SELECT DISTINCT {key_expr} AS key, {p} AS p FROM {events}),
rt_first AS (
  SELECT key, min(p) AS cohort FROM rt_act GROUP BY 1),
rt_sizes AS (
  SELECT cohort AS cohort_period, count(*)::BIGINT AS n_cohort
  FROM rt_first GROUP BY 1),
rt_grid AS (
  SELECT f.cohort AS cohort_period, a.p - f.cohort AS period_offset,
         count(DISTINCT a.key)::BIGINT AS n_active
  FROM rt_act a JOIN rt_first f USING (key) GROUP BY 1, 2),
rt_out AS (
  SELECT g.cohort_period, g.period_offset, g.n_active, s.n_cohort,
         (g.n_active * 1000000 // s.n_cohort)::BIGINT AS retention_ppm
  FROM rt_grid g JOIN rt_sizes s USING (cohort_period))"""


# ---------------------------------------------------------------------------
# Seasonal-naive deviation screening: flag (type, day, hour) cells
# whose event count deviates from that type's hour-of-day baseline —
# the calendar-seasonality anomaly screen (traffic has a daily shape;
# "3× the usual 4 a.m. rate" is an incident even when the absolute
# count is small).  Complements rate_burst_stats (trailing-window
# volume) and interarrival_stats (per-key gap regularity): this one
# conditions on the clock.
#
# Scale shape: the raw stream dies at ONE groupBy onto the
# (type, day, hour) grid — bounded by types × days × 24, orders of
# magnitude below the event count; the baseline is an agg OF the grid
# keyed on (type, hour) (≤ types × 24 rows, broadcast back), and the
# expected rate treats absent grid cells as zero days by dividing by
# the GLOBAL observed-day count, not the cell count.  Exact integer
# ppm ratio; baseline includes the flagged cell (plain seasonal-naive,
# documented — leave-one-out would subtract the cell from both lanes).


def seasonal_deviation(events: DataFrame, type_col: str = "event_type",
                       ts_col: str = "ts",
                       spike_ppm: int = 3_000_000) -> DataFrame:
    """(event_type, day, hour_of_day, n_events, baseline_total, n_days,
    ratio_ppm, is_spike) — per-hour counts vs the type's hour-of-day
    mean across all observed days.

        ratio_ppm = n_events · n_days · 10⁶ div baseline_total
        is_spike  = ratio_ppm > spike_ppm  (3× baseline by default)

    baseline_total = Σ over days of that (type, hour)'s counts; n_days
    is the global distinct-day count, so days where the cell was
    silent weigh the baseline down exactly as zeros."""
    cells = (events.select(F.col(type_col).alias("event_type"),
                           F.expr(f"unix_timestamp({ts_col}) div 86400")
                           .cast("long").alias("day"),
                           F.expr(f"(unix_timestamp({ts_col}) div 3600) % 24")
                           .cast("int").alias("hour_of_day"))
             .groupBy("event_type", "day", "hour_of_day")
             .agg(F.count("*").cast("long").alias("n_events")))
    base = (cells.groupBy("event_type", "hour_of_day")
            .agg(F.sum("n_events").cast("long").alias("baseline_total")))
    ndays = cells.select("day").distinct() \
        .agg(F.count("*").cast("long").alias("n_days"))
    return (cells.join(F.broadcast(base), ["event_type", "hour_of_day"])
            .crossJoin(F.broadcast(ndays))
            .withColumn("ratio_ppm",
                        F.expr("n_events * n_days * 1000000"
                               " div baseline_total").cast("long"))
            .withColumn("is_spike",
                        (F.col("ratio_ppm") > spike_ppm).cast("int"))
            .select("event_type", "day", "hour_of_day", "n_events",
                    "baseline_total", "n_days", "ratio_ppm", "is_spike"))


def seasonal_deviation_sql(events: str, type_expr: str = "event_type",
                           ts_expr: str = "ts",
                           spike_ppm: int = 3_000_000) -> str:
    """DuckDB oracle: identical grid → baseline → ratio chain; final
    relation ``sd_out``."""
    sec = f"epoch(date_trunc('second', {ts_expr}))::BIGINT"
    return f"""
sd_cells AS (
  SELECT {type_expr} AS event_type, {sec} // 86400 AS day,
         (({sec} // 3600) % 24)::INT AS hour_of_day,
         count(*)::BIGINT AS n_events
  FROM {events} GROUP BY 1, 2, 3),
sd_base AS (
  SELECT event_type, hour_of_day,
         sum(n_events)::BIGINT AS baseline_total
  FROM sd_cells GROUP BY 1, 2),
sd_days AS (SELECT count(DISTINCT day)::BIGINT AS n_days FROM sd_cells),
sd_out AS (
  SELECT c.event_type, c.day, c.hour_of_day, c.n_events,
         b.baseline_total, d.n_days,
         (c.n_events * d.n_days * 1000000 // b.baseline_total)::BIGINT
           AS ratio_ppm,
         ((c.n_events * d.n_days * 1000000 // b.baseline_total)
            > {spike_ppm})::INT AS is_spike
  FROM sd_cells c
  JOIN sd_base b USING (event_type, hour_of_day)
  CROSS JOIN sd_days d)"""


# ---------------------------------------------------------------------------
# Alert-episode collapsing (alert dedup with a cooldown): consecutive
# identical alerts from the same source within ``cooldown_s`` are ONE
# episode — the fatigue-reduction primitive every on-call pipeline
# (Elastalert's realert, PagerDuty's alert grouping) applies between
# the detector and the pager.  Implemented as sessionization of the
# (key, type) stream: lag gap → episode-start flag → running-sum
# episode id — the standard gaps-and-islands plan.
#
# Scale shape: ONE hash exchange on (key, type) shared by the lag
# window, the episode-id running sum, and BOTH downstream groupBys
# (their keys are supersets of the partition keys, so HashPartitioning
# already satisfies their clustering — no further exchange).  Equal-
# second ties need no tie-breaker: the start flag depends only on the
# multiset of second values, so any tie order yields identical
# episodes.  Hot keys cost O(their events), not O(events²).


def alert_episodes(events: DataFrame, key_col: str = "user_id",
                   type_col: str = "event_type", ts_col: str = "ts",
                   cooldown_s: int = 3600) -> DataFrame:
    """(key, event_type, n_events, n_episodes, max_episode_events,
    suppression_ppm) — repeated identical alerts collapsed into
    episodes separated by gaps > ``cooldown_s``; suppression_ppm is
    the exact-integer fraction of events a dedup'd pager would NOT
    send: (n_events - n_episodes) · 10⁶ div n_events."""
    sec = F.unix_timestamp(F.col(ts_col)).cast("long")
    rel = events.select(F.col(key_col).alias("key"),
                        F.col(type_col).alias("event_type"),
                        sec.alias("t"))
    w = Window.partitionBy("key", "event_type").orderBy("t")
    gap = F.col("t") - F.lag("t").over(w)
    starts = rel.withColumn(
        "is_start",
        (gap.isNull() | (gap > cooldown_s)).cast("long"))
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    eps = starts.withColumn("episode_no", F.sum("is_start").over(wrun))
    per_ep = (eps.groupBy("key", "event_type", "episode_no")
              .agg(F.count("*").cast("long").alias("ep_events")))
    return (per_ep.groupBy("key", "event_type")
            .agg(F.sum("ep_events").cast("long").alias("n_events"),
                 F.count("*").cast("long").alias("n_episodes"),
                 F.max("ep_events").cast("long")
                 .alias("max_episode_events"))
            .withColumn("suppression_ppm",
                        F.expr("(n_events - n_episodes) * 1000000"
                               " div n_events").cast("long")))


def alert_episodes_sql(events: str, key_expr: str = "user_id",
                       type_expr: str = "event_type",
                       ts_expr: str = "ts",
                       cooldown_s: int = 3600) -> str:
    """DuckDB oracle: identical gaps-and-islands chain; final relation
    ``ae_out``."""
    sec = f"epoch(date_trunc('second', {ts_expr}))::BIGINT"
    return f"""
ae_rel AS (
  SELECT {key_expr} AS key, {type_expr} AS event_type, {sec} AS t
  FROM {events}),
ae_flag AS (
  SELECT key, event_type, t,
         (CASE WHEN lag(t) OVER w IS NULL
                 OR t - lag(t) OVER w > {cooldown_s}
               THEN 1 ELSE 0 END)::BIGINT AS is_start
  FROM ae_rel
  WINDOW w AS (PARTITION BY key, event_type ORDER BY t)),
ae_eps AS (
  SELECT key, event_type,
         sum(is_start) OVER (PARTITION BY key, event_type ORDER BY t
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS episode_no
  FROM ae_flag),
ae_per AS (
  SELECT key, event_type, episode_no, count(*)::BIGINT AS ep_events
  FROM ae_eps GROUP BY 1, 2, 3),
ae_out AS (
  SELECT key, event_type,
         sum(ep_events)::BIGINT AS n_events,
         count(*)::BIGINT AS n_episodes,
         max(ep_events)::BIGINT AS max_episode_events,
         ((sum(ep_events) - count(*)) * 1000000
            // sum(ep_events))::BIGINT AS suppression_ppm
  FROM ae_per GROUP BY 1, 2)"""


# ---------------------------------------------------------------------------
# Template-transition rarity (the relational core of DeepLog, Du et
# al. CCS 2017): model the per-source stream of template/event types
# as a first-order Markov chain, then flag transitions whose observed
# probability is far below their predecessor's norm — "a reboot
# followed by a checkpoint-load is normal; a reboot followed by a
# payment event is an incident".  The LSTM in the paper is the
# sequence model; the screen every production deployment runs first is
# exactly this count-based transition table.
#
# Scale shape: ONE hash exchange on the source key for the lag window
# (tie-broken on event_id so both engines see identical pairs), then
# the stream dies at a groupBy onto the (prev, next) transition grid —
# bounded by (#types)², orders of magnitude below the event count.
# Row totals are an agg OF the grid, broadcast back.  Exact integer
# ppm; min-support guard keeps one-off predecessors from flagging.


def template_transitions(events: DataFrame, key_col: str = "user_id",
                         type_col: str = "event_type",
                         ts_col: str = "ts", id_col: str = "event_id",
                         rare_ppm: int = 20_000,
                         min_prev: int = 20) -> DataFrame:
    """(prev_e, e, n_trans, prev_total, prob_ppm, is_rare) — Markov
    transition counts over each key's time-ordered event stream;
    prob_ppm = n_trans · 10⁶ div prev_total, flagged rare when below
    ``rare_ppm`` with ``prev_total ≥ min_prev`` support."""
    sec = F.unix_timestamp(F.col(ts_col)).cast("long")
    rel = events.select(F.col(key_col).alias("key"), sec.alias("t"),
                        F.col(id_col).alias("i"),
                        F.col(type_col).alias("e"))
    w = Window.partitionBy("key").orderBy("t", "i")
    pairs = (rel.withColumn("prev_e", F.lag("e").over(w))
             .filter(F.col("prev_e").isNotNull()))
    grid = (pairs.groupBy("prev_e", "e")
            .agg(F.count("*").cast("long").alias("n_trans")))
    totals = (grid.groupBy("prev_e")
              .agg(F.sum("n_trans").cast("long").alias("prev_total")))
    return (grid.join(F.broadcast(totals), "prev_e")
            .withColumn("prob_ppm",
                        F.expr("n_trans * 1000000 div prev_total")
                        .cast("long"))
            .withColumn("is_rare",
                        ((F.col("prob_ppm") < rare_ppm) &
                         (F.col("prev_total") >= min_prev)).cast("int"))
            .select("prev_e", "e", "n_trans", "prev_total",
                    "prob_ppm", "is_rare"))


def template_transitions_sql(events: str, key_expr: str = "user_id",
                             type_expr: str = "event_type",
                             ts_expr: str = "ts",
                             id_expr: str = "event_id",
                             rare_ppm: int = 20_000,
                             min_prev: int = 20) -> str:
    """DuckDB oracle: identical lag → grid → totals chain; final
    relation ``tt_out``."""
    sec = f"epoch(date_trunc('second', {ts_expr}))::BIGINT"
    return f"""
tt_rel AS (
  SELECT {key_expr} AS key, {sec} AS t, {id_expr} AS i,
         {type_expr} AS e
  FROM {events}),
tt_pairs AS (
  SELECT * FROM (
    SELECT e, lag(e) OVER (PARTITION BY key ORDER BY t, i) AS prev_e
    FROM tt_rel) WHERE prev_e IS NOT NULL),
tt_grid AS (
  SELECT prev_e, e, count(*)::BIGINT AS n_trans
  FROM tt_pairs GROUP BY 1, 2),
tt_tot AS (
  SELECT prev_e, sum(n_trans)::BIGINT AS prev_total
  FROM tt_grid GROUP BY 1),
tt_out AS (
  SELECT g.prev_e, g.e, g.n_trans, t.prev_total,
         (g.n_trans * 1000000 // t.prev_total)::BIGINT AS prob_ppm,
         ((g.n_trans * 1000000 // t.prev_total) < {rare_ppm}
            AND t.prev_total >= {min_prev})::INT AS is_rare
  FROM tt_grid g JOIN tt_tot t USING (prev_e))"""


# ---------------------------------------------------------------------------
# CUSUM change-point screening (Page 1954) over per-type hourly event
# volume: the one-sided cumulative-sum control chart that detects a
# SUSTAINED level shift (a slow leak, a partial outage, a new crawler)
# that per-hour threshold screens miss because no single hour is
# extreme.  The recurrence S_t = max(0, S_{t-1} + x_t - k) is made
# window-expressible through the classic identity
#
#     S_t = P_t - min(0, min_{i ≤ t} P_i),   P_t = Σ_{i ≤ t} (x_i - k)
#
# so the whole chart is a cumulative sum plus a cumulative min — two
# frames over ONE sort, no recursion, no UDF.
#
# Scale shape: the raw stream dies at one groupBy onto the (type,
# hour) calendar grid, which is then DENSIFIED (sequence over the
# global hour range × observed types — silent hours must pull the
# chart down, else an outage right after a burst never registers);
# every window runs on the bounded grid only.  Milli-unit exact
# integers throughout; counts · 10³ stays far under int64 at 10¹²
# docs (DECIMAL(38) is the documented escape above that).


def cusum_drift(events: DataFrame, type_col: str = "event_type",
                ts_col: str = "ts", slack_div: int = 4,
                h_factor: int = 5) -> DataFrame:
    """(event_type, hour_idx, n_events, mean_milli, cusum_milli,
    is_drift) — one-sided CUSUM of hourly counts vs the type's mean
    rate.  k (the slack) = mean_milli div ``slack_div``; decision
    interval h = ``h_factor`` · mean_milli; all milli-unit integers so
    the DuckDB oracle hashes identically."""
    cells = (events.select(F.col(type_col).alias("event_type"),
                           F.expr(f"unix_timestamp({ts_col}) div 3600")
                           .cast("long").alias("hour_idx"))
             .groupBy("event_type", "hour_idx")
             .agg(F.count("*").cast("long").alias("n_events")))
    rngrow = cells.agg(F.min("hour_idx").alias("h0"),
                       F.max("hour_idx").alias("h1"))
    rng = rngrow.select(F.explode(F.sequence("h0", "h1")).alias("hour_idx"))
    # per-type mean over the DENSE series = type total div global hour
    # span — computed from the sparse grid + the 1-row range, so the
    # dense relation is derived exactly once (no duplicated subtree)
    means = (cells.groupBy("event_type")
             .agg(F.sum("n_events").cast("long").alias("tot"))
             .crossJoin(F.broadcast(rngrow))
             .select("event_type",
                     F.expr("tot * 1000 div (h1 - h0 + 1)")
                     .cast("long").alias("mean_milli")))
    dense = (means.crossJoin(F.broadcast(rng))
             .join(cells, ["event_type", "hour_idx"], "left")
             .select("event_type", "hour_idx",
                     F.coalesce("n_events", F.lit(0)).cast("long")
                     .alias("n_events"), "mean_milli"))
    w = Window.partitionBy("event_type").orderBy("hour_idx") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dev = (F.col("n_events") * 1000 - F.col("mean_milli")
           - F.expr(f"mean_milli div {slack_div}"))
    charted = (dense
               .withColumn("p", F.sum(dev).over(w))
               .withColumn("cusum_milli",
                           (F.col("p") -
                            F.least(F.lit(0).cast("long"),
                                    F.min("p").over(w))).cast("long")))
    return (charted
            .withColumn("is_drift",
                        ((F.col("cusum_milli") >
                          h_factor * F.col("mean_milli")) &
                         (F.col("mean_milli") > 0)).cast("int"))
            .select("event_type", "hour_idx", "n_events", "mean_milli",
                    "cusum_milli", "is_drift"))


def cusum_drift_sql(events: str, type_expr: str = "event_type",
                    ts_expr: str = "ts", slack_div: int = 4,
                    h_factor: int = 5) -> str:
    """DuckDB oracle: identical densified grid + cumsum/cummin chart;
    final relation ``cu_out``."""
    sec = f"epoch(date_trunc('second', {ts_expr}))::BIGINT"
    return f"""
cu_cells AS (
  SELECT {type_expr} AS event_type, {sec} // 3600 AS hour_idx,
         count(*)::BIGINT AS n_events
  FROM {events} GROUP BY 1, 2),
cu_rng AS (
  SELECT unnest(generate_series(min(hour_idx), max(hour_idx)))
           AS hour_idx
  FROM cu_cells),
cu_dense AS (
  SELECT t.event_type, r.hour_idx,
         coalesce(c.n_events, 0)::BIGINT AS n_events
  FROM (SELECT DISTINCT event_type FROM cu_cells) t
  CROSS JOIN cu_rng r
  LEFT JOIN cu_cells c USING (event_type, hour_idx)),
cu_means AS (
  SELECT event_type,
         (sum(n_events) * 1000 // count(*))::BIGINT AS mean_milli
  FROM cu_dense GROUP BY 1),
cu_p AS (
  SELECT d.event_type, d.hour_idx, d.n_events, m.mean_milli,
         sum(d.n_events * 1000 - m.mean_milli
             - m.mean_milli // {slack_div}) OVER w AS p
  FROM cu_dense d JOIN cu_means m USING (event_type)
  WINDOW w AS (PARTITION BY d.event_type ORDER BY d.hour_idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
cu_chart AS (
  SELECT event_type, hour_idx, n_events, mean_milli, p,
         min(p) OVER (PARTITION BY event_type ORDER BY hour_idx
                      ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS runmin
  FROM cu_p),
cu_out AS (
  SELECT event_type, hour_idx, n_events, mean_milli,
         (p - least(0, runmin))::BIGINT AS cusum_milli,
         ((p - least(0, runmin)) > {h_factor} * mean_milli
            AND mean_milli > 0)::INT AS is_drift
  FROM cu_chart)"""


# ---------------------------------------------------------------------------
# First-seen novelty screening: "this source just emitted an event
# type it has NEVER emitted before, and almost nobody else emits it"
# — the never-before-seen-template detector that log platforms
# (Sentry's new-issue alert, DataDog's new log pattern) fire before
# any statistical model has enough history to score.  Pure grid
# algebra: per-(key, type) first-occurrence epoch, the corpus clock's
# max, and the type's key-support, each an agg riding the same
# exchange or a broadcast scalar.
#
# Scale shape: ONE hash exchange on (key, type) for the min/count
# groupBy; the type-support table is an agg OF that grid (types-sized,
# broadcast back); the global max timestamp is a 1-row broadcast.  The
# output is key×type-grain — the same footprint as the per-key tables
# rate_burst / interarrival already emit.


def first_seen_novelty(events: DataFrame, key_col: str = "user_id",
                       type_col: str = "event_type", ts_col: str = "ts",
                       recent_s: int = 7 * 86400,
                       rare_keys: int = 3) -> DataFrame:
    """(key, event_type, first_sec, n_events, type_n_keys, is_new,
    is_novel) — is_new: the pair's first occurrence falls within the
    trailing ``recent_s`` of the corpus clock; is_novel: additionally
    the type is emitted by ≤ ``rare_keys`` keys in total."""
    sec = F.unix_timestamp(F.col(ts_col)).cast("long")
    rel = events.select(F.col(key_col).alias("key"),
                        F.col(type_col).alias("event_type"),
                        sec.alias("t"))
    grid = (rel.groupBy("key", "event_type")
            .agg(F.min("t").alias("first_sec"),
                 F.count("*").cast("long").alias("n_events")))
    support = (grid.groupBy("event_type")
               .agg(F.count("*").cast("long").alias("type_n_keys")))
    clock = rel.agg(F.max("t").alias("max_sec"))
    out = (grid.join(F.broadcast(support), "event_type")
           .crossJoin(F.broadcast(clock))
           .withColumn("is_new",
                       (F.col("first_sec") >
                        F.col("max_sec") - recent_s).cast("int"))
           .withColumn("is_novel",
                       ((F.col("first_sec") >
                         F.col("max_sec") - recent_s) &
                        (F.col("type_n_keys") <= rare_keys)).cast("int")))
    return out.select("key", "event_type", "first_sec", "n_events",
                      "type_n_keys", "is_new", "is_novel")


def first_seen_novelty_sql(events: str, key_expr: str = "user_id",
                           type_expr: str = "event_type",
                           ts_expr: str = "ts",
                           recent_s: int = 7 * 86400,
                           rare_keys: int = 3) -> str:
    """DuckDB oracle: identical grid + support + clock chain; final
    relation ``fs_out``."""
    sec = f"epoch(date_trunc('second', {ts_expr}))::BIGINT"
    return f"""
fs_rel AS (
  SELECT {key_expr} AS key, {type_expr} AS event_type, {sec} AS t
  FROM {events}),
fs_grid AS (
  SELECT key, event_type, min(t) AS first_sec,
         count(*)::BIGINT AS n_events
  FROM fs_rel GROUP BY 1, 2),
fs_sup AS (
  SELECT event_type, count(*)::BIGINT AS type_n_keys
  FROM fs_grid GROUP BY 1),
fs_clock AS (SELECT max(t) AS max_sec FROM fs_rel),
fs_out AS (
  SELECT g.key, g.event_type, g.first_sec, g.n_events, s.type_n_keys,
         (g.first_sec > c.max_sec - {recent_s})::INT AS is_new,
         (g.first_sec > c.max_sec - {recent_s}
            AND s.type_n_keys <= {rare_keys})::INT AS is_novel
  FROM fs_grid g JOIN fs_sup s USING (event_type)
  CROSS JOIN fs_clock c)"""
