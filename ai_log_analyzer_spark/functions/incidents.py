"""Incident-response analytics over the event telemetry: multiwindow
SLO burn-rate alerting, alert correlation (pairwise lift), and spike
attribution (which key drove the anomalous hour).

These are the three queries an on-call runs AFTER a detector fires —
"is this burning error budget fast enough to page?", "what else always
fires with this?", and "who caused it?" — re-expressed as pure
Catalyst grid algebra with exact-integer ppm so every one of them has
a hash-checkable DuckDB oracle.

Scale contract shared by all three: the raw event stream dies at ONE
groupBy onto a bounded grid (hours, (key, hour, type) baskets, or the
(type, hour) calendar), and every window/join after that runs on the
grid or on a broadcast restore.  No Python workers, no collect, no
single-partition sort of anything event-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# Multiwindow SLO burn-rate (Google SRE workbook ch. 5): page only
# when BOTH a short and a long trailing window burn error budget above
# the threshold — the short window gives fast detection, the long one
# suppresses blips that self-heal.  Ratios are exact-integer ppm; the
# trailing windows are RANGE frames over the DENSIFIED hour grid (a
# silent hour contributes zeros, so a burst followed by silence decays
# the long window exactly).


def burn_rate(events: DataFrame, error_type: str = "error",
              type_col: str = "event_type", ts_col: str = "ts",
              long_hours: int = 6,
              burn_ppm: int = 100_000) -> DataFrame:
    """(hour_idx, err_1h, tot_1h, ratio_1h_ppm, err_nh, tot_nh,
    ratio_nh_ppm, is_burn) — hourly error ratio and the trailing
    ``long_hours`` ratio, flagged when BOTH exceed ``burn_ppm``.

    Scale shape: the stream dies at one groupBy onto the hour grid
    (conditional sums — no second scan for the error lane); the grid
    is densified from its own (min, max) 1-row agg so the range frames
    see silent hours as zeros; both trailing sums share ONE
    unpartitioned-but-grid-sized window (hours-of-history rows, never
    event rows — a year is 8,760 rows, driver-safe by 5 orders of
    magnitude)."""
    hours = (events.select(
        F.expr(f"unix_timestamp({ts_col}) div 3600").cast("long")
        .alias("hour_idx"),
        (F.col(type_col) == error_type).cast("long").alias("is_err"))
        .groupBy("hour_idx")
        .agg(F.sum("is_err").cast("long").alias("err_1h"),
             F.count("*").cast("long").alias("tot_1h")))
    rngrow = hours.agg(F.min("hour_idx").alias("h0"),
                       F.max("hour_idx").alias("h1"))
    rng = rngrow.select(F.explode(F.sequence("h0", "h1")).alias("hour_idx"))
    dense = (rng.join(hours, "hour_idx", "left")
             .select("hour_idx",
                     F.coalesce("err_1h", F.lit(0)).cast("long")
                     .alias("err_1h"),
                     F.coalesce("tot_1h", F.lit(0)).cast("long")
                     .alias("tot_1h")))
    w = (Window.orderBy("hour_idx")
         .rangeBetween(-(long_hours - 1), 0))
    out = (dense
           .withColumn("err_nh", F.sum("err_1h").over(w).cast("long"))
           .withColumn("tot_nh", F.sum("tot_1h").over(w).cast("long"))
           .withColumn("ratio_1h_ppm",
                       F.when(F.col("tot_1h") > 0,
                              F.expr("err_1h * 1000000 div tot_1h"))
                       .otherwise(F.lit(0)).cast("long"))
           .withColumn("ratio_nh_ppm",
                       F.when(F.col("tot_nh") > 0,
                              F.expr("err_nh * 1000000 div tot_nh"))
                       .otherwise(F.lit(0)).cast("long")))
    return (out.withColumn(
        "is_burn",
        ((F.col("ratio_1h_ppm") > burn_ppm) &
         (F.col("ratio_nh_ppm") > burn_ppm)).cast("int"))
        .select("hour_idx", "err_1h", "tot_1h", "ratio_1h_ppm",
                "err_nh", "tot_nh", "ratio_nh_ppm", "is_burn"))


def burn_rate_sql(events: str, error_type: str = "error",
                  type_expr: str = "event_type", ts_expr: str = "ts",
                  long_hours: int = 6,
                  burn_ppm: int = 100_000) -> str:
    """DuckDB oracle: identical grid → densify → range-frame chain;
    final relation ``br_out``."""
    sec = f"epoch(date_trunc('second', {ts_expr}))::BIGINT"
    return f"""
br_hours AS (
  SELECT {sec} // 3600 AS hour_idx,
         sum(({type_expr} = '{error_type}')::BIGINT)::BIGINT AS err_1h,
         count(*)::BIGINT AS tot_1h
  FROM {events} GROUP BY 1),
br_rng AS (
  SELECT unnest(generate_series(min(hour_idx), max(hour_idx)))
           AS hour_idx
  FROM br_hours),
br_dense AS (
  SELECT r.hour_idx, coalesce(h.err_1h, 0)::BIGINT AS err_1h,
         coalesce(h.tot_1h, 0)::BIGINT AS tot_1h
  FROM br_rng r LEFT JOIN br_hours h USING (hour_idx)),
br_win AS (
  SELECT hour_idx, err_1h, tot_1h,
         sum(err_1h) OVER w::BIGINT AS err_nh,
         sum(tot_1h) OVER w::BIGINT AS tot_nh
  FROM br_dense
  WINDOW w AS (ORDER BY hour_idx
               RANGE BETWEEN {long_hours - 1} PRECEDING
                     AND CURRENT ROW)),
br_out AS (
  SELECT hour_idx, err_1h, tot_1h,
         (CASE WHEN tot_1h > 0 THEN err_1h * 1000000 // tot_1h
               ELSE 0 END)::BIGINT AS ratio_1h_ppm,
         err_nh, tot_nh,
         (CASE WHEN tot_nh > 0 THEN err_nh * 1000000 // tot_nh
               ELSE 0 END)::BIGINT AS ratio_nh_ppm,
         ((CASE WHEN tot_1h > 0 THEN err_1h * 1000000 // tot_1h
                ELSE 0 END) > {burn_ppm}
          AND (CASE WHEN tot_nh > 0 THEN err_nh * 1000000 // tot_nh
                    ELSE 0 END) > {burn_ppm})::INT AS is_burn
  FROM br_win)"""


# ---------------------------------------------------------------------------
# Alert correlation via pairwise lift (market-basket analysis,
# Agrawal et al. SIGMOD 1993, on telemetry baskets): which alert types
# co-fire in the same (key, hour) far beyond independence — the
# grouping signal alert-dedup platforms use to fold cascades into one
# incident.  basket = distinct (key, hour); lift(a,b) = P(a∧b) /
# (P(a)·P(b)) in exact ppm.
#
# Scale shape: the stream dies at the distinct onto (key, hour, type)
# baskets (one exchange, map-side partial distinct); the pair
# expansion is the output-sensitive self-join on the basket key —
# C(types-in-basket, 2) per basket, bounded by the type-alphabet, the
# same shape as cocitation_pairs; singleton counts are a grid agg
# broadcast back twice.


def alert_correlation(events: DataFrame, key_col: str = "user_id",
                      type_col: str = "event_type", ts_col: str = "ts",
                      bucket_s: int = 3600, min_co: int = 2,
                      lift_ppm: int = 1_500_000) -> DataFrame:
    """(a, b, n_co, n_a, n_b, n_baskets, lift_ppm, is_correlated) for
    unordered type pairs a < b sharing ≥ ``min_co`` (key, bucket)
    baskets; lift_ppm = n_co · n_baskets · 10⁶ div (n_a · n_b)."""
    baskets = (events.select(
        F.col(key_col).alias("key"),
        F.expr(f"unix_timestamp({ts_col}) div {bucket_s}").cast("long")
        .alias("b"),
        F.col(type_col).alias("e")).distinct())
    singles = (baskets.groupBy("e")
               .agg(F.count("*").cast("long").alias("n")))
    total = (baskets.select("key", "b").distinct()
             .agg(F.count("*").cast("long").alias("n_baskets")))
    l = baskets.select("key", "b", F.col("e").alias("a"))
    r = baskets.select("key", "b", F.col("e").alias("b_e"))
    pairs = (l.join(r, ["key", "b"])
             .filter(F.col("a") < F.col("b_e"))
             .groupBy("a", F.col("b_e").alias("b"))
             .agg(F.count("*").cast("long").alias("n_co"))
             .filter(F.col("n_co") >= min_co))
    sa = singles.select(F.col("e").alias("a"), F.col("n").alias("n_a"))
    sb = singles.select(F.col("e").alias("b"), F.col("n").alias("n_b"))
    return (pairs.join(F.broadcast(sa), "a").join(F.broadcast(sb), "b")
            .crossJoin(F.broadcast(total))
            .withColumn("lift_ppm",
                        F.expr("n_co * n_baskets * 1000000"
                               " div (n_a * n_b)").cast("long"))
            .withColumn("is_correlated",
                        (F.col("lift_ppm") > lift_ppm).cast("int"))
            .select("a", "b", "n_co", "n_a", "n_b", "n_baskets",
                    "lift_ppm", "is_correlated"))


def alert_correlation_sql(events: str, key_expr: str = "user_id",
                          type_expr: str = "event_type",
                          ts_expr: str = "ts", bucket_s: int = 3600,
                          min_co: int = 2,
                          lift_ppm: int = 1_500_000) -> str:
    """DuckDB oracle: identical basket → pair → lift chain; final
    relation ``ac_out``."""
    sec = f"epoch(date_trunc('second', {ts_expr}))::BIGINT"
    return f"""
ac_baskets AS (
  SELECT DISTINCT {key_expr} AS key, {sec} // {bucket_s} AS b,
         {type_expr} AS e
  FROM {events}),
ac_singles AS (
  SELECT e, count(*)::BIGINT AS n FROM ac_baskets GROUP BY 1),
ac_total AS (
  SELECT count(*)::BIGINT AS n_baskets
  FROM (SELECT DISTINCT key, b FROM ac_baskets)),
ac_pairs AS (
  SELECT l.e AS a, r.e AS b, count(*)::BIGINT AS n_co
  FROM ac_baskets l JOIN ac_baskets r USING (key, b)
  WHERE l.e < r.e GROUP BY 1, 2
  HAVING count(*) >= {min_co}),
ac_out AS (
  SELECT p.a, p.b, p.n_co, sa.n AS n_a, sb.n AS n_b, t.n_baskets,
         (p.n_co * t.n_baskets * 1000000 // (sa.n * sb.n))::BIGINT
           AS lift_ppm,
         ((p.n_co * t.n_baskets * 1000000 // (sa.n * sb.n))
            > {lift_ppm})::INT AS is_correlated
  FROM ac_pairs p
  JOIN ac_singles sa ON sa.e = p.a
  JOIN ac_singles sb ON sb.e = p.b
  CROSS JOIN ac_total t)"""


# ---------------------------------------------------------------------------
# Spike attribution (Adtributor, Bhagwan et al. NSDI 2014, reduced to
# its one-dimension core): for each type's WORST hour, which keys
# contributed a larger share of that hour than their steady-state
# share of the type — the drilldown an on-call does by hand, as one
# deterministic relational pass.
#
# Scale shape: (type, hour) counts are grid-sized; the per-type argmax
# is a window over the grid (ties broken to the earliest hour, both
# engines); only events IN a spike hour are re-aggregated per key —
# the second pass's input is one hour per type, not the corpus; the
# per-key type totals ride the same (type, key) exchange.


def spike_attribution(events: DataFrame, key_col: str = "user_id",
                      type_col: str = "event_type", ts_col: str = "ts",
                      driver_excess_ppm: int = 100_000) -> DataFrame:
    """(event_type, spike_hour, key, n_in_spike, spike_total, n_type,
    type_total, share_ppm, baseline_ppm, excess_ppm, is_driver) — for
    each type's max-count hour (earliest on ties), every contributing
    key's share of the spike vs its steady-state share of the type;
    excess_ppm = share − baseline, flagged above
    ``driver_excess_ppm``."""
    rel = events.select(F.col(type_col).alias("event_type"),
                        F.col(key_col).alias("key"),
                        F.expr(f"unix_timestamp({ts_col}) div 3600")
                        .cast("long").alias("hour_idx"))
    cells = (rel.groupBy("event_type", "hour_idx")
             .agg(F.count("*").cast("long").alias("n")))
    wr = Window.partitionBy("event_type") \
        .orderBy(F.desc("n"), F.asc("hour_idx"))
    spikes = (cells.withColumn("rk", F.row_number().over(wr))
              .filter(F.col("rk") == 1)
              .select("event_type", F.col("hour_idx").alias("spike_hour"),
                      F.col("n").alias("spike_total")))
    per_key_type = (rel.groupBy("event_type", "key")
                    .agg(F.count("*").cast("long").alias("n_type")))
    type_totals = (per_key_type.groupBy("event_type")
                   .agg(F.sum("n_type").cast("long").alias("type_total")))
    spikes_k = spikes.withColumnRenamed("spike_hour", "hour_idx")
    in_spike = (rel.join(F.broadcast(spikes_k), ["event_type", "hour_idx"])
                .groupBy("event_type",
                         F.col("hour_idx").alias("spike_hour"),
                         "key", "spike_total")
                .agg(F.count("*").cast("long").alias("n_in_spike")))
    return (in_spike
            .join(per_key_type, ["event_type", "key"])
            .join(F.broadcast(type_totals), "event_type")
            .withColumn("share_ppm",
                        F.expr("n_in_spike * 1000000 div spike_total")
                        .cast("long"))
            .withColumn("baseline_ppm",
                        F.expr("n_type * 1000000 div type_total")
                        .cast("long"))
            .withColumn("excess_ppm",
                        (F.col("share_ppm") -
                         F.col("baseline_ppm")).cast("long"))
            .withColumn("is_driver",
                        (F.col("excess_ppm") > driver_excess_ppm)
                        .cast("int"))
            .select("event_type", "spike_hour", "key", "n_in_spike",
                    "spike_total", "n_type", "type_total", "share_ppm",
                    "baseline_ppm", "excess_ppm", "is_driver"))


def spike_attribution_sql(events: str, key_expr: str = "user_id",
                          type_expr: str = "event_type",
                          ts_expr: str = "ts",
                          driver_excess_ppm: int = 100_000) -> str:
    """DuckDB oracle: identical argmax → spike-hour re-agg → share
    chain; final relation ``sp_out``."""
    sec = f"epoch(date_trunc('second', {ts_expr}))::BIGINT"
    return f"""
sp_rel AS (
  SELECT {type_expr} AS event_type, {key_expr} AS key,
         {sec} // 3600 AS hour_idx
  FROM {events}),
sp_cells AS (
  SELECT event_type, hour_idx, count(*)::BIGINT AS n
  FROM sp_rel GROUP BY 1, 2),
sp_spikes AS (
  SELECT event_type, hour_idx AS spike_hour, n AS spike_total
  FROM (SELECT *, row_number() OVER (PARTITION BY event_type
                                     ORDER BY n DESC, hour_idx ASC)
                    AS rk
        FROM sp_cells) WHERE rk = 1),
sp_pkt AS (
  SELECT event_type, key, count(*)::BIGINT AS n_type
  FROM sp_rel GROUP BY 1, 2),
sp_tt AS (
  SELECT event_type, sum(n_type)::BIGINT AS type_total
  FROM sp_pkt GROUP BY 1),
sp_in AS (
  SELECT r.event_type, s.spike_hour, r.key, s.spike_total,
         count(*)::BIGINT AS n_in_spike
  FROM sp_rel r JOIN sp_spikes s
    ON r.event_type = s.event_type AND r.hour_idx = s.spike_hour
  GROUP BY 1, 2, 3, 4),
sp_out AS (
  SELECT i.event_type, i.spike_hour, i.key, i.n_in_spike,
         i.spike_total, k.n_type, t.type_total,
         (i.n_in_spike * 1000000 // i.spike_total)::BIGINT AS share_ppm,
         (k.n_type * 1000000 // t.type_total)::BIGINT AS baseline_ppm,
         ((i.n_in_spike * 1000000 // i.spike_total)
          - (k.n_type * 1000000 // t.type_total))::BIGINT AS excess_ppm,
         (((i.n_in_spike * 1000000 // i.spike_total)
           - (k.n_type * 1000000 // t.type_total))
            > {driver_excess_ppm})::INT AS is_driver
  FROM sp_in i
  JOIN sp_pkt k ON k.event_type = i.event_type AND k.key = i.key
  JOIN sp_tt t ON t.event_type = i.event_type)"""


# ---------------------------------------------------------------------------
# Per-type latency percentiles — the p50/p95/p99 dashboard row.
# Percentile-by-sort is the classic skew trap (one hot type = one
# mega-sort-partition); quantizing the measure to milli-units first
# collapses the stream to a (type, milli-value) histogram whose
# cumulative window is O(distinct values), not O(events) — the exact
# discrete-percentile analogue of a t-digest, with none of the sketch
# error (token_percentiles' shape, applied to the measure column).
# Discrete percentile: p_q = min{v : cum_count(v) ≥ ceil(q·n)}.


def latency_percentiles(events: DataFrame, group_col: str = "event_type",
                        value_col: str = "value") -> DataFrame:
    """(event_type, n_events, mean_milli, p50_milli, p95_milli,
    p99_milli, max_milli) — exact discrete percentiles of the
    milli-quantized measure per type.  Quantization is
    round(value·1000) cast to long — bit-identical on both engines for
    finite positive doubles."""
    vm = F.round(F.col(value_col) * 1000).cast("long")
    hist = (events.select(F.col(group_col).alias("grp"), vm.alias("v"))
            .groupBy("grp", "v").agg(F.count("*").alias("c")))
    wcum = Window.partitionBy("grp").orderBy("v") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wtot = Window.partitionBy("grp")
    h = (hist.withColumn("cum", F.sum("c").over(wcum))
         .withColumn("n", F.sum("c").over(wtot))
         .withColumn("tot", F.sum(F.col("v") * F.col("c")).over(wtot)))
    # ceil(q·n) in exact integers: ceil(a/b) = -floordiv(-a, b)
    def need(num: int, den: int):
        return -F.floor(F.lit(-num) * F.col("n") / den)
    return (h.groupBy("grp")
            .agg(F.max("n").cast("long").alias("n_events"),
                 F.expr("max(tot) div max(n)").cast("long")
                 .alias("mean_milli"),
                 F.min(F.when(F.col("cum") >= need(1, 2), F.col("v")))
                 .cast("long").alias("p50_milli"),
                 F.min(F.when(F.col("cum") >= need(19, 20), F.col("v")))
                 .cast("long").alias("p95_milli"),
                 F.min(F.when(F.col("cum") >= need(99, 100), F.col("v")))
                 .cast("long").alias("p99_milli"),
                 F.max("v").cast("long").alias("max_milli"))
            .withColumnRenamed("grp", "event_type"))


def latency_percentiles_sql(events: str, group_expr: str = "event_type",
                            value_expr: str = "value") -> str:
    """DuckDB oracle: identical histogram → cumulative → threshold
    chain; final relation ``lp_out``."""
    return f"""
lp_hist AS (
  SELECT {group_expr} AS grp,
         CAST(round({value_expr} * 1000) AS BIGINT) AS v,
         count(*)::BIGINT AS c
  FROM {events} GROUP BY 1, 2),
lp_cum AS (
  SELECT grp, v, c,
         sum(c) OVER (PARTITION BY grp ORDER BY v
                      ROWS UNBOUNDED PRECEDING) AS cum,
         sum(c) OVER (PARTITION BY grp) AS n,
         sum(v * c) OVER (PARTITION BY grp) AS tot
  FROM lp_hist),
lp_out AS (
  SELECT grp AS event_type, max(n)::BIGINT AS n_events,
         (max(tot) // max(n))::BIGINT AS mean_milli,
         min(CASE WHEN cum >= -floor(-n / 2.0) THEN v END)::BIGINT
           AS p50_milli,
         min(CASE WHEN cum >= -floor(-19.0 * n / 20.0) THEN v END)::BIGINT
           AS p95_milli,
         min(CASE WHEN cum >= -floor(-99.0 * n / 100.0) THEN v END)::BIGINT
           AS p99_milli,
         max(v)::BIGINT AS max_milli
  FROM lp_cum GROUP BY grp)"""


# ---------------------------------------------------------------------------
# Tail-based sampling decision table (OpenTelemetry tail-sampling
# processor semantics): keep EVERY session that contains an error,
# and a deterministic hash fraction of the error-free rest — the
# ingest-cost lever observability pipelines pull first, evaluated
# retrospectively so the keep decision is session-complete (that is
# what "tail" means: decide after the session is over, not per-event).
#
# Scale shape: one groupBy onto (key, session-bucket) sessions with a
# conditional error sum; the keep rule is a pure projection on the
# session grid (hash32 is the md5-derived kernel both engines share);
# the decision fold is a bounded groupBy(keep_reason).  The raw stream
# is touched exactly once.


def tail_sampling(events: DataFrame, key_col: str = "user_id",
                  type_col: str = "event_type", ts_col: str = "ts",
                  error_type: str = "error", bucket_s: int = 3600,
                  sample_num: int = 1, sample_den: int = 10) -> DataFrame:
    """(keep_reason, n_sessions, n_events, pct_sessions_ppm) with
    keep_reason ∈ 'error' | 'sampled' | 'dropped' — error sessions
    always kept; error-free sessions kept when
    hash32(key||'|'||bucket) % sample_den < sample_num (deterministic,
    engine-portable); ppm shares are exact integers."""
    from .hashing import hash32
    sess = (events.select(
        F.col(key_col).alias("key"),
        F.expr(f"unix_timestamp({ts_col}) div {bucket_s}").cast("long")
        .alias("b"),
        (F.col(type_col) == error_type).cast("long").alias("is_err"))
        .groupBy("key", "b")
        .agg(F.sum("is_err").alias("n_err"),
             F.count("*").cast("long").alias("n_ev")))
    h = F.pmod(hash32(F.concat(F.col("key").cast("string"), F.lit("|"),
                               F.col("b").cast("string"))),
               F.lit(sample_den))
    lab = (F.when(F.col("n_err") > 0, F.lit("error"))
           .when(h < sample_num, F.lit("sampled"))
           .otherwise(F.lit("dropped")))
    per = (sess.withColumn("keep_reason", lab)
           .groupBy("keep_reason")
           .agg(F.count("*").cast("long").alias("n_sessions"),
                F.sum("n_ev").cast("long").alias("n_events")))
    tot = per.agg(F.sum("n_sessions").cast("long").alias("tot"))
    return (per.crossJoin(F.broadcast(tot))
            .withColumn("pct_sessions_ppm",
                        F.expr("n_sessions * 1000000 div tot")
                        .cast("long"))
            .select("keep_reason", "n_sessions", "n_events",
                    "pct_sessions_ppm"))


def tail_sampling_sql(events: str, key_expr: str = "user_id",
                      type_expr: str = "event_type", ts_expr: str = "ts",
                      error_type: str = "error", bucket_s: int = 3600,
                      sample_num: int = 1, sample_den: int = 10) -> str:
    """DuckDB oracle: identical session → hash rule → fold chain; final
    relation ``ts_out``."""
    from .hashing import hash32_sql
    sec = f"epoch(date_trunc('second', {ts_expr}))::BIGINT"
    hx = hash32_sql(f"key::VARCHAR || '|' || b::VARCHAR")
    return f"""
ts_sess AS (
  SELECT {key_expr} AS key, {sec} // {bucket_s} AS b,
         sum(({type_expr} = '{error_type}')::BIGINT) AS n_err,
         count(*)::BIGINT AS n_ev
  FROM {events} GROUP BY 1, 2),
ts_lab AS (
  SELECT CASE WHEN n_err > 0 THEN 'error'
              WHEN {hx} % {sample_den} < {sample_num} THEN 'sampled'
              ELSE 'dropped' END AS keep_reason,
         n_ev
  FROM ts_sess),
ts_per AS (
  SELECT keep_reason, count(*)::BIGINT AS n_sessions,
         sum(n_ev)::BIGINT AS n_events
  FROM ts_lab GROUP BY 1),
ts_tot AS (SELECT sum(n_sessions)::BIGINT AS tot FROM ts_per),
ts_out AS (
  SELECT p.keep_reason, p.n_sessions, p.n_events,
         (p.n_sessions * 1000000 // t.tot)::BIGINT AS pct_sessions_ppm
  FROM ts_per p CROSS JOIN ts_tot t)"""


# ---------------------------------------------------------------------------
# Alert exemplars: for each (type, flagged-or-not severity lane) the
# deterministic FIRST example — what every alert UI shows next to the
# count, chosen by min event id so reruns and both engines agree.
# min_by/arg_min is the single-pass idiom; no window, no sort of the
# stream, one bounded-output aggregate.


def alert_exemplars(events: DataFrame, type_col: str = "event_type",
                    id_col: str = "event_id", key_col: str = "user_id",
                    ts_col: str = "ts") -> DataFrame:
    """(event_type, n_events, n_keys, exemplar_id, exemplar_key,
    exemplar_sec) — per type: counts, distinct keys, and the
    min-event-id exemplar's (id, key, second) fetched in the SAME
    single aggregate via min_by (no join-back, no window)."""
    sec = F.unix_timestamp(F.col(ts_col)).cast("long")
    rel = events.select(F.col(type_col).alias("event_type"),
                        F.col(id_col).alias("i"),
                        F.col(key_col).alias("k"), sec.alias("t"))
    return (rel.groupBy("event_type")
            .agg(F.count("*").cast("long").alias("n_events"),
                 F.countDistinct("k").cast("long").alias("n_keys"),
                 F.min("i").cast("long").alias("exemplar_id"),
                 F.min_by("k", "i").cast("long").alias("exemplar_key"),
                 F.min_by("t", "i").cast("long").alias("exemplar_sec")))


def alert_exemplars_sql(events: str, type_expr: str = "event_type",
                        id_expr: str = "event_id",
                        key_expr: str = "user_id",
                        ts_expr: str = "ts") -> str:
    """DuckDB oracle: arg_min mirrors min_by; final relation
    ``ax_out``."""
    sec = f"epoch(date_trunc('second', {ts_expr}))::BIGINT"
    return f"""
ax_out AS (
  SELECT {type_expr} AS event_type,
         count(*)::BIGINT AS n_events,
         count(DISTINCT {key_expr})::BIGINT AS n_keys,
         min({id_expr})::BIGINT AS exemplar_id,
         arg_min({key_expr}, {id_expr})::BIGINT AS exemplar_key,
         arg_min({sec}, {id_expr})::BIGINT AS exemplar_sec
  FROM {events} GROUP BY 1)"""


# ---------------------------------------------------------------------------
# Semi-structured telemetry schema coverage: which JSON property keys
# each event type actually carries, and how consistently — the
# schema-drift tripwire for the freeform `props` bag (a producer that
# stops sending a key, or starts sending a new one, shows up here
# before any consumer breaks).  json_object_keys (Spark) / json_keys
# (DuckDB) agree on the key multiset; the stream dies at one groupBy
# onto the (type, key) grid.


def json_key_coverage(events: DataFrame, type_col: str = "event_type",
                      props_col: str = "props",
                      drift_ppm: int = 1_000_000) -> DataFrame:
    """(event_type, key, n_with_key, n_events, coverage_ppm,
    is_partial) — per type, each JSON key's presence count over the
    type's event count; is_partial flags keys below full coverage
    (coverage_ppm < ``drift_ppm``)."""
    rel = events.select(F.col(type_col).alias("event_type"),
                        F.col(props_col).alias("p"))
    totals = (rel.groupBy("event_type")
              .agg(F.count("*").cast("long").alias("n_events")))
    keys = (rel.select("event_type",
                       F.explode(F.json_object_keys("p")).alias("key"))
            .groupBy("event_type", "key")
            .agg(F.count("*").cast("long").alias("n_with_key")))
    return (keys.join(F.broadcast(totals), "event_type")
            .withColumn("coverage_ppm",
                        F.expr("n_with_key * 1000000 div n_events")
                        .cast("long"))
            .withColumn("is_partial",
                        (F.col("coverage_ppm") < drift_ppm).cast("int"))
            .select("event_type", "key", "n_with_key", "n_events",
                    "coverage_ppm", "is_partial"))


def json_key_coverage_sql(events: str, type_expr: str = "event_type",
                          props_expr: str = "props",
                          drift_ppm: int = 1_000_000) -> str:
    """DuckDB oracle: json_keys mirror; final relation ``jk_out``."""
    return f"""
jk_tot AS (
  SELECT {type_expr} AS event_type, count(*)::BIGINT AS n_events
  FROM {events} GROUP BY 1),
jk_keys AS (
  SELECT {type_expr} AS event_type, unnest(json_keys({props_expr})) AS key
  FROM {events}),
jk_grid AS (
  SELECT event_type, key, count(*)::BIGINT AS n_with_key
  FROM jk_keys GROUP BY 1, 2),
jk_out AS (
  SELECT g.event_type, g.key, g.n_with_key, t.n_events,
         (g.n_with_key * 1000000 // t.n_events)::BIGINT AS coverage_ppm,
         ((g.n_with_key * 1000000 // t.n_events) < {drift_ppm})::INT
           AS is_partial
  FROM jk_grid g JOIN jk_tot t USING (event_type))"""


# ---------------------------------------------------------------------------
# Incident summary capstone: the one-row-per-type incident digest a
# pager links to — counts + deterministic exemplar, the worst hour and
# its top driver key, and the most-correlated co-firing type —
# composed from alert_exemplars, spike_attribution, and
# alert_correlation.  The oracle composes the same three SQL
# generators verbatim (their CTE prefixes are disjoint by design), so
# the capstone is hash-checked end-to-end through the same kernels.
#
# Scale shape: all three inputs are type- or (type, key)-grain grids;
# the top-driver and top-partner reductions are rank-1 windows over
# those grids (excess desc / lift desc, deterministic tie-breaks); the
# final assembly is broadcast joins of type-grain tables.


def incident_summary(events: DataFrame, key_col: str = "user_id",
                     type_col: str = "event_type", ts_col: str = "ts",
                     id_col: str = "event_id") -> DataFrame:
    """(event_type, n_events, n_keys, exemplar_id, spike_hour,
    spike_total, top_driver_key, top_driver_excess_ppm, top_partner,
    top_partner_lift_ppm) — partner columns NULL when no correlated
    pair survived min-co support."""
    ex = alert_exemplars(events, type_col=type_col, id_col=id_col,
                         key_col=key_col, ts_col=ts_col) \
        .select("event_type", "n_events", "n_keys", "exemplar_id")
    sp = spike_attribution(events, key_col=key_col, type_col=type_col,
                           ts_col=ts_col)
    wd = Window.partitionBy("event_type") \
        .orderBy(F.desc("excess_ppm"), F.asc("key"))
    drivers = (sp.withColumn("rk", F.row_number().over(wd))
               .filter(F.col("rk") == 1)
               .select("event_type", "spike_hour", "spike_total",
                       F.col("key").alias("top_driver_key"),
                       F.col("excess_ppm")
                       .alias("top_driver_excess_ppm")))
    ac = alert_correlation(events, key_col=key_col, type_col=type_col,
                           ts_col=ts_col)
    both = (ac.select(F.col("a").alias("event_type"),
                      F.col("b").alias("partner"), "lift_ppm")
            .unionByName(ac.select(F.col("b").alias("event_type"),
                                   F.col("a").alias("partner"),
                                   "lift_ppm")))
    wp = Window.partitionBy("event_type") \
        .orderBy(F.desc("lift_ppm"), F.asc("partner"))
    partners = (both.withColumn("rk", F.row_number().over(wp))
                .filter(F.col("rk") == 1)
                .select("event_type",
                        F.col("partner").alias("top_partner"),
                        F.col("lift_ppm").alias("top_partner_lift_ppm")))
    return (ex.join(F.broadcast(drivers), "event_type")
            .join(F.broadcast(partners), "event_type", "left")
            .select("event_type", "n_events", "n_keys", "exemplar_id",
                    "spike_hour", "spike_total", "top_driver_key",
                    "top_driver_excess_ppm", "top_partner",
                    "top_partner_lift_ppm"))


def incident_summary_sql(events: str, key_expr: str = "user_id",
                         type_expr: str = "event_type",
                         ts_expr: str = "ts",
                         id_expr: str = "event_id") -> str:
    """DuckDB oracle: the three component generators composed verbatim
    (disjoint CTE prefixes) + rank-1 reductions; final relation
    ``is_out``."""
    return (alert_exemplars_sql(events, type_expr=type_expr,
                                id_expr=id_expr, key_expr=key_expr,
                                ts_expr=ts_expr) + ",\n"
            + spike_attribution_sql(events, key_expr=key_expr,
                                    type_expr=type_expr,
                                    ts_expr=ts_expr) + ",\n"
            + alert_correlation_sql(events, key_expr=key_expr,
                                    type_expr=type_expr,
                                    ts_expr=ts_expr) + f""",
is_drv AS (
  SELECT event_type, spike_hour, spike_total,
         key AS top_driver_key, excess_ppm AS top_driver_excess_ppm
  FROM (SELECT *, row_number() OVER (PARTITION BY event_type
                                     ORDER BY excess_ppm DESC, key ASC)
                    AS rk
        FROM sp_out) WHERE rk = 1),
is_both AS (
  SELECT a AS event_type, b AS partner, lift_ppm FROM ac_out
  UNION ALL
  SELECT b AS event_type, a AS partner, lift_ppm FROM ac_out),
is_ptn AS (
  SELECT event_type, partner AS top_partner,
         lift_ppm AS top_partner_lift_ppm
  FROM (SELECT *, row_number() OVER (PARTITION BY event_type
                                     ORDER BY lift_ppm DESC, partner ASC)
                    AS rk
        FROM is_both) WHERE rk = 1),
is_out AS (
  SELECT x.event_type, x.n_events, x.n_keys, x.exemplar_id,
         d.spike_hour, d.spike_total, d.top_driver_key,
         d.top_driver_excess_ppm, p.top_partner,
         p.top_partner_lift_ppm
  FROM ax_out x
  JOIN is_drv d USING (event_type)
  LEFT JOIN is_ptn p USING (event_type))""")


# ---------------------------------------------------------------------------
# At-least-once delivery audit: duplicate event-id detection — the
# ingest-hygiene table that tells you whether the upstream bus
# re-delivered, and how badly, before any consumer dedups.  One
# groupBy onto the id grid, one bounded global fold.


def delivery_dedup_stats(events: DataFrame,
                         id_col: str = "event_id") -> DataFrame:
    """(n_rows, n_ids, n_dup_ids, n_dup_rows, max_copies, dup_ppm) —
    one summary row; dup_ppm = redundant rows · 10⁶ div total rows."""
    per_id = (events.groupBy(F.col(id_col).alias("i"))
              .agg(F.count("*").cast("long").alias("c")))
    return (per_id.agg(
        F.sum("c").cast("long").alias("n_rows"),
        F.count("*").cast("long").alias("n_ids"),
        F.sum((F.col("c") > 1).cast("long")).cast("long")
        .alias("n_dup_ids"),
        F.sum(F.col("c") - 1).cast("long").alias("n_dup_rows"),
        F.max("c").cast("long").alias("max_copies"))
        .withColumn("dup_ppm",
                    F.expr("n_dup_rows * 1000000 div n_rows")
                    .cast("long")))


def delivery_dedup_stats_sql(events: str,
                             id_expr: str = "event_id") -> str:
    """DuckDB oracle; final relation ``dd_out``."""
    return f"""
dd_per AS (
  SELECT {id_expr} AS i, count(*)::BIGINT AS c
  FROM {events} GROUP BY 1),
dd_out AS (
  SELECT sum(c)::BIGINT AS n_rows, count(*)::BIGINT AS n_ids,
         sum((c > 1)::BIGINT)::BIGINT AS n_dup_ids,
         sum(c - 1)::BIGINT AS n_dup_rows,
         max(c)::BIGINT AS max_copies,
         (sum(c - 1) * 1000000 // sum(c))::BIGINT AS dup_ppm
  FROM dd_per)"""


# ---------------------------------------------------------------------------
# Watermark lateness profile: how out-of-order the stream actually is
# — the measurement that should SET the streaming watermark delay
# (too short drops late data, too long bloats state).  Arrival order
# is proxied by the monotone ingest id; per key, an event's lateness
# is the running max event-time at its arrival minus its own event
# time.  The lateness values collapse to a histogram (distinct
# lateness seconds, bounded by the disorder span — not the stream),
# and the global discrete percentiles run over that histogram; the
# single-partition window is histogram-sized, documented.


def lateness_profile(events: DataFrame, key_col: str = "user_id",
                     id_col: str = "event_id",
                     ts_col: str = "ts") -> DataFrame:
    """(n_events, n_late, late_ppm, p50_late_s, p95_late_s,
    p99_late_s, max_late_s) — one summary row; p_q over lateness
    seconds, discrete rule p_q = min{v : cum ≥ ceil(q·n)}."""
    sec = F.unix_timestamp(F.col(ts_col)).cast("long")
    w = (Window.partitionBy(key_col).orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    late = (events.select(F.col(key_col), F.col(id_col), sec.alias("t"))
            .withColumn("late", (F.max("t").over(w) - F.col("t"))
                        .cast("long")))
    hist = late.groupBy("late").agg(F.count("*").alias("c"))
    wcum = Window.orderBy("late") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    h = (hist.withColumn("cum", F.sum("c").over(wcum))
         .withColumn("n", F.sum("c").over(
             Window.partitionBy())))
    def need(num: int, den: int):
        return -F.floor(F.lit(-num) * F.col("n") / den)
    return (h.agg(
        F.max("n").cast("long").alias("n_events"),
        F.sum(F.when(F.col("late") > 0, F.col("c"))
              .otherwise(F.lit(0))).cast("long").alias("n_late"),
        F.min(F.when(F.col("cum") >= need(1, 2), F.col("late")))
        .cast("long").alias("p50_late_s"),
        F.min(F.when(F.col("cum") >= need(19, 20), F.col("late")))
        .cast("long").alias("p95_late_s"),
        F.min(F.when(F.col("cum") >= need(99, 100), F.col("late")))
        .cast("long").alias("p99_late_s"),
        F.max("late").cast("long").alias("max_late_s"))
        .withColumn("late_ppm",
                    F.expr("n_late * 1000000 div n_events").cast("long"))
        .select("n_events", "n_late", "late_ppm", "p50_late_s",
                "p95_late_s", "p99_late_s", "max_late_s"))


def lateness_profile_sql(events: str, key_expr: str = "user_id",
                         id_expr: str = "event_id",
                         ts_expr: str = "ts") -> str:
    """DuckDB oracle: identical running-max → histogram → percentile
    chain; final relation ``lt_out``."""
    sec = f"epoch(date_trunc('second', {ts_expr}))::BIGINT"
    return f"""
lt_late AS (
  SELECT (max({sec}) OVER (PARTITION BY {key_expr} ORDER BY {id_expr}
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW)
          - {sec})::BIGINT AS late
  FROM {events}),
lt_hist AS (
  SELECT late, count(*)::BIGINT AS c FROM lt_late GROUP BY 1),
lt_cum AS (
  SELECT late, c,
         sum(c) OVER (ORDER BY late ROWS UNBOUNDED PRECEDING) AS cum,
         sum(c) OVER () AS n
  FROM lt_hist),
lt_out AS (
  SELECT max(n)::BIGINT AS n_events,
         sum(CASE WHEN late > 0 THEN c ELSE 0 END)::BIGINT AS n_late,
         (sum(CASE WHEN late > 0 THEN c ELSE 0 END) * 1000000
            // max(n))::BIGINT AS late_ppm,
         min(CASE WHEN cum >= -floor(-n / 2.0) THEN late END)::BIGINT
           AS p50_late_s,
         min(CASE WHEN cum >= -floor(-19.0 * n / 20.0) THEN late END)
           ::BIGINT AS p95_late_s,
         min(CASE WHEN cum >= -floor(-99.0 * n / 100.0) THEN late END)
           ::BIGINT AS p99_late_s,
         max(late)::BIGINT AS max_late_s
  FROM lt_cum)"""


# ---------------------------------------------------------------------------
# Ingestion completeness: did every producer deliver every hour?  The
# first dashboard a pipeline on-call checks — per event type, the
# observed (type, hour) cells vs the corpus's full hour span, exact
# coverage ppm, and the LONGEST silent stretch (internal gaps between
# observed hours, plus the edge gaps to the corpus bounds).  The raw
# stream dies at one distinct onto the (type, hour) grid; the gap
# window runs per type over grid rows only.


def ingestion_completeness(events: DataFrame,
                           type_col: str = "event_type",
                           ts_col: str = "ts") -> DataFrame:
    """(event_type, span_hours, observed_hours, missing_hours,
    coverage_ppm, max_gap_hours) — one row per type; expectation is
    the GLOBAL corpus hour span (every producer, every hour)."""
    hour = F.expr(f"unix_timestamp({ts_col}) div 3600")
    cells = (events.select(F.col(type_col).alias("t"), hour.alias("h"))
             .distinct())
    bounds = cells.agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
    w = Window.partitionBy("t").orderBy("h")
    gap = F.col("h") - F.lag("h").over(w) - 1
    g = (cells.withColumn("internal_gap", gap)
         .groupBy("t")
         .agg(F.count(F.lit(1)).alias("observed_hours"),
              F.min("h").alias("first_h"), F.max("h").alias("last_h"),
              F.coalesce(F.max("internal_gap"), F.lit(0))
              .alias("max_internal_gap")))
    return (g.crossJoin(F.broadcast(bounds))
            .select(F.col("t").alias("event_type"),
                    (F.col("hi") - F.col("lo") + 1).alias("span_hours"),
                    "observed_hours",
                    (F.col("hi") - F.col("lo") + 1
                     - F.col("observed_hours")).alias("missing_hours"),
                    F.expr("observed_hours * 1000000 div (hi - lo + 1)")
                    .alias("coverage_ppm"),
                    F.greatest(F.col("max_internal_gap"),
                               F.col("first_h") - F.col("lo"),
                               F.col("hi") - F.col("last_h"))
                    .cast("long").alias("max_gap_hours")))


def ingestion_completeness_sql(events: str, type_expr: str = "event_type",
                               ts_expr: str = "ts") -> str:
    """DuckDB oracle; final relation ``cov_out``."""
    hour = f"(epoch(date_trunc('second', {ts_expr}))::BIGINT // 3600)"
    return f"""
cov_cells AS (
  SELECT DISTINCT {type_expr} AS t, {hour} AS h FROM {events}),
cov_bounds AS (
  SELECT min(h) AS lo, max(h) AS hi FROM cov_cells),
cov_gaps AS (
  SELECT t, h, h - lag(h) OVER (PARTITION BY t ORDER BY h) - 1
           AS internal_gap
  FROM cov_cells),
cov_g AS (
  SELECT t, count(*) AS observed_hours, min(h) AS first_h,
         max(h) AS last_h,
         coalesce(max(internal_gap), 0) AS max_internal_gap
  FROM cov_gaps GROUP BY t),
cov_out AS (
  SELECT t AS event_type, (hi - lo + 1)::BIGINT AS span_hours,
         observed_hours,
         (hi - lo + 1 - observed_hours)::BIGINT AS missing_hours,
         (observed_hours * 1000000 // (hi - lo + 1))::BIGINT
           AS coverage_ppm,
         greatest(max_internal_gap, first_h - lo, hi - last_h)::BIGINT
           AS max_gap_hours
  FROM cov_g, cov_bounds)
"""


# ---------------------------------------------------------------------------
# Pipeline health scorecard — the data-SLO digest a pipeline publishes
# per batch: ingestion coverage, contract violations, delivery
# duplication, and event-time disorder, each reduced to ONE number
# judged against a frozen threshold.  The four components are the
# existing audits (ingestion_completeness, contracts.
# data_contract_audit, delivery_dedup_stats, lateness_profile); each
# folds to a single row before the union, so the scorecard costs
# exactly what its components cost.  The DuckDB oracle composes the
# same four SQL generators verbatim (disjoint CTE prefixes cov_/dc_/
# dd_/lt_ by design).

HEALTH_COVERAGE_MIN_PPM = 900_000   # every producer ≥ 90% of hours
HEALTH_CONTRACT_MAX_PPM = 0         # any contract violation fails
HEALTH_DUP_MAX_PPM = 1_000          # ≤ 0.1% redundant deliveries
HEALTH_LATE_P99_MAX_S = 3_600      # watermarkable within an hour


def pipeline_health(events: DataFrame) -> DataFrame:
    """(check_name, value, threshold, ok) — four rows (module docstring).
    For coverage the check passes when value ≥ threshold; for the
    other three when value ≤ threshold."""
    from .contracts import data_contract_audit
    cov = (ingestion_completeness(events)
           .agg(F.min("coverage_ppm").cast("long").alias("value"))
           .select(F.lit("ingestion_coverage_min_ppm").alias("check_name"),
                   "value",
                   F.lit(HEALTH_COVERAGE_MIN_PPM).cast("long")
                   .alias("threshold"),
                   (F.col("value") >= HEALTH_COVERAGE_MIN_PPM)
                   .alias("ok")))
    dc = (data_contract_audit(events)
          .agg(F.max("violation_ppm").cast("long").alias("value"))
          .select(F.lit("contract_violation_max_ppm").alias("check_name"),
                  "value",
                  F.lit(HEALTH_CONTRACT_MAX_PPM).cast("long")
                  .alias("threshold"),
                  (F.col("value") <= HEALTH_CONTRACT_MAX_PPM)
                  .alias("ok")))
    dd = (delivery_dedup_stats(events)
          .select(F.lit("delivery_dup_ppm").alias("check_name"),
                  F.col("dup_ppm").cast("long").alias("value"),
                  F.lit(HEALTH_DUP_MAX_PPM).cast("long")
                  .alias("threshold"),
                  (F.col("dup_ppm") <= HEALTH_DUP_MAX_PPM).alias("ok")))
    lt = (lateness_profile(events)
          .select(F.lit("lateness_p99_s").alias("check_name"),
                  F.col("p99_late_s").cast("long").alias("value"),
                  F.lit(HEALTH_LATE_P99_MAX_S).cast("long")
                  .alias("threshold"),
                  (F.col("p99_late_s") <= HEALTH_LATE_P99_MAX_S)
                  .alias("ok")))
    return cov.unionByName(dc).unionByName(dd).unionByName(lt)


def pipeline_health_sql(events: str) -> str:
    """DuckDB oracle: composes the four component generators verbatim;
    final relation ``ph_out``."""
    from .contracts import data_contract_audit_sql
    return (ingestion_completeness_sql(events) + ",\n"
            + f"dc_rules AS ({data_contract_audit_sql(events)}),\n"
            + delivery_dedup_stats_sql(events) + ",\n"
            + lateness_profile_sql(events) + ",\n"
            + f"""
ph_out AS (
  SELECT 'ingestion_coverage_min_ppm' AS check_name,
         min(coverage_ppm)::BIGINT AS value,
         {HEALTH_COVERAGE_MIN_PPM}::BIGINT AS threshold,
         min(coverage_ppm) >= {HEALTH_COVERAGE_MIN_PPM} AS ok
  FROM cov_out
  UNION ALL
  SELECT 'contract_violation_max_ppm', max(violation_ppm)::BIGINT,
         {HEALTH_CONTRACT_MAX_PPM}::BIGINT,
         max(violation_ppm) <= {HEALTH_CONTRACT_MAX_PPM} FROM dc_rules
  UNION ALL
  SELECT 'delivery_dup_ppm', dup_ppm::BIGINT,
         {HEALTH_DUP_MAX_PPM}::BIGINT,
         dup_ppm <= {HEALTH_DUP_MAX_PPM} FROM dd_out
  UNION ALL
  SELECT 'lateness_p99_s', p99_late_s::BIGINT,
         {HEALTH_LATE_P99_MAX_S}::BIGINT,
         p99_late_s <= {HEALTH_LATE_P99_MAX_S} FROM lt_out)""")


# ---------------------------------------------------------------------------
# Apdex (Application Performance Index): the industry-standard
# satisfaction score over a latency-like measure — satisfied
# (value ≤ T), tolerating (T < value ≤ 4T), frustrated (> 4T);
# score = (satisfied + tolerating/2) / total.  Exact integers
# throughout: apdex_ppm = (2·sat + tol)·10⁶ div (2·total), so the /2
# never leaves integer arithmetic.  One conditional-sum groupBy onto
# the type grid — the cheapest possible shape.

APDEX_T_CENTS = 10_000           # T in value-cents (value ≤ 100.00)


def apdex_score(events: DataFrame, group_col: str = "event_type",
                value_col: str = "value",
                t_cents: int = APDEX_T_CENTS) -> DataFrame:
    """(event_type, n, satisfied, tolerating, frustrated, apdex_ppm)
    per group; measure compared in exact cents."""
    cents = F.round(F.col(value_col) * 100).cast("long")
    return (events
            .select(F.col(group_col).alias("event_type"),
                    cents.alias("v"))
            .where(F.col("v").isNotNull())
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.when(F.col("v") <= t_cents, 1).otherwise(0))
                 .alias("satisfied"),
                 F.sum(F.when((F.col("v") > t_cents) &
                              (F.col("v") <= 4 * t_cents), 1)
                       .otherwise(0)).alias("tolerating"),
                 F.sum(F.when(F.col("v") > 4 * t_cents, 1).otherwise(0))
                 .alias("frustrated"))
            .withColumn("apdex_ppm",
                        F.expr("(2 * satisfied + tolerating) * 1000000 "
                               "div (2 * n)")))


def apdex_score_sql(events: str, group_expr: str = "event_type",
                    value_expr: str = "value",
                    t_cents: int = APDEX_T_CENTS) -> str:
    v = f"round(({value_expr}) * 100)::BIGINT"
    return f"""
SELECT {group_expr} AS event_type, count(*) AS n,
       sum(CASE WHEN {v} <= {t_cents} THEN 1 ELSE 0 END)::BIGINT
         AS satisfied,
       sum(CASE WHEN {v} > {t_cents} AND {v} <= {4 * t_cents}
                THEN 1 ELSE 0 END)::BIGINT AS tolerating,
       sum(CASE WHEN {v} > {4 * t_cents} THEN 1 ELSE 0 END)::BIGINT
         AS frustrated,
       ((2 * sum(CASE WHEN {v} <= {t_cents} THEN 1 ELSE 0 END)
         + sum(CASE WHEN {v} > {t_cents} AND {v} <= {4 * t_cents}
               THEN 1 ELSE 0 END)) * 1000000
        // (2 * count(*)))::BIGINT AS apdex_ppm
FROM {events} WHERE {value_expr} IS NOT NULL
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Day-over-day volume movers: per producer type, the densified daily
# count grid (silent days are real zeros, not missing rows) and the
# exact day-over-day change in ppm of the prior day — the "top
# movers" screen that catches a producer silently halving its volume.
# The stream dies at one groupBy onto the (type, day) grid; the
# calendar densifies via sequence/generate_series over the tiny
# global day span, and the lag window runs on grid rows.

MOVER_THRESHOLD_PPM = 500_000    # flag |change| ≥ 50% of prior day


def volume_movers(events: DataFrame, type_col: str = "event_type",
                  ts_col: str = "ts",
                  threshold_ppm: int = MOVER_THRESHOLD_PPM) -> DataFrame:
    """(event_type, day_idx, n, prev_n, change_ppm, is_mover) per
    densified (type, day) cell except each type's first day;
    change_ppm = (n − prev)·10⁶ div prev, NULL when prev = 0 (flagged
    as a mover when n > 0 — appearance from silence)."""
    day = F.expr(f"unix_timestamp({ts_col}) div 86400")
    counts = (events.select(F.col(type_col).alias("t"), day.alias("d"))
              .groupBy("t", "d").agg(F.count(F.lit(1)).alias("n")))
    bounds = counts.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    types = counts.select("t").distinct()
    grid = (types.crossJoin(F.broadcast(bounds))
            .select("t", F.explode(F.expr("sequence(lo, hi)")).alias("d")))
    dense = (grid.join(counts, ["t", "d"], "left")
             .withColumn("n", F.coalesce(F.col("n"), F.lit(0))))
    w = Window.partitionBy("t").orderBy("d")
    out = (dense.withColumn("prev_n", F.lag("n").over(w))
           .where(F.col("prev_n").isNotNull())
           .withColumn("change_ppm",
                       F.when(F.col("prev_n") > 0,
                              F.expr("(n - prev_n) * 1000000 "
                                     "div prev_n"))))
    mover = (F.when(F.col("prev_n") > 0,
                    F.abs(F.col("change_ppm")) >= threshold_ppm)
             .otherwise(F.col("n") > 0))
    return (out.select(F.col("t").alias("event_type"),
                       F.col("d").alias("day_idx"),
                       "n", "prev_n", "change_ppm",
                       mover.alias("is_mover")))


def volume_movers_sql(events: str, type_expr: str = "event_type",
                      ts_expr: str = "ts",
                      threshold_ppm: int = MOVER_THRESHOLD_PPM) -> str:
    day = f"(epoch(date_trunc('second', {ts_expr}))::BIGINT // 86400)"
    return f"""
WITH vm_counts AS (
  SELECT {type_expr} AS t, {day} AS d, count(*) AS n
  FROM {events} GROUP BY 1, 2
), vm_bounds AS (
  SELECT min(d) AS lo, max(d) AS hi FROM vm_counts
), vm_grid AS (
  SELECT t, gs.d
  FROM (SELECT DISTINCT t FROM vm_counts), vm_bounds,
       LATERAL (SELECT unnest(generate_series(lo, hi)) AS d) gs
), vm_dense AS (
  SELECT g.t, g.d, coalesce(c.n, 0) AS n
  FROM vm_grid g LEFT JOIN vm_counts c ON g.t = c.t AND g.d = c.d
), vm_lag AS (
  SELECT t, d, n, lag(n) OVER (PARTITION BY t ORDER BY d) AS prev_n
  FROM vm_dense
)
SELECT t AS event_type, d AS day_idx, n, prev_n,
       CASE WHEN prev_n > 0
            THEN ((n - prev_n) * 1000000 // prev_n)::BIGINT END
         AS change_ppm,
       CASE WHEN prev_n > 0
            THEN abs((n - prev_n) * 1000000 // prev_n)
                 >= {threshold_ppm}
            ELSE n > 0 END AS is_mover
FROM vm_lag WHERE prev_n IS NOT NULL
"""


# ---------------------------------------------------------------------------
# Capacity profile: the sizing numbers a capacity plan reads — per
# producer type, total volume, the hourly mean over the FULL corpus
# span (silent hours dilute the mean, as they should), the peak hour
# and its volume, and peak-to-mean as exact ppm (max·span·10⁶ div
# total — the ratio never leaves integers).  Peak-hour ties break to
# the earliest hour deterministically.  One (type, hour) groupBy; the
# rest is grid algebra.


def capacity_profile(events: DataFrame, type_col: str = "event_type",
                     ts_col: str = "ts") -> DataFrame:
    """(event_type, total, span_hours, max_hourly, peak_hour_idx,
    peak_to_mean_ppm) per type."""
    hour = F.expr(f"unix_timestamp({ts_col}) div 3600")
    counts = (events.select(F.col(type_col).alias("t"), hour.alias("h"))
              .groupBy("t", "h").agg(F.count(F.lit(1)).alias("n")))
    bounds = counts.agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
    # max(struct(n, -h)) → largest n, then smallest h among ties
    peak = F.max(F.struct(F.col("n"), (-F.col("h")).alias("nh")))
    g = (counts.groupBy("t")
         .agg(F.sum("n").alias("total"), peak.alias("pk")))
    return (g.crossJoin(F.broadcast(bounds))
            .select(F.col("t").alias("event_type"), "total",
                    (F.col("hi") - F.col("lo") + 1).alias("span_hours"),
                    F.col("pk.n").alias("max_hourly"),
                    (-F.col("pk.nh")).cast("long").alias("peak_hour_idx"),
                    # r6 (ADVICE): the ppm numerator is widened to
                    # decimal(38,0) — max_hourly · span · 10⁶ overflows
                    # int64 around 1e9 rows/hour over 1e4 hours — and
                    # cast back to long after the divide, so the value
                    # and the BIGINT schema are unchanged at any
                    # non-overflowing scale (the DuckDB mirror computes
                    # in int128 natively)
                    F.expr("cast(cast(pk.n as decimal(38,0)) * (hi - lo + 1)"
                           " * 1000000 div total as long)")
                    .alias("peak_to_mean_ppm")))


def capacity_profile_sql(events: str, type_expr: str = "event_type",
                         ts_expr: str = "ts") -> str:
    hour = f"(epoch(date_trunc('second', {ts_expr}))::BIGINT // 3600)"
    return f"""
WITH cp_counts AS (
  SELECT {type_expr} AS t, {hour} AS h, count(*) AS n
  FROM {events} GROUP BY 1, 2
), cp_bounds AS (
  SELECT min(h) AS lo, max(h) AS hi FROM cp_counts
), cp_peak AS (
  SELECT t, n, h,
         row_number() OVER (PARTITION BY t ORDER BY n DESC, h ASC)
           AS rk,
         sum(n) OVER (PARTITION BY t) AS total
  FROM cp_counts
)
SELECT t AS event_type, total::BIGINT AS total,
       (hi - lo + 1)::BIGINT AS span_hours,
       n::BIGINT AS max_hourly, h::BIGINT AS peak_hour_idx,
       (n * (hi - lo + 1) * 1000000 // total)::BIGINT
         AS peak_to_mean_ppm
FROM cp_peak, cp_bounds WHERE rk = 1
"""


# ---------------------------------------------------------------------------
# DAU/MAU stickiness: mean daily active users over the corpus span
# vs span-wide active users, per producer type — the engagement ratio
# product analytics reads daily.  Exact integers: stickiness_ppm =
# Σ(daily distinct users)·10⁶ div (span_days · span_distinct_users);
# silent days contribute zero DAU through the span denominator.  Two
# distinct-grain groupBys onto (type, day, user) then (type, user) —
# both bounded grids.


def stickiness_ratio(events: DataFrame, type_col: str = "event_type",
                     user_col: str = "user_id",
                     ts_col: str = "ts") -> DataFrame:
    """(event_type, span_days, dau_sum, span_users, stickiness_ppm)
    per type."""
    day = F.expr(f"unix_timestamp({ts_col}) div 86400")
    base = events.select(F.col(type_col).alias("t"), day.alias("d"),
                         F.col(user_col).alias("u"))
    bounds = base.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    dau = (base.groupBy("t", "d").agg(F.countDistinct("u").alias("dau"))
           .groupBy("t").agg(F.sum("dau").alias("dau_sum")))
    mau = base.groupBy("t").agg(F.countDistinct("u").alias("span_users"))
    return (dau.join(mau, "t").crossJoin(F.broadcast(bounds))
            .select(F.col("t").alias("event_type"),
                    (F.col("hi") - F.col("lo") + 1).alias("span_days"),
                    "dau_sum", "span_users",
                    F.expr("dau_sum * 1000000 div "
                           "((hi - lo + 1) * span_users)")
                    .alias("stickiness_ppm")))


def stickiness_ratio_sql(events: str, type_expr: str = "event_type",
                         user_expr: str = "user_id",
                         ts_expr: str = "ts") -> str:
    day = f"(epoch(date_trunc('second', {ts_expr}))::BIGINT // 86400)"
    return f"""
WITH sk_base AS (
  SELECT {type_expr} AS t, {day} AS d, {user_expr} AS u FROM {events}
), sk_bounds AS (
  SELECT min(d) AS lo, max(d) AS hi FROM sk_base
), sk_dau AS (
  SELECT t, sum(dau) AS dau_sum FROM (
    SELECT t, d, count(DISTINCT u) AS dau FROM sk_base GROUP BY 1, 2)
  GROUP BY t
), sk_mau AS (
  SELECT t, count(DISTINCT u) AS span_users FROM sk_base GROUP BY t
)
SELECT d.t AS event_type, (hi - lo + 1)::BIGINT AS span_days,
       dau_sum::BIGINT AS dau_sum, span_users,
       (dau_sum * 1000000 // ((hi - lo + 1) * span_users))::BIGINT
         AS stickiness_ppm
FROM sk_dau d JOIN sk_mau m ON d.t = m.t, sk_bounds
"""
