"""Deterministic splitting / sampling for training-data pipelines.

Both ops key on the md5-derived ``hash32`` of the stringified id plus a
salt, so (a) assignment is a pure function of (id, salt) — stable
across runs, partitionings and cluster sizes, exactly what a training
pipeline needs for reproducible splits — and (b) the DuckDB oracle is
exact.  At 100 TB both are stateless projections: no shuffle, no join,
fully codegen'd except the md5 call itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .hashing import hash32, hash32_sql

SPLITS = (("train", 80), ("val", 10), ("test", 10))


def _bucket(id_col: Column, salt: str) -> Column:
    return F.pmod(hash32(F.concat(id_col.cast("string"), F.lit(f"|{salt}"))),
                  F.lit(100))


def split_assign(id_col: Column, salt: str = "split-v1") -> Column:
    """'train' | 'val' | 'test' per id (80/10/10, hash-bucketed)."""
    b = _bucket(id_col, salt)
    expr, lo = None, 0
    for name, width in SPLITS:
        hi = lo + width
        cond = b < hi if hi < 100 else F.lit(True)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo = hi
    return expr


def in_sample(id_col: Column, pct: int, salt: str = "sample-v1") -> Column:
    """Deterministic pct% sample membership flag."""
    return _bucket(id_col, salt) < pct


def _bucket_sql(id_expr: str, salt: str) -> str:
    salted = f"{id_expr}::VARCHAR || '|{salt}'"
    # hash32 is non-negative, so plain % == pmod
    return f"({hash32_sql(salted)} % 100)"


def split_assign_sql(id_expr: str, salt: str = "split-v1") -> str:
    b = _bucket_sql(id_expr, salt)
    expr, lo = "CASE", 0
    for name, width in SPLITS[:-1]:
        lo += width
        expr += f" WHEN {b} < {lo} THEN '{name}'"
    expr += f" ELSE '{SPLITS[-1][0]}' END"
    return expr


def in_sample_sql(id_expr: str, pct: int, salt: str = "sample-v1") -> str:
    return f"{_bucket_sql(id_expr, salt)} < {pct}"


# ---------------------------------------------------------------------------
# Temperature resampling (α = 0.5) across a group key (source/domain/lang)
# ---------------------------------------------------------------------------
# Multilingual/multi-domain pretraining mixes groups with weight ∝ c^α
# (α < 1 up-weights the tail).  Everything stays in EXACT integer
# arithmetic so the DuckDB oracle matches bit-for-bit with no float-
# boundary flips: weight w_g = floor(sqrt(c_g)) (isqrt via the
# correctly-rounded IEEE sqrt — exact for integer-valued doubles
# < 2^52), acceptance rate in ppm = (10^6 · N · w_g) div (Σw · c_g),
# membership = hash32(id | salt) % 10^6 < rate.  Per-row cost is a
# hash + compare; the per-group rate table is one groupBy (tiny) and a
# broadcast join — scales to any corpus.  Overflow bound: 10^6·N·w
# must stay under 2^63 → fine below ~10^9 target docs; past that,
# compute the rate in DECIMAL(38) or per-group on the driver.
TEMP_PPM = 1_000_000


def temperature_rates(docs, group_col: str, target_n: int):
    """Per-group acceptance rates: (group, n_docs, rate_ppm)."""
    from pyspark.sql import functions as F
    counts = docs.groupBy(group_col).agg(F.count("*").alias("n_docs"))
    w = F.floor(F.sqrt(F.col("n_docs").cast("double"))).cast("long")
    counts = counts.withColumn("_w", w)
    tot_w = counts.select(F.sum("_w").alias("tw"))
    return (counts.crossJoin(F.broadcast(tot_w))
            .select(group_col, "n_docs",
                    F.least(F.lit(TEMP_PPM), F.expr(
                        f"({TEMP_PPM}L * {target_n} * _w) div (tw * n_docs)"
                    )).alias("rate_ppm")))


def temperature_select(docs, group_col: str, id_col: str, target_n: int,
                       salt: str = "temp-v1"):
    """Docs joined with their group's rate + deterministic membership
    flag ``selected``."""
    from pyspark.sql import functions as F
    rates = temperature_rates(docs, group_col, target_n)
    h = F.pmod(hash32(F.concat(F.col(id_col).cast("string"),
                               F.lit(f"|{salt}"))), F.lit(TEMP_PPM))
    return (docs.join(F.broadcast(rates), group_col)
            .withColumn("selected", h < F.col("rate_ppm")))


def temperature_select_sql(table: str, group_expr: str, id_expr: str,
                           target_n: int, salt: str = "temp-v1") -> str:
    """Oracle: per-group (n_docs, rate_ppm, n_selected) — exact."""
    h = hash32_sql(f"{id_expr}::VARCHAR || '|{salt}'")
    return f"""
WITH counts AS (
  SELECT {group_expr} AS grp, count(*)::BIGINT AS n_docs FROM {table} GROUP BY 1
), weighted AS (
  SELECT grp, n_docs, floor(sqrt(n_docs::DOUBLE))::BIGINT AS w FROM counts
), rates AS (
  SELECT grp, n_docs,
         least({TEMP_PPM}, ({TEMP_PPM}::BIGINT * {target_n} * w)
               // ((SELECT sum(w)::BIGINT FROM weighted) * n_docs)
              )::BIGINT AS rate_ppm
  FROM weighted
)
SELECT r.grp AS grp, r.n_docs AS n_docs, r.rate_ppm AS rate_ppm,
       sum(CASE WHEN ({h} % {TEMP_PPM}) < r.rate_ppm THEN 1 ELSE 0 END)::BIGINT
         AS n_selected
FROM {table} t JOIN rates r ON {group_expr} = r.grp
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# Per-group quota sampling (domain caps)
# ---------------------------------------------------------------------------

def quota_sample(df, group_col: str, id_col: str = "doc_id",
                 cap: int = 10, salt: str = "quota-v1"):
    """Keep at most ``cap`` docs per group (domain/source caps — the
    standard crawl-curation guard against a single domain dominating
    the mix).  Selection = the ``cap`` smallest ``hash32(id|salt)``
    values per group (ties → min id): a pure function of (id, salt),
    so the kept set is stable across runs, partitionings and cluster
    sizes, and the DuckDB oracle is one window.

    Output: every input row + boolean ``keep``.

    Scale: the naive plan — ``row_number() OVER (PARTITION BY group)``
    over the full corpus — single-sorts every group, and a mega-domain
    (10⁹ pages of one host at 100 TB) lands in ONE task.  Instead a
    two-phase top-K: phase 1 ranks within (group, input-partition) —
    the partition id salt bounds any group's phase-2 candidate set to
    cap × n_partitions — and phase 2 ranks the candidates only.  Any
    per-partition top-``cap`` is a superset of the group's global
    top-``cap``, so the result is EXACTLY the naive window's."""
    from pyspark.sql import Window
    h = hash32(F.concat(F.col(id_col).cast("string"), F.lit(f"|{salt}")))
    ranked = df.withColumn("_h", h).withColumn("_pid", F.spark_partition_id())
    w1 = Window.partitionBy(group_col, "_pid").orderBy("_h", id_col)
    cand = (ranked.withColumn("_rn1", F.row_number().over(w1))
            .where(F.col("_rn1") <= cap))
    w2 = Window.partitionBy(group_col).orderBy("_h", id_col)
    kept = (cand.withColumn("_rn2", F.row_number().over(w2))
            .where(F.col("_rn2") <= cap)
            .select(F.col(id_col).alias("_keep_id")))
    # no broadcast hint: kept is cap × n_groups rows — tiny for bounded
    # domain sets (AQE broadcasts it at runtime) but at 10⁸ domains it
    # must stay a shuffle join on the uniform id key
    return (df.join(kept, F.col(id_col) == F.col("_keep_id"), "left")
            .withColumn("keep", F.col("_keep_id").isNotNull())
            .drop("_keep_id"))


def quota_sample_sql(table: str, group_expr: str, id_expr: str,
                     cap: int = 10, salt: str = "quota-v1") -> str:
    """Oracle: the naive global window (exact same kept set)."""
    h = hash32_sql(f"{id_expr}::VARCHAR || '|{salt}'")
    return f"""
WITH ranked AS (
  SELECT *, row_number() OVER (PARTITION BY {group_expr}
                               ORDER BY {h}, {id_expr}) AS _rn
  FROM {table})
SELECT {id_expr} AS doc_id, {group_expr} AS source, _rn <= {cap} AS keep
FROM ranked
"""


# ---------------------------------------------------------------------------
# Deterministic global training shuffle → shard manifest
# ---------------------------------------------------------------------------

def shard_assign(df, id_col: str = "doc_id", n_shards: int = 8,
                 salt: str = "shuffle-v1", n_buckets: int | None = None):
    """(doc_id, shard, pos) — the "global shuffle" step of a training
    pipeline: every doc gets a shard (hash-bucketed, so shard sizes are
    balanced) and a dense 0-based position within its shard in
    hash order — i.e. a reproducible random permutation materialized as
    a shard manifest, a pure function of (id, salt).

    Scale: the naive plan — ``row_number() OVER (PARTITION BY shard)``
    — sorts corpus/n_shards rows in ONE task per shard (10⁹ rows/task
    at 10¹² docs × 1024 shards): a scale-killer.  Instead the same
    distributed prefix-sum shape as ``packing.pack_manifest``: the
    uniform 32-bit hash is range-bucketed (``_b = h div width``, so
    bucket order IS hash order), per-(shard, bucket) counts — a tiny
    n_shards × n_buckets aggregate — turn into cumulative bases via a
    window over that tiny table only, and each (shard, bucket) cell
    ranks its own rows in parallel.  pos = base + local_rank: exactly
    the naive window's answer, never a corpus-scale sort in one task."""
    from pyspark.sql import Window
    spark = df.sparkSession
    if n_buckets is None:
        n_buckets = spark.sparkContext.defaultParallelism * 4
    width = max(-(-(1 << 32) // n_buckets), 1)      # ceil(2^32 / n_buckets)
    h = hash32(F.concat(F.col(id_col).cast("string"), F.lit(f"|{salt}")))
    rows = df.select(F.col(id_col).alias("doc_id"), h.alias("_h")) \
        .withColumn("shard", F.pmod(F.col("_h"), F.lit(n_shards)).cast("int")) \
        .withColumn("_b", F.expr(f"_h div {width}"))
    counts = rows.groupBy("shard", "_b").agg(F.count("*").alias("c"))
    wb = (Window.partitionBy("shard").orderBy("_b")
          .rowsBetween(Window.unboundedPreceding, -1))
    bases = counts.select(
        "shard", "_b",
        F.coalesce(F.sum("c").over(wb), F.lit(0)).cast("long").alias("_base"))
    wr = Window.partitionBy("shard", "_b").orderBy("_h", "doc_id")
    return (rows.join(F.broadcast(bases), ["shard", "_b"])
            .withColumn("pos", (F.col("_base") +
                                F.row_number().over(wr) - 1).cast("long"))
            .select("doc_id", "shard", "pos"))


def shard_assign_sql(table: str, id_expr: str, n_shards: int = 8,
                     salt: str = "shuffle-v1") -> str:
    """Oracle: the naive global per-shard window (same permutation)."""
    h = hash32_sql(f"{id_expr}::VARCHAR || '|{salt}'")
    return f"""
WITH hashed AS (
  SELECT {id_expr} AS doc_id, {h} AS h, ({h} % {n_shards})::INT AS shard
  FROM {table})
SELECT doc_id, shard,
       (row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) - 1)::BIGINT
         AS pos
FROM hashed
"""


# ---------------------------------------------------------------------------
# DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
# public NeurIPS paper): score every raw document by how much more
# likely its hashed n-gram features are under a TARGET distribution
# than under the RAW corpus distribution; resampling by these weights
# shifts the corpus toward the target domain without a trained model.
# ---------------------------------------------------------------------------

DSIR_BUCKETS = 256


def dsir_weights(df, target, text_col: str = "text",
                 id_col: str = "doc_id",
                 n_buckets: int = DSIR_BUCKETS):
    """(doc_id, n_tokens, dsir_weight) for docs with ≥1 token.

    Features are hashed UNIGRAM buckets (hash32(token) % n_buckets —
    the hashing-trick bag-of-ngrams of the paper, unigrams as the
    deterministic baseline).  Bucket probabilities use add-one
    smoothing: p[b] = (c[b]+1)/(total+n_buckets).  Per-token term
    ln(p_target[b]/p_raw[b]) is rounded to integer MICRO-nats before
    the per-doc sum (order-independent exact aggregation — the same
    determinism contract as bigram_lm_score); dsir_weight is the
    per-doc MEAN log-ratio, rounded 6 dp.

    ``target`` is a boolean Column over ``df``'s rows selecting the
    target-domain slice (e.g. lang == 'en').

    Scale shape: two bucket histograms (n_buckets rows each — tiny,
    map-side partial aggs), broadcast-joined back onto the token
    stream, one uniform groupBy(doc_id).  No corpus-scale state, no
    skew key (buckets are md5-uniform), one linear explode."""
    toks = (df.filter(F.trim(F.col(text_col)) != "")
            .select(F.col(id_col).alias("doc_id"),
                    target.alias("_is_t"),
                    F.explode(F.split(F.trim(F.col(text_col)), r"\s+"))
                    .alias("tok"))
            .withColumn("b", F.pmod(hash32(F.col("tok")), F.lit(n_buckets))))
    raw_h = toks.groupBy("b").agg(F.count("*").alias("c_raw"))
    tgt_h = (toks.filter("_is_t")
             .groupBy("b").agg(F.count("*").alias("c_tgt")))
    totals = toks.agg(
        F.count("*").alias("t_raw"),
        F.sum(F.col("_is_t").cast("long")).alias("t_tgt"))
    rates = (raw_h.join(tgt_h, "b", "left")
             .crossJoin(F.broadcast(totals))
             .select("b", F.round(F.log(
                 ((F.coalesce("c_tgt", F.lit(0)) + 1) /
                  (F.col("t_tgt") + n_buckets)) /
                 ((F.col("c_raw") + 1) / (F.col("t_raw") + n_buckets))
             ) * 1e6, 0).cast("long").alias("m")))
    return (toks.join(F.broadcast(rates), "b")
            .groupBy("doc_id")
            .agg(F.count("*").cast("long").alias("n_tokens"),
                 F.sum("m").alias("_sm"))
            .select("doc_id", "n_tokens",
                    F.round(F.col("_sm") / (F.col("n_tokens") * F.lit(1e6)),
                            6).alias("dsir_weight")))


def dsir_weights_sql(table: str = "documents", text_expr: str = "text",
                     id_expr: str = "doc_id",
                     target_expr: str = "lang = 'en'",
                     n_buckets: int = DSIR_BUCKETS) -> str:
    """Oracle: identical hashing, smoothing and micro-nat rounding."""
    return f"""
WITH toks AS (
  SELECT {id_expr} AS doc_id, ({target_expr}) AS is_t,
         {hash32_sql('w')} % {n_buckets} AS b
  FROM (SELECT *, unnest(regexp_split_to_array(trim({text_expr}), '\\s+'))
               AS w
        FROM {table} WHERE trim({text_expr}) <> '')
), raw_h AS (SELECT b, count(*)::BIGINT AS c_raw FROM toks GROUP BY b),
tgt_h AS (SELECT b, count(*)::BIGINT AS c_tgt FROM toks
          WHERE is_t GROUP BY b),
totals AS (
  SELECT count(*)::BIGINT AS t_raw,
         sum(CASE WHEN is_t THEN 1 ELSE 0 END)::BIGINT AS t_tgt
  FROM toks
), rates AS (
  SELECT b, round(ln(
      ((coalesce(c_tgt, 0) + 1)::DOUBLE / (t_tgt + {n_buckets})) /
      ((c_raw + 1)::DOUBLE / (t_raw + {n_buckets}))) * 1e6)::BIGINT AS m
  FROM raw_h LEFT JOIN tgt_h USING (b), totals
)
SELECT doc_id, count(*)::BIGINT AS n_tokens,
       round(sum(m) / (count(*) * 1e6), 6) AS dsir_weight
FROM toks JOIN rates USING (b)
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# Data-mixture manifest: per-source repeat factors (epochs) for a token
# budget — the table a pretraining run consumes to decide how often
# each source is traversed (weights ∝ sqrt(source tokens), the α=0.5
# temperature mixture, in EXACT integer arithmetic end to end).
# ---------------------------------------------------------------------------

def mixture_epochs(df, budget_tokens: int, group_col: str = "source",
                   text_col: str = "text"):
    """(source, n_tokens, weight_ppm, target_tokens, epochs_ppm): how
    the ``budget_tokens`` training budget distributes over sources with
    weight ∝ isqrt(n_tokens) (α=0.5), and the per-source repeat factor
    epochs = target/available (ppm; >1e6 ⇒ the source is up-sampled /
    multi-epoch).

    Everything is exact integers: isqrt via DOUBLE sqrt + one-step
    integer correction (exact for n < 2^52), ppm shares by integer
    div, target tokens = budget*weight_ppm/1e6.  The per-source token
    table is one groupBy (|sources| rows); the arithmetic is a tiny
    broadcast-side projection — at 100 TB this manifest is a driver-
    sized artifact derived from one scan."""
    t = F.trim(F.col(text_col))
    n_toks = F.when(t == "", F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))).cast("long")
    per = df.select(F.col(group_col).alias("source"), n_toks.alias("v")) \
        .groupBy("source").agg(F.sum("v").alias("n_tokens"))
    # exact isqrt: s = floor(sqrt(n)) computed in double, then corrected
    s0 = F.floor(F.sqrt(F.col("n_tokens").cast("double"))).cast("long")
    s = F.when((s0 + 1) * (s0 + 1) <= F.col("n_tokens"), s0 + 1) \
        .when(s0 * s0 > F.col("n_tokens"), s0 - 1).otherwise(s0)
    w = per.withColumn("rt", s)
    tot = w.agg(F.sum("rt").alias("rt_tot"))
    # integer `div` (not double /): exact at any token scale, and the
    # same floor semantics as the oracle's BIGINT // operator
    return (w.crossJoin(F.broadcast(tot))
            .select("source", "n_tokens",
                    F.expr("rt * 1000000 div rt_tot").cast("long")
                    .alias("weight_ppm"))
            .withColumn("target_tokens",
                        F.expr(f"{int(budget_tokens)} * weight_ppm "
                               f"div 1000000").cast("long"))
            .withColumn("epochs_ppm",
                        F.when(F.col("n_tokens") > 0,
                               F.expr("target_tokens * 1000000 "
                                      "div n_tokens").cast("long"))
                        .otherwise(F.lit(0))))


def mixture_epochs_sql(budget_tokens: int, table: str = "documents",
                       group_expr: str = "source",
                       text_expr: str = "text") -> str:
    return f"""
WITH per AS (
  SELECT {group_expr} AS source,
         sum(CASE WHEN trim({text_expr}) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim({text_expr}), '\\s+'))
             END)::BIGINT AS n_tokens
  FROM {table} GROUP BY 1
), rooted AS (
  SELECT source, n_tokens,
         CASE WHEN (floor(sqrt(n_tokens::DOUBLE))::BIGINT + 1)
                   * (floor(sqrt(n_tokens::DOUBLE))::BIGINT + 1) <= n_tokens
              THEN floor(sqrt(n_tokens::DOUBLE))::BIGINT + 1
              WHEN floor(sqrt(n_tokens::DOUBLE))::BIGINT
                   * floor(sqrt(n_tokens::DOUBLE))::BIGINT > n_tokens
              THEN floor(sqrt(n_tokens::DOUBLE))::BIGINT - 1
              ELSE floor(sqrt(n_tokens::DOUBLE))::BIGINT END AS rt
  FROM per
), tot AS (SELECT sum(rt)::BIGINT AS rt_tot FROM rooted)
SELECT source, n_tokens,
       (rt * 1000000 // rt_tot)::BIGINT AS weight_ppm,
       ({int(budget_tokens)} * (rt * 1000000 // rt_tot) // 1000000)::BIGINT
         AS target_tokens,
       CASE WHEN n_tokens > 0
            THEN (({int(budget_tokens)} * (rt * 1000000 // rt_tot)
                   // 1000000) * 1000000 // n_tokens)::BIGINT
            ELSE 0 END AS epochs_ppm
FROM rooted, tot
"""


# ---------------------------------------------------------------------------
# Priority sampling (weighted reservoir without replacement)
# ---------------------------------------------------------------------------
# Duffield, Lund & Thorup 2007 ("Priority sampling for estimation of
# arbitrary subset sums", JACM): each row draws u_i uniform in (0,1],
# priority q_i = w_i / u_i, and the k highest-priority rows per group
# form a weighted sample without replacement whose Horvitz–Thompson
# weight is max(w_i, tau) with tau = the (k+1)-th priority.  It is the
# standard one-pass weighted reservoir for "give me k representative
# docs per domain, long docs more likely" — per-group quotas with
# size-biased inclusion instead of quota_sample's uniform coin.
#
# Exactness: u_i = (hash32(id|salt)+1) / 2^32, so the priority is the
# INTEGER q_i = (w_i << 32) // (h_i + 1) — floor division of positive
# operands, identical in Spark (`div`) and DuckDB (`//`); no float
# enters the selection or the estimator, so the oracle matches
# bit-for-bit.  Overflow bound: w · 2^32 < 2^63 ⇔ w < 2^31.
#
# Scale: same two-phase top-K as quota_sample — phase 1 ranks within
# (group, input-partition) so a mega-domain never single-tasks; any
# per-partition top-(k+1) is a superset of the global top-(k+1), so
# the result equals the naive global window's exactly.

def priority_sample(df, group_col: str, weight_col: str,
                    id_col: str = "doc_id", k: int = 8,
                    salt: str = "prio-v1"):
    """(group, id, weight, priority, est_weight, rnk) — the k
    highest-priority rows per group plus their HT estimator weights.
    ``est_weight = max(weight, tau)``; groups with ≤ k rows get
    tau = 0 (every row selected, estimator = its own weight)."""
    from pyspark.sql import Window
    h = hash32(F.concat(F.col("id").cast("string"), F.lit(f"|{salt}")))
    rows = (df.select(F.col(group_col).alias("grp"),
                      F.col(id_col).alias("id"),
                      F.col(weight_col).cast("long").alias("weight"))
            .withColumn("_h", h)
            .withColumn("priority",
                        F.expr("(weight * 4294967296) div (_h + 1)"))
            .withColumn("_pid", F.spark_partition_id()))
    w1 = Window.partitionBy("grp", "_pid").orderBy(F.desc("priority"), "id")
    cand = (rows.withColumn("_rn1", F.row_number().over(w1))
            .where(F.col("_rn1") <= k + 1))
    w2 = Window.partitionBy("grp").orderBy(F.desc("priority"), "id")
    ranked = (cand.withColumn("rnk", F.row_number().over(w2))
              .where(F.col("rnk") <= k + 1))
    tau = (ranked.where(F.col("rnk") == k + 1)
           .select("grp", F.col("priority").alias("tau")))
    return (ranked.where(F.col("rnk") <= k)
            .join(tau, "grp", "left")
            .select("grp", "id", "weight", "priority",
                    F.greatest(F.col("weight"),
                               F.coalesce(F.col("tau"), F.lit(0)))
                    .cast("long").alias("est_weight"),
                    "rnk"))


def priority_sample_sql(table: str, group_expr: str, id_expr: str,
                        weight_expr: str, k: int = 8,
                        salt: str = "prio-v1") -> str:
    """Oracle: the naive global window (same selected set + estimator)."""
    h = hash32_sql(f"{id_expr}::VARCHAR || '|{salt}'")
    return f"""
WITH rows_p AS (
  SELECT {group_expr} AS grp, {id_expr} AS id,
         {weight_expr}::BIGINT AS weight,
         (({weight_expr}::BIGINT * 4294967296) // ({h} + 1))::BIGINT
           AS priority
  FROM {table}),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY grp
                               ORDER BY priority DESC, id) AS rnk
  FROM rows_p),
tau AS (SELECT grp, priority AS tau FROM ranked WHERE rnk = {k + 1})
SELECT r.grp, r.id, r.weight, r.priority,
       greatest(r.weight, COALESCE(t.tau, 0))::BIGINT AS est_weight,
       r.rnk
FROM ranked r LEFT JOIN tau t ON t.grp = r.grp
WHERE r.rnk <= {k}
"""


# ---------------------------------------------------------------------------
# Largest-remainder (Hamilton) budget allocation
# ---------------------------------------------------------------------------
# Eval/holdout sets are built to an exact TOTAL budget ("exactly 100
# docs, proportional to group mass").  Rounding floor(B·c/N) per group
# under-fills by up to n_groups-1; the largest-remainder method hands
# the leftover seats to the groups with the biggest truncated
# remainders — the exact, deterministic apportionment rule (Hamilton's
# method).  All integer: base = B·c div N, remainder = B·c mod N,
# +1 to the L = B - Σbase largest remainders (ties → group name).
#
# Scale: the corpus collapses to the per-group count table in one
# partial-agg groupBy; every window below runs over n_groups rows.


def eval_allocation(df, group_col: str, budget: int,
                    id_col: str = "doc_id"):
    """(grp, n_docs, alloc): per-group eval-set quota summing EXACTLY
    to ``budget`` (capped at n_docs per group never enforced here —
    callers with groups smaller than their quota re-run on the
    remainder; the driver corpus has no such group)."""
    from pyspark.sql import Window
    per = df.groupBy(F.col(group_col).alias("grp")) \
        .agg(F.count("*").cast("long").alias("n_docs"))
    tot = per.agg(F.sum("n_docs").alias("n_total"))
    base = (per.crossJoin(F.broadcast(tot))
            .withColumn("base", F.expr(f"({budget} * n_docs) div n_total"))
            .withColumn("rem", F.expr(f"({budget} * n_docs) % n_total")))
    w_left = Window.partitionBy()      # n_groups rows — bounded
    ranked = (base
              .withColumn("_leftover",
                          F.lit(budget) - F.sum("base").over(w_left))
              .withColumn("_rr", F.row_number().over(
                  Window.orderBy(F.desc("rem"), F.asc("grp")))))
    return ranked.select(
        "grp", "n_docs",
        (F.col("base") +
         F.when(F.col("_rr") <= F.col("_leftover"), 1).otherwise(0))
        .cast("long").alias("alloc"))


def eval_allocation_sql(table: str, group_expr: str, budget: int) -> str:
    return f"""
WITH per AS (
  SELECT {group_expr} AS grp, count(*)::BIGINT AS n_docs
  FROM {table} GROUP BY 1),
tot AS (SELECT sum(n_docs)::BIGINT AS n_total FROM per),
base AS (
  SELECT grp, n_docs,
         ({budget} * n_docs) // n_total AS base,
         ({budget} * n_docs) % n_total AS rem
  FROM per, tot),
ranked AS (
  SELECT *, {budget} - sum(base) OVER () AS _leftover,
         row_number() OVER (ORDER BY rem DESC, grp) AS _rr
  FROM base)
SELECT grp, n_docs,
       (base + CASE WHEN _rr <= _leftover THEN 1 ELSE 0 END)::BIGINT
         AS alloc
FROM ranked
"""


# ---------------------------------------------------------------------------
# Gini concentration of corpus mass across sources
# ---------------------------------------------------------------------------
# The dataset-card diversity number: how concentrated is the corpus in
# a few domains/sources?  Gini over the per-group doc counts, via the
# exact rank formula on ascending-sorted counts
#     G = (2·Σ i·x_i − (n+1)·Σ x_i) / (n·Σ x_i),   i = 1..n ascending
# (Sen 1973's discrete form).  The numerator is ≥ 0 for ascending
# order, so the single integer division has non-negative operands and
# Spark `div` = DuckDB `//` exactly; reported in ppm.
#
# Scale: the corpus collapses to the n_groups-row count table in one
# partial-agg groupBy; the rank window and final agg run over n_groups
# rows — driver-trivial even with 10^8 domains (that window would then
# partition by a domain prefix and merge, but source cardinality here
# is bounded).


def domain_gini(df, group_col: str = "source"):
    """One row: (n_groups, n_docs, gini_ppm, top_share_ppm)."""
    from pyspark.sql import Window
    per = (df.groupBy(F.col(group_col).alias("grp"))
           .agg(F.count("*").cast("long").alias("x")))
    ranked = per.withColumn(
        "i", F.row_number().over(Window.orderBy(F.asc("x"), F.asc("grp")))
        .cast("long"))
    return (ranked.agg(F.count("*").cast("long").alias("n_groups"),
                       F.sum("x").cast("long").alias("n_docs"),
                       F.sum(F.col("i") * F.col("x")).cast("long")
                       .alias("_s"),
                       F.max("x").cast("long").alias("_mx"))
            .select("n_groups", "n_docs",
                    F.expr("((2 * _s - (n_groups + 1) * n_docs) * 1000000)"
                           " div (n_groups * n_docs)")
                    .cast("long").alias("gini_ppm"),
                    F.expr("(_mx * 1000000) div n_docs")
                    .cast("long").alias("top_share_ppm")))


def domain_gini_sql(table: str, group_expr: str) -> str:
    return f"""
WITH per AS (
  SELECT {group_expr} AS grp, count(*)::BIGINT AS x
  FROM {table} GROUP BY 1),
ranked AS (
  SELECT x, (row_number() OVER (ORDER BY x, grp))::BIGINT AS i FROM per),
agg AS (
  SELECT count(*)::BIGINT AS n_groups, sum(x)::BIGINT AS n_docs,
         sum(i * x)::BIGINT AS _s, max(x)::BIGINT AS _mx
  FROM ranked)
SELECT n_groups, n_docs,
       (((2 * _s - (n_groups + 1) * n_docs) * 1000000)
        // (n_groups * n_docs))::BIGINT AS gini_ppm,
       ((_mx * 1000000) // n_docs)::BIGINT AS top_share_ppm
FROM agg
"""


# ---------------------------------------------------------------------------
# Shard integrity checksums.  The north rule requires per-partition
# lineage + metrics and resumable re-runs; the operational primitive
# that VERIFIES a re-run (or a migration, or a second cluster) produced
# the same corpus is an order-invariant per-shard checksum manifest:
# commutative folds (sum / xor / min / max of a content hash) are
# partitioning- and arrival-order-independent by construction, so two
# manifests are comparable row-by-row no matter how either run was
# scheduled.  The sum lane accumulates in DECIMAL(38,0) — 2^32-bounded
# terms would overflow a signed long after ~2^31 rows (the round-4
# star-CC lesson).


def shard_checksums(df, id_col: str = "doc_id", text_col: str = "text",
                    n_shards: int = 8, salt: str = "shuffle-v1"):
    """(shard, n_docs, n_chars, content_sum, content_xor, content_min,
    content_max) — one row per hash shard (same bucketing rule as
    ``shard_assign``), all lanes exact integers and order-invariant.

    Scale shape: one codegen projection (hash32 of id and text) + ONE
    partial-aggregable groupBy over n_shards keys; text never
    shuffles — only (shard, hash, length) survives the exchange."""
    sh = F.pmod(hash32(F.concat(F.col(id_col).cast("string"),
                                F.lit(f"|{salt}"))), F.lit(n_shards))
    ch = hash32(F.col(text_col))
    rows = df.select(sh.cast("int").alias("shard"),
                     F.length(F.col(text_col)).cast("long").alias("len"),
                     ch.cast("long").alias("h"))
    return (rows.groupBy("shard")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.sum(F.col("len").cast("decimal(38,0)")).alias("n_chars"),
                 F.sum(F.col("h").cast("decimal(38,0)")).alias("content_sum"),
                 F.expr("bit_xor(h)").cast("long").alias("content_xor"),
                 F.min("h").cast("long").alias("content_min"),
                 F.max("h").cast("long").alias("content_max")))


def shard_checksums_sql(table: str, id_expr: str = "doc_id",
                        text_expr: str = "text", n_shards: int = 8,
                        salt: str = "shuffle-v1") -> str:
    """Oracle: the identical commutative folds (DuckDB sums promote to
    HUGEINT — already overflow-free)."""
    sh = hash32_sql(f"{id_expr}::VARCHAR || '|{salt}'")
    ch = hash32_sql(text_expr)
    return f"""
WITH ck_rows AS (
  SELECT ({sh} % {n_shards})::INT AS shard,
         length({text_expr})::BIGINT AS len,
         {ch}::BIGINT AS h
  FROM {table})
SELECT shard, count(*)::BIGINT AS n_docs,
       sum(len)::DECIMAL(38,0) AS n_chars,
       sum(h)::DECIMAL(38,0) AS content_sum,
       bit_xor(h)::BIGINT AS content_xor,
       min(h)::BIGINT AS content_min,
       max(h)::BIGINT AS content_max
FROM ck_rows GROUP BY shard
"""


# ---------------------------------------------------------------------------
# Per-group percentile quality gate.  "Keep the top p% of each
# language/source by classifier score" is the standard final cut of a
# curation funnel.  The naive plan — rank() over (PARTITION BY group
# ORDER BY score) — sorts each group's full population in one task: a
# scale-killer for billion-row language groups.  This is the same
# problem pack_manifest/shard_assign solved for hash ranks, with one
# twist: the rank key is the SCORE, so the histogram buckets are score
# ranges.  Per-(group, bucket) counts (a tiny table) give cumulative
# "kept above this bucket" bases; only the single boundary bucket of
# each group ever ranks its own rows.  Degenerate score distributions
# (one bucket holding most of a group) re-concentrate that window —
# documented; with 6-dp integer scores and W=16 the fixture corpus
# spreads 100+ buckets.


def percentile_gate(df, group_col: str = "grp", score_col: str = "score_m",
                    id_col: str = "doc_id", keep_pct: int = 20,
                    bucket_w: int = 16):
    """(doc_id, grp, score_m, keep) — keep the top ``keep_pct`` percent
    of each group by (score_m desc, doc_id asc); target_g =
    (n_g · keep_pct) div 100 rows exactly (groups smaller than
    100/keep_pct keep zero rows — the integer floor, mirrored in the
    oracle).  score_m must be an integer score (e.g. milli/ppm units).

    Exactly the naive global window's keep set, computed without any
    corpus-scale single-task sort: bucket = (score_max − score_m) div
    bucket_w (so bucket order IS descending score order), cumulative
    bases over the tiny (group × buckets) count table, and a
    row_number window confined to each group's boundary bucket."""
    from pyspark.sql import Window
    smax = df.agg(F.max(F.col(score_col)).alias("_smax"))
    rows = (df.select(F.col(id_col).alias("doc_id"),
                      F.col(group_col).alias("grp"),
                      F.col(score_col).cast("long").alias("score_m"))
            .crossJoin(F.broadcast(smax))
            .withColumn("_b", F.expr(f"(_smax - score_m) div {bucket_w}")))
    counts = rows.groupBy("grp", "_b").agg(F.count("*").alias("c"))
    wb = (Window.partitionBy("grp").orderBy("_b")
          .rowsBetween(Window.unboundedPreceding, -1))
    totals = counts.groupBy("grp").agg(F.sum("c").alias("n_g"))
    bases = (counts
             .withColumn("base", F.coalesce(F.sum("c").over(wb), F.lit(0)))
             .join(F.broadcast(totals), "grp")
             .withColumn("target",
                         F.expr(f"(n_g * {keep_pct}) div 100"))
             .select("grp", "_b", "base", "target"))
    joined = rows.join(F.broadcast(bases), ["grp", "_b"])
    # rows in buckets fully above the cut keep unconditionally; the
    # boundary bucket (base < target <= base + c) ranks internally
    need = F.col("target") - F.col("base")
    wr = (Window.partitionBy("grp", "_b")
          .orderBy(F.desc("score_m"), F.asc("doc_id")))
    ranked = joined.withColumn(
        "keep",
        F.when(need <= 0, F.lit(False))
        .otherwise(F.row_number().over(wr) <= need))
    return ranked.select("doc_id", "grp", "score_m", "keep")


def percentile_gate_sql(table: str, group_expr: str, score_expr: str,
                        id_expr: str, keep_pct: int = 20) -> str:
    """Oracle: the naive global per-group window (provably the same
    keep set — bucket boundaries respect descending score order)."""
    return f"""
WITH pg_rows AS (
  SELECT {id_expr} AS doc_id, {group_expr} AS grp,
         {score_expr}::BIGINT AS score_m
  FROM {table}),
pg_ranked AS (
  SELECT doc_id, grp, score_m,
         row_number() OVER (PARTITION BY grp
                            ORDER BY score_m DESC, doc_id) AS rn,
         count(*) OVER (PARTITION BY grp) AS n_g
  FROM pg_rows)
SELECT doc_id, grp, score_m,
       (rn <= (n_g * {keep_pct}) // 100) AS keep
FROM pg_ranked
"""


def length_ks_stats(df: DataFrame, group_col: str = "source",
                    val_col: str = "n_chars",
                    id_col: str = "doc_id") -> DataFrame:
    """(grp, n_docs, ks_ppm) — per-group two-sample Kolmogorov–Smirnov
    distance between the group's ``val_col`` distribution and the
    pooled corpus's, in exact integer ppm.  A source whose document-
    length CDF sits far from the corpus (high ks_ppm) is the classic
    ingest-bug tripwire: truncation at a fetch limit, boilerplate
    farms, or a decoder slicing pages in half all shift the length
    distribution before any content signal fires.

        D(g) = max over corpus-distinct values x of
               |cum_g(x)·N − cum_all(x)·n_g| · 10⁶ div (n_g·N)

    evaluated on the cross-multiplied integers so no per-engine
    rounding exists until the single final floor division; group jump
    points are a subset of corpus jump points (groups pool INTO the
    corpus), so the corpus-distinct grid covers every jump of both step
    functions and the max is the true sup.  The multiplications ride
    DECIMAL(38,0) lanes (cum·N reaches 10²⁴ at web scale — the
    ``shard_checksums`` overflow rule).

    Scale shape: the corpus collapses to a (group, val) count table in
    ONE partial-agg groupBy — the only scan of the data; everything
    after runs on histogram-sized relations (the ``percentile_gate``
    pattern): the distinct-value table gets its corpus CDF from one
    ordered window over ≤|distinct vals| rows, the group × value grid
    is a broadcast cross join bounded by |groups|·|distinct vals|
    (bucket ``val_col`` upstream — e.g. ``val div 64`` — if the value
    universe is genuinely unbounded), and the per-group CDF is a window
    over grid rows, never corpus rows."""
    gv = (df.groupBy(F.col(group_col).alias("grp"),
                     F.col(val_col).cast("long").alias("val"))
          .agg(F.count("*").cast("long").alias("cnt")))
    vals = (gv.groupBy("val").agg(F.sum("cnt").alias("vcnt"))
            .withColumn("cum_all",
                        F.sum("vcnt").over(
                            Window.orderBy("val")
                            .rowsBetween(Window.unboundedPreceding, 0))
                        .cast("long"))
            .drop("vcnt"))
    groups = gv.groupBy("grp").agg(F.sum("cnt").cast("long").alias("n_docs"))
    tot = gv.agg(F.sum("cnt").cast("long").alias("n_tot"))
    grid = (groups.crossJoin(F.broadcast(vals))
            .join(gv, ["grp", "val"], "left")
            .withColumn("cum_g",
                        F.sum(F.coalesce("cnt", F.lit(0))).over(
                            Window.partitionBy("grp").orderBy("val")
                            .rowsBetween(Window.unboundedPreceding, 0))
                        .cast("long"))
            .crossJoin(F.broadcast(tot)))
    d = F.abs(F.col("cum_g").cast("decimal(38,0)") * F.col("n_tot")
              - F.col("cum_all").cast("decimal(38,0)") * F.col("n_docs"))
    return (grid.withColumn("_d", d)
            .groupBy("grp", "n_docs", "n_tot")
            .agg(F.max("_d").alias("_dmax"))
            .select("grp", "n_docs",
                    F.expr("(_dmax * 1000000) div "
                           "(cast(n_docs as decimal(38,0)) * n_tot)")
                    .cast("long").alias("ks_ppm")))


def length_ks_sql(table: str, group_expr: str = "source",
                  val_expr: str = "n_chars") -> str:
    """DuckDB oracle: identical grid + cross-multiplied integer sup
    (HUGEINT ⊇ DECIMAL(38,0)); final relation ``ks_out``."""
    return f"""
ks_gv AS (
  SELECT {group_expr} AS grp, {val_expr}::BIGINT AS val,
         count(*)::BIGINT AS cnt
  FROM {table} GROUP BY 1, 2),
ks_vals AS (
  SELECT val, sum(sum(cnt)) OVER (ORDER BY val
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum_all
  FROM ks_gv GROUP BY val),
ks_groups AS (SELECT grp, sum(cnt)::BIGINT AS n_docs FROM ks_gv GROUP BY grp),
ks_tot AS (SELECT sum(cnt)::BIGINT AS n_tot FROM ks_gv),
ks_grid AS (
  SELECT g.grp, g.n_docs, v.val, v.cum_all, t.n_tot,
         sum(coalesce(x.cnt, 0)) OVER (PARTITION BY g.grp ORDER BY v.val
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum_g
  FROM ks_groups g CROSS JOIN ks_vals v CROSS JOIN ks_tot t
  LEFT JOIN ks_gv x ON x.grp = g.grp AND x.val = v.val),
ks_out AS (
  SELECT grp, n_docs,
         (max(abs(cum_g::HUGEINT * n_tot - cum_all::HUGEINT * n_docs))
            * 1000000 // (n_docs::HUGEINT * max(n_tot)))::BIGINT AS ks_ppm
  FROM ks_grid GROUP BY grp, n_docs)"""
