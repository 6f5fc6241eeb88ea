"""Count-min sketch over token streams — the sub-linear-memory
frequency summary for heavy-hitter detection at corpus scale.

At 100 TB you cannot groupBy every distinct token to find the heavy
hitters of a live stream cheaply; the CMS is the classic answer
(Cormode & Muthukrishnan 2005): d hash rows × w buckets of counters,
point estimate = min over rows.  Overestimates only (never under), by
at most εN with ε = e/w at probability 1-δ, δ = e^-d.

Spark-first shape: building the sketch is ONE explode + ONE hash
aggregate on fixed-width (row, bucket) int keys — d·w counters total
(d=4, w=1024 → 4,096 rows ≈ 64 KB), so the finished sketch BROADCASTS
and probing any candidate set is a map-side join.  All hashes are the
md5-derived portable ``hash32`` so the DuckDB oracle computes the
identical sketch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .hashing import hash32, hash32_sql

CMS_D = 4        # hash rows
CMS_W = 1024     # buckets per row


def _tokens(df: DataFrame, text_col: str) -> DataFrame:
    return df.select(
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok")) \
        .filter(F.col("tok") != "")


def cms_sketch(df: DataFrame, text_col: str = "text",
               d: int = CMS_D, w: int = CMS_W) -> DataFrame:
    """(row_i, bucket, cnt): the d×w counter table over the corpus'
    whitespace tokens (with multiplicity).  Each token contributes to
    exactly one bucket per row via independent salted hashes; the
    explode fan-out is d (a constant), and the aggregate's key space
    is d·w regardless of corpus size — partial aggregation map-side
    collapses almost everything before the one tiny shuffle."""
    toks = _tokens(df, text_col)
    lanes = F.array(*[
        F.struct(F.lit(i).alias("row_i"),
                 F.pmod(hash32(F.concat(F.col("tok"), F.lit(f"|cms{i}"))),
                        F.lit(w)).alias("bucket"))
        for i in range(d)])
    return (toks.select(F.explode(lanes).alias("l"))
            .select("l.row_i", "l.bucket")
            .groupBy("row_i", "bucket").agg(F.count("*").alias("cnt")))


def cms_estimate(candidates: DataFrame, sketch: DataFrame,
                 tok_col: str = "tok", d: int = CMS_D,
                 w: int = CMS_W) -> DataFrame:
    """(tok, est): CMS point estimate (min over the d rows) for each
    candidate token.  The sketch side is d·w rows → broadcast; the
    candidate side explodes by the constant d, joins map-side, and
    aggregates on the candidate key."""
    lanes = F.array(*[
        F.struct(F.lit(i).alias("row_i"),
                 F.pmod(hash32(F.concat(F.col(tok_col), F.lit(f"|cms{i}"))),
                        F.lit(w)).alias("bucket"))
        for i in range(d)])
    probes = (candidates.select(F.col(tok_col).alias("tok"),
                                F.explode(lanes).alias("l"))
              .select("tok", "l.row_i", "l.bucket"))
    return (probes.join(F.broadcast(sketch), ["row_i", "bucket"])
            .groupBy("tok").agg(F.min("cnt").alias("est")))


def cms_lanes_sql(tok_expr: str, d: int = CMS_D, w: int = CMS_W) -> str:
    """DuckDB: one SELECT per hash row, UNION ALL — identical salted
    md5 bucket math as the Spark lanes."""
    parts = []
    for i in range(d):
        h = hash32_sql(f"{tok_expr} || '|cms{i}'")
        parts.append(f"SELECT {tok_expr} AS tok, {i} AS row_i, "
                     f"{h} % {w} AS bucket FROM _toks")
    return " UNION ALL ".join(parts)


# ---------------------------------------------------------------------------
# HyperLogLog distinct sketch (Flajolet et al. 2007) — portable registers
# ---------------------------------------------------------------------------

HLL_P = 10                   # 2^10 = 1024 registers
HLL_M = 1 << HLL_P
HLL_WBITS = 32 - HLL_P       # rank field width (hash32 is 32-bit)
# alpha_1024 = 0.7213 / (1 + 1.079/m) — the standard bias constant
HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)


def hll_registers(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(bucket, m): HLL registers over the corpus' whitespace tokens.

    Spark-side this is ONE groupBy(bucket).max(rho) — 1024 groups, the
    partial max folds map-side, so the shuffle moves ≤ 1024 rows per
    task regardless of corpus size.  That is the whole point of the
    sketch: distinct-token cardinality at 100 TB without a corpus-wide
    DISTINCT exchange (``distinct_counts`` does the exact version; this
    is its sub-linear companion, mergeable across shards by plain max).

    rho = leading-zero rank of the (32-p)-bit suffix, computed with
    EXACT integer bit-length (string length of the binary rendering —
    no float log2, whose ULP could misround at powers of two):
    w = 0 → WBITS+1, else WBITS+1 - bit_length(w)."""
    toks = _tokens(df, text_col)
    h = hash32(F.col("tok"))
    w = (h / HLL_M).cast("long")           # h div 2^p: exact, h < 2^32
    rho = F.when(w == 0, F.lit(HLL_WBITS + 1)) \
        .otherwise(F.lit(HLL_WBITS + 1) - F.length(F.bin(w)))
    return (toks.select(F.pmod(h, F.lit(HLL_M)).alias("bucket"),
                        rho.alias("rho"))
            .groupBy("bucket").agg(F.max("rho").alias("m")))


def hll_estimate(registers: DataFrame) -> DataFrame:
    """One row (n_buckets_set, n_zero, hll_estimate) from the register
    table.  The harmonic sum is accumulated in EXACT integers —
    Σ 2^(32-M_j) scaled by 2^32, absent buckets contribute 2^32 — so
    both engines reduce the same integer before the one double-valued
    estimate expression (with the standard small-range linear-counting
    correction below 2.5m when empty registers remain)."""
    agg = registers.agg(
        F.count("*").alias("n_set"),
        F.sum(F.expr(f"cast(pow(2, 32 - m) as bigint)")).alias("s_set"))
    n_set, s_set = F.col("n_set"), F.col("s_set")
    n_zero = F.lit(HLL_M) - n_set
    s_total = s_set + n_zero * F.lit(1 << 32)
    raw = F.lit(HLL_ALPHA * HLL_M * HLL_M * float(1 << 32)) / s_total
    lc = F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / n_zero)
    est = F.when((raw < 2.5 * HLL_M) & (n_zero > 0), lc).otherwise(raw)
    return agg.select(n_set.cast("long").alias("n_buckets_set"),
                      n_zero.cast("long").alias("n_zero"),
                      F.round(est, 4).alias("hll_estimate"))


def hll_sql(toks_cte: str) -> str:
    """DuckDB oracle fragment: CTEs ``regs``, ``hsum``, ``hll`` (the
    last exposing n_buckets_set / n_zero / hll_estimate) — identical
    register construction + estimate over a CTE named ``toks_cte``
    with one column ``tok``.  Caller writes ``WITH <toks>, {fragment}
    SELECT ... FROM hll``."""
    h = hash32_sql("tok")
    raw = (f"({HLL_ALPHA * HLL_M * HLL_M}::DOUBLE * 4294967296.0::DOUBLE)"
           f" / ((s_set + ({HLL_M} - n_set) * 4294967296)::DOUBLE)")
    return f"""regs AS (
  SELECT ({h}) % {HLL_M} AS bucket,
         max(CASE WHEN ({h}) // {HLL_M} = 0 THEN {HLL_WBITS + 1}
                  ELSE {HLL_WBITS + 1}
                       - length(format('{{:b}}', ({h}) // {HLL_M})) END) AS m
  FROM {toks_cte} GROUP BY 1),
hsum AS (
  SELECT count(*) AS n_set,
         sum(power(2, 32 - m)::BIGINT)::BIGINT AS s_set
  FROM regs),
hll AS (
  SELECT n_set::BIGINT AS n_buckets_set,
         ({HLL_M} - n_set)::BIGINT AS n_zero,
         round(CASE WHEN {raw} < {2.5 * HLL_M} AND n_set < {HLL_M}
               THEN {float(HLL_M)} * ln({float(HLL_M)} / ({HLL_M} - n_set))
               ELSE {raw} END, 4) AS hll_estimate
  FROM hsum)"""


# ---------------------------------------------------------------------------
# KMV / theta distinct sketch (Bar-Yossef et al. 2002; Beyer et al. 2007)
# ---------------------------------------------------------------------------

KMV_K = 64                       # minimum values retained per group
KMV_SHRINK = 16                  # theta prefilter: keep h < 2^32/shrink
KMV_T = (1 << 32) // KMV_SHRINK


def kmv_group_sketch(df: DataFrame, group_col: str,
                     text_col: str = "text", k: int = KMV_K,
                     shrink: int = KMV_SHRINK) -> DataFrame:
    """(group, n_below, kth_h, kmv_estimate) per group: distinct-token
    cardinality from the k minimum hash values.

    Estimator (all integer, so the DuckDB oracle is exact):
      - ≥ k survivors below the theta threshold T = 2^32/shrink: the k
        smallest hashes overall all sit below T, so the classic KMV
        unbiased estimate applies — D̂ = (k-1)·2^32 // h_(k).
      - < k survivors: the prefilter is the binding bound and the
        sketch holds EVERY distinct hash below T — the theta estimate
        D̂ = n_below · shrink.

    Spark-first scale shape (the point of the sketch vs an exact
    countDistinct): the theta filter is a MAP-SIDE projection+compare
    that drops (shrink-1)/shrink of all tokens before any exchange;
    the distinct then shuffles only survivor (group, hash32) longs —
    ~D/shrink rows instead of the corpus' full token stream — and the
    final per-group rank/agg runs over ≤ a few thousand rows per
    group.  Sketches merge across shards by unioning survivor sets
    (min-k of a union = min-k of the merged min-k's), exactly how a
    100-TB run would tier it."""
    toks = (df.select(F.col(group_col).alias("grp"),
                      F.explode(F.split(F.trim(F.col(text_col)),
                                        r"\s+")).alias("tok"))
            .filter(F.col("tok") != ""))
    t = (1 << 32) // shrink
    surv = (toks.select("grp", hash32(F.col("tok")).alias("h"))
            .filter(F.col("h") < t)
            .distinct())
    from pyspark.sql import Window
    w = Window.partitionBy("grp").orderBy("h")
    ranked = surv.withColumn("_rn", F.row_number().over(w))
    return (ranked.groupBy("grp").agg(
                F.count("*").alias("n_below"),
                F.max(F.when(F.col("_rn") == k, F.col("h")))
                 .alias("kth_h"))
            .select("grp", "n_below",
                    F.coalesce("kth_h", F.lit(0)).cast("long").alias("kth_h"),
                    F.when(F.col("n_below") >= k,
                           F.expr(f"({k - 1} * 4294967296) div kth_h"))
                     .otherwise(F.col("n_below") * shrink)
                     .cast("long").alias("kmv_estimate")))


def kmv_group_sql(table: str, group_expr: str, text_expr: str,
                  k: int = KMV_K, shrink: int = KMV_SHRINK) -> str:
    """Oracle: identical survivor set, rank and integer estimator."""
    t = (1 << 32) // shrink
    h = hash32_sql("tok")
    return f"""
WITH _kt AS (
  SELECT {group_expr} AS grp, unnest(regexp_split_to_array(
           trim({text_expr}), '\\s+')) AS tok
  FROM {table}),
surv AS (
  SELECT DISTINCT grp, {h} AS h
  FROM _kt WHERE tok <> '' AND {h} < {t}),
ranked AS (
  SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) AS _rn
  FROM surv),
agg AS (
  SELECT grp, count(*)::BIGINT AS n_below,
         COALESCE(max(CASE WHEN _rn = {k} THEN h END), 0)::BIGINT AS kth_h
  FROM ranked GROUP BY grp)
SELECT grp, n_below, kth_h,
       (CASE WHEN n_below >= {k} THEN ({k - 1} * 4294967296) // kth_h
             ELSE n_below * {shrink} END)::BIGINT AS kmv_estimate
FROM agg
"""
