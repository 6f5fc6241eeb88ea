"""Sequence chunking / packing manifests for LLM pretraining pipelines.

Two operators over the ``documents`` table:

- ``chunk_spans``: split each document's whitespace-token sequence into
  fixed-size windows with overlap (the per-document chunking used for
  context-window-bounded training and embedding jobs).  Stateless
  per-row explode — pure Catalyst, no shuffle, scales trivially.

- ``pack_manifest``: the document-concatenation packing manifest — lay
  every document end-to-end in ``doc_id`` order and cut the resulting
  global token stream every ``capacity`` tokens (how pretraining
  sequences are actually packed: documents concatenated, boundaries
  ignored).  Each doc gets its global [start_off, end_off) token span
  plus the first/last training-sequence index it lands in.

  The global running offset is a distributed prefix sum, NOT a single
  global window (``Window.orderBy`` with no partition key funnels the
  whole table through ONE task — the classic scale-killer):

    1. one cheap agg for (min, max) doc_id → fixed integer bucket
       boundaries (deterministic — no RangePartitioner sampling, whose
       boundaries can drift between the jobs that must agree on them);
    2. per-bucket token totals (tiny: n_buckets rows) → cumulative
       bucket base offsets on the driver → broadcast-joined back;
    3. the running sum WITHIN each bucket is a windowed sum partitioned
       by bucket — every bucket computes in parallel.

  At 100 TB: two scans (totals + final), one hash shuffle each keyed by
  the bucket column, a window sort bounded by bucket size, and an
  O(n_buckets) driver step.  The DuckDB oracle is the plain global
  window (``SUM ... OVER (ORDER BY doc_id)``) — exact integer parity.

No counterpart in the reference (its pipeline stops at log parsing);
this is one of the task-spec training-data extras.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import token_count, token_count_sql

DEFAULT_CHUNK = 64
DEFAULT_OVERLAP = 16
DEFAULT_CAPACITY = 256


def n_chunks(n_tokens: Column, chunk: int, overlap: int) -> Column:
    """ceil((n - chunk) / stride) + 1 for n > chunk, else 1 (n > 0)."""
    stride = chunk - overlap
    extra = n_tokens - F.lit(chunk)
    return F.when(extra <= 0, F.lit(1)).otherwise(
        F.lit(1) + F.floor((extra + F.lit(stride - 1)) / F.lit(stride))
    ).cast("long")


def chunk_spans(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id",
                chunk: int = DEFAULT_CHUNK,
                overlap: int = DEFAULT_OVERLAP) -> DataFrame:
    """One row per (doc, chunk window): token [start, end) within the
    doc.  Empty docs emit no chunks."""
    if not 0 <= overlap < chunk:
        raise ValueError("need 0 <= overlap < chunk")
    stride = chunk - overlap
    toks = token_count(F.col(text_col))
    df = (docs.select(F.col(id_col).alias("doc_id"),
                      toks.alias("n_tokens"))
          .where(F.col("n_tokens") > 0))
    idx = F.explode(F.sequence(
        F.lit(0).cast("long"),
        n_chunks(F.col("n_tokens"), chunk, overlap) - 1)).alias("chunk_idx")
    start = F.col("chunk_idx") * stride
    return (df.select("doc_id", "n_tokens", idx)
            .select("doc_id", "n_tokens", "chunk_idx",
                    start.alias("tok_start"),
                    F.least(start + chunk,
                            F.col("n_tokens")).alias("tok_end")))


def chunk_spans_sql(table: str = "documents", text_expr: str = "text",
                    id_expr: str = "doc_id",
                    chunk: int = DEFAULT_CHUNK,
                    overlap: int = DEFAULT_OVERLAP) -> str:
    stride = chunk - overlap
    nt = token_count_sql(text_expr)
    return f"""
WITH toks AS (
  SELECT {id_expr} AS doc_id, {nt} AS n_tokens FROM {table}
), sized AS (
  SELECT doc_id, n_tokens,
         CASE WHEN n_tokens <= {chunk} THEN 1
              ELSE 1 + (n_tokens - {chunk} + {stride - 1}) // {stride}
         END AS nc
  FROM toks WHERE n_tokens > 0
)
SELECT doc_id, n_tokens, chunk_idx,
       chunk_idx * {stride} AS tok_start,
       least(chunk_idx * {stride} + {chunk}, n_tokens) AS tok_end
FROM sized, unnest(generate_series(0, nc - 1)) AS u(chunk_idx)
"""


def pack_manifest(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id",
                  capacity: int = DEFAULT_CAPACITY,
                  n_buckets: int | None = None) -> DataFrame:
    """Global concatenation-packing manifest (see module docstring).

    Output: doc_id, n_tokens, start_off, end_off (global token offsets
    in doc_id order), first_seq, last_seq (training-sequence indices of
    the doc's first/last token at ``capacity`` tokens per sequence).
    Empty docs are dropped (they occupy no tokens)."""
    spark = docs.sparkSession
    if n_buckets is None:
        n_buckets = spark.sparkContext.defaultParallelism * 4
    # fail fast on non-integral ids (round-4 advice): a silent cast to
    # long turns string ids into NULLs that survive the n_tokens filter,
    # land in a None bucket key, and crash sorted(totals) obscurely
    id_type = dict(docs.dtypes)[id_col]
    if id_type not in ("tinyint", "smallint", "int", "bigint"):
        raise TypeError(
            f"pack_manifest requires an integral {id_col!r} column for "
            f"its range-bucketed prefix sum; got {id_type!r} — map ids "
            f"to integers first (e.g. xxhash64 or a dictionary join)")
    toks = (docs.select(F.col(id_col).cast("long").alias("doc_id"),
                        token_count(F.col(text_col)).alias("n_tokens"))
            .where(F.col("n_tokens") > 0))

    bounds = toks.agg(F.min("doc_id").alias("lo"),
                      F.max("doc_id").alias("hi")).collect()[0]
    if bounds.lo is None:
        return toks.select(
            "doc_id", "n_tokens",
            F.lit(0).cast("long").alias("start_off"),
            F.lit(0).cast("long").alias("end_off"),
            F.lit(0).cast("long").alias("first_seq"),
            F.lit(0).cast("long").alias("last_seq"))
    span = max(int(bounds.hi) - int(bounds.lo) + 1, 1)
    width = max(-(-span // n_buckets), 1)          # ceil
    bucket = ((F.col("doc_id") - F.lit(int(bounds.lo))) / F.lit(width)) \
        .cast("long")
    toks = toks.withColumn("_b", bucket)

    # tiny: n_buckets rows to the driver, cumulative base per bucket
    totals = {r._b: r.t for r in
              toks.groupBy("_b").agg(F.sum("n_tokens").alias("t")).collect()}
    base, acc = {}, 0
    for b in sorted(totals):
        base[b] = acc
        acc += int(totals[b])
    base_df = spark.createDataFrame(
        [(int(b), int(o)) for b, o in base.items()], "_b long, _base long")

    w = (Window.partitionBy("_b").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    local_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    start = (F.col("_base") + local_before).alias("start_off")
    out = (toks.join(F.broadcast(base_df), "_b")
           .select("doc_id", "n_tokens", start)
           .withColumn("end_off", F.col("start_off") + F.col("n_tokens")))
    # `div` = exact integral division (global offsets can exceed the
    # 2^53 range where double `/` + cast would round)
    return (out.select(
        "doc_id", "n_tokens", "start_off", "end_off",
        F.expr(f"start_off div {capacity}").alias("first_seq"),
        F.expr(f"(end_off - 1) div {capacity}").alias("last_seq")))


def pack_manifest_sql(table: str = "documents", text_expr: str = "text",
                      id_expr: str = "doc_id",
                      capacity: int = DEFAULT_CAPACITY) -> str:
    nt = token_count_sql(text_expr)
    return f"""
WITH toks AS (
  SELECT {id_expr}::BIGINT AS doc_id, {nt}::BIGINT AS n_tokens FROM {table}
), offs AS (
  SELECT doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
           AS start_off
  FROM toks WHERE n_tokens > 0
)
SELECT doc_id, n_tokens, start_off, start_off + n_tokens AS end_off,
       start_off // {capacity} AS first_seq,
       (start_off + n_tokens - 1) // {capacity} AS last_seq
FROM offs
"""


def pack_pairs(docs: DataFrame, text_col: str = "text",
               id_col: str = "doc_id",
               capacity: int = DEFAULT_CAPACITY) -> DataFrame:
    """Boundary-respecting 2-per-bin packing manifest — the padded-
    sequence counterpart of ``pack_manifest`` (there, documents
    concatenate across boundaries; here no document crosses one, the
    regime of SFT / packed-attention training where cross-doc
    attention is masked and pad tokens are pure waste; motivation:
    Krell et al., "Efficient Sequence Packing without Cross-
    contamination", arXiv 2107.02027).

    Deterministic folded pairing: rank docs by (clamped length desc,
    doc_id); the r-th longest is paired with the r-th shortest
    (partner rank N+1−r).  A pair that fits in ``capacity`` shares a
    bin; one that doesn't splits into two singletons (and the odd
    middle doc is a singleton).  ≤2 docs per bin is the sweet spot of
    the packing literature — on real web length distributions it
    removes most one-doc-per-bin padding — and unlike first-fit
    chains it is ORDER-FREE: pure rank arithmetic, so Spark and the
    SQL oracle reproduce identical bins with no sequential fold.

    Scale: the desc rank is NOT a global window — lengths clamp to
    [1, capacity], so the length histogram (≤ capacity rows) comes
    back to the driver, higher-length cumulative counts broadcast
    back as the per-length rank base, and row_number runs within each
    length class only.  Pair assembly is one uniform groupBy(pair_id)
    over exactly-≤2-row groups.  Docs longer than ``capacity`` clamp
    and flag ``truncated`` (they'd be chunked upstream via
    ``chunk_spans``).

    Output: (doc_id, n_tokens, n_eff, truncated, bin_id, n_in_bin,
    bin_fill, bin_waste); bin ids are 2·pair for the pair-or-first
    bin and 2·pair+1 for a split's smaller half."""
    sized = (docs.select(F.col(id_col).cast("long").alias("doc_id"),
                         token_count(F.col(text_col)).alias("n_tokens"))
             .where(F.col("n_tokens") > 0)
             .select("doc_id", "n_tokens",
                     F.least(F.col("n_tokens"), F.lit(capacity))
                     .cast("long").alias("n_eff"),
                     (F.col("n_tokens") > capacity).alias("truncated")))
    # per-length histogram → driver cumulative base in desc order
    hist = {int(r.n_eff): int(r.c) for r in
            sized.groupBy("n_eff").agg(F.count("*").alias("c")).collect()}
    if not hist:
        return sized.select(
            "doc_id", "n_tokens", "n_eff", "truncated",
            F.lit(0).cast("long").alias("bin_id"),
            F.lit(0).cast("long").alias("n_in_bin"),
            F.lit(0).cast("long").alias("bin_fill"),
            F.lit(0).cast("long").alias("bin_waste"))
    n_total, base, acc = sum(hist.values()), {}, 0
    for length in sorted(hist, reverse=True):
        base[length] = acc
        acc += hist[length]
    spark = docs.sparkSession
    base_df = spark.createDataFrame(
        [(int(l), int(o)) for l, o in base.items()], "n_eff long, _base long")
    rn = F.row_number().over(
        Window.partitionBy("n_eff").orderBy("doc_id"))
    ranked = (sized.join(F.broadcast(base_df), "n_eff")
              .withColumn("_r", (F.col("_base") + rn).cast("long")))
    pair = F.least(F.col("_r"), F.lit(n_total + 1) - F.col("_r"))
    members = (ranked.withColumn("_p", pair)
               .groupBy("_p")
               .agg(F.sum("n_eff").alias("_fill"),
                    F.count("*").alias("_n"),
                    F.min_by(F.struct("doc_id", "n_tokens", "n_eff",
                                      "truncated"), "_r").alias("_big"),
                    F.max_by(F.struct("doc_id", "n_tokens", "n_eff",
                                      "truncated"), "_r").alias("_small")))
    fits = (F.col("_n") == 1) | (F.col("_fill") <= capacity)
    # explode the ≤2 members back out with their bin assignment
    big = F.struct(
        F.col("_big.*"),
        (F.col("_p") * 2).alias("bin_id"),
        F.when(fits, F.col("_n")).otherwise(F.lit(1)).cast("long")
        .alias("n_in_bin"),
        F.when(fits, F.col("_fill")).otherwise(F.col("_big.n_eff"))
        .cast("long").alias("bin_fill"))
    small = F.struct(
        F.col("_small.*"),
        F.when(fits, F.col("_p") * 2).otherwise(F.col("_p") * 2 + 1)
        .alias("bin_id"),
        F.when(fits, F.col("_n")).otherwise(F.lit(1)).cast("long")
        .alias("n_in_bin"),
        F.when(fits, F.col("_fill")).otherwise(F.col("_small.n_eff"))
        .cast("long").alias("bin_fill"))
    rows = F.when(F.col("_n") == 1, F.array(big)) \
        .otherwise(F.array(big, small))
    return (members.select(F.explode(rows).alias("m"))
            .select("m.doc_id", "m.n_tokens", "m.n_eff", "m.truncated",
                    "m.bin_id", "m.n_in_bin", "m.bin_fill")
            .withColumn("bin_waste",
                        (F.lit(capacity) - F.col("bin_fill"))
                        .cast("long")))


def pack_pairs_sql(table: str = "documents", text_expr: str = "text",
                   id_expr: str = "doc_id",
                   capacity: int = DEFAULT_CAPACITY) -> str:
    """Oracle: identical folded-pairing rule with a plain global
    row_number (fine at oracle scale)."""
    nt = token_count_sql(text_expr)
    return f"""
WITH sized AS (
  SELECT {id_expr}::BIGINT AS doc_id, {nt}::BIGINT AS n_tokens,
         least({nt}, {capacity})::BIGINT AS n_eff,
         {nt} > {capacity} AS truncated
  FROM {table} WHERE {nt} > 0
), ranked AS (
  SELECT *, row_number() OVER (ORDER BY n_eff DESC, doc_id) AS r,
         count(*) OVER () AS n_total
  FROM sized
), paired AS (
  SELECT *, least(r, n_total + 1 - r) AS p FROM ranked
), bins AS (
  SELECT p, sum(n_eff) AS fill, count(*) AS n,
         (count(*) = 1 OR sum(n_eff) <= {capacity}) AS fits
  FROM paired GROUP BY p
)
SELECT d.doc_id, d.n_tokens, d.n_eff, d.truncated,
       CASE WHEN b.fits OR d.r = d.p THEN d.p * 2
            ELSE d.p * 2 + 1 END AS bin_id,
       CASE WHEN b.fits THEN b.n ELSE 1 END::BIGINT AS n_in_bin,
       CASE WHEN b.fits THEN b.fill ELSE d.n_eff END::BIGINT AS bin_fill,
       ({capacity} - CASE WHEN b.fits THEN b.fill ELSE d.n_eff END)::BIGINT
         AS bin_waste
FROM paired d JOIN bins b USING (p)
"""
