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
