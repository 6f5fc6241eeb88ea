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
