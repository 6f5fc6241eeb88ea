"""PMI bigram collocation mining — phrase discovery over a corpus.

Tokenizer and vocabulary construction for LLM training data start from
collocation statistics: adjacent word pairs whose joint frequency far
exceeds the independence expectation ("new york", "machine learning")
are merge/phrase candidates, while high-frequency incidental pairs are
not.  The classic score is pointwise mutual information,
PMI = log P(x,y)/(P(x)P(y)); this module emits the EXACT-INTEGER
ratio in parts-per-million instead of the log —
``pmi_ppm = n_xy · N · 10⁶ div (n_x · n_y)`` — so the DuckDB oracle
can never diverge on float rounding (10⁶ = independence; larger =
positively associated; the log is monotone in it, so ranking is
preserved).

Spark-first shape, zero Python:
- bigrams per doc via ``zip_with(slice(toks,1,n-1), slice(toks,2,n-1))``
  — a per-row array projection, NO self-join and NO shuffle to form
  pairs;
- one groupBy(w1,w2) with map-side partial aggregation (stop-word
  pairs are the hot keys — exactly AQE's skew-split case);
- unigram counts are vocabulary-sized → broadcast joined onto the
  bigram table twice (never a shuffle of the pair table on a word);
- the corpus total N rides a broadcast 1-row crossJoin.

Overflow bound: the numerator ``n_xy·N·10⁶`` is computed in
DECIMAL(38,0) (Spark) / HUGEINT (DuckDB); at N = 10¹³ tokens it peaks
at ~10³² ≪ 10³⁸.  The emitted ppm fits a long whenever
``N·10⁶/min_count < 2⁶³`` — at min_count ≥ 5 that allows N up to
~4.6·10¹³ tokens (≈ a 100-TB text corpus); the docstringed escape is
keeping the DECIMAL.

No counterpart in the reference (log pipeline); task-spec extra for
the web-curation path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import WS


def _tokens(text_col: str):
    t = F.trim(F.lower(F.col(text_col)))
    return F.when(t == "", F.array().cast("array<string>")) \
        .otherwise(F.split(t, WS))


def pmi_collocations(df: DataFrame, text_col: str = "text",
                     min_count: int = 5) -> DataFrame:
    """(w1, w2, n_xy, n_x, n_y, pmi_ppm) for every adjacent lowercased
    word pair seen ≥ ``min_count`` times.  ``pmi_ppm`` is the exact
    integer ``n_xy·N·10⁶ div (n_x·n_y)`` with N the corpus token
    count — 10⁶ = independence."""
    toks = _tokens(text_col)
    n = F.size(toks)
    pairs = F.zip_with(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")))
    big = (df.select(F.explode(pairs).alias("p"))
           .select("p.w1", "p.w2")
           .groupBy("w1", "w2").agg(F.count("*").alias("n_xy"))
           .filter(F.col("n_xy") >= min_count))
    uni = (df.select(F.explode(toks).alias("w"))
           .groupBy("w").agg(F.count("*").alias("n_w")))
    total = uni.agg(F.sum("n_w").cast("decimal(38,0)").alias("n_total"))
    u1 = uni.select(F.col("w").alias("w1"), F.col("n_w").alias("n_x"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("n_w").alias("n_y"))
    num = (F.col("n_xy").cast("decimal(38,0)") * F.col("n_total")
           * F.lit(1000000).cast("decimal(38,0)"))
    den = (F.col("n_x").cast("decimal(38,0)")
           * F.col("n_y").cast("decimal(38,0)"))
    return (big.join(F.broadcast(u1), "w1")
            .join(F.broadcast(u2), "w2")
            .crossJoin(F.broadcast(total))
            .select("w1", "w2",
                    F.col("n_xy").cast("long").alias("n_xy"),
                    F.col("n_x").cast("long").alias("n_x"),
                    F.col("n_y").cast("long").alias("n_y"),
                    F.expr("CAST(" + _DIV + " AS LONG)").alias("pmi_ppm")))


# exact integer division of the decimal product — `div` on decimals is
# exact in both engines (no float path anywhere)
_DIV = ("(CAST(n_xy AS DECIMAL(38,0)) * n_total * 1000000) div "
        "(CAST(n_x AS DECIMAL(38,0)) * CAST(n_y AS DECIMAL(38,0)))")


def pmi_collocations_sql(text_table: str, min_count: int = 5) -> str:
    """DuckDB CTE chain over ``text_table`` (text); yields ``pmi``."""
    return f"""
ctok AS (
  SELECT CASE WHEN trim(text) = '' THEN []::VARCHAR[]
              ELSE regexp_split_to_array(lower(trim(text)), '\\s+') END AS ts
  FROM {text_table}
),
cbig AS (
  SELECT ts[i] AS w1, ts[i + 1] AS w2, count(*)::BIGINT AS n_xy
  FROM ctok, UNNEST(range(1, len(ts))) AS t(i)
  GROUP BY 1, 2 HAVING count(*) >= {min_count}
),
cuni AS (
  SELECT w, count(*)::BIGINT AS n_w
  FROM (SELECT unnest(ts) AS w FROM ctok) GROUP BY w
),
ctot AS (SELECT sum(n_w)::HUGEINT AS n_total FROM cuni),
pmi AS (
  SELECT b.w1, b.w2, b.n_xy, u1.n_w AS n_x, u2.n_w AS n_y,
         ((b.n_xy::HUGEINT * t.n_total * 1000000) //
          (u1.n_w::HUGEINT * u2.n_w::HUGEINT))::BIGINT AS pmi_ppm
  FROM cbig b
  JOIN cuni u1 ON b.w1 = u1.w
  JOIN cuni u2 ON b.w2 = u2.w
  CROSS JOIN ctot t
)"""
