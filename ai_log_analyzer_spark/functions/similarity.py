"""Similarity search over an embedding column (array<float>).

- ``cosine_topk``: brute-force cosine top-k — the exactness baseline.
  Query side is tiny and broadcast; the dot product is a Catalyst
  ``aggregate(zip_with(...))`` fold — JVM-side, no Python.
- ``srp_lsh_topk``: sign-random-projection LSH bucketed variant — the
  scale path.  Hyperplanes are DATA-DERIVED (the first ``n_planes``
  vectors), so the SQL oracle can reconstruct the identical buckets
  without shipping random floats into SQL literals.  Candidates =
  same-bucket rows only; at 100 TB the bucket join replaces the full
  cross product (cost ∝ bucket occupancy, tunable via n_planes).

All scores are rounded to 6 dp on BOTH engines before ranking so
float-order ties can't flip rankings between Spark and DuckDB; rank
tie-break is (score desc, vec_id asc) — fully deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    return _dot(ad, bd) / (_norm(ad) * _norm(bd))


def cosine_topk(emb: DataFrame, query_ids: list[int], k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(query_id, vec_id, cos) top-k neighbours per query (queries
    excluded from candidates)."""
    q = (emb.filter(F.col(id_col).isin(query_ids))
         .select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")))
    c = (emb.filter(~F.col(id_col).isin(query_ids))
         .select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cvec")))
    scored = (c.join(F.broadcast(q))
              .withColumn("cos", F.round(cosine(F.col("qvec"), F.col("cvec")), 6)))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select("query_id", "vec_id", "cos", "rnk"))


def srp_buckets(emb: DataFrame, n_planes: int = 4,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(vec_id, bucket) — sign bits against the first n_planes vectors."""
    planes = (emb.filter(F.col(id_col) < n_planes)
              .select(F.col(id_col).alias("plane_id"), F.col(vec_col).alias("pvec")))
    joined = (emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"))
              .join(F.broadcast(planes))
              .withColumn("bit", F.when(F.round(cosine(F.col("v"), F.col("pvec")), 9) >= 0,
                                        F.lit(1)).otherwise(F.lit(0))))
    return (joined.groupBy("vec_id")
            .agg(F.sum(F.col("bit") * F.pow(F.lit(2.0), F.col("plane_id")).cast("long"))
                 .cast("long").alias("bucket")))


def srp_lsh_topk(emb: DataFrame, query_ids: list[int], k: int = 5,
                 n_planes: int = 4, id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """Bucketed ANN: per query, rank only same-bucket candidates."""
    buckets = srp_buckets(emb, n_planes=n_planes, id_col=id_col, vec_col=vec_col)
    base = emb.join(buckets, emb[id_col] == buckets.vec_id).drop(buckets.vec_id)
    q = (base.filter(F.col(id_col).isin(query_ids))
         .select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"),
                 F.col("bucket").alias("qbucket")))
    c = (base.filter(~F.col(id_col).isin(query_ids))
         .select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cvec"),
                 F.col("bucket")))
    scored = (c.join(F.broadcast(q), F.col("bucket") == F.col("qbucket"))
              .withColumn("cos", F.round(cosine(F.col("qvec"), F.col("cvec")), 6)))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select("query_id", "vec_id", "cos", "rnk"))
