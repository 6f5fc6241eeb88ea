"""Pages table source/sink (FIXTURES.md F1).

Parquet layout with explicit url-hash bucketing (north rule: "explicit
partitioning").  Iceberg jars are unavailable offline (checked at
session start — no iceberg-* in the pyspark jar dir), so the documented
fallback applies: parquet + a manifest file, same physical layout
(``bucket=N/`` directories ≙ ``PARTITIONED BY (bucket(N, url))``).
The parse stage reads bucket-aligned — no shuffle before parse.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import grammar, schemas

N_BUCKETS = 32


def pages_to_spark(spark: SparkSession, pdf: pd.DataFrame) -> DataFrame:
    """Generator pandas frame → Spark DF with the PAGES schema (ground
    truth columns dropped — the engine never sees them)."""
    cols = [f.name for f in schemas.PAGES.fields]
    return spark.createDataFrame(pdf[cols], schema=schemas.PAGES)


def write_pages(df: DataFrame, path: str, n_buckets: int = N_BUCKETS):
    (df.withColumn("bucket", F.pmod(F.hash("url"), F.lit(n_buckets)))
       .repartition(n_buckets, "bucket")
       .write.mode("overwrite").partitionBy("bucket").parquet(path))


def read_pages(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def generate_and_write(spark: SparkSession, path: str, n_rows: int,
                       seed: int = grammar.SEED, n_buckets: int = N_BUCKETS):
    """Deterministic synthetic pages table at any scale, written in
    chunks so bench-scale generation never materializes one giant
    pandas frame."""
    first = True
    for chunk in grammar.generate_pages_arrow_batches(n_rows, seed=seed):
        df = pages_to_spark(spark, chunk) \
            .withColumn("bucket", F.pmod(F.hash("url"), F.lit(n_buckets))) \
            .repartition(n_buckets, "bucket")
        mode = "overwrite" if first else "append"
        df.write.mode(mode).partitionBy("bucket").parquet(path)
        first = False
