"""Broadcast enrichment joins (SURVEY.md O23; north rule "lookup enrich").

All three dimensions are tiny and explicitly broadcast — Catalyst turns
these into BroadcastHashJoins with zero shuffle of the fact side.  The
tld is derived with a Catalyst ``regexp_extract`` (whole-stage codegen,
no Python).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import dims


def enrich(parsed: DataFrame, catalog_rows: pd.DataFrame) -> DataFrame:
    spark = parsed.sparkSession
    lang_dim = spark.createDataFrame(dims.LANG_DIM)
    tld_dim = spark.createDataFrame(dims.TLD_DIM)
    freq_dim = spark.createDataFrame(dims.tmpl_freq_dim(catalog_rows))
    return (
        parsed
        .withColumn("tld", F.regexp_extract("url", dims.TLD_REGEX, 1))
        .join(F.broadcast(lang_dim), "lang", "left")
        .join(F.broadcast(tld_dim), "tld", "left")
        .join(F.broadcast(freq_dim), "template_id", "left")
    )
