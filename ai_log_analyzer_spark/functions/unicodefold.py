"""Unicode NFC normalization — the one text op that genuinely needs
Python.

Web text arrives in mixed normalization forms (decomposed ``e`` +
U+0301 from mac filesystems and some CMSes, precomposed ``é`` from
everything else).  Every hash-keyed stage downstream — exact dedup,
fingerprints, MinHash shingles — treats the two encodings of the same
word as different bytes, so normalization must run BEFORE any content
hash or the dedup recall silently drops on exactly the documents that
mix sources.  (C4/CCNet normalize early for the same reason.)

Catalyst has no unicode-normalization expression, so this is the
documented slow path done right: a scalar ``pandas_udf`` (Arrow-batched
— one Python hop per record batch, never per row) wrapping
``unicodedata.normalize``, which implements the same Unicode standard
annex (UAX #15) as DuckDB's ``nfc_normalize`` — making the oracle a
true cross-engine check of the kernel rather than a shared-code echo.

Scale: stateless projection — no shuffle, no driver state; the Arrow
hop costs one serialize/deserialize of the text column per batch,
which is why the pipeline calls it once, before hashing, not per
operator.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType


def _nfc_kernel(s: pd.Series) -> pd.Series:
    import unicodedata
    return s.map(lambda x: None if x is None
                 else unicodedata.normalize("NFC", x))


# return type passed as a DataType (not a DDL string) so declaring the
# UDF needs no active SparkSession — import-safe for the oracle path
nfc_normalize = pandas_udf(_nfc_kernel, StringType())


def nfc_stats(df: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """(doc_id, changed, len_before, len_after, norm_hash) — per-doc
    NFC effect: whether normalization rewrote the text, the char-length
    delta (combining sequences compose, so length can shrink), and the
    portable md5-based 32-bit hash of the normalized form (the value a
    dedup stage would key on)."""
    from .hashing import hash32
    norm = nfc_normalize(F.col(text_col))
    return df.select(
        F.col(id_col).alias("doc_id"),
        (norm != F.col(text_col)).alias("changed"),
        F.length(text_col).cast("long").alias("len_before"),
        F.length(norm).cast("long").alias("len_after"),
        hash32(norm).alias("norm_hash"))


def nfc_stats_sql(text_table: str) -> str:
    """DuckDB projection over ``text_table`` (doc_id, text): the
    normalization itself is DuckDB's native ``nfc_normalize`` — an
    independent implementation of UAX #15, not shared code."""
    from .hashing import hash32_sql
    return f"""
nfc AS (
  SELECT doc_id,
         nfc_normalize(text) <> text AS changed,
         length(text)::BIGINT AS len_before,
         length(nfc_normalize(text))::BIGINT AS len_after,
         {hash32_sql('nfc_normalize(text)')} AS norm_hash
  FROM {text_table}
)"""
