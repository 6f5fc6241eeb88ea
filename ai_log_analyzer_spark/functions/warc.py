"""WARC record parsing: the Common-Crawl container format, relationally.

A crawl delivery is not one page per file — it is WARC: concatenated
records (``WARC/1.0`` version line, CRLF header block, blank line,
payload, blank-line terminator).  A pipeline over the input contract's
``html: binary`` column needs this stage the moment its upstream hands
it raw WARC segments instead of pre-exploded pages.  (Format is public:
ISO 28500 / the WARC 1.0 spec; no reference counterpart — the
reference reads newline-delimited log files, ``SURVEY.md`` O1.)

Spark-first shape: decode → ONE regex split on the version line →
``posexplode`` → per-record header regexes.  Pure projection + explode,
no shuffle, codegen end to end; the same Java ∩ RE2 patterns run in the
DuckDB oracle.  At real scale the upstream source would hand whole WARC
*files* via ``spark.read.format("binaryFile")`` (one record batch per
file, same per-row kernel, ``maxPartitionBytes``-sized splits); this
column form is that kernel without the file-source plumbing.

Frozen contract (documented, test-pinned): version line ``WARC/1.0``;
headers ``WARC-Type``, ``WARC-Target-URI``, ``WARC-Date``,
``Content-Length`` each on one CRLF line; payload runs from the first
CRLF-CRLF to the record's trailing CRLF-CRLF.  ``Content-Length`` is
octets; payloads here are ASCII by synthesis so char length == octet
length (both engines check it with plain ``length``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SPLIT = "WARC/1\\.0\r\n"
_TYPE = "WARC-Type: ([^\r\n]*)"
_URI = "WARC-Target-URI: ([^\r\n]*)"
_DATE = "WARC-Date: ([^\r\n]*)"
_CLEN = "Content-Length: ([0-9]+)"
_PAYLOAD = "(?s)\r\n\r\n(.*)$"


def parse_warc_records(df: DataFrame, warc_col: str = "warc",
                       id_col: str = "doc_id") -> DataFrame:
    """(doc_id, rec_idx, warc_type, target_uri, warc_date,
    content_length, payload, length_ok) — one row per record in each
    WARC blob.  ``length_ok`` cross-checks the declared Content-Length
    against the extracted payload (the standard WARC integrity check; a
    false row means a torn/truncated record that a real pipeline routes
    to a dead-letter sink instead of the corpus)."""
    s = F.decode(F.col(warc_col), "UTF-8")
    recs = F.filter(F.split(s, _SPLIT), lambda x: x != "")
    e = df.select(F.col(id_col).alias("doc_id"),
                  F.posexplode(recs).alias("pos", "rec"))
    rec = F.col("rec")
    payload = F.regexp_replace(
        F.regexp_extract(rec, _PAYLOAD, 1), "(\r\n)+$", "")
    clen = F.regexp_extract(rec, _CLEN, 1).cast("long")
    return e.select(
        "doc_id",
        F.col("pos").cast("long").alias("rec_idx"),
        F.regexp_extract(rec, _TYPE, 1).alias("warc_type"),
        F.regexp_extract(rec, _URI, 1).alias("target_uri"),
        F.regexp_extract(rec, _DATE, 1).alias("warc_date"),
        clen.alias("content_length"),
        payload.alias("payload"),
        (clen == F.length(payload)).alias("length_ok"))


def parse_warc_records_sql(warc_table: str) -> str:
    """DuckDB CTE chain over ``warc_table`` (doc_id, warc TEXT — the
    oracle synthesizes the blob as VARCHAR, matching Spark's decode);
    final relation is ``warc_records``."""
    return f"""
splits AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(warc, '{_SPLIT}'),
                     x -> x <> '') AS recs
  FROM {warc_table}
),
recrows AS (
  SELECT doc_id, (i - 1)::BIGINT AS rec_idx, recs[i] AS rec
  FROM splits, UNNEST(range(1, len(recs) + 1)) AS t(i)
),
warc_records AS (
  SELECT doc_id, rec_idx,
         regexp_extract(rec, '{_TYPE}', 1) AS warc_type,
         regexp_extract(rec, '{_URI}', 1) AS target_uri,
         regexp_extract(rec, '{_DATE}', 1) AS warc_date,
         regexp_extract(rec, '{_CLEN}', 1)::BIGINT AS content_length,
         regexp_replace(regexp_extract(rec, '{_PAYLOAD}', 1),
                        '(\r\n)+$', '') AS payload,
         (regexp_extract(rec, '{_CLEN}', 1)::BIGINT =
          length(regexp_replace(regexp_extract(rec, '{_PAYLOAD}', 1),
                                '(\r\n)+$', ''))) AS length_ok
  FROM recrows
)"""
