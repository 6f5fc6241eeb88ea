"""Raw log-file source — the reference's actual input mode.

AI-Log-Analyzer ingests a plain text log file line by line in file
order (``/root/reference/ailoganalyzer/dataset/logFileDataset.py`` —
``LogFileDataset(log_file, ...)`` iterates ``open(log_file)``), so a
user switching to this engine needs "point it at .log files" to work,
not just the pages parquet table.

Re-expression: ``spark.read.text`` over the file(s)/glob, with a
DETERMINISTIC per-file 0-based line number as the series order key.
The DataFrame text source exposes no intra-file offset, so line
numbers come from ``RDD.zipWithIndex`` — Hadoop text splits enumerate
in (file, byte-offset) order and zipWithIndex is order-preserving, so
the global index is stable for a fixed file set regardless of
parallelism (pinned by test_logfile_source.py at several partition
counts); the per-file number is then (global index − file's minimum).
zipWithIndex costs one extra pass over the data — the same price the
reference pays by reading the file serially, and at cluster scale this
source is the ingest edge, not the steady-state path (events normally
arrive as a table or a stream).

The output conforms to the pages contract, so the whole fit → parse →
window → score → route pipeline runs unchanged on top:
  url      = file:///path#L<line_no>   (unique per line)
  warc_ts  = base_ts + line_no seconds (synthetic, deterministic)
  host     = log file stem             (the series key)
  seq_no   = per-file line number      (the series order)
  text     = the raw line
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_BASE_TS = 1704067200  # 2024-01-01T00:00:00Z, matches the synth corpus


def read_log_lines(spark: SparkSession, path: str) -> DataFrame:
    """(file, seq_no, text): raw lines with a deterministic per-file
    0-based line number."""
    schema = T.StructType([
        T.StructField("file", T.StringType(), False),
        T.StructField("idx", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
    ])
    lines = (spark.read.text(path)
             .select(F.input_file_name().alias("file"), F.col("value").alias("text")))
    indexed = (lines.rdd
               .zipWithIndex()
               .map(lambda t: (t[0]["file"], t[1], t[0]["text"])))
    df = spark.createDataFrame(indexed, schema)
    w_min = F.min("idx").over(Window.partitionBy("file"))
    return (df.withColumn("seq_no", (F.col("idx") - w_min).cast("long"))
            .select("file", "seq_no", "text"))


def pages_from_logfile(spark: SparkSession, path: str) -> DataFrame:
    """Log file(s) → pages-contract DataFrame (url, warc_ts, html, text,
    lang, host, seq_no) feeding the standard pipeline unchanged."""
    lines = read_log_lines(spark, path)
    stem = F.regexp_replace(
        F.element_at(F.split(F.col("file"), "/"), -1), r"\.[^.]*$", "")
    return lines.select(
        F.concat(F.col("file"), F.lit("#L"),
                 F.col("seq_no").cast("string")).alias("url"),
        F.timestamp_seconds(F.lit(_BASE_TS) + F.col("seq_no")).alias("warc_ts"),
        F.encode(F.col("text"), "UTF-8").alias("html"),
        F.col("text"),
        F.lit("en").alias("lang"),
        stem.alias("host"),
        F.col("seq_no"),
    )
