"""Raw log-file source — the reference's actual input mode.

AI-Log-Analyzer ingests a plain text log file line by line in file
order (``/root/reference/ailoganalyzer/dataset/logFileDataset.py`` —
``LogFileDataset(log_file, ...)`` iterates ``open(log_file)``), so a
user switching to this engine needs "point it at .log files" to work,
not just the pages parquet table.

Re-expression: one ``sc.textFile`` PER FILE + ``RDD.zipWithIndex``,
unioned.  Hadoop's FileInputFormat enumerates a single file's splits
in byte-offset order and zipWithIndex is order-preserving, so the
index IS the 0-based line number at any split count.  The DataFrame
text scan can NOT be used here: FileSourceScanExec bin-packs splits by
size, so a file read as several tiny splits lands in non-contiguous,
size-sorted partitions and any global-index scheme mis-numbers the
lines (caught by test_logfile_source.py, which really varies
maxPartitionBytes; the round-2 version of this source had exactly that
bug).  The driver-side loop is over FILES (the listing is distributed,
only names are collected) — fine at the ingest edge, where file counts
are thousands, not billions; steady-state events arrive as a table or
a stream.  zipWithIndex costs one extra pass per file — the price the
reference pays by reading the file serially.

The output conforms to the pages contract, so the whole fit → parse →
window → score → route pipeline runs unchanged on top:
  url      = file:///path#L<line_no>   (unique per line)
  warc_ts  = base_ts + line_no seconds (synthetic, deterministic)
  host     = log file stem             (the series key)
  seq_no   = per-file line number      (the series order)
  text     = the raw line
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_BASE_TS = 1704067200  # 2024-01-01T00:00:00Z, matches the synth corpus


def read_log_lines(spark: SparkSession, path: str,
                   min_partitions: int | None = None) -> DataFrame:
    """(file, seq_no, text): raw lines with a deterministic per-file
    0-based line number, stable at any scan parallelism
    (``min_partitions`` forces finer per-file splits; numbering must
    not change — pinned in test_logfile_source.py)."""
    schema = T.StructType([
        T.StructField("file", T.StringType(), False),
        T.StructField("seq_no", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
    ])
    # distributed listing; only the (small) file-name set is collected
    files = sorted(r.file for r in spark.read.text(path)
                   .select(F.input_file_name().alias("file"))
                   .distinct().collect())
    sc = spark.sparkContext
    rdds = [sc.textFile(f, min_partitions)
            .zipWithIndex()
            .map(lambda t, fname=f: (fname, t[1], t[0]))
            for f in files]
    if not rdds:
        return spark.createDataFrame([], schema)
    return spark.createDataFrame(sc.union(rdds), schema)


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
