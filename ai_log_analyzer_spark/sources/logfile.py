"""Raw log-file source — the reference's actual input mode.

AI-Log-Analyzer ingests a plain text log file line by line in file
order (``/root/reference/ailoganalyzer/dataset.py:126-131`` —
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
bug).  The driver-side loop is over FILES, enumerated names-only via
the Hadoop FileSystem listing — zero data bytes read (round-3 verdict
item 7: the old ``spark.read.text`` + ``input_file_name().distinct()``
listing scanned every byte of every file just to learn the names,
tripling ingest read cost) — fine at the ingest edge, where file
counts are thousands, not billions; steady-state events arrive as a
table or a stream.  zipWithIndex costs one extra pass per file — the
price the reference pays by reading the file serially.

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

# Hadoop glob metacharacters — file names are literal by the time they
# reach sc.textFile, so escape them (round-3 advice item 1: a name like
# app[1].log would be re-expanded as a glob and silently match nothing).
# Backslash FIRST, or the escapes themselves get re-escaped.
_GLOB_CHARS = "\\{}[]*?"


def _escape_glob(name: str) -> str:
    for ch in _GLOB_CHARS:
        name = name.replace(ch, "\\" + ch)
    return name


def _list_files(spark: SparkSession, path: str) -> list[str]:
    """Names-only enumeration via the Hadoop FileSystem API (globStatus
    + recursive listStatus) — reads ZERO file content bytes; returns
    sorted fully-qualified URIs.  Accepts a file, a directory, or a
    glob, like the old text-scan listing did."""
    sc = spark.sparkContext
    jvm = sc._jvm
    hconf = sc._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(hconf)
    stack = list(fs.globStatus(jpath) or [])
    names: list[str] = []
    while stack:
        st = stack.pop()
        if st.isDirectory():
            stack.extend(fs.listStatus(st.getPath()))
        elif not st.getPath().getName().startswith(("_", ".")):
            names.append(st.getPath().toString())
    return sorted(names)


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
    # names-only FS listing (no data scan); glob chars in real file
    # names are escaped so sc.textFile treats them literally
    files = _list_files(spark, path)
    sc = spark.sparkContext
    rdds = [sc.textFile(_escape_glob(f), min_partitions)
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
