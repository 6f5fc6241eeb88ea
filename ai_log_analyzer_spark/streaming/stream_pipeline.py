"""Structured-Streaming variant of the parse → enrich → route DAG.

The reference is batch-only (reads a finite file; SURVEY.md §2.8), so
this is additive capability: the SAME frozen-catalog parse kernel and
severity routing applied to a file-source stream with event-time
tumbling-window counts and a watermark for late data.

Design: the catalog is frozen (fit runs as the batch job), so streaming
needs no stateful mining — ``mapInPandas`` works unchanged on a
streaming DataFrame.  Sinks partition by severity exactly like the
batch fan-out.  ``Trigger.AvailableNow`` gives deterministic, testable
runs; on a cluster the same code runs continuously.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import schemas
from ..operators import parse as parse_op
from ..operators import route as route_op


def read_pages_stream(spark: SparkSession, path: str,
                      max_files_per_trigger: int | None = None) -> DataFrame:
    reader = (spark.readStream.schema(schemas.PAGES)
              .option("recursiveFileLookup", "true"))
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(path)


def parse_stream(pages_stream: DataFrame, catalog_rows: pd.DataFrame) -> DataFrame:
    """Frozen-catalog parse on a stream — identical kernel to batch."""
    return parse_op.parse_pages(pages_stream, catalog_rows)


def windowed_template_counts(parsed_stream: DataFrame,
                             window: str = "5 minutes",
                             watermark: str = "10 minutes") -> DataFrame:
    """Event-time tumbling counts per template with late-data watermark
    (SURVEY.md O34 streaming form)."""
    return (parsed_stream
            .withWatermark("warc_ts", watermark)
            .groupBy(F.window("warc_ts", window).alias("win"), "template_id")
            .agg(F.count("*").alias("n"))
            .select(F.col("win.start").alias("window_start"),
                    F.col("win.end").alias("window_end"),
                    "template_id", "n"))


def windowed_event_counts_available_now(spark: SparkSession, events_path: str,
                                        window: str = "1 hour") -> DataFrame:
    """Run event-time tumbling-window counts over the events table AS A
    STREAM (file source, Trigger.AvailableNow, memory sink) and return
    the finished result — deterministic batch-equivalent semantics, used
    by the driver-contract query ``stream_window_counts``.

    Complete output mode so every window is emitted at end-of-stream
    (append mode would hold back windows the watermark hasn't passed,
    which for a finite corpus means the trailing windows never flush).
    No watermark here: events.ts is TIMESTAMP_NTZ, which Spark's
    watermark rejects, and complete mode needs none — the late-data
    watermark pattern lives in ``windowed_template_counts`` above."""
    import os
    import tempfile
    import uuid

    schema = spark.read.parquet(events_path).schema
    src = events_path
    if os.path.isfile(events_path):
        # the file stream source requires a DIRECTORY; stage a symlink
        src = tempfile.mkdtemp(prefix="stream_events_")
        os.symlink(os.path.abspath(events_path),
                   os.path.join(src, os.path.basename(events_path)))
    stream = spark.readStream.schema(schema).parquet(src)
    agg = (stream
           .groupBy(F.window("ts", window).alias("win"), "event_type")
           .agg(F.count("*").alias("n"))
           .select(F.col("win.start").alias("window_start"), "event_type", "n"))
    name = f"swc_{uuid.uuid4().hex[:12]}"
    q = (agg.writeStream.format("memory").queryName(name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(name)


def run_available_now(pages_path: str, catalog_rows: pd.DataFrame,
                      out_path: str, checkpoint: str,
                      spark: SparkSession) -> None:
    """Drain everything currently in ``pages_path`` through parse and a
    per-severity-partitioned sink, then stop (deterministic batch-like
    semantics via AvailableNow; restart-safe through the checkpoint)."""
    stream = read_pages_stream(spark, pages_path)
    parsed = parse_stream(stream, catalog_rows)
    # per-event severity proxy for the streaming path: dead-letter vs ok
    routed = parsed.withColumn(
        "severity", F.when(F.col("template_id").isNull(), "dead").otherwise("ok"))
    q = (routed.writeStream
         .format("parquet")
         .option("path", out_path)
         .option("checkpointLocation", checkpoint)
         .partitionBy("severity")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
