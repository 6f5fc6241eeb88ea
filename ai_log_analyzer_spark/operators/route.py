"""Severity bucketing + fan-out routing (SURVEY.md O7/O17/O31).

Severity is a pure Catalyst ``when`` chain (whole-stage codegen, no
Python) kept in lockstep with ``scorer.severity`` — the oracle's numpy
rule.  Fan-out is ONE write partitioned by severity (single pass over
the data; per-severity directories are the per-sink tables), plus the
per-sink aggregate counts the north rule's acceptance check needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import scorer


def with_severity(scored: DataFrame) -> DataFrame:
    s, a = F.col("anomaly_score"), F.col("is_anomaly")
    sev = (
        F.when(a & (s >= scorer.T_HI), "crit")
        .when(a, "high")
        .when(s >= scorer.T_HI, "med")
        .when(s >= scorer.T_LO, "low")
        .otherwise("info")
    )
    return scored.withColumn("severity", sev)


def write_sinks(routed: DataFrame, base_path: str):
    """Fan-out: one partitioned write = N per-severity sinks, one pass."""
    (routed.write.mode("overwrite")
     .partitionBy("severity")
     .parquet(base_path))


def sink_counts(routed: DataFrame) -> DataFrame:
    """Per-sink aggregate counts (north-rule acceptance aggregate).

    n_urls = distinct source pages per sink.  When the scoring branch
    ran with carry=() (url pruned before the Arrow hop), the page
    identity key (host, seq_no) stands in for url — exactly equal by
    construction since url ↔ (host, seq_no) is 1:1 in the pages
    contract (asserted in tests/test_engine_parity.py)."""
    n_urls = (F.countDistinct("url") if "url" in routed.columns
              else F.countDistinct("host", "seq_no"))
    return (routed.groupBy("severity")
            .agg(F.count("*").alias("n_rows"),
                 n_urls.alias("n_urls"))
            .orderBy("severity"))
