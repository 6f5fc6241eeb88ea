"""Driver contract for the spark-graft builder (PySpark target).

``entry``: flagship log-pipeline DAG (fit → parse → window → score →
route) over a pages table derived from the sf0.001 ``documents``
parquet.  ``queries``/``oracle_sql``: the operator registry in
``ai_log_analyzer_spark.queries`` (one entry per implemented operator
family from SURVEY.md §2 + the training-data-pipeline extras), each
with an exact DuckDB oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _pages_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-Crawl-shaped pages table derived deterministically from
    the documents table (shared with the flagship_scored driver query)."""
    from ai_log_analyzer_spark.queries import pages_from_documents
    return pages_from_documents(spark, sf_dir)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: parse→enrich→score→route over sf0.001; returns the
    per-severity sink counts (the north rule's acceptance aggregate)."""
    from ai_log_analyzer_spark.operators import fit as fit_op
    from ai_log_analyzer_spark.operators import parse as parse_op
    from ai_log_analyzer_spark.operators import route as route_op
    from ai_log_analyzer_spark.operators import windows as win_op

    pages = _pages_from_documents(spark, "/root/testdata/sf0.001")
    catalog_rows = fit_op.fit_catalog(pages)
    # id-only parse: the scoring branch prunes extracted_text, so the
    # parse UDF skips extraction and ships 8 bytes/row (parse.py)
    parsed = parse_op.parse_template_ids(pages, catalog_rows)
    scored = win_op.window_score_grouped(parse_op.matched(parsed),
                                         num_classes=len(catalog_rows),
                                         carry=(), host_lookup=pages)
    routed = route_op.with_severity(scored)
    return route_op.sink_counts(routed)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from ai_log_analyzer_spark.queries import queries as _q
    return _q()


def oracle_sql() -> dict[str, str]:
    from ai_log_analyzer_spark.queries import oracle_sql as _o
    return _o()
