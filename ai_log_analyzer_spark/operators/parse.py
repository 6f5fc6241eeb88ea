"""Spark parse stage: broadcast frozen catalog → vectorized batch match.

The north star's core re-expression: drain3's per-line ``match`` +
``extract_parameters`` (/root/reference/ailoganalyzer/dataset/
template_miner.py:59-66) becomes ONE scalar ``pandas_udf`` over Arrow
record batches, calling the same ``catalog.Matcher`` kernel the oracle
uses — no per-row Python UDF calls.

Scale design:
- ONLY the ``text`` column crosses the JVM↔Python Arrow boundary; url/
  timestamps/keys never leave the JVM (a struct-returning scalar UDF,
  not a full-frame mapInPandas — measured ~2x less Arrow traffic).
- the parse output carries no derivable columns: ``params`` is
  recoverable by splitting ``extracted_text`` on PARAM_SEP and
  ``mask_names`` lives in the broadcast catalog keyed by template_id.
- the catalog is broadcast (KBs); matching is map-side only — zero
  shuffle in this stage; callers' column pruning keeps the fat ``html``
  out of the scan.
- unmatched rows keep ``template_id = NULL`` and flow to the
  dead-letter sink instead of crashing (reference fix, SURVEY.md §7).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

PARSE_INPUT_COLS = ["url", "warc_ts", "lang", "host", "seq_no", "text"]

_RESULT = T.StructType([
    T.StructField("template_id", T.LongType(), True),
    T.StructField("extracted_text", T.StringType(), True),
])

# per-PYTHON-WORKER-PROCESS matcher cache: Matcher(from_rows(...)) is
# O(catalog cardinality) (~0.4 s at 5k templates) and the UDF closure
# re-runs per TASK — without this, a 10k-task stage pays it 10k times.
# Keyed by a driver-side token unique to each parse call; bounded LRU so
# long-lived workers serving many catalogs don't accumulate.  The cached
# matcher also carries the memoized masked-form cache across tasks.
_MATCHER_CACHE: dict[str, object] = {}
_MATCHER_CACHE_CAP = 4


def _cached_matcher(token: str, bc):
    from ..catalog import Matcher, from_rows
    m = _MATCHER_CACHE.get(token)
    if m is None:
        if len(_MATCHER_CACHE) >= _MATCHER_CACHE_CAP:
            _MATCHER_CACHE.pop(next(iter(_MATCHER_CACHE)))
        m = Matcher(from_rows(bc.value))
        _MATCHER_CACHE[token] = m
    return m


def parse_pages(pages: DataFrame, catalog_rows: pd.DataFrame) -> DataFrame:
    """pages (any superset of PARSE_INPUT_COLS) → PARSED rows
    (url, warc_ts, lang, host, seq_no, template_id, extracted_text)."""
    import uuid

    sc = pages.sparkSession.sparkContext
    bc = sc.broadcast(catalog_rows)
    token = uuid.uuid4().hex

    @pandas_udf(_RESULT)
    def _parse(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        matcher = _cached_matcher(token, bc)     # once per worker PROCESS
        for text in batches:
            # with_params=False: params/mask_names are derivable columns
            # (split extracted_text / catalog lookup) — skip the per-row
            # object churn in the hot path
            m = matcher.match_frame(text, with_params=False)
            yield pd.DataFrame({
                "template_id": m["template_id"].astype(object).where(
                    m["template_id"].notna(), None),
                "extracted_text": m["extracted_text"],
            })

    return (pages
            .select("url", "warc_ts", "lang", "host", "seq_no",
                    _parse(F.col("text")).alias("_p"))
            .select("url", "warc_ts", "lang", "host", "seq_no",
                    F.col("_p.template_id").alias("template_id"),
                    F.col("_p.extracted_text").alias("extracted_text")))


def parse_template_ids(pages: DataFrame, catalog_rows: pd.DataFrame) -> DataFrame:
    """Projection-pushdown parse for the windows→score branch: same
    decision rule as ``parse_pages`` (Matcher.match_ids — equality
    pinned by tests/test_engine_parity.py) but emits ONLY template_id.
    Parameter extraction never runs and no strings cross Arrow back to
    the JVM — 8 bytes/row instead of ~100 (round-1 verdict: reduce
    bytes/doc through the memory-bandwidth-bound stages).  Use when the
    consumer prunes extracted_text (scoring, counting, routing on
    severity); sinks that persist extracted text use ``parse_pages``."""
    import uuid

    sc = pages.sparkSession.sparkContext
    bc = sc.broadcast(catalog_rows)
    token = uuid.uuid4().hex

    @pandas_udf(T.LongType())
    def _match(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        matcher = _cached_matcher(token, bc)
        for text in batches:
            yield matcher.match_ids(text)

    return pages.select("url", "warc_ts", "lang", "host", "seq_no",
                        _match(F.col("text")).alias("template_id"))


def dead_letter(parsed: DataFrame) -> DataFrame:
    return parsed.filter(F.col("template_id").isNull())


def matched(parsed: DataFrame) -> DataFrame:
    return parsed.filter(F.col("template_id").isNotNull())


def params_from_extracted(extracted_text_col) -> F.Column:
    """Recover the params array from the canonical encoding (derivable
    column — never materialized in the pipeline)."""
    from .. import masking
    return F.split(extracted_text_col, masking.PARAM_SEP)
