"""Spark parse stage: broadcast frozen catalog → vectorized batch match.

The north star's core re-expression: drain3's per-line ``match`` +
``extract_parameters`` (/root/reference/ailoganalyzer/dataset/
template_miner.py:59-66) becomes ONE ``mapInPandas`` over Arrow record
batches, calling the same ``catalog.Matcher`` kernel the oracle uses —
pandas ``str.match`` / ``str.extract`` grouped by token count, no
per-row Python UDF calls.

Scale notes:
- the catalog is broadcast (KBs); matching is map-side only — zero
  shuffle in this stage.
- column pruning: callers select only what parse needs; the fat
  ``html`` binary column never reaches the Python workers.
- unmatched rows keep ``template_id = NULL`` and flow to the
  dead-letter sink instead of crashing (reference fix, SURVEY.md §7).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import schemas
from ..catalog import Matcher, from_rows

PARSE_INPUT_COLS = ["url", "warc_ts", "lang", "host", "seq_no", "text"]


def parse_pages(pages: DataFrame, catalog_rows: pd.DataFrame) -> DataFrame:
    """pages (any superset of PARSE_INPUT_COLS) → PARSED rows."""
    sc = pages.sparkSession.sparkContext
    bc = sc.broadcast(catalog_rows)

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        matcher = Matcher(from_rows(bc.value))  # once per partition
        for pdf in batches:
            m = matcher.match_frame(pdf["text"])
            out = pdf[["url", "warc_ts", "lang", "host", "seq_no"]].copy()
            out["template_id"] = m["template_id"].astype(object).where(
                m["template_id"].notna(), None)
            out["params"] = m["params"]
            out["mask_names"] = m["mask_names"]
            out["extracted_text"] = m["extracted_text"]
            yield out

    return pages.select(*PARSE_INPUT_COLS).mapInPandas(_parse, schema=schemas.PARSED)


def dead_letter(parsed: DataFrame) -> DataFrame:
    return parsed.filter(F.col("template_id").isNull())


def matched(parsed: DataFrame) -> DataFrame:
    return parsed.filter(F.col("template_id").isNotNull())
