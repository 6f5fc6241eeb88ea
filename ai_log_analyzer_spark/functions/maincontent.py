"""Main-content block selection — boilerpipe-style text-density
extraction, relationally.

``html_text`` (functions/text.py) extracts ALL visible text; real web
curation wants the MAIN content — the article body without nav bars,
footers, and link farms.  The public boilerpipe/trafilatura insight:
split the page into blocks at block-level tags, score each block by
text mass penalized by link density, keep the winner.  This module is
that algorithm as pure Catalyst:

- ONE regex split at block-level boundaries (``p/div/li/h1-6/br/
  section/article/td/tr``) after comments and script/style bodies are
  removed — so a nav ``<div>`` and the article ``<div>`` become
  separate rows;
- per-block: visible text (tag strip + entity decode + ws collapse,
  the SAME frozen kernel as ``html_text``), text length, anchor-tag
  count; score = ``text_len − LINK_PENALTY·n_anchors`` (boilerpipe's
  density heuristic with the division replaced by an exact-integer
  penalty so the oracle can never diverge on rounding);
- per-doc argmax via partial-aggregable ``max_by`` over
  ``struct(score, −block_idx)`` (earliest block wins ties), plus
  ``main_ppm`` = main text mass / total text mass in exact ppm — the
  boilerplate fraction a curation dashboard tracks per domain.

Scale: projection + posexplode + ONE groupBy(doc_id) whose partials
collapse map-side (each task holds one running max + two sums per
doc) — block rows never survive the exchange.  Zero Python.

No counterpart in the reference (log pipeline); task-spec extra for
the web-curation path.  Frozen contract: the block-boundary tag list
above; LINK_PENALTY = 40 chars per anchor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import (COMMENT_RE, HTML_ENTITIES, SCRIPT_RE, STYLE_RE,
                   TAG_RE, WS)

BLOCK_SPLIT_RE = r"(?i)</?(?:p|div|li|h[1-6]|br|section|article|td|tr)[^>]*>"
ANCHOR_RE = r"(?i)<a[\s>]"
LINK_PENALTY = 40


def _block_text(raw):
    s = F.regexp_replace(raw, TAG_RE, " ")
    for pat, repl in HTML_ENTITIES:
        s = F.regexp_replace(s, pat, repl)
    return F.trim(F.regexp_replace(s, WS, " "))


def main_content(df: DataFrame, html_col: str = "html",
                 id_col: str = "doc_id") -> DataFrame:
    """(doc_id, main_text, main_len, n_blocks, total_len, main_ppm) —
    per-page main-content block by text-density score."""
    s = F.decode(F.col(html_col), "UTF-8")
    s = F.regexp_replace(s, COMMENT_RE, " ")
    s = F.regexp_replace(s, SCRIPT_RE, " ")
    s = F.regexp_replace(s, STYLE_RE, " ")
    e = df.select(F.col(id_col).alias("doc_id"),
                  F.posexplode(F.split(s, BLOCK_SPLIT_RE))
                  .alias("block_idx", "raw"))
    text = _block_text(F.col("raw"))
    n_anchor = F.size(F.regexp_extract_all("raw", F.lit(ANCHOR_RE), 0))
    b = (e.select("doc_id",
                  F.col("block_idx").cast("long").alias("block_idx"),
                  text.alias("text"),
                  F.length(text).cast("long").alias("text_len"),
                  n_anchor.cast("long").alias("n_anchors"))
         .filter(F.col("text_len") > 0))
    score = (F.col("text_len") - LINK_PENALTY * F.col("n_anchors"))
    ordkey = F.struct(score.alias("s"), (-F.col("block_idx")).alias("i"))
    agg = b.groupBy("doc_id").agg(
        F.max_by("text", ordkey).alias("main_text"),
        F.max_by("text_len", ordkey).alias("main_len"),
        F.count("*").alias("n_blocks"),
        F.sum("text_len").alias("total_len"))
    return agg.select(
        "doc_id", "main_text", "main_len", "n_blocks", "total_len",
        F.expr("CAST((main_len * 1000000L) div total_len AS LONG)")
        .alias("main_ppm"))


def main_content_sql(html_table: str) -> str:
    """DuckDB CTE chain over ``html_table`` (doc_id, html TEXT);
    yields ``main_blocks``."""
    clean = (f"regexp_replace(regexp_replace(regexp_replace(html, "
             f"'{COMMENT_RE}', ' ', 'g'), '{SCRIPT_RE}', ' ', 'g'), "
             f"'{STYLE_RE}', ' ', 'g')")
    t = "regexp_replace(bs[i], '" + TAG_RE + "', ' ', 'g')"
    for pat, repl in HTML_ENTITIES:
        lit = repl.replace("'", "''")
        t = f"regexp_replace({t}, '{pat}', '{lit}', 'g')"
    t = f"trim(regexp_replace({t}, '\\s+', ' ', 'g'))"
    return f"""
mblocks AS (
  SELECT doc_id, (i - 1)::BIGINT AS block_idx,
         {t} AS text,
         len(regexp_extract_all(bs[i], '{ANCHOR_RE}'))::BIGINT AS n_anchors
  FROM (SELECT doc_id,
               regexp_split_to_array({clean}, '{BLOCK_SPLIT_RE}') AS bs
        FROM {html_table}),
       UNNEST(range(1, len(bs) + 1)) AS t(i)
),
mscored AS (
  SELECT doc_id, block_idx, text, length(text)::BIGINT AS text_len,
         (length(text) - {LINK_PENALTY} * n_anchors)::BIGINT AS score
  FROM mblocks WHERE length(text) > 0
),
mranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY score DESC, block_idx) AS rn,
         count(*) OVER (PARTITION BY doc_id) AS n_blocks,
         sum(text_len) OVER (PARTITION BY doc_id) AS total_len
  FROM mscored
),
main_blocks AS (
  SELECT doc_id, text AS main_text, text_len AS main_len,
         n_blocks::BIGINT AS n_blocks, total_len::BIGINT AS total_len,
         ((text_len * 1000000) // total_len)::BIGINT AS main_ppm
  FROM mranked WHERE rn = 1
)"""
