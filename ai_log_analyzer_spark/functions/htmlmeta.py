"""HTML document-metadata extraction: title / description / lang /
charset / og:title, plus declaration-consistency flags.

Web curation keys on page metadata before it ever reads the body:
titles and meta descriptions feed quality filters and search-style
dedup keys, ``<html lang>`` is the publisher's language claim that a
language-ID stage must be checked AGAINST (mismatch = strong
misdeclaration signal, a known junk indicator), and the declared
charset routes re-decoding.  All extractions are single anchored-group
regexes in the Java ∩ RE2 subset over the decoded html — pure codegen
projection, zero shuffle, zero Python — and each pattern is shared
verbatim with the DuckDB oracle.

FROZEN attribute-order contract (same as ``urls.page_policy``):
``name``/``property``/``http-equiv`` precede ``content`` on <meta>.
The dominant emitted order; the mirrored-order alternation doubles
pattern cost at identical plan shape if ever needed.

No counterpart in the reference (log pipeline); task-spec extra for
the web-curation path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import HTML_ENTITIES, WS

_TITLE = "(?is)<title[^>]*>(.*?)</title>"
_DESC = ("(?is)<meta\\s[^>]*name\\s*=\\s*[\"']description[\"']"
         "[^>]*content\\s*=\\s*[\"']([^\"']*)[\"']")
_OG_TITLE = ("(?is)<meta\\s[^>]*property\\s*=\\s*[\"']og:title[\"']"
             "[^>]*content\\s*=\\s*[\"']([^\"']*)[\"']")
_HTML_LANG = "(?is)<html\\s[^>]*lang\\s*=\\s*[\"']([^\"']*)[\"']"
_META_CHARSET = "(?is)<meta\\s+charset\\s*=\\s*[\"']?([a-zA-Z0-9_-]+)"
_HTTP_EQUIV_CHARSET = ("(?is)<meta\\s[^>]*http-equiv\\s*=\\s*[\"']"
                       "content-type[\"'][^>]*charset=([a-zA-Z0-9_-]+)")


def _clean(col):
    for pat, repl in HTML_ENTITIES:
        col = F.regexp_replace(col, pat, repl)
    return F.trim(F.regexp_replace(col, WS, " "))


def html_meta(df: DataFrame, html_col: str = "html",
              id_col: str = "doc_id") -> DataFrame:
    """(doc_id, title, description, og_title, lang, lang2, charset,
    has_title, charset_is_utf8) per page.  ``lang2`` is the 2-letter
    primary subtag of the lang claim (the join key against a detected
    language column); ``charset`` coalesces <meta charset> over the
    http-equiv form, lowercased; absent fields are ''."""
    s = F.decode(F.col(html_col), "UTF-8")
    title = _clean(F.regexp_extract(s, _TITLE, 1))
    desc = _clean(F.regexp_extract(s, _DESC, 1))
    og = _clean(F.regexp_extract(s, _OG_TITLE, 1))
    lang = F.lower(F.trim(F.regexp_extract(s, _HTML_LANG, 1)))
    cs1 = F.lower(F.regexp_extract(s, _META_CHARSET, 1))
    cs2 = F.lower(F.regexp_extract(s, _HTTP_EQUIV_CHARSET, 1))
    charset = F.when(cs1 != "", cs1).otherwise(cs2)
    return df.select(
        F.col(id_col).alias("doc_id"),
        title.alias("title"),
        desc.alias("description"),
        og.alias("og_title"),
        lang.alias("lang"),
        F.regexp_extract(lang, "^([a-z]{2})", 1).alias("lang2"),
        charset.alias("charset"),
        (title != "").alias("has_title"),
        charset.isin("utf-8", "utf8").alias("charset_is_utf8"))


def html_meta_sql(html_table: str) -> str:
    """DuckDB projection over ``html_table`` (doc_id, html TEXT);
    yields CTE ``meta``."""
    def esc(p):
        return p.replace("'", "''")

    def clean(expr):
        for pat, repl in HTML_ENTITIES:
            expr = f"regexp_replace({expr}, '{pat}', " \
                   f"'{repl.replace(chr(39), chr(39) * 2)}', 'g')"
        return f"trim(regexp_replace({expr}, '{WS}', ' ', 'g'))"

    title = clean(f"regexp_extract(html, '{esc(_TITLE)}', 1)")
    desc = clean(f"regexp_extract(html, '{esc(_DESC)}', 1)")
    og = clean(f"regexp_extract(html, '{esc(_OG_TITLE)}', 1)")
    lang = f"lower(trim(regexp_extract(html, '{esc(_HTML_LANG)}', 1)))"
    cs1 = f"lower(regexp_extract(html, '{esc(_META_CHARSET)}', 1))"
    cs2 = f"lower(regexp_extract(html, '{esc(_HTTP_EQUIV_CHARSET)}', 1))"
    return f"""
mraw AS (
  SELECT doc_id, {title} AS title, {desc} AS description,
         {og} AS og_title, {lang} AS lang,
         CASE WHEN {cs1} <> '' THEN {cs1} ELSE {cs2} END AS charset
  FROM {html_table}
),
meta AS (
  SELECT doc_id, title, description, og_title, lang,
         regexp_extract(lang, '^([a-z]{{2}})', 1) AS lang2,
         charset,
         title <> '' AS has_title,
         charset IN ('utf-8', 'utf8') AS charset_is_utf8
  FROM mraw
)"""


# ---------------------------------------------------------------------------
# DOM structural stats — markup-shape quality signals.  Machine-
# generated and spammy pages betray themselves structurally before any
# text model runs: tag soup (unbalanced divs), iframe/form farms,
# script-dominated payloads, near-zero visible-text mass.  These are
# the cheap structural features web-quality classifiers consume
# (the prevalence of such features in public spam-detection literature
# is exactly why they're here).  Pure codegen regex-count projection —
# zero shuffle, zero Python; every count is one regexp_extract_all
# over the decoded page, shared verbatim with the DuckDB oracle.

_OPEN_TAG = "<[a-zA-Z]"
_CLOSE_TAG = "</[a-zA-Z]"
_DIV_OPEN = "(?i)<div[\\s>]"
_DIV_CLOSE = "(?i)</div"
_SCRIPT_TAG = "(?i)<script[\\s>]"
_IFRAME_TAG = "(?i)<iframe[\\s>]"
_FORM_TAG = "(?i)<form[\\s>]"


def dom_structure(df: DataFrame, html_col: str = "html",
                  id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_open_tags, n_close_tags, div_balance, n_scripts,
    n_iframes, n_forms, html_len, text_len, markup_ppm) per page.
    ``div_balance`` = div opens − div closes (0 for well-formed);
    ``markup_ppm`` = exact-integer share of bytes that are NOT visible
    text (tags, scripts, styles, comments, inter-tag whitespace)."""
    from .text import html_text
    s = F.decode(F.col(html_col), "UTF-8")

    def n(pat):
        return F.size(F.regexp_extract_all(s, F.lit(pat), 0)).cast("long")

    html_len = F.length(s).cast("long")
    text_len = F.length(html_text(s)).cast("long")
    base = df.select(
        F.col(id_col).alias("doc_id"),
        n(_OPEN_TAG).alias("n_open_tags"),
        n(_CLOSE_TAG).alias("n_close_tags"),
        (n(_DIV_OPEN) - n(_DIV_CLOSE)).alias("div_balance"),
        n(_SCRIPT_TAG).alias("n_scripts"),
        n(_IFRAME_TAG).alias("n_iframes"),
        n(_FORM_TAG).alias("n_forms"),
        html_len.alias("html_len"),
        text_len.alias("text_len"))
    return base.withColumn(
        "markup_ppm",
        F.expr("CAST(((html_len - text_len) * 1000000L) div "
               "greatest(html_len, 1L) AS LONG)"))


def dom_structure_sql(html_table: str) -> str:
    """DuckDB projection over ``html_table`` (doc_id, html TEXT);
    yields CTE ``dom_stats``."""
    from .text import html_text_sql

    def n(pat):
        return f"len(regexp_extract_all(html, '{pat}'))::BIGINT"

    text_len = f"length({html_text_sql('html')})::BIGINT"
    return f"""
draw AS (
  SELECT doc_id,
         {n(_OPEN_TAG)} AS n_open_tags,
         {n(_CLOSE_TAG)} AS n_close_tags,
         ({n(_DIV_OPEN)} - {n(_DIV_CLOSE)})::BIGINT AS div_balance,
         {n(_SCRIPT_TAG)} AS n_scripts,
         {n(_IFRAME_TAG)} AS n_iframes,
         {n(_FORM_TAG)} AS n_forms,
         length(html)::BIGINT AS html_len,
         {text_len} AS text_len
  FROM {html_table}
),
dom_stats AS (
  SELECT *, (((html_len - text_len) * 1000000) //
             greatest(html_len, 1))::BIGINT AS markup_ppm
  FROM draw
)"""
