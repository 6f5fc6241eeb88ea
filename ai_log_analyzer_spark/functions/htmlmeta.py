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
