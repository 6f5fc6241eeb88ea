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


# ---------------------------------------------------------------------------
# Declared-vs-detected language agreement.  The <html lang> claim is
# publisher metadata; the marker-lexicon detector reads the body.  The
# (claimed, detected) confusion matrix is the standard audit before
# trusting EITHER signal for monolingual split routing — a high
# mismatch rate for a host is a known junk/misdeclaration indicator.
# One combined codegen projection (claim regex + detector fold share
# the row) and one tiny groupBy over ≤ |langs|² keys — the page never
# shuffles.


def lang_claim_agreement(df: DataFrame, html_col: str = "html",
                         text_col: str = "text") -> DataFrame:
    """(claimed, detected, n_pages, agree) — counts per (html-lang
    2-letter claim, marker-detected language) cell; '' = no claim,
    'und' = detector abstained; ``agree`` marks the diagonal (both
    sides decided and equal)."""
    from .text import LANG_MARKERS
    s = F.decode(F.col(html_col), "UTF-8")
    lang = F.lower(F.trim(F.regexp_extract(s, _HTML_LANG, 1)))
    claimed = F.regexp_extract(lang, "^([a-z]{2})", 1)
    t = F.lower(F.col(text_col))
    scores = []
    for lg in sorted(LANG_MARKERS):
        rx = r"\b(" + "|".join(LANG_MARKERS[lg]) + r")\b"
        scores.append(F.size(F.regexp_extract_all(t, F.lit(rx), 0))
                      .alias(f"s_{lg}"))
    voted = df.select(claimed.alias("claimed"), *scores)
    best = F.greatest(*[F.col(f"s_{lg}") for lg in sorted(LANG_MARKERS)])
    guess = F.lit("und")
    for lg in sorted(LANG_MARKERS, reverse=True):
        guess = F.when((F.col(f"s_{lg}") == best) & (best > 0),
                       F.lit(lg)).otherwise(guess)
    cells = voted.select("claimed", guess.alias("detected"))
    return (cells.groupBy("claimed", "detected")
            .agg(F.count("*").cast("long").alias("n_pages"))
            .withColumn("agree",
                        (F.col("claimed") == F.col("detected"))
                        & (F.col("claimed") != "")
                        & (F.col("detected") != "und")))


def lang_claim_agreement_sql(pages: str, html_expr: str = "html",
                             text_expr: str = "text") -> str:
    """DuckDB oracle: identical claim regex, detector fold, and cells."""
    from .text import LANG_MARKERS
    langs = sorted(LANG_MARKERS)
    # DuckDB string literals keep backslashes verbatim — only quotes
    # need escaping (same rule as html_meta_sql's esc helper)
    esc = _HTML_LANG.replace("'", "''")
    scores = []
    for lg in langs:
        rx = r"\b(" + "|".join(LANG_MARKERS[lg]) + r")\b"
        scores.append(f"len(regexp_extract_all(lower({text_expr}), '{rx}'))"
                      f" AS s_{lg}")
    best = "greatest(" + ", ".join(f"s_{lg}" for lg in langs) + ")"
    guess = "'und'"
    for lg in sorted(langs, reverse=True):
        guess = (f"CASE WHEN s_{lg} = {best} AND {best} > 0 "
                 f"THEN '{lg}' ELSE {guess} END")
    return f"""
lca_base AS (
  SELECT regexp_extract(lower(trim(regexp_extract(
           decode({html_expr}), '{esc}', 1))), '^([a-z]{{2}})', 1)
           AS claimed,
         {', '.join(scores)}
  FROM {pages}),
lca_cells AS (
  SELECT claimed, {guess} AS detected FROM lca_base),
lca AS (
  SELECT claimed, detected, count(*)::BIGINT AS n_pages,
         (claimed = detected AND claimed <> '' AND detected <> 'und')
           AS agree
  FROM lca_cells GROUP BY claimed, detected)"""
