"""Sitemap XML parsing — the crawl-discovery companion to robots.txt.

After ``robots_sitemaps`` surfaces a host's sitemap URLs, the fetched
sitemap bodies name the URLs (and their declared last-modification
times) the publisher WANTS crawled — the freshness/priority signal a
recrawl scheduler joins against the crawl log (sitemaps.org protocol,
public).  Two record shapes share one file format: urlset entries
(``<url><loc>…</loc><lastmod>…</lastmod>…</url>``) and sitemap-index
entries (``<sitemap><loc>…</loc></sitemap>`` pointing at child
sitemaps).

Spark-first shape: ``regexp_extract_all`` pulls every ``<url>``/
``<sitemap>`` block in ONE pass, ``posexplode`` flattens, per-block
regexes lift the fields — pure projection + explode, codegen end to
end, no shuffle; the identical Java∩RE2 patterns run in the DuckDB
oracle.  FROZEN contract (test-pinned): elements in lowercase, no
namespace prefixes on the entry tags, ``loc`` required, ``lastmod``/
``changefreq``/``priority`` optional ('' when absent); CDATA is not
unwrapped (upgrade path: one more regexp_replace).

Scale: sitemap bytes ≪ page bytes (50k-URL cap per file in the
protocol), so this runs as a projection over a small side table; the
output joins crawl-side tables on canonical URL.

No counterpart in the reference (log pipeline); task-spec extra for
the web-curation path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_URL_BLOCK = "(?s)<url>(.*?)</url>"
_SM_BLOCK = "(?s)<sitemap>(.*?)</sitemap>"
_LOC = "(?s)<loc>\\s*(.*?)\\s*</loc>"
_LASTMOD = "(?s)<lastmod>\\s*(.*?)\\s*</lastmod>"
_CHANGEFREQ = "(?s)<changefreq>\\s*(.*?)\\s*</changefreq>"
_PRIORITY = "(?s)<priority>\\s*(.*?)\\s*</priority>"


def parse_sitemap(df: DataFrame, xml_col: str = "sitemap_xml",
                  host_col: str = "host") -> DataFrame:
    """(host, entry_idx, is_index, loc, lastmod, changefreq, priority)
    — one row per ``<url>`` or ``<sitemap>`` entry; ``is_index`` rows
    are child-sitemap pointers (their freshness fields are '')."""
    xml = F.col(xml_col)
    urls = F.regexp_extract_all(xml, F.lit(_URL_BLOCK), F.lit(1))
    subs = F.regexp_extract_all(xml, F.lit(_SM_BLOCK), F.lit(1))
    tagged = F.concat(
        F.transform(urls, lambda b: F.struct(
            F.lit(False).alias("is_index"), b.alias("block"))),
        F.transform(subs, lambda b: F.struct(
            F.lit(True).alias("is_index"), b.alias("block"))))
    e = df.select(F.col(host_col).alias("host"),
                  F.posexplode(tagged).alias("entry_idx", "t"))
    blk = F.col("t.block")
    return e.select(
        "host",
        F.col("entry_idx").cast("long").alias("entry_idx"),
        F.col("t.is_index").alias("is_index"),
        F.regexp_extract(blk, _LOC, 1).alias("loc"),
        F.regexp_extract(blk, _LASTMOD, 1).alias("lastmod"),
        F.regexp_extract(blk, _CHANGEFREQ, 1).alias("changefreq"),
        F.regexp_extract(blk, _PRIORITY, 1).alias("priority"))


def parse_sitemap_sql(sitemap_table: str) -> str:
    """DuckDB CTE chain over ``sitemap_table`` (host, sitemap_xml);
    yields ``sitemap_entries``."""
    return f"""
sblocks AS (
  SELECT host,
         list_concat(
           list_transform(regexp_extract_all(sitemap_xml,
                            '{_URL_BLOCK}', 1),
                          b -> struct_pack(is_index := FALSE, block := b)),
           list_transform(regexp_extract_all(sitemap_xml,
                            '{_SM_BLOCK}', 1),
                          b -> struct_pack(is_index := TRUE, block := b)))
           AS entries
  FROM {sitemap_table}
),
sitemap_entries AS (
  SELECT host, (i - 1)::BIGINT AS entry_idx,
         entries[i].is_index AS is_index,
         regexp_extract(entries[i].block, '{_LOC}', 1) AS loc,
         regexp_extract(entries[i].block, '{_LASTMOD}', 1) AS lastmod,
         regexp_extract(entries[i].block, '{_CHANGEFREQ}', 1) AS changefreq,
         regexp_extract(entries[i].block, '{_PRIORITY}', 1) AS priority
  FROM sblocks, UNNEST(range(1, len(entries) + 1)) AS t(i)
)"""
