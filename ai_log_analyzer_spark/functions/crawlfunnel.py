"""Crawl-admission funnel: robots → indexability → trap filter →
canonical collapse, as ONE Catalyst DAG with per-domain stage counts.

The crawl-side twin of the text-side curation funnel
(``queries.curation_funnel``): before a page's CONTENT is ever judged,
a crawler decides whether the URL may be fetched (robots.txt), whether
the publisher wants it indexed (meta robots), whether its URL space
looks machine-generated (crawler-trap skeletons), and how many
distinct documents survive rel=canonical collapse.  Operating teams
watch exactly this table per domain — where URLs die, and how much of
a domain's apparent size is canonical duplication.

Composition, not new kernels: robots verdicts (`functions.robots`),
page policy (`functions.urls.page_policy` patterns inlined as the same
frozen regexes), trap skeletons (`functions.urls.url_pattern_stats`).
Scale shape: the robots-rules join is broadcast (rules ≪ pages) and
its longest-match verdict is one fixed-width groupBy(doc_id, host);
the verdict joins back on doc_id (co-partitioned corpus join — the
funnel's only page-sized exchange pair); trap stats are
(domain, skeleton)-grained — orders of magnitude smaller than pages —
and broadcast back; the funnel itself is ONE groupBy(domain) of
conditional sums plus a conditional countDistinct for the
post-canonical population.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import robots as RB
from .urls import (_CANONICAL, _META_ROBOTS, path_skeleton,
                   path_skeleton_sql, registered_domain,
                   registered_domain_sql, url_pattern_stats,
                   url_pattern_stats_sql)


def crawl_admission(pages: DataFrame, robots: DataFrame,
                    url_col: str = "url", html_col: str = "html",
                    id_col: str = "doc_id",
                    trap_min_urls: int = 20) -> DataFrame:
    """(domain, n_urls, n_allowed, n_indexable, n_admitted,
    n_canonical_targets) per registered domain.

    n_allowed    = robots.txt permits the fetch
    n_indexable  = allowed AND no meta-robots noindex
    n_admitted   = indexable AND URL skeleton is not a trap candidate
    n_canonical_targets = distinct coalesce(canonical_href, url) over
                   admitted pages — corpus size after canonical collapse.
    """
    u = F.col(url_col)
    s = F.decode(F.col(html_col), "UTF-8")
    robots_v = F.lower(F.regexp_extract(s, _META_ROBOTS, 1))
    canon = F.regexp_extract(s, _CANONICAL, 1)
    base = pages.select(
        F.col(id_col).alias("doc_id"),
        u.alias("url"),
        registered_domain(u).alias("domain"),
        path_skeleton(u).alias("skeleton"),
        robots_v.contains("noindex").alias("noindex"),
        F.when(canon != "", canon).otherwise(u).alias("canon_target"))
    verdict = RB.robots_match(
        pages.select(id_col, url_col), RB.robots_rules(robots),
        url_col=url_col, id_col=id_col).select("doc_id", "crawl_allowed")
    traps = (url_pattern_stats(pages.select(u.alias("url")),
                               trap_min_urls=trap_min_urls)
             .select("domain", "skeleton", "is_trap_candidate"))
    j = (base.join(verdict, "doc_id")
         .join(F.broadcast(traps), ["domain", "skeleton"], "left"))
    allowed = F.col("crawl_allowed")
    indexable = allowed & ~F.col("noindex")
    admitted = indexable & ~F.coalesce(F.col("is_trap_candidate"),
                                       F.lit(False))
    one = lambda c: F.sum(c.cast("long")).cast("long")  # noqa: E731
    return j.groupBy("domain").agg(
        F.count("*").alias("n_urls"),
        one(allowed).alias("n_allowed"),
        one(indexable).alias("n_indexable"),
        one(admitted).alias("n_admitted"),
        F.countDistinct(F.when(admitted, F.col("canon_target")))
        .cast("long").alias("n_canonical_targets"))


def crawl_admission_sql(pages_table: str, robots_table: str,
                        trap_min_urls: int = 20) -> str:
    """DuckDB oracle over ``pages_table`` (doc_id, url, html TEXT) and
    ``robots_table`` (host, robots_txt); yields ``admission``."""
    rob = _META_ROBOTS.replace("'", "''")
    can = _CANONICAL.replace("'", "''")
    canon = f"regexp_extract(html, '{can}', 1)"
    return f"""{RB.robots_rules_sql(robots_table)},
{RB.robots_match_sql(pages_table)},
{url_pattern_stats_sql(pages_table, trap_min_urls=trap_min_urls)},
fbase AS (
  SELECT doc_id, url,
         {registered_domain_sql('url')} AS domain,
         {path_skeleton_sql('url')} AS skeleton,
         contains(lower(regexp_extract(html, '{rob}', 1)), 'noindex')
           AS noindex,
         CASE WHEN {canon} <> '' THEN {canon} ELSE url END
           AS canon_target
  FROM {pages_table}
),
fjoin AS (
  SELECT b.*, v.crawl_allowed,
         coalesce(p.is_trap_candidate, FALSE) AS is_trap
  FROM fbase b
  JOIN verdicts v USING (doc_id)
  LEFT JOIN url_patterns p USING (domain, skeleton)
),
admission AS (
  SELECT domain,
         count(*)::BIGINT AS n_urls,
         sum(CASE WHEN crawl_allowed THEN 1 ELSE 0 END)::BIGINT
           AS n_allowed,
         sum(CASE WHEN crawl_allowed AND NOT noindex
                  THEN 1 ELSE 0 END)::BIGINT AS n_indexable,
         sum(CASE WHEN crawl_allowed AND NOT noindex AND NOT is_trap
                  THEN 1 ELSE 0 END)::BIGINT AS n_admitted,
         count(DISTINCT CASE WHEN crawl_allowed AND NOT noindex
                                  AND NOT is_trap
                             THEN canon_target END)::BIGINT
           AS n_canonical_targets
  FROM fjoin GROUP BY domain
)"""
