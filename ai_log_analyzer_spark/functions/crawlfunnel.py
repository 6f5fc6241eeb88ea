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


# ---------------------------------------------------------------------------
# Soft-404 detection.  Servers that return HTTP 200 with an error page
# body ("page not found", "no longer available") poison both the crawl
# frontier (the URL looks alive) and the training corpus (boilerplate
# error text).  The standard heuristic (Bar-Yossef et al. WWW 2004
# "Sic transit gloria telae") is content-based: an error-phrase marker
# on a SHORT page.  Long editorial pages that merely mention "error
# 404" are not flagged — the marker alone is kept as a separate count
# so operators can see the near-miss volume per host.

SOFT404_MARKER = (r"(?i)(page not found|404 not found|error 404|"
                  r"could not be found|no longer available|"
                  r"does not exist|has been removed)")
SOFT404_MAX_TOKENS = 40


def soft404_stats(df: DataFrame, host_col: str = "host",
                  text_col: str = "text") -> DataFrame:
    """(host, n_pages, n_marker, n_short, n_soft404, soft404_ppm) per
    host: error-phrase marker hits, short pages (≤ 40 tokens), their
    conjunction (the soft-404 verdict), and the exact-integer ppm rate.

    Scale shape: marker + token count are a zero-shuffle codegen
    projection; the rollup is ONE partial-aggregable groupBy(host) —
    page text never shuffles."""
    t = F.trim(F.col(text_col))
    n_tok = F.when(t == "", F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))).cast("long")
    marker = F.col(text_col).rlike(SOFT404_MARKER)
    short = n_tok <= SOFT404_MAX_TOKENS
    flags = df.select(
        F.col(host_col).alias("host"),
        marker.cast("int").alias("m"),
        short.cast("int").alias("s"),
        (marker & short).cast("int").alias("x"))
    return (flags.groupBy("host")
            .agg(F.count("*").cast("long").alias("n_pages"),
                 F.sum("m").cast("long").alias("n_marker"),
                 F.sum("s").cast("long").alias("n_short"),
                 F.sum("x").cast("long").alias("n_soft404"))
            .withColumn("soft404_ppm",
                        F.expr("(n_soft404 * 1000000) div n_pages")
                        .cast("long")))


def soft404_sql(pages: str, host_expr: str = "host",
                text_expr: str = "text") -> str:
    """DuckDB oracle: identical marker regex (RE2 ∩ Java subset),
    token rule, and integer rate."""
    marker = SOFT404_MARKER.replace("'", "''")
    return f"""
s404_flags AS (
  SELECT {host_expr} AS host,
         CASE WHEN regexp_matches({text_expr}, '{marker}')
              THEN 1 ELSE 0 END AS m,
         CASE WHEN (CASE WHEN trim({text_expr}) = '' THEN 0
                    ELSE len(regexp_split_to_array(trim({text_expr}),
                                                   '\\s+')) END)
                   <= {SOFT404_MAX_TOKENS} THEN 1 ELSE 0 END AS s
  FROM {pages}),
s404 AS (
  SELECT host, count(*)::BIGINT AS n_pages,
         sum(m)::BIGINT AS n_marker, sum(s)::BIGINT AS n_short,
         sum(m * s)::BIGINT AS n_soft404,
         (sum(m * s) * 1000000 // count(*))::BIGINT AS soft404_ppm
  FROM s404_flags GROUP BY host)"""
