"""robots.txt parsing + crawl-permission evaluation (RFC 9309 core).

A crawl pipeline must honor robots.txt before a URL is fetched or its
page enters the corpus — it is the publisher's machine-readable opt-out
and every serious web corpus (Common Crawl, C4, RefinedWeb) filters on
it.  Two relational stages:

1. ``robots_rules``: robots.txt text → one row per Allow/Disallow rule
   of the ``User-agent: *`` group.  Lines via ONE split + posexplode;
   RFC group structure (consecutive User-agent lines open ONE group
   that owns the rules after them) is recovered with a lag + running
   sum over (host, line_idx) — robots files are tiny, so the window
   partition is bounded by file length, never by corpus size; a group
   applies when any of its User-agent values is ``*``.
2. ``robots_match``: URL table ⋈ rules on (host, prefix-match) as a
   LEFT join (the prefix test lives in the join condition, so a host
   whose rules all miss still yields its URL row, null-extended); the
   rules side broadcasts (robots bytes ≪ page bytes at any crawl
   scale); the verdict is the longest-match rule via one
   partial-aggregable ``max_by`` over ``struct(rule_len, is_allow)`` —
   longer prefix wins, tie goes to Allow (RFC 9309 §2.3.2 "least
   restrictive"), never a per-URL sort.  No matching rule (or no
   robots.txt for the host) → allowed.

FROZEN contract (documented, test-pinned): literal path prefixes only —
no ``*``/``$`` wildcards (the RFC wildcard subset is the upgrade path:
compile each rule to an anchored regex, same join shape); rules match
the URL path only (not path+query); ``#`` starts a comment; an empty
``Disallow:`` value is a no-op (allow-all, per the original 1994 spec);
matching is case-sensitive on paths, case-insensitive on directive
names.  ``Sitemap:`` lines are global (group-independent) and surfaced
by ``robots_sitemaps``.

Scale: stage 1 is proportional to total robots bytes (≪ corpus);
stage 2 shuffles nothing on the page side when the rules broadcast —
one codegen'd hash-join probe + partial max_by per URL.

No counterpart in the reference (log pipeline); task-spec extra for
the web-curation path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .urls import host_of, host_of_sql

_DIRECTIVE = "^\\s*([A-Za-z-]+)\\s*:"
_VALUE = "^[^:]*:(.*)$"
_PATH_OF = "^[A-Za-z]+://[^/?#]+([^?#]*)"


def _parsed_lines(robots: DataFrame, host_col: str, txt_col: str):
    """(host, line_idx, directive, value) for every recognized
    directive line (comment-stripped; non-directive lines dropped)."""
    lines = F.split(F.col(txt_col), "\r?\n")
    e = robots.select(F.col(host_col).alias("host"),
                      F.posexplode(lines).alias("line_idx", "raw"))
    line = F.regexp_replace(F.col("raw"), "#.*$", "")
    p = e.select(
        "host", "line_idx",
        F.lower(F.regexp_extract(line, _DIRECTIVE, 1)).alias("directive"),
        F.trim(F.regexp_extract(line, _VALUE, 1)).alias("value"))
    return p.filter(F.col("directive") != "")


def robots_rules(robots: DataFrame, host_col: str = "host",
                 txt_col: str = "robots_txt") -> DataFrame:
    """(host, rule_path, is_allow, rule_len) — the ``User-agent: *``
    group's Allow/Disallow rules.  A UA line STARTS a new group only if
    the previous directive line was not itself a UA line (consecutive
    UA lines share the group, RFC 9309 §2.2.1), so the group id is a
    running sum of block-start flags."""
    p = _parsed_lines(robots, host_col, txt_col)
    wlag = Window.partitionBy("host").orderBy("line_idx")
    wsum = wlag.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    is_ua = F.col("directive") == "user-agent"
    prev = F.lag("directive").over(wlag)
    starts = (is_ua & (prev.isNull() | (prev != "user-agent"))).cast("int")
    g = p.withColumn("grp", F.sum(starts).over(wsum))
    star = (g.filter(is_ua & (F.col("value") == "*"))
            .select("host", "grp").distinct())
    rules = g.filter(F.col("directive").isin("allow", "disallow")
                     & (F.col("value") != ""))
    return (rules.join(star, ["host", "grp"])
            .select("host",
                    F.col("value").alias("rule_path"),
                    (F.col("directive") == "allow").alias("is_allow"),
                    F.length("value").cast("long").alias("rule_len")))


def robots_sitemaps(robots: DataFrame, host_col: str = "host",
                    txt_col: str = "robots_txt") -> DataFrame:
    """(host, sitemap_url) — global Sitemap directives, any group."""
    p = _parsed_lines(robots, host_col, txt_col)
    return (p.filter((F.col("directive") == "sitemap")
                     & (F.col("value") != ""))
            .select("host", F.col("value").alias("sitemap_url")))


def robots_match(urls: DataFrame, rules: DataFrame,
                 url_col: str = "url",
                 id_col: str = "doc_id") -> DataFrame:
    """(doc_id, host, matched, rule_path, rule_is_allow, crawl_allowed)
    — per-URL robots verdict.  Longest-match winner via one map-side-
    combinable max_by over struct(rule_len, is_allow); ties on length
    can only differ in is_allow (equal-length prefixes of one path are
    equal strings), where boolean max makes Allow win."""
    u = urls.select(F.col(id_col).alias("doc_id"),
                    host_of(F.col(url_col)).alias("host"),
                    F.regexp_extract(url_col, _PATH_OF, 1).alias("path"))
    r = rules.select(F.col("host").alias("r_host"),
                     "rule_path", "is_allow", "rule_len")
    cand = u.join(
        F.broadcast(r),
        (F.col("host") == F.col("r_host"))
        & F.col("path").startswith(F.col("rule_path")),
        "left")
    ordkey = F.struct(F.col("rule_len").alias("l"),
                      F.col("is_allow").alias("a"))
    best = (cand.groupBy("doc_id", "host").agg(
        F.max_by("rule_path", ordkey).alias("rule_path"),
        F.max_by("is_allow", ordkey).alias("rule_is_allow")))
    matched = F.col("rule_path").isNotNull()
    return best.select(
        "doc_id", "host", matched.alias("matched"),
        F.coalesce("rule_path", F.lit("")).alias("rule_path"),
        F.coalesce("rule_is_allow", F.lit(True)).alias("rule_is_allow"),
        F.coalesce("rule_is_allow", F.lit(True)).alias("crawl_allowed"))


def robots_rules_sql(robots_table: str) -> str:
    """DuckDB CTE chain over ``robots_table`` (host, robots_txt);
    yields ``rules``."""
    return f"""
rlines AS (
  SELECT host, (i - 1)::BIGINT AS line_idx,
         lower(regexp_extract(regexp_replace(ls[i], '#.*$', ''),
                              '{_DIRECTIVE}', 1)) AS directive,
         trim(regexp_extract(regexp_replace(ls[i], '#.*$', ''),
                             '{_VALUE}', 1)) AS value
  FROM (SELECT host, regexp_split_to_array(robots_txt, '\r?\n') AS ls
        FROM {robots_table}),
       UNNEST(range(1, len(ls) + 1)) AS t(i)
),
dlines AS (
  SELECT * FROM rlines WHERE directive <> ''
),
flagged AS (
  SELECT *, CASE WHEN directive = 'user-agent' AND
                      coalesce(lag(directive) OVER
                        (PARTITION BY host ORDER BY line_idx), '')
                      <> 'user-agent'
                 THEN 1 ELSE 0 END AS starts
  FROM dlines
),
grouped AS (
  SELECT *, sum(starts) OVER (PARTITION BY host ORDER BY line_idx) AS grp
  FROM flagged
),
star AS (
  SELECT DISTINCT host, grp FROM grouped
  WHERE directive = 'user-agent' AND value = '*'
),
rules AS (
  SELECT g.host, g.value AS rule_path,
         (g.directive = 'allow') AS is_allow,
         length(g.value)::BIGINT AS rule_len
  FROM grouped g JOIN star USING (host, grp)
  WHERE g.directive IN ('allow', 'disallow') AND g.value <> ''
)"""


def robots_match_sql(urls_table: str) -> str:
    """DuckDB CTE chain continuing from ``rules``; ``urls_table`` has
    (doc_id, url); yields ``verdicts``."""
    return f"""
upaths AS (
  SELECT doc_id, {host_of_sql('url')} AS host,
         regexp_extract(url, '{_PATH_OF}', 1) AS path
  FROM {urls_table}
),
cand AS (
  SELECT u.doc_id, u.host, r.rule_path, r.is_allow, r.rule_len
  FROM upaths u LEFT JOIN rules r
    ON u.host = r.host AND starts_with(u.path, r.rule_path)
),
ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY doc_id, host
      ORDER BY rule_len DESC NULLS LAST, is_allow DESC NULLS LAST) AS rn
  FROM cand
),
verdicts AS (
  SELECT doc_id, host,
         rule_path IS NOT NULL AS matched,
         coalesce(rule_path, '') AS rule_path,
         coalesce(is_allow, TRUE) AS rule_is_allow,
         coalesce(is_allow, TRUE) AS crawl_allowed
  FROM ranked WHERE rn = 1
)"""
