"""URL canonicalization / domain extraction for web-crawl pipelines.

Crawl dedup and domain-level curation both start from a canonical URL:
case-normalized scheme+host, default ports dropped, tracking params
(``utm_*``) stripped, remaining query params SORTED (``?b=2&a=1`` and
``?a=1&b=2`` are the same resource), trailing-slash-insensitive path,
fragment dropped.  The kernel is a shared recipe of regexp/array steps
written in the Java-regex ∩ RE2 subset (no lookaround, no replacement
backrefs), so the Spark form and the DuckDB oracle are the same
computation — pure Catalyst, stateless projection, no shuffle at any
scale.

``registered_domain`` uses a FROZEN two-level public-suffix table (the
public-suffix-list entries a crawl actually hits: ``co.uk``-style
ccTLD second levels).  The table is ~50 literals, so it compiles to a
codegen'd IN list — strictly cheaper than the broadcast join a full
PSL (~9k rules, wildcards/exceptions) would need; the docstring names
that as the upgrade path if full PSL fidelity is ever required.

No counterpart in the reference (log pipeline); task-spec extra for
the training-data path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME = r"^([A-Za-z]+)://"
_HOST = r"^[A-Za-z]+://([^/?#:]+)"
_PATH = r"^[A-Za-z]+://[^/?#]+([^?#]*)"
_QUERY = r"[?]([^#]*)"
_UTM_PARAM = r"^utm_[a-z]+="
_REG_DOMAIN = r"([^.]+[.][^.]+)$"
_REG_DOMAIN3 = r"([^.]+[.][^.]+[.][^.]+)$"

# Frozen two-level public suffixes (ccTLD second-level registries).  A
# host ending in one of these registers at the THIRD label from the
# right: bbc.co.uk, not co.uk.  Full-PSL fidelity (wildcard `*.ck`,
# exception rules, private suffixes) would need the ~9k-rule list as a
# broadcast table; this frozen subset covers the dominant crawl mass.
TWO_LEVEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk", "ltd.uk",
    "plc.uk", "sch.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp", "ad.jp", "ed.jp",
    "com.br", "net.br", "org.br", "gov.br", "edu.br",
    "co.in", "net.in", "org.in", "gen.in", "firm.in", "ind.in",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz",
    "co.za", "org.za", "net.za", "web.za", "gov.za",
    "com.mx", "org.mx", "net.mx", "gob.mx", "edu.mx",
    "com.tr", "net.tr", "org.tr", "gov.tr", "edu.tr",
    "com.ar", "net.ar", "org.ar", "gob.ar", "edu.ar",
    "com.sg", "edu.sg", "gov.sg",
    "com.hk", "edu.hk", "gov.hk",
    "com.tw", "edu.tw", "gov.tw",
    "co.kr", "or.kr", "ne.kr", "go.kr", "ac.kr",
    "co.th", "or.th", "ac.th", "go.th",
    "co.id", "or.id", "ac.id", "go.id", "web.id",
    "com.my", "net.my", "org.my", "gov.my", "edu.my",
    "com.ph", "net.ph", "org.ph", "gov.ph",
    "com.vn", "net.vn", "org.vn", "gov.vn", "edu.vn",
    "com.eg", "com.sa", "com.ua", "com.pl", "com.pk", "com.ng",
    "co.il", "org.il", "ac.il", "gov.il",
    "co.ke", "or.ke", "ac.ke", "go.ke",
)


def host_of(url: Column) -> Column:
    return F.lower(F.regexp_extract(url, _HOST, 1))


def registered_domain(url: Column) -> Column:
    """Registrable domain: last two host labels, or last THREE when the
    last two are a frozen two-level public suffix (``bbc.co.uk`` groups
    as ``bbc.co.uk``, never as ``co.uk``)."""
    host = host_of(url)
    last2 = F.regexp_extract(host, _REG_DOMAIN, 1)
    last3 = F.regexp_extract(host, _REG_DOMAIN3, 1)
    return F.when(last2.isin(list(TWO_LEVEL_SUFFIXES)) & (last3 != ""),
                  last3).otherwise(last2)


def _canon_query(q: Column) -> Column:
    """Drop utm_* params and empty fragments, then SORT what remains —
    param order is presentation, not identity.  Array ops are Catalyst
    higher-order functions (filter/array_sort/array_join): codegen'd,
    no Python."""
    params = F.filter(F.split(q, "&"),
                      lambda x: (x != "") & ~x.rlike(_UTM_PARAM))
    return F.array_join(F.array_sort(params), "&")


def canonical_url(url: Column) -> Column:
    scheme = F.lower(F.regexp_extract(url, _SCHEME, 1))
    host = host_of(url)
    # default ports: the host regex already stops at ':'; the port is
    # simply never re-emitted unless non-default
    port = F.regexp_extract(url, r"^[A-Za-z]+://[^/?#:]+:([0-9]+)", 1)
    keep_port = (
        (port != "")
        & ~((scheme == "https") & (port == "443"))
        & ~((scheme == "http") & (port == "80")))
    path = F.regexp_extract(url, _PATH, 1)
    path = F.regexp_replace(path, r"/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    q = _canon_query(F.regexp_extract(url, _QUERY, 1))
    return F.concat(
        scheme, F.lit("://"), host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q)))


def host_of_sql(expr: str) -> str:
    return f"lower(regexp_extract({expr}, '{_HOST}', 1))"


def registered_domain_sql(expr: str) -> str:
    host = host_of_sql(expr)
    last2 = f"regexp_extract({host}, '{_REG_DOMAIN}', 1)"
    last3 = f"regexp_extract({host}, '{_REG_DOMAIN3}', 1)"
    inlist = ", ".join(f"'{s}'" for s in TWO_LEVEL_SUFFIXES)
    return (f"(CASE WHEN {last2} IN ({inlist}) AND {last3} <> '' "
            f"THEN {last3} ELSE {last2} END)")


def _canon_query_sql(q: str) -> str:
    # coalesce: DuckDB's array_to_string([]) is NULL, Spark's is ''
    return ("coalesce(array_to_string(list_sort(list_filter("
            f"string_split({q}, '&'), "
            f"x -> x <> '' AND NOT regexp_matches(x, '{_UTM_PARAM}'))), "
            "'&'), '')")


def canonical_url_sql(expr: str) -> str:
    scheme = f"lower(regexp_extract({expr}, '{_SCHEME}', 1))"
    host = host_of_sql(expr)
    port = f"regexp_extract({expr}, '^[A-Za-z]+://[^/?#:]+:([0-9]+)', 1)"
    keep = (f"({port} <> '' AND NOT ({scheme} = 'https' AND {port} = '443')"
            f" AND NOT ({scheme} = 'http' AND {port} = '80'))")
    path = f"regexp_replace(regexp_extract({expr}, '{_PATH}', 1), '/+$', '')"
    path = f"CASE WHEN {path} = '' THEN '/' ELSE {path} END"
    q = _canon_query_sql(f"regexp_extract({expr}, '{_QUERY}', 1)")
    return (f"{scheme} || '://' || {host}"
            f" || (CASE WHEN {keep} THEN ':' || {port} ELSE '' END)"
            f" || {path}"
            f" || (CASE WHEN {q} = '' THEN '' ELSE '?' || {q} END)")


# ---------------------------------------------------------------------------
# Outlink extraction: html binary -> (link_idx, href, anchor_text, host,
# registered domain) per <a> element.  One regex with two capture groups
# runs twice (group 1 = href, group 2 = anchor body), so the two arrays
# index the SAME match positions and zip losslessly — no risk of the
# href/anchor misalignment a pair of independent patterns would have on
# href-less anchors.  Pattern lives in the Java-regex ∩ RE2 subset
# (inline (?is) flags, lazy quantifier — both engines support them), so
# the DuckDB oracle is the identical computation.  Per-row projection +
# one explode: no shuffle, codegen'd end to end at any corpus size.
_LINK_RE = "(?is)<a\\s[^>]*href\\s*=\\s*[\"']([^\"']*)[\"'][^>]*>(.*?)</a>"
_ABS_RE = r"^[A-Za-z]+://"


def extract_links(df, html_col: str = "html", id_col: str = "doc_id"):
    """(doc_id, link_idx, href, is_abs, host, domain, anchor_text) —
    exploded outlink table from an ``html: binary`` column (the input
    contract's page shape).  Anchor text is tag-stripped and
    whitespace-collapsed; host/registered-domain are computed only for
    absolute hrefs (relative links resolve against the page's own host,
    which this table intentionally leaves to the caller's join).  This
    is the edge-extraction step that feeds host-level link graphs
    (``functions/graph.pagerank``) and anchor-text quality signals."""
    s = F.decode(F.col(html_col), "UTF-8")
    hrefs = F.regexp_extract_all(s, F.lit(_LINK_RE), F.lit(1))
    anchors = F.regexp_extract_all(s, F.lit(_LINK_RE), F.lit(2))
    z = F.arrays_zip(hrefs.alias("href"), anchors.alias("anchor"))
    e = df.select(F.col(id_col).alias("doc_id"),
                  F.posexplode(z).alias("pos", "lk"))
    href = F.col("lk.href")
    is_abs = href.rlike(_ABS_RE)
    anchor = F.trim(F.regexp_replace(
        F.regexp_replace(F.col("lk.anchor"), r"<[^>]+>", " "),
        r"\s+", " "))
    return e.select(
        "doc_id",
        F.col("pos").cast("long").alias("link_idx"),
        href.alias("href"),
        is_abs.alias("is_abs"),
        F.when(is_abs, host_of(href)).otherwise(F.lit("")).alias("host"),
        F.when(is_abs, registered_domain(href)).otherwise(F.lit(""))
         .alias("domain"),
        anchor.alias("anchor_text"))


def extract_links_sql(html_table: str) -> str:
    """DuckDB CTE chain over ``html_table`` (columns doc_id, html TEXT —
    the oracle synthesizes html as VARCHAR, matching Spark's decode)."""
    pat = _LINK_RE.replace("'", "''")
    abs_m = f"regexp_matches(href, '{_ABS_RE}')"
    host = host_of_sql("href")
    dom = registered_domain_sql("href")
    return f"""
links AS (
  SELECT doc_id,
         regexp_extract_all(html, '{pat}', 1) AS hrefs,
         regexp_extract_all(html, '{pat}', 2) AS anchors
  FROM {html_table}
),
edges AS (
  SELECT doc_id, (i - 1)::BIGINT AS link_idx,
         hrefs[i] AS href, anchors[i] AS anchor
  FROM links, UNNEST(range(1, len(hrefs) + 1)) AS t(i)
),
outlinks AS (
  SELECT doc_id, link_idx, href,
         {abs_m} AS is_abs,
         CASE WHEN {abs_m} THEN {host} ELSE '' END AS host,
         CASE WHEN {abs_m} THEN {dom} ELSE '' END AS domain,
         trim(regexp_replace(regexp_replace(anchor, '<[^>]+>', ' ', 'g'),
                             '\\s+', ' ', 'g')) AS anchor_text
  FROM edges
)"""


# Frozen curation blocklist (UT1-style category ban), keyed by
# REGISTERED domain so every subdomain of a banned domain is banned by
# construction (www.spam.co.uk -> spam.co.uk -> hit).  Real pipelines
# load ~4M UT1 entries; the mechanism is identical — at that size the
# IN-list becomes a broadcast join on the domain column, named here as
# the upgrade path.
BLOCKLIST_DOMAINS = (
    "spam.co.uk", "ads.example", "tracker.example", "casino7.com",
)


def domain_blocked(url: Column) -> Column:
    """True iff the url's registered domain is on the frozen blocklist."""
    return registered_domain(url).isin(list(BLOCKLIST_DOMAINS))


def domain_blocked_sql(expr: str) -> str:
    inlist = ", ".join(f"'{s}'" for s in BLOCKLIST_DOMAINS)
    return f"({registered_domain_sql(expr)} IN ({inlist}))"


# ---------------------------------------------------------------------------
# Anchor-text aggregation: the inlink-side quality signal.  Web curation
# pipelines score a target domain by who links to it and with what
# words (anchor text is the classic relevance/spam signal; FineWeb-Edu
# style quality classifiers consume exactly this table).  Shape: the
# edge table from ``extract_links`` is grouped twice — once per target
# domain (inlink counts), once per (domain, term) for the top anchor
# term.  Both aggs have map-side partials over fixed-width keys; the
# deterministic top term is a partial-aggregable min_by over the
# struct (-count, term) — count desc, term asc, never a per-domain
# sort.  At 10^12 edges both shuffles key on the target domain, whose
# skew (everyone links to wikipedia.org) is exactly what AQE's skew
# split handles; the term agg pre-aggregates map-side so a hot domain
# contributes one row per distinct term per task, not one per edge.

def anchor_domain_stats(links):
    """(domain, n_links, n_src_docs, top_term, top_term_count) over the
    absolute outlinks of an ``extract_links`` edge table."""
    abs_links = links.filter(F.col("is_abs") & (F.col("domain") != ""))
    base = abs_links.groupBy("domain").agg(
        F.count("*").alias("n_links"),
        F.countDistinct("doc_id").alias("n_src_docs"))
    terms = (abs_links
             .select("domain", F.explode(
                 F.split(F.lower("anchor_text"), r"\s+")).alias("term"))
             .filter(F.col("term") != "")
             .groupBy("domain", "term").agg(F.count("*").alias("cnt")))
    ordkey = F.struct((-F.col("cnt")).alias("nc"), F.col("term").alias("t"))
    top = terms.groupBy("domain").agg(
        F.min_by("term", ordkey).alias("top_term"),
        F.min_by("cnt", ordkey).alias("top_term_count"))
    # left join: a domain whose every anchor is empty still reports its
    # inlink counts (top_term NULL -> '')
    return (base.join(top, "domain", "left")
            .select("domain", "n_links", "n_src_docs",
                    F.coalesce("top_term", F.lit("")).alias("top_term"),
                    F.coalesce("top_term_count", F.lit(0)).cast("long")
                     .alias("top_term_count")))


def anchor_domain_stats_sql() -> str:
    """DuckDB CTE chain continuing from ``extract_links_sql``'s
    ``outlinks`` CTE; final relation is ``anchor_stats``."""
    return """
abslinks AS (
  SELECT * FROM outlinks WHERE is_abs AND domain <> ''
),
base AS (
  SELECT domain, count(*)::BIGINT AS n_links,
         count(DISTINCT doc_id)::BIGINT AS n_src_docs
  FROM abslinks GROUP BY domain
),
terms AS (
  SELECT domain, term, count(*)::BIGINT AS cnt
  FROM (SELECT domain,
               unnest(regexp_split_to_array(lower(anchor_text), '\\s+'))
                 AS term
        FROM abslinks)
  WHERE term <> '' GROUP BY domain, term
),
top AS (
  SELECT domain, term AS top_term, cnt AS top_term_count
  FROM (SELECT domain, term, cnt,
               row_number() OVER (PARTITION BY domain
                                  ORDER BY cnt DESC, term) AS rn
        FROM terms)
  WHERE rn = 1
),
anchor_stats AS (
  SELECT base.domain, n_links, n_src_docs,
         coalesce(top_term, '') AS top_term,
         coalesce(top_term_count, 0)::BIGINT AS top_term_count
  FROM base LEFT JOIN top ON base.domain = top.domain
)"""


# ---------------------------------------------------------------------------
# Page indexing policy: meta-robots noindex/nofollow + rel=canonical.
# A crawl-curation pipeline must honor these before a page enters the
# corpus (noindex pages are the publisher's opt-out; the canonical link
# collapses parameterized/mirrored duplicates onto one representative
# BEFORE any content-hash dedup runs — it is the cheapest dedup signal
# a crawl carries).  All three extractions are single regexes in the
# Java ∩ RE2 subset over the decoded html, pure codegen projection,
# zero shuffle.  FROZEN attribute-order contract: `name` precedes
# `content` on <meta>, `rel` precedes `href` on <link> (the dominant
# emitted order; a production variant adds the mirrored-order
# alternation at 2x pattern cost, same plan shape).

_META_ROBOTS = ("(?is)<meta\\s[^>]*name\\s*=\\s*[\"']robots[\"']"
                "[^>]*content\\s*=\\s*[\"']([^\"']*)[\"']")
_CANONICAL = ("(?is)<link\\s[^>]*rel\\s*=\\s*[\"']canonical[\"']"
              "[^>]*href\\s*=\\s*[\"']([^\"']*)[\"']")


def page_policy(df, html_col: str = "html", url_col: str = "url",
                id_col: str = "doc_id"):
    """(doc_id, noindex, nofollow, canonical_href, has_canonical,
    canonical_offsite): indexing policy per page.  ``canonical_offsite``
    is true when the canonical target's registered domain differs from
    the page's own — the cross-domain-canonical case a dedup stage must
    treat as a merge hint, not an intra-site alias."""
    s = F.decode(F.col(html_col), "UTF-8")
    robots = F.lower(F.regexp_extract(s, _META_ROBOTS, 1))
    canon = F.regexp_extract(s, _CANONICAL, 1)
    has_canon = canon != ""
    return df.select(
        F.col(id_col).alias("doc_id"),
        robots.contains("noindex").alias("noindex"),
        robots.contains("nofollow").alias("nofollow"),
        canon.alias("canonical_href"),
        has_canon.alias("has_canonical"),
        (has_canon &
         (registered_domain(canon) != registered_domain(F.col(url_col))))
        .alias("canonical_offsite"))


def page_policy_sql(html_table: str) -> str:
    """DuckDB projection over ``html_table`` (doc_id, url, html TEXT);
    yields CTE ``policy``."""
    rob = _META_ROBOTS.replace("'", "''")
    can = _CANONICAL.replace("'", "''")
    robots = f"lower(regexp_extract(html, '{rob}', 1))"
    canon = f"regexp_extract(html, '{can}', 1)"
    return f"""
policy AS (
  SELECT doc_id,
         contains({robots}, 'noindex') AS noindex,
         contains({robots}, 'nofollow') AS nofollow,
         {canon} AS canonical_href,
         {canon} <> '' AS has_canonical,
         ({canon} <> '' AND
          {registered_domain_sql(canon)} <>
          {registered_domain_sql('url')}) AS canonical_offsite
  FROM {html_table}
)"""


# ---------------------------------------------------------------------------
# Domain-level curation rollup: the per-registered-domain summary table
# every web-corpus pipeline maintains (FineWeb/RefinedWeb curate at the
# domain grain — quota caps, blocklists, and quality triage all key on
# it).  ONE groupBy(domain) with exclusively partial-aggregable
# aggregates (counts, sums, approx-free distincts on md5 fingerprints);
# dup_ppm is exact integer arithmetic so the oracle can never diverge
# on rounding.  Domain skew (a mega-host with 10^9 pages) is the
# canonical AQE-skew-split case; the per-row projection before the agg
# keeps only (domain, host, n_tokens, fp) — text never shuffles.

def domain_rollup(df, url_col: str = "url", text_col: str = "text"):
    """(domain, n_pages, n_hosts, total_tokens, n_distinct_fps,
    dup_ppm) — per-registered-domain corpus stats; ``dup_ppm`` =
    (pages − distinct fingerprints) · 10⁶ / pages, the within-domain
    exact-duplicate mass."""
    from .text import fingerprint, token_count
    u = F.col(url_col)
    proj = df.select(
        registered_domain(u).alias("domain"),
        host_of(u).alias("host"),
        token_count(F.col(text_col)).cast("long").alias("n_tokens"),
        fingerprint(F.col(text_col)).alias("fp"))
    return (proj.groupBy("domain")
            .agg(F.count("*").alias("n_pages"),
                 F.countDistinct("host").alias("n_hosts"),
                 F.sum("n_tokens").alias("total_tokens"),
                 F.countDistinct("fp").alias("n_distinct_fps"))
            .withColumn("dup_ppm", F.expr(
                "CAST(((n_pages - n_distinct_fps) * 1000000L) div n_pages"
                " AS LONG)")))


def domain_rollup_sql(pages_table: str) -> str:
    """DuckDB CTE over ``pages_table`` (url, text); yields ``rollup``."""
    from .text import fingerprint_sql, token_count_sql
    return f"""
proj AS (
  SELECT {registered_domain_sql('url')} AS domain,
         {host_of_sql('url')} AS host,
         ({token_count_sql('text')})::BIGINT AS n_tokens,
         {fingerprint_sql('text')} AS fp
  FROM {pages_table}
),
rollup AS (
  SELECT domain,
         count(*)::BIGINT AS n_pages,
         count(DISTINCT host)::BIGINT AS n_hosts,
         sum(n_tokens)::BIGINT AS total_tokens,
         count(DISTINCT fp)::BIGINT AS n_distinct_fps,
         ((count(*) - count(DISTINCT fp)) * 1000000 // count(*))::BIGINT
           AS dup_ppm
  FROM proj GROUP BY domain
)"""


# ---------------------------------------------------------------------------
# URL pattern mining / crawler-trap detection.  Crawlers die in URL
# spaces that grow without bound (calendars, session ids, faceted
# search permutations); the standard defense groups URLs by PATH
# SKELETON (variable runs abstracted to typed placeholders) and flags
# skeletons whose population is large AND fully distinct — the
# signature of a generated space rather than an authored one.  The
# skeleton kernel is a frozen ordered regexp_replace chain in the
# Java ∩ RE2 subset (hex runs BEFORE digit runs, or every hex id
# degrades to '<d>x<d>'); the aggregate is ONE groupBy(domain,
# skeleton) with count + countDistinct(path) + max(flag) — all
# partial-aggregable, one shuffle, AQE handles skeleton skew.

_HEX_RUN = "[0-9a-f]{8,}"
_DIGIT_RUN = "[0-9]+"
SESSION_PARAMS = ("sid", "sessionid", "phpsessid", "jsessionid", "sess")
_SESSION_RE = "(?i)[?&](" + "|".join(SESSION_PARAMS) + ")="


def path_skeleton(url: Column) -> Column:
    """Typed path skeleton: lowercase path with ≥8-char hex runs →
    ``<h>`` then digit runs → ``<d>``."""
    path = F.lower(F.regexp_extract(url, _PATH, 1))
    path = F.regexp_replace(path, _HEX_RUN, "<h>")
    return F.regexp_replace(path, _DIGIT_RUN, "<d>")


def url_pattern_stats(df, url_col: str = "url",
                      trap_min_urls: int = 20):
    """(domain, skeleton, n_urls, n_paths, depth, any_session,
    is_trap_candidate) per (registered domain, path skeleton).
    ``is_trap_candidate`` = population ≥ ``trap_min_urls`` AND every
    member path distinct — an unbounded generated space."""
    u = F.col(url_col)
    proj = df.select(
        registered_domain(u).alias("domain"),
        path_skeleton(u).alias("skeleton"),
        F.lower(F.regexp_extract(u, _PATH, 1)).alias("path"),
        u.rlike(_SESSION_RE).alias("has_session"))
    agg = (proj.groupBy("domain", "skeleton").agg(
        F.count("*").alias("n_urls"),
        F.countDistinct("path").alias("n_paths"),
        F.max("has_session").alias("any_session")))
    depth = (F.length("skeleton")
             - F.length(F.regexp_replace("skeleton", "/", ""))) \
        .cast("long")
    return agg.select(
        "domain", "skeleton", "n_urls", "n_paths",
        depth.alias("depth"), "any_session",
        ((F.col("n_urls") >= trap_min_urls)
         & (F.col("n_paths") == F.col("n_urls")))
        .alias("is_trap_candidate"))


def path_skeleton_sql(expr: str) -> str:
    path = f"lower(regexp_extract({expr}, '{_PATH}', 1))"
    return (f"regexp_replace(regexp_replace({path}, '{_HEX_RUN}', '<h>', 'g'),"
            f" '{_DIGIT_RUN}', '<d>', 'g')")


def url_pattern_stats_sql(urls_table: str, trap_min_urls: int = 20) -> str:
    """DuckDB CTE chain over ``urls_table`` (url); yields
    ``url_patterns``."""
    return f"""
uproj AS (
  SELECT {registered_domain_sql('url')} AS domain,
         {path_skeleton_sql('url')} AS skeleton,
         lower(regexp_extract(url, '{_PATH}', 1)) AS path,
         regexp_matches(url, '{_SESSION_RE}') AS has_session
  FROM {urls_table}
),
url_patterns AS (
  SELECT domain, skeleton,
         count(*)::BIGINT AS n_urls,
         count(DISTINCT path)::BIGINT AS n_paths,
         (length(skeleton) -
          length(replace(skeleton, '/', '')))::BIGINT AS depth,
         bool_or(has_session) AS any_session,
         (count(*) >= {trap_min_urls} AND
          count(DISTINCT path) = count(*)) AS is_trap_candidate
  FROM uproj GROUP BY domain, skeleton
)"""


# ---------------------------------------------------------------------------
# URL-pattern bitext candidate mining
# ---------------------------------------------------------------------------
# Before any embedding-based alignment (margin_pairs), web bitext
# pipelines harvest the free signal: multilingual sites encode language
# in the URL path ('/en/', '/de/'), and two pages whose URLs differ
# ONLY in that segment are translation candidates (the WMT shared-task
# document-alignment baseline; Buck & Koehn 2016).  This is the 10⁶×
# cheaper candidate generator the cosine stage then verifies.
#
# Scale: one codegen'd regex projection derives (key, lang) per page;
# the self-join is an equi-join on the stripped key, co-partitioned
# after one exchange, and per-key fan-out is bounded by the language
# count — no skew, no candidate explosion.

BITEXT_LANGS = ("en", "de", "fr", "es", "it", "pt", "nl", "pl",
                "ru", "ja", "zh")
_LANG_SEG = "/(" + "|".join(BITEXT_LANGS) + ")/"


def bitext_url_candidates(df, url_col: str = "url",
                          id_col: str = "doc_id"):
    """(url_key, lang_a, doc_a, lang_b, doc_b): page pairs whose URLs
    are identical after removing the language path segment, lang_a <
    lang_b.  Pages without a recognized language segment are dropped
    (they have no translation twin by this signal)."""
    keyed = (df.select(F.col(id_col).alias("doc_id"),
                       F.regexp_extract(F.col(url_col), _LANG_SEG, 1)
                       .alias("lang"),
                       F.regexp_replace(F.col(url_col), _LANG_SEG, "/")
                       .alias("url_key"))
             .filter(F.col("lang") != ""))
    a = keyed.select(F.col("url_key"), F.col("lang").alias("lang_a"),
                     F.col("doc_id").alias("doc_a"))
    b = keyed.select(F.col("url_key"), F.col("lang").alias("lang_b"),
                     F.col("doc_id").alias("doc_b"))
    return (a.join(b, "url_key")
            .filter(F.col("lang_a") < F.col("lang_b"))
            .select("url_key", "lang_a", "doc_a", "lang_b", "doc_b"))


def bitext_url_candidates_sql(pages_cte: str) -> str:
    """Oracle over a CTE named ``pages_cte`` with (doc_id, url):
    same regex key-strip and self-join.  regexp_replace in DuckDB
    replaces the FIRST match only — same as Spark without the 'g'
    flag, which is exactly the semantics we want (one language
    segment per URL)."""
    return f"""
keyed AS (
  SELECT doc_id,
         regexp_extract(url, '{_LANG_SEG}', 1) AS lang,
         regexp_replace(url, '{_LANG_SEG}', '/') AS url_key
  FROM {pages_cte}
  WHERE regexp_extract(url, '{_LANG_SEG}', 1) <> ''),
bitext AS (
  SELECT a.url_key, a.lang AS lang_a, a.doc_id AS doc_a,
         b.lang AS lang_b, b.doc_id AS doc_b
  FROM keyed a JOIN keyed b ON a.url_key = b.url_key
  WHERE a.lang < b.lang)"""


# ---------------------------------------------------------------------------
# URL-slug / content coherence.  SEO-spam and auto-generated pages
# often carry keyword-stuffed slugs unrelated to the body (or body
# text unrelated to the advertised slug); search-quality and curation
# pipelines score the overlap between the URL's last path segment and
# the document's vocabulary.  Pure per-row array algebra — the token
# sets never leave the row, so the operator is a zero-shuffle codegen
# projection at any corpus size.


def slug_text_coherence(df, url_col: str = "url",
                        text_col: str = "text", id_col: str = "doc_id"):
    """(doc_id, slug, n_slug_tokens, n_matched, coherence_ppm) per
    page: distinct slug tokens (last path segment split on -/_/.),
    how many appear in the page's own token set, and the exact-integer
    ppm share.  Pages with an empty slug report 0 tokens / 0 ppm."""
    path = F.regexp_extract(F.col(url_col), r"^[a-z]+://[^/?#]+([^?#]*)", 1)
    seg = F.element_at(F.split(path, "/"), -1)
    slug_toks = F.array_distinct(F.filter(
        F.split(F.lower(seg), r"[-_.]+"), lambda x: x != ""))
    text_toks = F.array_distinct(F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
        lambda x: x != ""))
    n_slug = F.size(slug_toks).cast("long")
    n_match = F.size(F.array_intersect(slug_toks, text_toks)).cast("long")
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.lower(seg).alias("slug"),
        n_slug.alias("n_slug_tokens"),
        n_match.alias("n_matched"),
        (n_match * F.lit(1_000_000)).cast("long").alias("_num"),
    ).select(
        "doc_id", "slug", "n_slug_tokens", "n_matched",
        F.expr("_num div greatest(n_slug_tokens, 1)").cast("long")
        .alias("coherence_ppm"))


def slug_text_coherence_sql(pages: str, url_expr: str = "url",
                            text_expr: str = "text",
                            id_expr: str = "doc_id") -> str:
    """DuckDB oracle: identical slug extraction and list algebra
    (list_intersect dedups exactly like Spark's array_intersect)."""
    return f"""
slug_base AS (
  SELECT {id_expr} AS doc_id,
         lower(CASE WHEN len(string_split(
                 regexp_extract({url_expr},
                                '^[a-z]+://[^/?#]+([^?#]*)', 1), '/')) > 0
               THEN list_extract(string_split(
                 regexp_extract({url_expr},
                                '^[a-z]+://[^/?#]+([^?#]*)', 1), '/'), -1)
               ELSE '' END) AS slug,
         list_distinct(list_filter(
           regexp_split_to_array(trim(lower({text_expr})), '\\s+'),
           x -> x <> '')) AS text_toks
  FROM {pages}),
slug_tok AS (
  SELECT doc_id, slug,
         list_distinct(list_filter(
           regexp_split_to_array(slug, '[-_.]+'), x -> x <> '')) AS st,
         text_toks
  FROM slug_base),
slug_coh AS (
  SELECT doc_id, slug, len(st)::BIGINT AS n_slug_tokens,
         len(list_intersect(st, text_toks))::BIGINT AS n_matched,
         (CASE WHEN len(st) > 0
               THEN len(list_intersect(st, text_toks)) * 1000000
               ELSE 0 END
          // greatest(len(st), 1))::BIGINT AS coherence_ppm
  FROM slug_tok)"""
