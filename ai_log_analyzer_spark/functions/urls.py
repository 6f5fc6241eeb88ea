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
