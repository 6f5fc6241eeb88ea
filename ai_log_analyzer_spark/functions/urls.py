"""URL canonicalization / domain extraction for web-crawl pipelines.

Crawl dedup and domain-level curation both start from a canonical URL:
case-normalized scheme+host, default ports dropped, tracking params
(``utm_*``) stripped, trailing-slash-insensitive path, fragment
dropped.  The kernel is a shared recipe of regexp_extract/replace steps
written in the Java-regex ∩ RE2 subset (no lookaround, no replacement
backrefs), so the Spark form and the DuckDB oracle are the same
computation — pure Catalyst, stateless projection, no shuffle at any
scale.

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
# utm_* killers, applied in order (mid-string, leading, lone)
_UTM_STEPS = (
    (r"&utm_[a-z]+=[^&#]*", ""),
    (r"^utm_[a-z]+=[^&#]*&", ""),
    (r"^utm_[a-z]+=[^&#]*$", ""),
)
_REG_DOMAIN = r"([^.]+[.][^.]+)$"


def host_of(url: Column) -> Column:
    return F.lower(F.regexp_extract(url, _HOST, 1))


def registered_domain(url: Column) -> Column:
    """Last two host labels (public-suffix-lite: good for generic
    TLDs; a frozen two-level-suffix table is the at-scale upgrade)."""
    return F.regexp_extract(host_of(url), _REG_DOMAIN, 1)


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
    q = F.regexp_extract(url, _QUERY, 1)
    for pat, rep in _UTM_STEPS:
        q = F.regexp_replace(q, pat, rep)
    return F.concat(
        scheme, F.lit("://"), host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q)))


def host_of_sql(expr: str) -> str:
    return f"lower(regexp_extract({expr}, '{_HOST}', 1))"


def registered_domain_sql(expr: str) -> str:
    return f"regexp_extract({host_of_sql(expr)}, '{_REG_DOMAIN}', 1)"


def canonical_url_sql(expr: str) -> str:
    scheme = f"lower(regexp_extract({expr}, '{_SCHEME}', 1))"
    host = host_of_sql(expr)
    port = f"regexp_extract({expr}, '^[A-Za-z]+://[^/?#:]+:([0-9]+)', 1)"
    keep = (f"({port} <> '' AND NOT ({scheme} = 'https' AND {port} = '443')"
            f" AND NOT ({scheme} = 'http' AND {port} = '80'))")
    path = f"regexp_replace(regexp_extract({expr}, '{_PATH}', 1), '/+$', '')"
    path = f"CASE WHEN {path} = '' THEN '/' ELSE {path} END"
    q = f"regexp_extract({expr}, '{_QUERY}', 1)"
    for pat, rep in _UTM_STEPS:
        q = f"regexp_replace({q}, '{pat}', '{rep}')"
    return (f"{scheme} || '://' || {host}"
            f" || (CASE WHEN {keep} THEN ':' || {port} ELSE '' END)"
            f" || {path}"
            f" || (CASE WHEN {q} = '' THEN '' ELSE '?' || {q} END)")
