"""Unit tests for the round-5 web-curation operators: anchor-text
aggregation, page indexing policy, WARC record parsing, NFC
normalization, and the per-domain rollup — edge cases the driver's
oracle parity sweep can't isolate (tie-breaks, torn records, the
attribute-order contract, cross-form hash equality)."""

import pandas as pd
from pyspark.sql import functions as F

from ai_log_analyzer_spark.functions import unicodefold as UF
from ai_log_analyzer_spark.functions import urls as U
from ai_log_analyzer_spark.functions import warc as W


def _links(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "html"])
    ).select("doc_id", F.encode("html", "UTF-8").alias("html"))


def test_anchor_top_term_tiebreak_is_count_desc_term_asc(spark):
    # domain d.org gets anchors: "beta", "beta", "alpha", "alpha" —
    # equal counts, so the top term must be the LEXICALLY smaller one
    rows = [(i, f'<a href="https://d.org/{i}">{t}</a>')
            for i, t in enumerate(["beta", "beta", "alpha", "alpha"])]
    out = U.anchor_domain_stats(
        U.extract_links(_links(spark, rows))).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.domain, r.n_links, r.n_src_docs) == ("d.org", 4, 4)
    assert (r.top_term, r.top_term_count) == ("alpha", 2)


def test_anchor_stats_empty_anchors_keep_link_counts(spark):
    rows = [(1, '<a href="https://e.org/x"></a>'),
            (2, '<a href="https://e.org/y"> <b> </b> </a>')]
    r = U.anchor_domain_stats(
        U.extract_links(_links(spark, rows))).collect()[0]
    assert (r.n_links, r.n_src_docs) == (2, 2)
    assert (r.top_term, r.top_term_count) == ("", 0)


def test_page_policy_flags_and_offsite(spark):
    rows = [
        (0, "https://a.site0.co.uk/p",
         '<head><meta name="robots" content="noindex"></head>'),
        (1, "https://a.site0.co.uk/p",
         '<head><link rel="canonical" href="https://b.site0.co.uk/q"></head>'),
        (2, "https://a.site0.co.uk/p",
         '<head><LINK REL=\'canonical\' HREF=\'https://other.net/q\'></head>'),
        (3, "https://a.site0.co.uk/p", "<head></head>"),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "url", "html"])
    ).select("doc_id", "url", F.encode("html", "UTF-8").alias("html"))
    got = {r.doc_id: r for r in U.page_policy(df).collect()}
    assert got[0].noindex and not got[0].nofollow
    # same registered domain (site0.co.uk) through the suffix table:
    # different HOSTS are NOT offsite
    assert got[1].has_canonical and not got[1].canonical_offsite
    assert got[2].has_canonical and got[2].canonical_offsite
    assert not got[3].has_canonical and got[3].canonical_href == ""


def test_warc_parse_torn_record_flags_length(spark):
    p1, p2 = "hello body", "x" * 7
    blob = ("WARC/1.0\r\nWARC-Type: response\r\n"
            "WARC-Target-URI: https://e.org/1\r\n"
            "WARC-Date: 2024-01-01T00:00:00Z\r\n"
            f"Content-Length: {len(p1)}\r\n\r\n{p1}\r\n\r\n"
            "WARC/1.0\r\nWARC-Type: metadata\r\n"
            "WARC-Target-URI: https://e.org/1\r\n"
            "WARC-Date: 2024-01-01T00:00:01Z\r\n"
            f"Content-Length: {len(p2) + 3}\r\n\r\n{p2}\r\n\r\n")
    df = spark.createDataFrame(
        pd.DataFrame([(1, blob)], columns=["doc_id", "warc"])
    ).select("doc_id", F.encode("warc", "UTF-8").alias("warc"))
    out = {r.rec_idx: r for r in W.parse_warc_records(df).collect()}
    assert len(out) == 2
    assert out[0].warc_type == "response" and out[0].payload == p1
    assert out[0].length_ok
    assert out[1].warc_type == "metadata" and out[1].payload == p2
    assert not out[1].length_ok          # declared 3 octets high
    assert out[0].target_uri == "https://e.org/1"


def test_nfc_decomposed_hashes_equal_precomposed(spark):
    dec = "cafe\u0301 du parc"   # e + COMBINING ACUTE
    pre = "caf\u00e9 du parc"    # precomposed U+00E9
    df = spark.createDataFrame(
        pd.DataFrame([(1, dec), (2, pre), (3, "plain")],
                     columns=["doc_id", "text"]))
    got = {r.doc_id: r for r in UF.nfc_stats(df).collect()}
    assert got[1].changed and not got[2].changed and not got[3].changed
    assert got[1].len_before == got[1].len_after + 1
    # the whole point: both forms key identically after normalization
    assert got[1].norm_hash == got[2].norm_hash
    assert got[1].len_after == got[2].len_after == got[2].len_before


def test_domain_rollup_exact_dup_ppm(spark):
    rows = [("https://www.d.org/1", "same body"),
            ("https://m.d.org/2", "same  body"),   # ws-normalized dup
            ("https://www.d.org/3", "unique body here"),
            ("https://other.co.uk/1", "solo page")]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["url", "text"]))
    got = {r.domain: r for r in U.domain_rollup(df).collect()}
    d = got["d.org"]
    assert (d.n_pages, d.n_hosts, d.n_distinct_fps) == (3, 2, 2)
    assert d.dup_ppm == (3 - 2) * 1000000 // 3
    o = got["other.co.uk"]
    assert (o.n_pages, o.n_hosts, o.dup_ppm) == (1, 1, 0)


def _robots_df(spark, rows):
    from ai_log_analyzer_spark.functions import robots as RB
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["host", "robots_txt"]))


def test_robots_consecutive_ua_lines_share_group(spark):
    from ai_log_analyzer_spark.functions import robots as RB
    txt = ("User-agent: goodbot\nUser-agent: *\nDisallow: /a\n\n"
           "User-agent: badbot\nDisallow: /\n")
    rules = RB.robots_rules(_robots_df(spark, [("h", txt)])).collect()
    # the star group owns /a (opened by goodbot, joined by *); the
    # badbot group's Disallow: / must NOT leak in
    assert [(r.rule_path, r.is_allow) for r in rules] == [("/a", False)]


def test_robots_longest_match_allow_wins_and_comments(spark):
    from ai_log_analyzer_spark.functions import robots as RB
    txt = ("# policy\nUser-agent: *\n"
           "Disallow: /p  # inline comment\n"
           "Allow: /p/ok\nDisallow:\n")
    rules = RB.robots_rules(_robots_df(spark, [("h", txt)]))
    urls = spark.createDataFrame(pd.DataFrame(
        [(1, "https://h/p/x"), (2, "https://h/p/ok/x"),
         (3, "https://h/other"), (4, "https://nowhere/abc")],
        columns=["doc_id", "url"]))
    got = {r.doc_id: r for r in RB.robots_match(urls, rules).collect()}
    assert not got[1].crawl_allowed and got[1].rule_path == "/p"
    assert got[2].crawl_allowed and got[2].rule_path == "/p/ok"
    assert got[3].crawl_allowed and not got[3].matched
    # host with no robots at all -> allowed, unmatched
    assert got[4].crawl_allowed and not got[4].matched


def test_robots_equal_length_tie_allow_wins(spark):
    from ai_log_analyzer_spark.functions import robots as RB
    txt = "User-agent: *\nDisallow: /dup\nAllow: /dup\n"
    rules = RB.robots_rules(_robots_df(spark, [("h", txt)]))
    urls = spark.createDataFrame(pd.DataFrame(
        [(1, "https://h/dup/page")], columns=["doc_id", "url"]))
    r = RB.robots_match(urls, rules).collect()[0]
    assert r.crawl_allowed and r.rule_is_allow


def test_robots_sitemaps_are_group_independent(spark):
    from ai_log_analyzer_spark.functions import robots as RB
    txt = ("Sitemap: https://h/s1.xml\nUser-agent: badbot\n"
           "Disallow: /\nSitemap: https://h/s2.xml\n")
    got = sorted(r.sitemap_url for r in
                 RB.robots_sitemaps(_robots_df(spark, [("h", txt)]))
                 .collect())
    assert got == ["https://h/s1.xml", "https://h/s2.xml"]
