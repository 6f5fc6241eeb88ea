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


def test_pmi_exact_integer_values(spark):
    from ai_log_analyzer_spark.functions import collocations as CL
    rows = [(1, "New York new york"), (2, "york new"),
            (3, "plain words here"), (4, "")]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"]))
    got = {(r.w1, r.w2): r
           for r in CL.pmi_collocations(df, min_count=2).collect()}
    # corpus: new=3, york=3, N=9; (new,york)=2 (case-folded), (york,new)=2
    assert set(got) == {("new", "york"), ("york", "new")}
    for k in got:
        r = got[k]
        assert (r.n_xy, r.n_x, r.n_y) == (2, 3, 3)
        assert r.pmi_ppm == 2 * 9 * 1_000_000 // (3 * 3)  # 2_000_000


def test_encoding_triage_matches_native_is_valid_utf8(spark):
    from ai_log_analyzer_spark.functions import encodings as EN
    blobs = [
        b"plain ascii", "café € \U0001f600".encode(),
        b"\xef\xbb\xbfbom", b"\xff\xfeh\x00", b"\xfe\xff\x00h",
        b"\xc0\x80", b"\xed\xa0\x80", b"\xf4\x90\x80\x80",
        b"\xf4\x8f\xbf\xbf", b"", b"\xe0\x9f\xbf", b"\xc2",
        b"\xff\xfe\x00\x00rest", b"\x00\x00\xfe\xffrest",
    ]
    df = spark.createDataFrame(
        [(i, b) for i, b in enumerate(blobs)], "doc_id long, body binary")
    out = EN.encoding_triage(df)
    # cross-check the shared hex-regex kernel against Spark's NATIVE
    # JVM is_valid_utf8 — an independent implementation of RFC 3629
    native = df.select(
        "doc_id",
        F.expr("is_valid_utf8(cast(body as string))").alias("nv"))
    joined = {r.doc_id: r for r in out.join(native, "doc_id").collect()}
    for i in range(len(blobs)):
        assert joined[i].valid_utf8 == joined[i].nv, (i, blobs[i])
    assert joined[2].bom == "utf8"
    assert joined[3].bom == "utf16le" and joined[4].bom == "utf16be"
    assert joined[12].bom == "utf32le"      # FFFE0000 beats FFFE
    assert joined[13].bom == "utf32be"
    assert joined[9].valid_utf8 and joined[9].n_bytes == 0


def test_sitemap_parse_both_shapes_and_trim(spark):
    from ai_log_analyzer_spark.functions import sitemaps as SMF
    xml = ('<?xml version="1.0"?><urlset>'
           "<url><loc>  https://h/p1\n</loc>"
           "<priority>0.8</priority></url>"
           "<url><loc>https://h/p2</loc></url></urlset>"
           "<sitemapindex><sitemap><loc>https://h/child.xml</loc>"
           "</sitemap></sitemapindex>")
    df = spark.createDataFrame(
        pd.DataFrame([("h", xml)], columns=["host", "sitemap_xml"]))
    out = sorted(SMF.parse_sitemap(df).collect(),
                 key=lambda r: r.entry_idx)
    assert [(r.is_index, r.loc) for r in out] == [
        (False, "https://h/p1"), (False, "https://h/p2"),
        (True, "https://h/child.xml")]
    assert out[0].priority == "0.8" and out[0].lastmod == ""
    assert out[2].lastmod == ""


def test_url_pattern_skeleton_hex_before_digits(spark):
    rows = [("https://a.org/s/deadbeef1234/x",),
            ("https://a.org/p/123/v2",),
            ("https://a.org/p/456/v2",)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["url"]))
    got = {r.skeleton: r for r in
           U.url_pattern_stats(df, trap_min_urls=2).collect()}
    # hex run became <h>, NOT '<d>x<d>'-style digit debris
    assert "/s/<h>/x" in got
    p = got["/p/<d>/v<d>"]
    # depth = '/' count = path-segment count ('/p/<d>/v<d>' has 3)
    assert (p.n_urls, p.n_paths, p.depth) == (2, 2, 3)
    assert p.is_trap_candidate  # 2 urls, all distinct, min_urls=2


def test_url_pattern_session_param_flag(spark):
    rows = [("https://a.org/x?sid=1",), ("https://a.org/x?q=2",),
            ("https://b.org/y?JSESSIONID=abc",)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["url"]))
    got = {(r.domain, r.skeleton): r for r in
           U.url_pattern_stats(df).collect()}
    assert got[("a.org", "/x")].any_session          # bool_or over the group
    assert got[("b.org", "/y")].any_session          # case-insensitive
    assert not got[("a.org", "/x")].is_trap_candidate


def test_main_content_link_farm_loses(spark):
    from ai_log_analyzer_spark.functions import maincontent as MCF
    # nav has MORE characters than the article but 5 anchors; with
    # LINK_PENALTY=40 the article must win
    nav = " ".join(f'<a href="/{i}">menu item number {i}</a>'
                   for i in range(5))
    art = "a short but real article body with actual words"
    html = (f"<body><div>{nav}</div><p>{art}</p>"
            f"<div><a href='/x'>foot</a></div></body>")
    df = spark.createDataFrame(
        pd.DataFrame([(1, html.encode())], columns=["doc_id", "html"]))
    r = MCF.main_content(df).collect()[0]
    assert r.main_text == art
    assert r.n_blocks == 3
    assert r.main_ppm == len(art) * 1_000_000 // r.total_len


def test_main_content_tie_earliest_block_wins(spark):
    from ai_log_analyzer_spark.functions import maincontent as MCF
    html = b"<body><p>same size</p><p>xame size</p></body>"
    r = MCF.main_content(spark.createDataFrame(
        pd.DataFrame([(1, html)], columns=["doc_id", "html"]))).collect()[0]
    assert r.main_text == "same size"


def test_html_meta_shapes(spark):
    from ai_log_analyzer_spark.functions import htmlmeta as HMF
    pages = [
        (0, b'<html lang="PT-br"><head><title>\n A &amp; B \n</title>'
            b'<meta charset=UTF-8></head><body>x</body></html>'),
        (1, b'<html><head><meta http-equiv="content-type" '
            b'content="text/html; charset=windows-1252">'
            b'<meta name="description" content="d1"></head></html>'),
        (2, b'<html><body>no head at all</body></html>'),
        (3, b'<html><head><meta property="og:title" content="OG T">'
            b'<title>t</title></head></html>'),
    ]
    df = spark.createDataFrame(pages, "doc_id long, html binary")
    out = {r.doc_id: r for r in HMF.html_meta(df).collect()}
    assert out[0].title == "A & B"            # entity + ws collapse
    assert (out[0].lang, out[0].lang2) == ("pt-br", "pt")
    assert out[0].charset == "utf-8" and out[0].charset_is_utf8
    assert out[1].charset == "windows-1252" and not out[1].charset_is_utf8
    assert out[1].description == "d1" and not out[1].has_title
    assert (out[2].title, out[2].lang, out[2].charset) == ("", "", "")
    assert out[3].og_title == "OG T" and out[3].has_title


def test_dom_structure_counts_and_markup(spark):
    from ai_log_analyzer_spark.functions import htmlmeta as HMF
    html = (b'<html><body><div><DIV><p>hi</p>'
            b'<script>x</script><iframe></iframe><form></form>'
            b'</div></body></html>')           # 2 div opens, 1 close
    df = spark.createDataFrame([(1, html)], "doc_id long, html binary")
    r = HMF.dom_structure(df).collect()[0]
    assert r.div_balance == 1                  # case-insensitive opens
    assert (r.n_scripts, r.n_iframes, r.n_forms) == (1, 1, 1)
    assert r.text_len == 2                     # just "hi"
    assert r.markup_ppm == (r.html_len - 2) * 1_000_000 // r.html_len
    assert r.n_open_tags > r.n_close_tags      # the unbalanced div
