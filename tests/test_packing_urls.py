"""Unit tests for the chunking/packing manifests, URL canonicalization,
and temperature resampling (functions/packing.py, urls.py, sampling.py).
Cross-engine oracle parity for the driver queries is covered by
tests/test_driver_contract.py; these pin the kernels' semantics on
handcrafted cases."""

import pandas as pd
from pyspark.sql import functions as F

from ai_log_analyzer_spark.functions import packing as PK
from ai_log_analyzer_spark.functions import sampling as SA
from ai_log_analyzer_spark.functions import urls as U


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_chunk_spans_overlap_math(spark):
    ten = " ".join(f"t{i}" for i in range(10))
    df = _docs(spark, [(1, ten), (2, "a b"), (3, ""), (4, "   ")])
    out = (PK.chunk_spans(df, chunk=4, overlap=1)
           .orderBy("doc_id", "chunk_idx").collect())
    got = [(r.doc_id, r.chunk_idx, r.tok_start, r.tok_end) for r in out]
    # stride 3: 10 tokens -> [0,4) [3,7) [6,10); 2 tokens -> one short
    # chunk; empty/blank docs emit nothing
    assert got == [(1, 0, 0, 4), (1, 1, 3, 7), (1, 2, 6, 10),
                   (2, 0, 0, 2)]


def test_chunk_spans_boundary_exact_fit(spark):
    # n == chunk -> exactly one chunk, no empty tail window
    df = _docs(spark, [(1, "a b c d")])
    out = PK.chunk_spans(df, chunk=4, overlap=2).collect()
    assert [(r.chunk_idx, r.tok_start, r.tok_end) for r in out] == [(0, 0, 4)]


def test_pack_manifest_is_global_cumsum(spark):
    # adversarial doc_id order + gaps; compare to a pandas prefix sum
    rows = [(i * 7 % 101, " ".join(["w"] * (1 + i % 9))) for i in range(60)]
    df = _docs(spark, rows).repartition(7)
    out = (PK.pack_manifest(df, capacity=10, n_buckets=5)
           .orderBy("doc_id").toPandas())
    ref = (pd.DataFrame(rows, columns=["doc_id", "text"])
           .assign(n=lambda d: d.text.str.split().str.len())
           .sort_values("doc_id").reset_index(drop=True))
    ref["start"] = ref.n.cumsum().shift(fill_value=0)
    assert list(out.doc_id) == list(ref.doc_id)
    assert list(out.start_off) == list(ref.start)
    assert list(out.end_off) == list(ref.start + ref.n)
    assert list(out.first_seq) == list(ref.start // 10)
    assert list(out.last_seq) == list((ref.start + ref.n - 1) // 10)


def test_pack_manifest_partitioning_invariant(spark):
    rows = [(i, " ".join(["w"] * (1 + i % 5))) for i in range(40)]
    a = (PK.pack_manifest(_docs(spark, rows).repartition(1), n_buckets=3)
         .orderBy("doc_id").collect())
    b = (PK.pack_manifest(_docs(spark, rows).repartition(13), n_buckets=11)
         .orderBy("doc_id").collect())
    assert a == b


def test_pack_manifest_drops_empty_docs(spark):
    df = _docs(spark, [(1, "a b"), (2, ""), (3, "c")])
    out = PK.pack_manifest(df, capacity=2).orderBy("doc_id").collect()
    assert [(r.doc_id, r.start_off, r.end_off) for r in out] == \
        [(1, 0, 2), (3, 2, 3)]


def test_pack_manifest_rejects_non_integral_ids(spark):
    """Round-4 advice: a string id silently cast to long becomes NULL,
    survives the n_tokens filter and crashes the bucket math obscurely —
    must fail fast with a clear TypeError instead."""
    import pytest
    df = spark.createDataFrame([("doc-1", "a b"), ("doc-2", "c")],
                               ["doc_id", "text"])
    with pytest.raises(TypeError, match="integral"):
        PK.pack_manifest(df)


CANON_CASES = [
    # (raw, canonical)
    ("https://A.Example.COM:443/p/1/?utm_source=x&id=3",
     "https://a.example.com/p/1?id=3"),
    ("http://h.example.com:80/x", "http://h.example.com/x"),
    ("http://h.example.com:8080/x", "http://h.example.com:8080/x"),
    ("https://h.example.com", "https://h.example.com/"),
    ("https://h.example.com/a/b/#frag", "https://h.example.com/a/b"),
    ("https://h.example.com/?utm_a=1", "https://h.example.com/"),
    ("https://h.example.com/?utm_a=1&utm_b=2&q=z",
     "https://h.example.com/?q=z"),
    ("HTTPS://h.example.com/KeepCase", "https://h.example.com/KeepCase"),
    # param order is presentation, not identity: both sort to a=1&b=2
    ("https://h.example.com/x?b=2&a=1", "https://h.example.com/x?a=1&b=2"),
    ("https://h.example.com/x?a=1&b=2", "https://h.example.com/x?a=1&b=2"),
    ("https://h.example.com/x?b=2&utm_source=rss&a=1",
     "https://h.example.com/x?a=1&b=2"),
    ("https://h.example.com/x?&a=1&", "https://h.example.com/x?a=1"),
]


def test_canonical_url_cases(spark):
    df = spark.createDataFrame([(r,) for r, _c in CANON_CASES], ["url"])
    got = [r.c for r in
           df.select(U.canonical_url(F.col("url")).alias("c")).collect()]
    assert got == [c for _r, c in CANON_CASES]


def test_canonical_url_sql_mirror_matches(spark):
    import duckdb
    con = duckdb.connect()
    con.execute("SET threads TO 1")
    for raw, want in CANON_CASES:
        got = con.execute(
            f"SELECT {U.canonical_url_sql('u')} FROM (SELECT ? AS u)",
            [raw]).fetchone()[0]
        assert got == want, raw


DOMAIN_CASES = [
    ("https://a.b.news.example.com/x", "example.com"),
    # two-level public suffixes register at the third label
    ("https://www.bbc.co.uk/news", "bbc.co.uk"),
    ("https://shop.example.com.au/", "example.com.au"),
    ("https://EXAMPLE.Co.Uk/x", "example.co.uk"),
    # the bare suffix itself falls back to two labels (no third exists)
    ("https://co.uk/", "co.uk"),
    ("https://example.org/", "example.org"),
]


def test_registered_domain(spark):
    df = spark.createDataFrame([(r,) for r, _d in DOMAIN_CASES], ["url"])
    got = [r.d for r in
           df.select(U.registered_domain(F.col("url")).alias("d")).collect()]
    assert got == [d for _r, d in DOMAIN_CASES]


def test_registered_domain_sql_mirror_matches(spark):
    import duckdb
    con = duckdb.connect()
    con.execute("SET threads TO 1")
    for raw, want in DOMAIN_CASES:
        got = con.execute(
            f"SELECT {U.registered_domain_sql('u')} FROM (SELECT ? AS u)",
            [raw]).fetchone()[0]
        assert got == want, raw


def test_temperature_rates_upweight_tail(spark):
    # head source 300 docs, tail 3 docs: alpha=0.5 must give the tail a
    # strictly higher acceptance rate, never above 100%
    rows = [(i, "head") for i in range(300)] + \
        [(1000 + i, "tail") for i in range(3)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    rates = {r.source: r.rate_ppm for r in
             SA.temperature_rates(df, "source", target_n=150).collect()}
    assert rates["tail"] > rates["head"]
    assert rates["tail"] <= SA.TEMP_PPM


def test_temperature_select_deterministic(spark):
    rows = [(i, f"s{i % 4}") for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    a = sorted((r.doc_id, r.selected) for r in
               SA.temperature_select(df, "source", "doc_id", 100).collect())
    b = sorted((r.doc_id, r.selected) for r in
               SA.temperature_select(df.repartition(9), "source", "doc_id",
                                     100).collect())
    assert a == b
    n_sel = sum(1 for _i, s in a if s)
    assert 60 <= n_sel <= 140     # rate targets ~100 of 200


def test_new_ops_have_no_python_eval(spark):
    """chunking / url canonicalization are pure Catalyst — no UDFs."""
    df = _docs(spark, [(1, "a b c")])
    for plan_df in (PK.chunk_spans(df),
                    df.select(U.canonical_url(F.lit("https://x.example.com/")))):
        plan = plan_df._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan


# --- outlink extraction / blocklist (functions/urls.py round 5) -----------

_HTML_CASES = [
    # (doc_id, html, expected [(link_idx, href, is_abs, host, domain,
    #                           anchor_text)])
    (1, '<a href="/rel/1">one</a>',
     [(0, "/rel/1", False, "", "", "one")]),
    # uppercase tag+attr, single quotes, nested markup + whitespace mess
    (2, "<A HREF='https://www.BBC.co.uk:443/news'>\n <b>Top</b>  story\t</A>",
     [(0, "https://www.BBC.co.uk:443/news", True, "www.bbc.co.uk",
       "bbc.co.uk", "Top story")]),
    # two links incl. an anchor spanning lines; href-less <a name=> is
    # NOT an outlink and must not desync href/anchor pairing
    (3, '<a name="x">skip</a><a href="http://a.example/p">A\nB</a>'
        '<a class="z" href="ftp://f.example/q">f</a>',
     [(0, "http://a.example/p", True, "a.example", "a.example", "A B"),
      (1, "ftp://f.example/q", True, "f.example", "f.example", "f")]),
    (4, "<p>no links</p>", []),
]


def test_extract_links_handcrafted(spark):
    df = spark.createDataFrame(
        [(i, h.encode()) for i, h, _e in _HTML_CASES], ["doc_id", "html"])
    out = U.extract_links(df).orderBy("doc_id", "link_idx").collect()
    got = {}
    for r in out:
        got.setdefault(r.doc_id, []).append(
            (r.link_idx, r.href, r.is_abs, r.host, r.domain, r.anchor_text))
    for i, _h, exp in _HTML_CASES:
        assert got.get(i, []) == exp, f"doc {i}"


def test_extract_links_sql_parity():
    import duckdb
    con = duckdb.connect()
    con.execute("CREATE TABLE h (doc_id BIGINT, html VARCHAR)")
    for i, html, _e in _HTML_CASES:
        con.execute("INSERT INTO h VALUES (?, ?)", [i, html])
    # extract_links_sql returns "links AS (...), ..., outlinks AS (...)"
    sql = "WITH" + U.extract_links_sql("h") + \
          "\nSELECT doc_id, link_idx, href, is_abs, host, domain, anchor_text" \
          " FROM outlinks ORDER BY doc_id, link_idx"
    rows = con.sql(sql).fetchall()
    exp = [(i, *e) for i, _h, es in _HTML_CASES for e in es]
    assert rows == exp


def test_domain_blocked_subdomains(spark):
    urls = ["http://www.spam.co.uk/a", "http://x.y.ads.example/b",
            "https://ok.org/c", "https://notspam.co.uk/d",
            "http://casino7.com/e"]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    got = [r.b for r in
           df.select(U.domain_blocked(F.col("url")).alias("b")).collect()]
    assert got == [True, True, False, False, True]


def test_pack_pairs_fold_split_odd_truncate(spark):
    """Folded pairing at capacity 10: ranks desc = [9, 8, 7, 4, 2].
    Pair (9,2) fits (11 > 10? no — 11 > 10 → SPLITS); pair (8,4) fits
    (12 > 10 → splits too); middle 7 is a singleton.  Use lengths that
    exercise both outcomes and an over-capacity doc."""
    mk = lambda n: " ".join(["w"] * n)
    rows = [(1, mk(9)), (2, mk(8)), (3, mk(7)), (4, mk(4)), (5, mk(2)),
            (6, mk(13))]          # 13 > 10 -> clamps to 10, truncated
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in PK.pack_pairs(df, capacity=10).collect()}
    assert len(out) == 6
    # desc order: d6(10,trunc) d1(9) d2(8) d3(7) d5... wait lengths:
    # 10,9,8,7,4,2 -> ranks 1..6; folds (1,6)=(10,2) 12>10 split;
    # (2,5)=(9,4) 13>10 split; (3,4)=(8,7) 15>10 split
    assert out[6].truncated and out[6].n_eff == 10
    for d in (1, 2, 3, 4, 5, 6):
        assert out[d].n_in_bin == 1          # every fold overflows here
        assert out[d].bin_fill == out[d].n_eff
        assert out[d].bin_waste == 10 - out[d].n_eff
    # distinct bins for every doc when all pairs split
    assert len({out[d].bin_id for d in out}) == 6

    # now a corpus where folds FIT: lengths 6,5,3,2 at capacity 10 ->
    # (6,2)=8 fits, (5,3)=8 fits -> two bins of two
    rows2 = [(1, mk(6)), (2, mk(5)), (3, mk(3)), (4, mk(2))]
    out2 = PK.pack_pairs(spark.createDataFrame(rows2, ["doc_id", "text"]),
                         capacity=10).collect()
    bins = {}
    for r in out2:
        bins.setdefault(r.bin_id, []).append(r)
    assert len(bins) == 2
    for members in bins.values():
        assert len(members) == 2
        assert members[0].bin_fill == 8 and members[0].bin_waste == 2
        assert all(m.n_in_bin == 2 for m in members)

    # odd middle doc is a singleton: lengths 6,5,2 -> (6,2) fits, 5 alone
    rows3 = [(1, mk(6)), (2, mk(5)), (3, mk(2))]
    out3 = {r.doc_id: r for r in
            PK.pack_pairs(spark.createDataFrame(rows3, ["doc_id", "text"]),
                          capacity=10).collect()}
    assert out3[2].n_in_bin == 1 and out3[2].bin_fill == 5
    assert out3[1].n_in_bin == 2 and out3[1].bin_fill == 8
    assert out3[1].bin_id == out3[3].bin_id
