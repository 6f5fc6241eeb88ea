"""Edge-semantics tests for the temporal joins (as-of, banded range),
the hypertable rollup, the count-min sketch, and integer PageRank.
Corpus-level Spark-vs-DuckDB parity lives in test_driver_contract.py;
these pin the boundary cases the sf corpus doesn't exercise."""

from datetime import datetime

from pyspark.sql import functions as F

from ai_log_analyzer_spark.functions import graph as G
from ai_log_analyzer_spark.functions import sketches as SK
from ai_log_analyzer_spark.functions import temporal as TP


def _ts(s):
    return datetime.fromisoformat(s)


def _events(spark, rows):
    return spark.createDataFrame(rows, ["event_id", "user_id", "ts", "value"])


def test_asof_join_semantics(spark):
    left = _events(spark, [
        (1, 10, _ts("2024-01-01 10:00:00"), 0.0),   # before any right → NULL
        (2, 10, _ts("2024-01-01 12:00:00"), 0.0),   # exactly at right ts → tie included
        (3, 10, _ts("2024-01-01 13:00:00"), 0.0),   # later → latest right
        (4, 99, _ts("2024-01-01 13:00:00"), 0.0),   # key with no right rows
    ]).select("event_id", "user_id", "ts")
    right = _events(spark, [
        (101, 10, _ts("2024-01-01 12:00:00"), 1.5),
        (102, 10, _ts("2024-01-01 12:00:00"), 2.5),  # same ts: larger id wins
        (103, 10, _ts("2024-01-01 12:30:00"), 3.5),
    ])
    out = {r.event_id: r for r in
           TP.asof_join(left, right, key="user_id", ts="ts",
                        value_cols=["event_id", "value"],
                        tie_col="event_id").collect()}
    assert out[1].asof_event_id is None and out[1].asof_value is None
    assert out[2].asof_event_id == 102 and out[2].asof_value == 2.5
    assert out[3].asof_event_id == 103 and out[3].asof_value == 3.5
    assert out[4].asof_event_id is None


def test_range_join_count_boundaries(spark):
    left = _events(spark, [
        (1, 10, _ts("2024-01-01 10:00:00"), 0.0),
    ]).select("event_id", "user_id", "ts")
    right = _events(spark, [
        (0, 10, _ts("2024-01-01 10:00:00"), 0.0),   # == l.ts → excluded
        (0, 10, _ts("2024-01-01 10:05:00"), 0.0),   # inside
        (0, 10, _ts("2024-01-01 10:10:00"), 0.0),   # == l.ts+600s → included
        (0, 10, _ts("2024-01-01 10:10:01"), 0.0),   # past → excluded
        (0, 11, _ts("2024-01-01 10:05:00"), 0.0),   # other key → excluded
    ]).select("user_id", "ts")
    out = TP.range_join_count(left, right, key="user_id", ts="ts",
                              span_s=600, left_id="event_id").collect()
    assert len(out) == 1 and out[0].n_in_range == 2


def test_hypertable_rollup_day_sums_hours(spark):
    ev = spark.createDataFrame([
        ("a", _ts("2024-01-01 10:15:00"), 1.25),
        ("a", _ts("2024-01-01 10:45:00"), 2.25),
        ("a", _ts("2024-01-01 11:05:00"), 4.0),
        ("b", _ts("2024-01-02 00:00:00"), 8.0),
    ], ["event_type", "ts", "value"])
    vm = F.round(F.col("value") * 1000).cast("long")
    rows = TP.hypertable_rollup(ev, "ts", "event_type", vm).collect()
    day = {(r.grp, str(r.day)): r for r in rows if r.grain == "day"}
    hour = [r for r in rows if r.grain == "hour"]
    assert day[("a", "2024-01-01 00:00:00")].n_events == 3
    assert day[("a", "2024-01-01 00:00:00")].sum_value == 7.5
    assert all(r.hour is None for r in rows if r.grain == "day")
    a_hours = sorted(r.sum_value for r in hour if r.grp == "a")
    assert a_hours == [3.5, 4.0]
    # day level = exact sum of its hour levels (integer milli accumulate)
    assert sum(a_hours) == day[("a", "2024-01-01 00:00:00")].sum_value


def test_cms_never_underestimates(spark):
    docs = spark.createDataFrame(
        [(i, f"tok{i % 7} common common") for i in range(50)],
        ["doc_id", "text"])
    sketch = SK.cms_sketch(docs)
    toks = SK._tokens(docs, "text")
    exact = toks.groupBy("tok").agg(F.count("*").alias("exact"))
    est = SK.cms_estimate(exact.select("tok"), sketch)
    joined = est.join(exact, "tok").collect()
    assert len(joined) == 8  # 7 tokN + common
    for r in joined:
        assert r.est >= r.exact, r
    common = next(r for r in joined if r.tok == "common")
    assert common.exact == 100


def test_pagerank_two_node_cycle_and_chain(spark):
    # symmetric 2-cycle: ranks stay equal and at the fixpoint value PPB
    cyc = spark.createDataFrame([(1, 2), (2, 1)], ["src", "dst"])
    r = {x.node: x.rank_ppb for x in G.pagerank(cyc, iters=3).collect()}
    assert r[1] == r[2]
    # chain a->b: replicate the integer recurrence in plain python
    chain = spark.createDataFrame([(1, 2)], ["src", "dst"])
    got = {x.node: x.rank_ppb for x in G.pagerank(chain, iters=2).collect()}
    floor_ppb = (G.PPB * (G.DAMP_DEN - G.DAMP_NUM)) // G.DAMP_DEN
    ra, rb = G.PPB, G.PPB
    for _ in range(2):
        ra, rb = floor_ppb, floor_ppb + (G.DAMP_NUM * (ra // 1)) // G.DAMP_DEN
    assert got[1] == ra and got[2] == rb


def test_hll_estimate_accuracy(spark):
    # 5000 distinct tokens → well past linear-counting, exercises the
    # raw harmonic path; HLL with m=1024 has ~3.25% std error
    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(i * 10, i * 10 + 10)))
         for i in range(500)], ["doc_id", "text"])
    from ai_log_analyzer_spark.functions import sketches as SK2
    est = SK2.hll_estimate(SK2.hll_registers(docs)).collect()[0]
    assert est.n_buckets_set + est.n_zero == SK2.HLL_M
    assert abs(est.hll_estimate - 5000) / 5000 < 0.15
    # registers are mergeable: max of two half-corpus register tables
    # must equal the full-corpus registers
    h1 = SK2.hll_registers(docs.filter("doc_id < 250"))
    h2 = SK2.hll_registers(docs.filter("doc_id >= 250"))
    merged = (h1.unionAll(h2).groupBy("bucket")
              .agg(F.max("m").alias("m")))
    full = {r.bucket: r.m for r in SK2.hll_registers(docs).collect()}
    assert {r.bucket: r.m for r in merged.collect()} == full


def test_bpe_encode_counts(spark):
    from ai_log_analyzer_spark.functions import text as TX
    docs = spark.createDataFrame([
        (1, "the"),        # t h e → th e → 2 tokens
        (2, "er"),         # e r → er → 1 token
        (3, "xyz"),        # no merges → 3
        (4, ""),           # empty → 0/0
        (5, "anthem"),     # a n t h e m → an th e m → 4
    ], ["doc_id", "text"])
    out = {r.doc_id: r for r in TX.bpe_encode_counts(docs).collect()}
    assert (out[1].n_words, out[1].n_bpe_tokens) == (1, 2)
    assert (out[2].n_words, out[2].n_bpe_tokens) == (1, 1)
    assert (out[3].n_words, out[3].n_bpe_tokens) == (1, 3)
    assert (out[4].n_words, out[4].n_bpe_tokens) == (0, 0)
    assert (out[5].n_words, out[5].n_bpe_tokens) == (1, 4)


def test_redirect_resolution_chain_cycle_and_cap(spark):
    from ai_log_analyzer_spark.functions import graph as G
    # chain a0->a1->...->a17 (17 hops from a0: OVER the 16-hop cap),
    # a 2-cycle, a dup-src (min(dst) wins), and a self-redirect (drops)
    edges = ([(f"a{i}", f"a{i + 1}") for i in range(17)]
             + [("c1", "c2"), ("c2", "c1"),
                ("d", "zz"), ("d", "aa"), ("s", "s")])
    df = spark.createDataFrame(edges, ["src_url", "dst_url"])
    out = {r.src_url: r for r in G.resolve_redirects(df).collect()}
    assert "s" not in out                       # self-redirect dropped
    assert out["d"].final_url == "aa" and out["d"].n_hops == 1  # min(dst)
    # a1 is 16 hops from the terminal a17 -> resolves exactly at cap
    assert out["a1"].resolved and out["a1"].n_hops == 16
    assert out["a1"].final_url == "a17"
    # a0 is 17 hops -> unresolved, NULL final/hops
    assert not out["a0"].resolved
    assert out["a0"].final_url is None and out["a0"].n_hops is None
    # cycle members never resolve
    assert not out["c1"].resolved and not out["c2"].resolved
    # mid-chain hop counts are exact path lengths
    assert out["a10"].n_hops == 7 and out["a10"].final_url == "a17"


def test_link_reciprocity_hand_graph(spark):
    from ai_log_analyzer_spark.functions import graph as G
    # a<->b reciprocal; a->c one-way (c has NO outlinks); b->b self (drops)
    edges = [("a", "b"), ("a", "b"), ("b", "a"), ("a", "c"), ("b", "b")]
    df = spark.createDataFrame(edges, ["src_domain", "dst_domain"])
    out = {r.domain: r for r in G.link_reciprocity(df).collect()}
    assert set(out) == {"a", "b"}               # c never links out
    a = out["a"]
    assert (a.n_out_domains, a.n_reciprocal, a.n_links) == (2, 1, 3)
    assert a.reciprocity_ppm == 1 * 1_000_000 // 2
    b = out["b"]
    assert (b.n_out_domains, b.n_reciprocal, b.n_links) == (1, 1, 1)
    assert b.reciprocity_ppm == 1_000_000
