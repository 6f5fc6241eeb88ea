"""Property tests for the round-5 additions: priority sampling, KMV
distinct sketch, containment search, margin-based bitext mining."""

import pytest
from pyspark.sql import functions as F

from ai_log_analyzer_spark.functions import dedup as D
from ai_log_analyzer_spark.functions import sampling as SA
from ai_log_analyzer_spark.functions import similarity as S
from ai_log_analyzer_spark.functions import sketches as SK


# ---------------------------------------------------------------------------
# priority_sample
# ---------------------------------------------------------------------------

def _weighted_docs(spark, n=200, groups=4):
    rows = [(i, f"g{i % groups}", 1 + (i * 37) % 500) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, source string, n_chars long")


def test_priority_sample_k_and_estimator_bounds(spark):
    df = _weighted_docs(spark)
    out = SA.priority_sample(df, "source", "n_chars", k=8).toPandas()
    per = out.groupby("grp").size()
    assert (per == 8).all()                      # every group has > k rows here
    assert (out.est_weight >= out.weight).all()  # HT weight = max(w, tau) >= w
    assert (out.priority >= out.weight).all()    # q = w/u with u <= 1


def test_priority_sample_matches_naive_window(spark):
    df = _weighted_docs(spark, n=300, groups=3)
    got = SA.priority_sample(df, "source", "n_chars", k=5).toPandas()
    # naive reference: global sort by the same integer priority
    rows = df.toPandas()
    import hashlib
    def h32(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)
    rows["pri"] = [
        (w * (1 << 32)) // (h32(f"{i}|prio-v1") + 1)
        for i, w in zip(rows.doc_id, rows.n_chars)]
    want = (rows.sort_values(["source", "pri", "doc_id"],
                             ascending=[True, False, True])
            .groupby("source").head(5))
    got_set = set(zip(got.grp, got.id))
    want_set = set(zip(want.source, want.doc_id))
    assert got_set == want_set


def test_priority_sample_small_group_keeps_all_with_zero_tau(spark):
    df = spark.createDataFrame([(1, "g", 10), (2, "g", 20)],
                               "doc_id long, source string, n_chars long")
    out = SA.priority_sample(df, "source", "n_chars", k=8).toPandas()
    assert len(out) == 2
    # no (k+1)-th row -> tau = 0 -> estimator collapses to the raw weight
    assert (out.est_weight == out.weight).all()


# ---------------------------------------------------------------------------
# kmv_group_sketch
# ---------------------------------------------------------------------------

def test_kmv_estimate_tracks_exact_distinct(spark):
    # two groups with known distinct vocabularies of very different size
    rows = []
    for i in range(3000):
        rows.append((f"a", f"tok{i % 2000}"))
    for i in range(300):
        rows.append((f"b", f"tok{i % 120}"))
    df = (spark.createDataFrame(rows, "lang string, tok string")
          .groupBy("lang").agg(F.concat_ws(" ", F.collect_list("tok"))
                               .alias("text")))
    out = {r["grp"]: r.asDict()
           for r in SK.kmv_group_sketch(df, "lang").collect()}
    # group a: 2000 distinct -> ~125 survive the 1/16 filter >= k=64 -> KMV
    est_a = out["a"]["kmv_estimate"]
    assert 1200 <= est_a <= 3000
    # group b: 120 distinct -> ~7 survivors < k -> theta path n_below*16
    est_b = out["b"]["kmv_estimate"]
    assert out["b"]["n_below"] < 64
    assert est_b == out["b"]["n_below"] * SK.KMV_SHRINK
    assert 30 <= est_b <= 400


# ---------------------------------------------------------------------------
# containment_topk
# ---------------------------------------------------------------------------

def test_containment_finds_planted_subset(spark):
    base = " ".join(f"w{i}" for i in range(40))
    quote = " ".join(f"w{i}" for i in range(10, 22))   # strict substring
    other = " ".join(f"x{i}" for i in range(40))
    df = spark.createDataFrame(
        [(0, quote), (7, base), (9, other)], "doc_id long, text string")
    out = D.containment_topk(df, query_mod=50, k=3).toPandas()
    top = out[(out.query_id == 0) & (out.rnk == 1)].iloc[0]
    assert top.cand_id == 7 and top.containment == 1.0
    # asymmetry: the big doc is NOT contained in the quote
    assert not ((out.query_id == 0) & (out.cand_id == 9)).any() or \
        out[(out.query_id == 0) & (out.cand_id == 9)].containment.max() < 0.5


# ---------------------------------------------------------------------------
# margin_pairs
# ---------------------------------------------------------------------------

def _emb(spark, vecs):
    rows = [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")


def test_margin_pairs_mutual_and_threshold(spark):
    # even ids = A side, odd = B side; vec 0 and 1 are near-identical
    # while everything else is scattered -> (0, 1) must be mutual-best
    vecs = [
        [1.0, 0.0, 0.0, 0.0], [0.99, 0.01, 0.0, 0.0],
        [0.0, 1.0, 0.0, 0.0], [0.0, 0.9, 0.1, 0.0],
        [0.0, 0.0, 1.0, 0.0], [0.1, 0.0, 0.9, 0.0],
        [0.5, 0.5, 0.0, 0.0], [0.0, 0.5, 0.5, 0.0],
        [0.3, 0.3, 0.3, 0.1], [0.2, 0.0, 0.0, 0.8],
    ]
    out = S.margin_pairs(_emb(spark, vecs), k=2).toPandas()
    assert (out.margin_ppm >= S.MARGIN_PPM_MIN).all()
    row = out[out.src_id == 0]
    assert len(row) == 1 and row.iloc[0].dst_id == 1 and bool(row.iloc[0].mutual)


def test_margin_pairs_one_best_per_src(spark):
    vecs = [[float((i * j) % 7 - 3) for j in range(1, 5)] for i in range(12)]
    out = S.margin_pairs(_emb(spark, vecs), k=2, min_ppm=0).toPandas()
    assert out.src_id.is_unique


# ---------------------------------------------------------------------------
# phrase_search
# ---------------------------------------------------------------------------

def test_phrase_search_counts_and_order(spark):
    from ai_log_analyzer_spark.functions import search as SR
    df = spark.createDataFrame([
        (1, "red fox red fox red"),          # "red fox" twice
        (2, "red fox jumps"),                # once
        (3, "fox red"),                      # reversed -> no hit
        (4, "red and fox apart"),            # not adjacent -> no hit
    ], "doc_id long, text string")
    out = SR.phrase_search(df, "red fox", k=5).toPandas()
    assert list(out.doc_id) == [1, 2]
    assert list(out.n_hits) == [2, 1]


def test_phrase_search_absent_phrase_empty(spark):
    from ai_log_analyzer_spark.functions import search as SR
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    assert SR.phrase_search(df, "x y", k=5).count() == 0


# ---------------------------------------------------------------------------
# scd2_versions
# ---------------------------------------------------------------------------

def test_scd2_collapses_runs_and_flags_current(spark):
    import datetime as dt
    t = lambda s: dt.datetime(2024, 1, 1, 0, s)
    obs = spark.createDataFrame(
        [("p", t(0), "A"), ("p", t(1), "A"), ("p", t(2), "B"),
         ("p", t(3), "A"), ("q", t(0), "X")],
        "page_key string, snap_ts timestamp, fp string")
    from ai_log_analyzer_spark.functions import snapshots as SN
    out = (SN.scd2_versions(obs).toPandas()
           .sort_values(["page_key", "version_no"]).reset_index(drop=True))
    p = out[out.page_key == "p"]
    assert list(p.fp) == ["A", "B", "A"]          # A-run, B, A again (new row)
    assert list(p.n_obs) == [2, 1, 1]
    assert list(p.is_current) == [False, False, True]
    # valid_to chains to the next version's valid_from
    assert p.iloc[0].valid_to == p.iloc[1].valid_from
    q = out[out.page_key == "q"]
    assert len(q) == 1 and bool(q.iloc[0].is_current)


# ---------------------------------------------------------------------------
# stream interval join
# ---------------------------------------------------------------------------

def test_stream_interval_join_horizon_edges(spark, tmp_path):
    import datetime as dt
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # click by user 1 at t0
        (100, t0, 1, "click", 0.0, "{}"),
        (101, t0 + dt.timedelta(minutes=1), 1, "view", 0.0, "{}"),   # in
        (102, t0 + dt.timedelta(minutes=9), 1, "view", 0.0, "{}"),   # in
        (103, t0 + dt.timedelta(minutes=10), 1, "view", 0.0, "{}"),  # out: < bound
        (104, t0 - dt.timedelta(minutes=1), 1, "view", 0.0, "{}"),   # out: before
        (105, t0 + dt.timedelta(minutes=2), 2, "view", 0.0, "{}"),   # other user
        # click with no views at all
        (200, t0, 3, "click", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    path = str(tmp_path / "events.parquet")
    df.coalesce(1).write.parquet(path)
    from ai_log_analyzer_spark.streaming import stream_pipeline as SP
    out = SP.interval_join_counts_available_now(spark, path).toPandas()
    assert len(out) == 1
    assert out.iloc[0].click_id == 100 and out.iloc[0].n_views == 2
