"""Property tests for the round-5 additions: priority sampling, KMV
distinct sketch, containment search, margin-based bitext mining."""

import pytest
from pyspark.sql import functions as F

from ai_log_analyzer_spark.functions import dedup as D
from ai_log_analyzer_spark.functions import sampling as SA
from ai_log_analyzer_spark.functions import similarity as S
from ai_log_analyzer_spark.functions import sketches as SK
from ai_log_analyzer_spark.functions import ranking as RKF
from ai_log_analyzer_spark.functions import text as TX


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


# ---------------------------------------------------------------------------
# Kendall tau / RRF / Gini / Flesch (ranking + dataset-card ops)
# ---------------------------------------------------------------------------

def test_kendall_tau_extremes(spark):
    """Pairs with both signals moving together give tau=+1 (shifted
    2e6); the sample modulus of 1 keeps every doc."""
    from ai_log_analyzer_spark.functions import ranking as RK
    # craft docs whose classifier score and stopword rate are both
    # monotone in doc_id: more stopwords = higher b; a is whatever the
    # frozen hash gives, so instead assert the identity case: the two
    # signals COMPARED TO THEMSELVES are perfectly concordant.
    rows = [(i, ("the of to and in " * (i + 1)).strip()) for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = RK.kendall_tau_signals(df, sample_mod=1).collect()[0]
    assert out.n_docs == 6
    assert out.n_pairs == 15
    assert out.concordant + out.discordant + out.tied == out.n_pairs
    # all-stopword docs: b is 1e6 for every doc -> db=0 -> all tied
    assert out.tied == out.n_pairs
    assert out.tau_shifted_ppm == 1_000_000      # tau = 0


def test_rrf_fusion_integer_scores(spark):
    from ai_log_analyzer_spark.functions import ranking as RK
    rows = [(i, f"window stream anomaly doc{i} filler") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = RK.rrf_fusion(df, ["window", "stream"], top_k=5).toPandas()
    assert len(out) == 5
    assert list(out.fused_rank) == [1, 2, 3, 4, 5]
    # a doc in both pools scores the sum of the two reciprocal terms
    both = out[(out.rank_bm25 > 0) & (out.rank_quality > 0)]
    for _, r in both.iterrows():
        assert r.rrf_micro == (1_000_000 // (60 + r.rank_bm25)
                               + 1_000_000 // (60 + r.rank_quality))


def test_domain_gini_uniform_and_skewed(spark):
    from ai_log_analyzer_spark.functions import sampling as SA
    uni = spark.createDataFrame([(i, f"s{i % 4}") for i in range(40)],
                                "doc_id long, source string")
    g = SA.domain_gini(uni, "source").collect()[0]
    assert g.n_groups == 4 and g.n_docs == 40
    assert g.gini_ppm == 0                      # equal shares
    assert g.top_share_ppm == 250_000
    skew = spark.createDataFrame(
        [(i, "big" if i < 37 else f"s{i}") for i in range(40)],
        "doc_id long, source string")
    g2 = SA.domain_gini(skew, "source").collect()[0]
    assert g2.n_groups == 4
    assert g2.gini_ppm > 600_000                # heavy concentration
    assert g2.top_share_ppm == 925_000


def test_flesch_hand_computed(spark):
    from ai_log_analyzer_spark.functions import text as TX
    # "the cat sat. it ran!" -> W=5, S=2, syllables: the(1) cat(1)
    # sat.(1) it(1) ran!(1) = 5
    df = spark.createDataFrame([(1, "the cat sat. it ran!")],
                               "doc_id long, text string")
    out = TX.flesch_reading_ease(df).collect()[0]
    assert (out.n_words, out.n_sents, out.n_syll) == (5, 2, 5)
    expected = 206835000 - (1015000 * 5) // 2 - (84600000 * 5) // 5
    assert out.fre_micro == expected
    assert out.fre_band == 5                     # very easy (>= 90)
    # vowelless "words" still count one syllable
    df2 = spark.createDataFrame([(2, "hmm pfft 123")],
                                "doc_id long, text string")
    out2 = TX.flesch_reading_ease(df2).collect()[0]
    assert out2.n_syll == 3 and out2.n_sents == 1


# ---------------------------------------------------------------------------
# lsh_audit
# ---------------------------------------------------------------------------

def test_lsh_audit_identities_and_bounds(spark):
    # near-dup pairs (shared long prefix) + unrelated docs
    rows = []
    for i in range(20):
        body = " ".join(f"w{i}x{j}" for j in range(12))
        rows.append((2 * i, body + " tail alpha"))
        rows.append((2 * i + 1, body + " tail beta"))
    for i in range(40, 60):
        rows.append((i, " ".join(f"solo{i}y{j}" for j in range(12))))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = D.lsh_audit(df, threshold=0.5).collect()[0]
    assert out.true_pos + out.false_pos == out.n_candidates
    assert out.true_pos + out.false_neg == out.n_truth
    assert 0 <= out.precision_ppm <= 1_000_000
    assert 0 <= out.recall_ppm <= 1_000_000
    assert out.n_truth > 0           # the engineered near-dups are real
    assert out.recall_ppm > 500_000  # 4x2 banding recalls most j>=0.5 pairs


def test_lsh_audit_verified_pairs_subset_of_candidates(spark):
    rows = [(i, " ".join(f"t{i // 2}z{j}" for j in range(10))) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    audit = D.lsh_audit(df).collect()[0]
    verified = D.minhash_lsh_pairs(df, threshold=0.5).count()
    # verified output = candidates that passed exact Jaccard -> <= TP
    assert verified <= audit.true_pos


# ---------------------------------------------------------------------------
# cdc_chunk_stats
# ---------------------------------------------------------------------------

def test_cdc_duplicate_passage_detected_despite_shift(spark):
    passage = " ".join(f"p{j}" for j in range(40))
    df = spark.createDataFrame(
        [(1, passage),
         (2, "completely different preamble here then " + passage)],
        "doc_id long, text string")
    out = D.cdc_chunk_stats(df).collect()[0]
    # content-defined boundaries realign after the shift -> shared chunks
    assert out.dup_chunks > 0
    assert out.dup_chars > 0
    assert out.total_chunks == out.distinct_chunks + out.dup_chunks


def test_cdc_unique_corpus_has_no_dups_and_short_docs_are_one_chunk(spark):
    df = spark.createDataFrame(
        [(i, " ".join(f"u{i}q{j}" for j in range(3))) for i in range(10)],
        "doc_id long, text string")
    out = D.cdc_chunk_stats(df, w=4).collect()[0]
    assert out.total_chunks == 10        # 3 tokens < w -> whole-doc chunk
    assert out.dup_chunks == 0
    assert out.dup_char_ppm == 0


def test_cdc_chunks_partition_the_text(spark):
    text = " ".join(f"c{j % 7}k{j % 11}" for j in range(200))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = D.cdc_chunk_stats(df).collect()[0]
    # chars in chunks = chars in text minus the boundary spaces
    n_spaces = out.total_chunks - 1
    assert out.total_chars == len(text) - n_spaces


# ---------------------------------------------------------------------------
# cohens_kappa_gates
# ---------------------------------------------------------------------------

def test_kappa_cells_sum_and_range(spark):
    rows = [(i, ("the of to and in " * (i % 3 + 1)
                 + f"rare{i} words here")) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = RKF.cohens_kappa_gates(df).collect()[0]
    assert (out.n_both_pos + out.n_a_only + out.n_b_only
            + out.n_both_neg == out.n_docs)
    assert 0 <= out.kappa_shifted_ppm <= 2_000_000


def test_kappa_perfect_agreement_is_2e6(spark):
    # identical gates: compare the stopword gate against itself by
    # constructing docs where the classifier gate == stopword gate
    # can't be forced directly; instead verify the formula on a corpus
    # where both gates give all-positive -> kappa undefined -> den=0
    # guard yields shifted 2e6 via ((0+0)+...)/... -- just assert range
    rows = [(i, "the of to and in the of to and in") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = RKF.cohens_kappa_gates(df).collect()[0]
    # all docs identical -> every doc lands in the same cell
    assert out.n_docs == 10
    assert max(out.n_both_pos, out.n_a_only,
               out.n_b_only, out.n_both_neg) == 10


# ---------------------------------------------------------------------------
# watermark_screen
# ---------------------------------------------------------------------------

def test_watermark_green_construction_flags(spark):
    import hashlib

    def h32(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    # build a 100%-green doc: greedily pick each next token so the
    # bigram hash is even (exactly what a watermarking sampler does)
    toks = ["seed"]
    pool = [f"v{k}" for k in range(200)]
    for _ in range(30):
        nxt = next(p for p in pool if h32(f"{toks[-1]}|{p}") % 2 == 0)
        toks.append(nxt)
    wm_text = " ".join(toks)
    df = spark.createDataFrame(
        [(1, wm_text), (2, "short"), (3, " ".join(f"h{j}" for j in range(31)))],
        "doc_id long, text string")
    out = {r.doc_id: r for r in TX.watermark_screen(df).collect()}
    assert out[1].n_green == out[1].n_scored == 30
    assert out[1].wm_flagged                      # z = sqrt(30) > 4
    assert out[2].n_scored == 0 and not out[2].wm_flagged
    assert not out[3].wm_flagged                  # ~gamma*T greens


def test_watermark_green_ppm_bounds(spark):
    df = spark.createDataFrame(
        [(i, " ".join(f"a{i}b{j}" for j in range(20))) for i in range(50)],
        "doc_id long, text string")
    pdf = TX.watermark_screen(df).toPandas()
    assert (pdf.green_ppm >= 0).all() and (pdf.green_ppm <= 1_000_000).all()
    assert (pdf.n_scored == 19).all()


# ---------------------------------------------------------------------------
# distinct_n_diversity
# ---------------------------------------------------------------------------

def test_distinct_n_template_farm_vs_diverse(spark):
    rows = ([(i, "farm", "buy now cheap deals buy now cheap deals")
             for i in range(50)]
            + [(i + 100, "wiki", " ".join(f"u{i}w{j}" for j in range(8)))
               for i in range(50)])
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r.source: r for r in TX.distinct_n_diversity(df).collect()}
    assert out["farm"].distinct1_ppm < out["wiki"].distinct1_ppm
    assert out["farm"].distinct2_ppm < out["wiki"].distinct2_ppm
    assert out["wiki"].distinct1_ppm == 1_000_000   # all tokens unique
    assert out["farm"].n_tokens == 400
    assert out["farm"].distinct_tokens == 4


# ---------------------------------------------------------------------------
# char_ic_stats (index of coincidence)
# ---------------------------------------------------------------------------

def _ic_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_char_ic_hand_computed(spark):
    out = {r.doc_id: r for r in TX.char_ic_stats(_ic_docs(spark, [
        (1, "aaaa"),            # IC = 4*3/(4*3) = 1
        (2, "abcd"),            # all singletons -> 0
        (3, "a a B-b!"),        # cs = "aabb": 4/12
    ])).collect()}
    assert out[1].ic_ppm == 1_000_000 and out[1].distinct_alnum == 1
    assert out[2].ic_ppm == 0 and out[2].distinct_alnum == 4
    assert out[3].n_alnum == 4 and out[3].ic_ppm == 333_333
    assert out[3].top_char_ppm == 500_000


def test_char_ic_gibberish_flags(spark):
    uniform = " ".join("abcdefghijklmnopqrstuvwxyz0123456789")  # 36 singles
    spam = "z" * 50
    english = "the quick brown fox jumps over the lazy dog " * 3
    out = {r.doc_id: r for r in TX.char_ic_stats(_ic_docs(spark, [
        (1, uniform), (2, spam), (3, english), (4, "short")])).collect()}
    assert out[1].gibberish            # IC 0 < 35k fence, n=36 >= 20
    assert out[2].gibberish            # IC 1e6 > 250k fence
    assert not out[3].gibberish        # english inside the band
    assert not out[4].gibberish        # below IC_MIN_CHARS


# ---------------------------------------------------------------------------
# simhash_hamming_pairs
# ---------------------------------------------------------------------------

def test_simhash_hamming_matches_bruteforce(spark):
    # deterministic corpus with planted near-identical docs
    base = ["alpha beta gamma delta epsilon zeta eta theta",
            "one two three four five six seven eight nine ten"]
    rows = []
    for i in range(60):
        words = (base[i % 2] + f" tail{i % 7} mid{i % 5}").split()
        rows.append((i, " ".join(words)))
    docs = _ic_docs(spark, rows)
    got = {(r.doc_a, r.doc_b, r.hamming)
           for r in D.simhash_hamming_pairs(docs, d=3, bands=4).collect()}
    sigs = {r.doc_id: r.simhash for r in D.simhash(docs).collect()}
    want = set()
    ids = sorted(sigs)
    for i in ids:
        for j in ids:
            if i < j:
                h = bin(sigs[i] ^ sigs[j]).count("1")
                if h <= 3:
                    want.add((i, j, h))
    assert got == want and want     # pigeonhole complete AND non-trivial


def test_simhash_hamming_identical_docs_distance_zero(spark):
    docs = _ic_docs(spark, [(1, "same text here"), (2, "same text here"),
                            (3, "totally different words entirely")])
    got = {(r.doc_a, r.doc_b): r.hamming
           for r in D.simhash_hamming_pairs(docs).collect()}
    assert got[(1, 2)] == 0


# ---------------------------------------------------------------------------
# source_ruzicka
# ---------------------------------------------------------------------------

def test_ruzicka_identical_disjoint_and_hand(spark):
    docs = spark.createDataFrame([
        (1, "a", "x y x"), (2, "b", "x y x"),          # identical dists
        (3, "c", "p q"),                               # disjoint from a/b
        (4, "d", "x x x y z"),                         # partial vs a
    ], "doc_id long, source string, text string")
    out = {(r.source_a, r.source_b): r
           for r in D.source_ruzicka(docs).collect()}
    assert len(out) == 6                               # full 4C2 matrix
    assert out[("a", "b")].ruzicka_ppm == 1_000_000
    assert out[("a", "c")].inter_min == 0
    assert out[("a", "c")].ruzicka_ppm == 0
    # a={x:2,y:1} d={x:3,y:1,z:1}: min 2+1=3, max = 3+5-3 = 5
    r = out[("a", "d")]
    assert (r.t_a, r.t_b, r.inter_min) == (3, 5, 3)
    assert r.ruzicka_ppm == 600_000


def test_ruzicka_symmetric_in_content_not_order(spark):
    # permuting tokens inside docs must not change the distribution sim
    d1 = spark.createDataFrame([(1, "a", "u v w"), (2, "b", "w v u")],
                               "doc_id long, source string, text string")
    out = D.source_ruzicka(d1).collect()
    assert len(out) == 1 and out[0].ruzicka_ppm == 1_000_000


# ---------------------------------------------------------------------------
# heaps_law_fit / doc_entropy / source_js_divergence
# ---------------------------------------------------------------------------

def test_heaps_template_farm_beta_below_natural(spark):
    # natural-ish corpus: every doc contributes fresh types
    nat = spark.createDataFrame(
        [(i, " ".join(f"w{i}_{j}" for j in range(20))) for i in range(100)],
        "doc_id long, text string")
    # template farm: one shared 20-word vocabulary repeated everywhere
    farm = spark.createDataFrame(
        [(i, " ".join(f"t{j}" for j in range(20))) for i in range(100)],
        "doc_id long, text string")
    b_nat = TX.heaps_law_fit(nat).toPandas().heaps_beta[0]
    b_farm = TX.heaps_law_fit(farm).toPandas().heaps_beta[0]
    assert b_nat > 0.9          # fully novel vocab: types ~ tokens
    assert b_farm < 0.2         # frozen vocab: flat growth
    assert b_nat > b_farm + 0.5


def test_heaps_counts_exact_at_final_checkpoint(spark):
    df = spark.createDataFrame(
        [(0, "a b c"), (1, "a b d"), (2, "e e e")],
        "doc_id long, text string")
    row = TX.heaps_law_fit(df, k=3).toPandas().iloc[0]
    assert row.n_tokens == 9
    assert row.n_types == 5
    assert row.n_ckpt == 3


def test_doc_entropy_hand_computed(spark):
    import math
    df = spark.createDataFrame(
        [(0, "a a b b"),          # uniform over 2 types -> ln 2, evenness 1
         (1, "a a a a"),          # single type -> 0, norm 0
         (2, "a b c d")],         # uniform over 4 -> ln 4, evenness 1
        "doc_id long, text string")
    out = TX.doc_entropy(df).toPandas().set_index("doc_id")
    assert abs(out.loc[0].entropy_nats - math.log(2)) < 1e-6
    assert out.loc[1].entropy_nats == 0.0
    assert out.loc[1].entropy_norm == 0.0
    assert abs(out.loc[2].entropy_nats - math.log(4)) < 1e-6
    assert abs(out.loc[0].entropy_norm - 1.0) < 1e-6
    assert abs(out.loc[2].entropy_norm - 1.0) < 1e-6


def test_js_identical_sources_zero_disjoint_ln2(spark):
    import math
    df = spark.createDataFrame(
        [("a", "x y z"), ("b", "x y z"),      # identical distributions
         ("c", "p q r")],                      # disjoint from both
        "source string, text string")
    out = TX.source_js_divergence(df).toPandas()
    pairs = {(r.source_a, r.source_b): r for _, r in out.iterrows()}
    assert pairs[("a", "b")].js_nats == 0.0
    assert pairs[("a", "b")].js_norm_ppm == 0
    # fully disjoint pairs share no types -> no inner-join row; the pair
    # is absent from the output and the implied JS is exactly ln 2
    assert ("a", "c") not in pairs and ("b", "c") not in pairs


def test_js_symmetric_and_bounded(spark):
    df = spark.createDataFrame(
        [("a", "x x y"), ("b", "x y y z"), ("c", "x z z")],
        "source string, text string")
    out = TX.source_js_divergence(df).toPandas()
    assert (out.js_nats >= 0).all()
    assert (out.js_nats <= 0.6931472).all()
    assert (out.js_norm_ppm <= 1_000_000).all()
    # pair keys are canonical (a < b): swapping input row order can't
    # change the matrix
    df2 = spark.createDataFrame(
        [("c", "x z z"), ("a", "x x y"), ("b", "x y y z")],
        "source string, text string")
    out2 = TX.source_js_divergence(df2).toPandas()
    a = out.sort_values(["source_a", "source_b"]).reset_index(drop=True)
    b = out2.sort_values(["source_a", "source_b"]).reset_index(drop=True)
    assert a.equals(b)


# ---------------------------------------------------------------------------
# soft404 / slug coherence / freshness / shard checksums
# ---------------------------------------------------------------------------

def test_soft404_short_error_flagged_long_mention_not(spark):
    from ai_log_analyzer_spark.functions import crawlfunnel as CFX
    long_doc = "error 404 " + " ".join(f"w{i}" for i in range(100))
    df = spark.createDataFrame(
        [("h1", "Page Not Found"),            # marker + short -> soft404
         ("h1", long_doc),                    # marker, long   -> not
         ("h1", "a perfectly fine page"),     # short, no marker -> not
         ("h2", "This page does NOT exist")],  # case-insensitive marker
        "host string, text string")
    out = CFX.soft404_stats(df).toPandas().set_index("host")
    assert out.loc["h1"].n_soft404 == 1
    assert out.loc["h1"].n_marker == 2
    assert out.loc["h1"].soft404_ppm == 333333
    assert out.loc["h2"].n_soft404 == 1


def test_slug_coherence_honest_vs_spam(spark):
    from ai_log_analyzer_spark.functions import urls as UX
    df = spark.createDataFrame(
        [(0, "https://a.org/posts/green-tea-health", "green tea health facts"),
         (1, "https://a.org/buy/casino-loans", "green tea health facts"),
         (2, "https://a.org/", "anything at all"),
         (3, "https://a.org/posts/Tea_GREEN.tea", "green tea")],
        "doc_id long, url string, text string")
    out = UX.slug_text_coherence(df).toPandas().set_index("doc_id")
    assert out.loc[0].coherence_ppm == 1_000_000
    assert out.loc[1].coherence_ppm == 0
    assert out.loc[2].n_slug_tokens == 0 and out.loc[2].coherence_ppm == 0
    # -_. all split; dedup means {tea, green} -> both matched
    assert out.loc[3].n_slug_tokens == 2
    assert out.loc[3].coherence_ppm == 1_000_000


def test_freshness_halving_and_cap(spark):
    from ai_log_analyzer_spark.functions import temporal as TPX
    from datetime import datetime, timezone
    base = 1_700_000_000

    def ts(s):
        return datetime.fromtimestamp(base + s, tz=timezone.utc)
    df = spark.createDataFrame(
        [("h", ts(300)),     # newest: age 0    -> 1e6
         ("h", ts(200)),     # age 100 = 1 hl   -> 500000
         ("h", ts(0)),       # age 300 = 3 hl   -> 125000
         ("old", ts(-100_000))],  # 1000 halvings -> capped shift, 0 ppm
        "host string, warc_ts timestamp")
    out = TPX.freshness_scores(df, halflife_s=100).toPandas() \
        .set_index("host")
    assert out.loc["h"].mean_fresh_ppm == (1_000_000 + 500_000 + 125_000) // 3
    assert out.loc["h"].min_age_s == 0 and out.loc["h"].max_age_s == 300
    assert out.loc["old"].mean_fresh_ppm == 0


def test_shard_checksums_order_and_partitioning_invariant(spark):
    from ai_log_analyzer_spark.functions import sampling as SAX
    rows = [(i, f"doc body {i % 37}") for i in range(200)]
    a = spark.createDataFrame(rows, "doc_id long, text string")
    b = (spark.createDataFrame(list(reversed(rows)),
                               "doc_id long, text string")
         .repartition(17))
    ma = SAX.shard_checksums(a).toPandas().sort_values("shard") \
        .reset_index(drop=True)
    mb = SAX.shard_checksums(b).toPandas().sort_values("shard") \
        .reset_index(drop=True)
    assert ma.equals(mb)
    assert ma.n_docs.sum() == 200
    # a single flipped byte must change the manifest
    c = spark.createDataFrame(
        [(i, f"doc body {i % 37}" if i != 150 else "doc bodY 2")
         for i in range(200)], "doc_id long, text string")
    mc = SAX.shard_checksums(c).toPandas().sort_values("shard") \
        .reset_index(drop=True)
    assert not ma.content_xor.equals(mc.content_xor) \
        or not ma.content_sum.equals(mc.content_sum)


# ---------------------------------------------------------------------------
# chi2 source keywords / lang mixing / percentile gate
# ---------------------------------------------------------------------------

def test_chi2_overused_word_ranks_first(spark):
    # source A hammers 'casino'; shared filler is evenly distributed
    filler = " ".join("common word stream here" for _ in range(3))
    df = spark.createDataFrame(
        [("A", ("casino " * 10) + filler),
         ("B", filler), ("C", filler)],
        "source string, text string")
    out = TX.source_keywords_chi2(df, min_count=5).toPandas()
    a1 = out[(out.source == "A") & (out["rank"] == 1)].iloc[0]
    assert a1.word == "casino" and a1.obs == 10
    # evenly-spread filler is never overrepresented enough to beat it
    assert not ((out.source == "A") & (out.word != "casino")
                & (out.chi2 > a1.chi2)).any()


def test_lang_mixing_code_switched_doc(spark):
    en = "the cat and the dog of the house"
    fr = "le chat et la maison est grande les arbres"
    df = spark.createDataFrame(
        [(0, f"{en}. {en}. {fr}."),       # 2 en + 1 fr -> mixing 1/3
         (1, f"{en}. {en}."),             # pure en -> 0
         (2, "xqz 123. zzz 9.")],          # no markers -> und, 0 segs decided
        "doc_id long, text string")
    out = TX.lang_mixing_stats(df).toPandas().set_index("doc_id")
    assert out.loc[0].major_lang == "en"
    assert out.loc[0].mixing_ppm == 333333
    assert out.loc[1].mixing_ppm == 0 and out.loc[1].major_lang == "en"
    assert out.loc[2].major_lang == "und" and out.loc[2].n_lang_segs == 0


def test_percentile_gate_matches_naive_and_handles_ties(spark):
    from ai_log_analyzer_spark.functions import sampling as SAX
    rows = [(i, f"g{i % 3}", (i * 7919) % 50) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, grp string, score_m long")
    got = SAX.percentile_gate(df, "grp", "score_m", "doc_id",
                              keep_pct=20, bucket_w=4).toPandas()
    pdf = df.toPandas()
    pdf["rn"] = (pdf.sort_values(["score_m", "doc_id"],
                                 ascending=[False, True])
                 .groupby("grp").cumcount() + 1)
    n_g = pdf.groupby("grp").grp.transform("size")
    pdf["keep"] = pdf.rn <= (n_g * 20) // 100
    want = set(pdf[pdf.keep].doc_id)
    assert set(got[got.keep].doc_id) == want
    assert got.keep.sum() == 60  # 100 per group * 20%


def test_percentile_gate_constant_scores_and_tiny_group(spark):
    from ai_log_analyzer_spark.functions import sampling as SAX
    df = spark.createDataFrame(
        [(i, "c", 7) for i in range(10)] + [(100, "tiny", 99)],
        "doc_id long, grp string, score_m long")
    out = SAX.percentile_gate(df, "grp", "score_m", "doc_id",
                              keep_pct=20).toPandas()
    c = out[out.grp == "c"]
    # all scores equal -> lowest doc_ids kept, exactly floor(10*0.2)=2
    assert sorted(c[c.keep].doc_id) == [0, 1]
    # group smaller than 1/keep_pct keeps nothing (integer floor)
    assert not out[out.grp == "tiny"].keep.any()


# ---------------------------------------------------------------------------
# lang claim agreement / shrunk means / split leakage
# ---------------------------------------------------------------------------

def test_lang_claim_agreement_cells(spark):
    from ai_log_analyzer_spark.functions import htmlmeta as HMX
    def page(lang_attr, body):
        return bytearray(f'<html{lang_attr}><head></head><body>{body}'
                         f'</body></html>', 'utf-8')
    en = "the cat and the dog of the town"
    fr = "le chat et la maison est grande"
    df = spark.createDataFrame(
        [(page(' lang="en-US"', en), en),     # claim en, detect en: agree
         (page(' lang="en"', fr), fr),        # claim en, detect fr: mismatch
         (page("", en), en),                  # no claim
         (page(' lang="de"', "xqz 123"), "xqz 123")],  # claim de, und
        "html binary, text string")
    out = HMX.lang_claim_agreement(df).toPandas()
    cells = {(r.claimed, r.detected): (r.n_pages, r.agree)
             for _, r in out.iterrows()}
    assert cells[("en", "en")] == (1, True)
    assert cells[("en", "fr")] == (1, False)
    assert cells[("", "en")][1] == False
    assert cells[("de", "und")][1] == False


def test_shrunk_means_pulls_small_groups_to_global(spark):
    from ai_log_analyzer_spark.functions import ranking as RKX
    rows = ([("big", 100_000)] * 50          # big group at 100k
            + [("lucky", 900_000)]           # 1-item group at 900k
            + [("unlucky", 0)])              # 1-item group at 0
    df = spark.createDataFrame(
        [(g, s) for g, s in rows], "grp string, score_ppm long")
    out = RKX.shrunk_group_means(df, "grp", "score_ppm", k=20) \
        .toPandas().set_index("grp")
    gm = (100_000 * 50 + 900_000) // 52      # global mean (floor)
    assert out.loc["big"].mean_ppm == 100_000
    # big group barely moves; singletons collapse most of the way to μ
    assert abs(out.loc["big"].shrunk_ppm - 100_000) < 15_000
    assert out.loc["lucky"].shrunk_ppm == (900_000 + 20 * gm) // 21
    assert out.loc["lucky"].shrunk_ppm < 200_000
    assert out.loc["unlucky"].shrunk_ppm > 90_000


def test_split_leakage_detects_cross_split_neardup(spark):
    from ai_log_analyzer_spark.functions import dedup as DX
    from ai_log_analyzer_spark.functions import sampling as SAX
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    # two near-identical docs + unrelated filler; ids chosen so the
    # near-dup pair lands in different splits
    import hashlib
    def split_of(i):
        h = int(hashlib.md5(f"{i}|split-v1".encode()).hexdigest()[:8], 16)
        b = h % 100
        return "train" if b < 80 else ("val" if b < 90 else "test")
    a = next(i for i in range(1000) if split_of(i) == "train")
    b = next(i for i in range(1000) if split_of(i) == "test")
    rows = [(a, base + " one"), (b, base + " two")]
    rows += [(10_000 + j, f"totally unrelated doc {j} " * 3)
             for j in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = DX.split_leakage_audit(df).toPandas()
    leak = out[out.is_leak]
    assert len(leak) == 1
    assert tuple(sorted([leak.iloc[0].split_a, leak.iloc[0].split_b])) \
        == ("test", "train")
    assert leak.iloc[0].n_pairs == 1


def test_recrawl_allocation_invariants(spark):
    from datetime import datetime, timezone
    from ai_log_analyzer_spark.functions import scheduling as SCHX
    base = 1_700_000_000

    def ts(s):
        return datetime.fromtimestamp(base + s, tz=timezone.utc)
    # 'fresh' host: everything captured at the corpus max -> zero stale
    # mass -> zero allocation; stale hosts split the budget by mass
    rows = ([("fresh", ts(1000))] * 5
            + [("stale_big", ts(0))] * 30
            + [("stale_small", ts(0))] * 10)
    df = spark.createDataFrame(rows, "host string, warc_ts timestamp")
    out = SCHX.recrawl_allocation(df, budget=1000, halflife_s=10) \
        .toPandas().set_index("host")
    assert out.alloc.sum() == 1000
    assert out.loc["fresh"].alloc == 0 and out.loc["fresh"].weight == 0
    # same staleness, 3x the pages -> 3x the weight, ~3x the budget
    assert out.loc["stale_big"].weight == 3 * out.loc["stale_small"].weight
    assert out.loc["stale_big"].alloc == 750
    assert out.loc["stale_small"].alloc == 250


# ---------------------------------------------------------------------------
# interarrival_stats (machine-traffic regularity)
# ---------------------------------------------------------------------------

def test_interarrival_constant_gap_is_regular(spark):
    from ai_log_analyzer_spark.functions import temporal as TP
    rows = ([(i, 1_700_000_000 + i * 60, 1) for i in range(20)] +      # cron: exact 60s
            [(100 + i, 1_700_000_000 + (i * i * 7) % 10_000, 2)        # bursty
             for i in range(20)])
    ev = spark.createDataFrame(rows, "event_id long, es long, user_id long") \
        .select("event_id", F.timestamp_seconds("es").alias("ts"), "user_id")
    out = {r.key: r for r in TP.interarrival_stats(
        ev, min_gaps=3).collect()}
    assert out[1].cv2_ppm == 0 and out[1].is_regular == 1
    assert out[1].mean_gap_s == 60
    assert out[2].cv2_ppm > 250_000 and out[2].is_regular == 0


def test_interarrival_min_gaps_and_zero_sum_excluded(spark):
    from ai_log_analyzer_spark.functions import temporal as TP
    rows = [(1, 1000, 1), (2, 2000, 1),          # key 1: only 1 gap
            (3, 5000, 2), (4, 5000, 2), (5, 5000, 2), (6, 5000, 2)]  # all-zero gaps
    ev = spark.createDataFrame(rows, "event_id long, es long, user_id long") \
        .select("event_id", F.timestamp_seconds("es").alias("ts"), "user_id")
    assert TP.interarrival_stats(ev, min_gaps=2).count() == 0


# ---------------------------------------------------------------------------
# cocitation_pairs
# ---------------------------------------------------------------------------

def test_cocitation_known_graph(spark):
    from ai_log_analyzer_spark.functions import graph as G
    # srcs 1..3 all cite (10, 11); src 4 cites (10, 12); src 5 cites 12 only
    edges = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10), (2, 11), (3, 10), (3, 11),
         (4, 10), (4, 12), (5, 12),
         (1, 10)],                                # duplicate edge must not double-count
        "src long, dst long")
    out = {(r.dst_a, r.dst_b): r
           for r in G.cocitation_pairs(edges, min_co=1).collect()}
    assert out[(10, 11)].n_co == 3
    # in(10)={1,2,3,4}, in(11)={1,2,3} → jaccard = 3/4
    assert out[(10, 11)].jaccard_ppm == 750_000
    assert out[(10, 12)].n_co == 1
    # in(12)={4,5} → 1 / (4+2-1)
    assert out[(10, 12)].jaccard_ppm == 1_000_000 // 5
    assert (11, 12) not in out                   # no common citer
    assert G.cocitation_pairs(edges, min_co=2).count() == 1


# ---------------------------------------------------------------------------
# length_ks_stats
# ---------------------------------------------------------------------------

def test_length_ks_identical_vs_shifted(spark):
    # group A == the corpus shape it dominates; group C fully shifted
    rows = ([(i, "A", (i % 10) + 1) for i in range(100)] +
            [(200 + i, "B", (i % 10) + 1) for i in range(100)] +
            [(400 + i, "C", 1000 + i) for i in range(50)])
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    out = {r.grp: r for r in SA.length_ks_stats(df).collect()}
    # A and B are identical distributions; their distance from the pooled
    # corpus is the C mass they lack: sup |CDF| gap = 50/250 at x=10
    assert out["A"].ks_ppm == out["B"].ks_ppm == 200_000
    # C is disjoint above everything: at x=10 its CDF is 0, corpus is 200/250
    assert out["C"].ks_ppm == 800_000
    assert out["A"].n_docs == 100 and out["C"].n_docs == 50


def test_length_ks_single_group_is_zero(spark):
    rows = [(i, "only", (i * 13) % 97) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    out = SA.length_ks_stats(df).collect()
    assert len(out) == 1 and out[0].ks_ppm == 0


# ---------------------------------------------------------------------------
# cidr_enrich_stats (longest-prefix network enrichment)
# ---------------------------------------------------------------------------

def test_cidr_longest_prefix_precedence(spark):
    from ai_log_analyzer_spark.functions import netenrich as NE
    # hand-built ips at every depth: /24 (10.1.2.5), nested /16 (10.3.9.9),
    # /8-only (172.20.1.1), unmatched (8.8.8.8)
    def ip(a, b, c, d):
        return (a << 24) | (b << 16) | (c << 8) | d
    rows = [(1, ip(10, 1, 2, 5)), (2, ip(10, 3, 9, 9)),
            (3, ip(172, 20, 1, 1)), (4, ip(8, 8, 8, 8)),
            (5, ip(10, 1, 2, 200))]                      # same /24 as row 1
    ev = spark.createDataFrame(rows, "event_id long, ip long") \
        .withColumn("user_id", F.col("event_id"))
    out = {r.block_label: r for r in NE.cidr_enrich_stats(
        ev.withColumn("_fixed_ip", F.col("ip")),
        ip_col="_fixed_ip").collect()}
    assert out["dc-2"].prefix_len == 24 and out["dc-2"].n_events == 2
    assert out["region-3"].prefix_len == 16
    assert out["net-172"].prefix_len == 8
    assert out["unmatched"].prefix_len == 0


def test_cidr_synthetic_ip_hits_all_depths(spark):
    from ai_log_analyzer_spark.functions import netenrich as NE
    ev = spark.range(400).select(
        F.col("id").alias("event_id"), F.col("id").alias("user_id"))
    out = NE.cidr_enrich_stats(ev).collect()
    depths = {r.prefix_len for r in out}
    assert depths == {24, 16, 8, 0}
    assert sum(r.n_events for r in out) == 400


# ---------------------------------------------------------------------------
# rate_burst_stats (trailing-window rate-limit screening)
# ---------------------------------------------------------------------------

def test_rate_burst_flags_hot_key_only(spark):
    from ai_log_analyzer_spark.functions import temporal as TP
    base = 1_700_000_000
    rows = ([(i, base + i, 1) for i in range(6)] +          # 6 events in 6s: burst
            [(100 + i, base + i * 3600, 2) for i in range(6)])  # 1/hour: calm
    ev = spark.createDataFrame(rows, "event_id long, es long, user_id long") \
        .select("event_id", F.timestamp_seconds("es").alias("ts"), "user_id")
    out = {r.key: r for r in TP.rate_burst_stats(
        ev, window_s=60, burst_threshold=4).collect()}
    assert out[1].max_burst == 6 and out[1].is_abusive == 1
    assert out[1].n_burst_events == 2                        # 5th and 6th events
    assert out[2].max_burst == 1 and out[2].is_abusive == 0


def test_rate_burst_window_boundary_closed(spark):
    from ai_log_analyzer_spark.functions import temporal as TP
    base = 1_700_000_000
    # window_s=10 → frame [-9, 0]: event at +9 sees both, event at +10 doesn't
    rows = [(1, base, 1), (2, base + 9, 1), (3, base + 10, 1)]
    ev = spark.createDataFrame(rows, "event_id long, es long, user_id long") \
        .select("event_id", F.timestamp_seconds("es").alias("ts"), "user_id")
    out = TP.rate_burst_stats(ev, window_s=10, burst_threshold=1).collect()[0]
    assert out.max_burst == 2


# ---------------------------------------------------------------------------

def test_km_survival_hand_computed(spark):
    """4 pages, bucket=50s: hand-derived risk sets, censoring, and the
    exact-zero tail when the last bucket kills its whole risk set."""
    from ai_log_analyzer_spark.functions import snapshots as SN
    rows = [
        ("A", 0, "x"), ("A", 100, "y"), ("A", 200, "y"),
        ("B", 0, "x"),
        ("C", 0, "x"), ("C", 50, "y"), ("C", 60, "z"),
        ("D", 0, "w"), ("D", 500, "v"),
    ]
    obs = spark.createDataFrame(rows, "page_key string, es long, fp string") \
        .select("page_key", F.timestamp_seconds("es").alias("snap_ts"), "fp")
    out = {r.dur_bucket: r for r in
           SN.km_survival(obs, bucket_s=50).collect()}
    # versions: A:(x died 100)(y cens 100)  B:(x cens 0)
    #           C:(x died 50)(y died 10)(z cens 0)  D:(w died 500)(v cens 0)
    assert set(out) == {0, 1, 2, 10}
    b0 = out[0]          # C.y dies; B.x, C.z, D.v censored
    assert (b0.n_at_risk, b0.n_died, b0.n_censored) == (8, 1, 3)
    assert b0.survival == pytest.approx(0.875)
    b1 = out[1]          # C.x dies at risk set 4
    assert (b1.n_at_risk, b1.n_died) == (4, 1)
    assert b1.survival == pytest.approx(0.65625)
    b2 = out[2]          # A.x dies, A.y censored, risk set 3
    assert (b2.n_at_risk, b2.n_died, b2.n_censored) == (3, 1, 1)
    assert b2.survival == pytest.approx(0.4375)
    b10 = out[10]        # D.w kills the whole remaining risk set
    assert (b10.n_at_risk, b10.n_died) == (1, 1)
    assert b10.survival == 0.0


def test_km_survival_censored_never_counted_as_death(spark):
    """All-current pages (single observation each) → zero deaths, S=1."""
    from ai_log_analyzer_spark.functions import snapshots as SN
    rows = [(f"p{i}", 0, "x") for i in range(5)]
    obs = spark.createDataFrame(rows, "page_key string, es long, fp string") \
        .select("page_key", F.timestamp_seconds("es").alias("snap_ts"), "fp")
    out = SN.km_survival(obs, bucket_s=60).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.dur_bucket, r.n_died, r.n_censored) == (0, 0, 5)
    assert r.survival == pytest.approx(1.0)


def test_funnel_stages_ordering_ties_and_greedy(spark):
    """Strict event-time order: pre-step-1 events and same-second ties
    never advance; greedy earliest-match means a purchase BEFORE the
    matched click cannot complete the funnel."""
    from ai_log_analyzer_spark.functions import temporal as TP
    b = 1_700_000_000
    rows = [
        (1, b, "view"), (1, b + 1, "click"), (1, b + 2, "purchase"),
        (2, b, "click"), (2, b + 1, "view"), (2, b + 2, "purchase"),
        (3, b, "view"), (3, b, "click"),                  # same-second tie
        (4, b, "view"), (4, b + 1, "purchase"),           # skipped step
        (5, b, "click"),                                  # never entered
        (6, b, "view"), (6, b + 5, "purchase"), (6, b + 10, "click"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, es long, event_type string") \
        .select("user_id", F.timestamp_seconds("es").alias("ts"), "event_type")
    out = {r.stage_no: r for r in TP.funnel_stages(
        ev, ("view", "click", "purchase")).collect()}
    assert [out[i].step for i in (1, 2, 3)] == ["view", "click", "purchase"]
    assert out[1].n_users == 5            # users 1,2,3,4,6 did a view
    assert out[2].n_users == 2            # 1 and 6 clicked strictly later
    assert out[3].n_users == 1            # only user 1: 6's purchase precedes
    assert out[1].conv_ppm == 1_000_000
    assert out[2].conv_ppm == 400_000
    assert out[3].conv_ppm == 200_000


def test_funnel_stages_user2_cannot_reuse_early_purchase(spark):
    """user 2's purchase AFTER the view but with no later click stays
    at stage 1 — the funnel demands each step strictly after the last
    MATCHED step, not merely after step 1."""
    from ai_log_analyzer_spark.functions import temporal as TP
    b = 1_700_000_000
    rows = [(2, b, "click"), (2, b + 1, "view"), (2, b + 2, "purchase")]
    ev = spark.createDataFrame(rows, "user_id long, es long, event_type string") \
        .select("user_id", F.timestamp_seconds("es").alias("ts"), "event_type")
    out = {r.stage_no: r.n_users for r in TP.funnel_stages(
        ev, ("view", "click", "purchase")).collect()}
    assert out == {1: 1, 2: 0, 3: 0}


def test_retention_cohorts_hand_computed(spark):
    """Two cohorts with churn and a comeback gap: day-0 rows are the
    cohorts themselves; a user inactive on day 1 but back on day 2
    counts in offset 2, not offset 1."""
    from ai_log_analyzer_spark.functions import temporal as TP
    d = 86400
    rows = [
        # cohort day 0: users 1,2,3
        (1, 0), (1, d), (1, 2 * d),
        (2, 10), (2, 2 * d + 5),            # skips day 1, returns day 2
        (3, 20),                            # churns after day 0
        # cohort day 1: user 4
        (4, d + 7), (4, 2 * d + 9),
    ]
    ev = spark.createDataFrame(rows, "user_id long, es long") \
        .select("user_id", F.timestamp_seconds("es").alias("ts"))
    out = {(r.cohort_period, r.period_offset): r
           for r in TP.retention_cohorts(ev, bucket_s=d).collect()}
    assert out[(0, 0)].n_active == 3 and out[(0, 0)].retention_ppm == 1_000_000
    assert out[(0, 1)].n_active == 1            # only user 1
    assert out[(0, 1)].retention_ppm == 333_333  # exact integer div
    assert out[(0, 2)].n_active == 2            # users 1 and 2
    assert out[(0, 2)].retention_ppm == 666_666
    assert out[(1, 0)].n_active == 1 and out[(1, 0)].n_cohort == 1
    assert out[(1, 1)].n_active == 1
    assert set(out) == {(0, 0), (0, 1), (0, 2), (1, 0), (1, 1)}


def test_seasonal_deviation_hand_computed(spark):
    """Absent cells weigh the baseline as zero days: a type that fired
    8 events in hour 1 of day 0 and none on day 1 reads 2x its
    hour-1 baseline on day 0."""
    from ai_log_analyzer_spark.functions import temporal as TP
    rows = ([(i, 0 * 86400 + 0 * 3600 + i, "a") for i in range(2)]
            + [(10 + i, 1 * 86400 + 0 * 3600 + i, "a") for i in range(2)]
            + [(20 + i, 0 * 86400 + 1 * 3600 + i, "a") for i in range(8)])
    ev = spark.createDataFrame(rows, "event_id long, es long, event_type string") \
        .select("event_id", F.timestamp_seconds("es").alias("ts"), "event_type")
    out = {(r.day, r.hour_of_day): r for r in
           TP.seasonal_deviation(ev, spike_ppm=1_500_000).collect()}
    assert out[(0, 0)].ratio_ppm == 1_000_000      # 2 ev, baseline 4/2 days
    assert out[(1, 0)].ratio_ppm == 1_000_000
    r = out[(0, 1)]                                 # 8 ev, baseline 8/2 days
    assert (r.n_events, r.baseline_total, r.n_days) == (8, 8, 2)
    assert r.ratio_ppm == 2_000_000 and r.is_spike == 1
    assert out[(0, 0)].is_spike == 0


# ---------------------------------------------------------------------------
# telemetry screens: alert_episodes / template_transitions /
# cusum_drift / first_seen_novelty
# ---------------------------------------------------------------------------

def _ts_events(spark, rows, schema="user_id long, es long, event_type string"):
    return (spark.createDataFrame(rows, schema)
            .withColumn("ts", F.timestamp_seconds("es")).drop("es"))


def test_alert_episodes_hand_computed(spark):
    """Gaps ≤ cooldown chain into one episode; a gap of exactly
    cooldown+1 starts a new one; same-second duplicates never split;
    types sessionize independently."""
    from ai_log_analyzer_spark.functions import temporal as TP
    rows = [
        (1, 0, "err"), (1, 50, "err"), (1, 120, "err"),   # gaps 50, 70
        (1, 500, "err"),                                  # gap 380 > 100
        (1, 0, "warn"),
        (2, 0, "err"), (2, 101, "err"),                   # gap 101 > 100
        (3, 10, "err"), (3, 10, "err"),                   # same-second tie
    ]
    ev = _ts_events(spark, rows)
    out = {(r.key, r.event_type): r
           for r in TP.alert_episodes(ev, cooldown_s=100).collect()}
    r = out[(1, "err")]
    assert (r.n_events, r.n_episodes, r.max_episode_events) == (4, 2, 3)
    assert r.suppression_ppm == 500_000
    assert out[(1, "warn")].n_episodes == 1
    r2 = out[(2, "err")]
    assert (r2.n_events, r2.n_episodes, r2.suppression_ppm) == (2, 2, 0)
    r3 = out[(3, "err")]
    assert (r3.n_events, r3.n_episodes, r3.max_episode_events) == (2, 1, 2)
    assert r3.suppression_ppm == 500_000


def test_template_transitions_hand_computed(spark):
    """Transition grid, conditional ppm, min-support guard, and the
    event_id tie-break at equal seconds."""
    from ai_log_analyzer_spark.functions import temporal as TP
    rows = [  # (event_id, user, sec, type)
        (1, 1, 0, "a"), (2, 1, 10, "b"), (3, 1, 20, "a"),
        (4, 1, 30, "b"), (5, 1, 40, "a"), (6, 1, 50, "c"),
        (7, 2, 0, "a"), (8, 2, 10, "b"),
        (9, 4, 100, "x"), (10, 4, 100, "y"),  # tie: id orders x before y
    ]
    ev = (spark.createDataFrame(
        rows, "event_id long, user_id long, es long, event_type string")
        .withColumn("ts", F.timestamp_seconds("es")).drop("es"))
    out = {(r.prev_e, r.e): r for r in TP.template_transitions(
        ev, rare_ppm=300_000, min_prev=3).collect()}
    assert out[("a", "b")].n_trans == 3 and out[("a", "b")].prev_total == 4
    assert out[("a", "b")].prob_ppm == 750_000
    assert out[("a", "b")].is_rare == 0
    assert out[("a", "c")].prob_ppm == 250_000
    assert out[("a", "c")].is_rare == 1          # rare with support
    assert out[("b", "a")].prob_ppm == 1_000_000
    assert out[("b", "a")].is_rare == 0          # prev_total 2 < min_prev
    assert ("x", "y") in out and ("y", "x") not in out


def test_cusum_drift_matches_textbook_recurrence(spark):
    """The window identity S_t = P_t - min(0, running-min P) must equal
    the classic recurrence S_t = max(0, S_{t-1} + x·1000 - mean - k)
    on an irregular series with silent (densified) hours."""
    from ai_log_analyzer_spark.functions import temporal as TP
    rows = []
    eid = 0
    counts = {0: 1, 2: 5, 3: 2, 7: 9, 8: 9, 9: 9}   # hours 1,4,5,6 silent
    for h, c in counts.items():
        for j in range(c):
            rows.append((eid, 3600 * h + j, "t"))
            eid += 1
    ev = (spark.createDataFrame(rows, "event_id long, es long, event_type string")
          .withColumn("ts", F.timestamp_seconds("es")).drop("es"))
    got = {r.hour_idx: r for r in TP.cusum_drift(ev).collect()}
    assert len(got) == 10                          # densified 0..9
    dense = [counts.get(h, 0) for h in range(10)]
    mean = sum(dense) * 1000 // len(dense)
    k = mean // 4
    s = 0
    for h, x in enumerate(dense):
        s = max(0, s + x * 1000 - mean - k)
        assert got[h].cusum_milli == s, (h, got[h].cusum_milli, s)
        assert got[h].n_events == x
        assert got[h].mean_milli == mean
        assert got[h].is_drift == int(s > 5 * mean and mean > 0)


def test_cusum_drift_flags_sustained_shift(spark):
    """20 quiet hours then 4 hours at 25x must trip the decision
    interval during the shift, never before it."""
    from ai_log_analyzer_spark.functions import temporal as TP
    rows = []
    eid = 0
    for h in range(24):
        for j in range(2 if h < 20 else 50):
            rows.append((eid, 3600 * h + j, "svc"))
            eid += 1
    ev = (spark.createDataFrame(rows, "event_id long, es long, event_type string")
          .withColumn("ts", F.timestamp_seconds("es")).drop("es"))
    out = {r.hour_idx: r.is_drift for r in TP.cusum_drift(ev).collect()}
    assert all(out[h] == 0 for h in range(21))
    assert all(out[h] == 1 for h in (21, 22, 23))


def test_first_seen_novelty_hand_computed(spark):
    """is_new keys off the corpus clock's trailing window; is_novel
    additionally demands the type be near-unique across keys."""
    from ai_log_analyzer_spark.functions import temporal as TP
    rows = [(1, 10, "a"), (2, 20, "a"), (1, 950, "b"),
            (3, 990, "c"), (2, 40, "c"), (1, 1000, "a")]
    ev = _ts_events(spark, rows)
    out = {(r.key, r.event_type): r for r in TP.first_seen_novelty(
        ev, recent_s=100, rare_keys=1).collect()}
    assert len(out) == 5
    assert out[(1, "a")].first_sec == 10 and out[(1, "a")].n_events == 2
    assert out[(1, "a")].is_new == 0
    assert out[(1, "b")].is_new == 1 and out[(1, "b")].is_novel == 1
    assert out[(3, "c")].is_new == 1 and out[(3, "c")].is_novel == 0
    assert out[(3, "c")].type_n_keys == 2
    assert out[(2, "c")].is_new == 0


# ---------------------------------------------------------------------------
# incident analytics: burn_rate / alert_correlation / spike_attribution
# ---------------------------------------------------------------------------

def test_burn_rate_multiwindow_hand_computed(spark):
    """A one-hour error blip must NOT page (long window dilutes it); a
    sustained burn must; silent hours decay the long window as zeros."""
    from ai_log_analyzer_spark.functions import incidents as IC
    rows = []
    # hours 0-5: 10 ok events each.  hour 2: +3 errors (blip).
    # hours 10-12 (after silence 6-9): 5 ok + 5 errors each (burn).
    eid = 0
    for h in range(6):
        for j in range(10):
            rows.append((eid, 3600 * h + j, "view")); eid += 1
    for j in range(3):
        rows.append((eid, 3600 * 2 + 100 + j, "error")); eid += 1
    for h in (10, 11, 12):
        for j in range(5):
            rows.append((eid, 3600 * h + j, "view")); eid += 1
        for j in range(5):
            rows.append((eid, 3600 * h + 50 + j, "error")); eid += 1
    ev = _ts_events(spark, rows, "event_id long, es long, event_type string")
    out = {r.hour_idx: r for r in IC.burn_rate(
        ev, long_hours=6, burn_ppm=100_000).collect()}
    assert len(out) == 13                       # densified 0..12
    # blip hour: 3/13 short ≈ 230769 ppm > bar, but 6h window
    # (h 0-2: 3 errors / 33 events) ≈ 90909 ppm < bar → no page
    assert out[2].ratio_1h_ppm == 230_769
    assert out[2].ratio_nh_ppm == 90_909 and out[2].is_burn == 0
    # silent hour: zero totals, zero ratios
    assert out[7].tot_1h == 0 and out[7].ratio_1h_ppm == 0
    # sustained burn at hour 12: short 500000; 6h window covers
    # hours 7-12 = 15 errors / 30 events = 500000 → page
    assert out[12].ratio_1h_ppm == 500_000
    assert out[12].ratio_nh_ppm == 500_000 and out[12].is_burn == 1
    # hour 10: 6h window h5..10 = 5 err / 20 tot = 250000 → also burns
    assert out[10].is_burn == 1


def test_alert_correlation_lift_hand_computed(spark):
    """Types always co-firing lift above independence; a pair sharing
    one basket dies at min_co; lift is exact ppm."""
    from ai_log_analyzer_spark.functions import incidents as IC
    rows = []
    eid = 0
    # baskets (key=1..4, hour 0): a+b co-fire in 2 of 4 baskets;
    # c fires alone in the other two; d once with a (below min_co)
    for k, types in [(1, ["a", "b"]), (2, ["a", "b"]),
                     (3, ["c"]), (4, ["c", "a", "d"])]:
        for t in types:
            rows.append((eid, k, 10 + eid, t)); eid += 1
    ev = (spark.createDataFrame(
        rows, "event_id long, user_id long, es long, event_type string")
        .withColumn("ts", F.timestamp_seconds("es")).drop("es"))
    out = {(r.a, r.b): r for r in IC.alert_correlation(
        ev, bucket_s=3600, min_co=2, lift_ppm=1_200_000).collect()}
    assert set(out) == {("a", "b")}            # (a,d)/(a,c) co=1 < min_co
    r = out[("a", "b")]
    assert (r.n_co, r.n_a, r.n_b, r.n_baskets) == (2, 3, 2, 4)
    # lift = 2·4·1e6 / (3·2) = 1333333 ppm > 1.2 → correlated
    assert r.lift_ppm == 1_333_333 and r.is_correlated == 1


def test_spike_attribution_hand_computed(spark):
    """The worst hour picks the earliest on ties; a key overweighted
    in the spike hour relative to its steady-state share is the
    driver."""
    from ai_log_analyzer_spark.functions import incidents as IC
    rows = []
    eid = 0
    # type 'err': hour 0 has 2 events (u1, u2); hour 5 has 8 events,
    # 6 from u9 (the driver), 2 from u1
    for u, h in [(1, 0), (2, 0)] + [(9, 5)] * 6 + [(1, 5)] * 2:
        rows.append((eid, u, 3600 * h + eid, "err")); eid += 1
    ev = (spark.createDataFrame(
        rows, "event_id long, user_id long, es long, event_type string")
        .withColumn("ts", F.timestamp_seconds("es")).drop("es"))
    out = {r.key: r for r in IC.spike_attribution(
        ev, driver_excess_ppm=100_000).collect()}
    assert all(r.spike_hour == 5 and r.spike_total == 8
               for r in out.values())
    assert set(out) == {9, 1}                  # u2 absent from spike hour
    r9 = out[9]
    assert r9.share_ppm == 750_000             # 6/8
    assert r9.baseline_ppm == 600_000          # 6/10
    assert r9.excess_ppm == 150_000 and r9.is_driver == 1
    r1 = out[1]
    assert r1.share_ppm == 250_000 and r1.baseline_ppm == 300_000
    assert r1.excess_ppm == -50_000 and r1.is_driver == 0


def test_spike_attribution_tie_breaks_to_earliest_hour(spark):
    """Two hours at the same max count: the earlier one is the spike
    on both engines."""
    from ai_log_analyzer_spark.functions import incidents as IC
    rows = [(0, 1, 100, "x"), (1, 2, 200, "x"),
            (2, 1, 3600 + 100, "x"), (3, 2, 3600 + 200, "x")]
    ev = (spark.createDataFrame(
        rows, "event_id long, user_id long, es long, event_type string")
        .withColumn("ts", F.timestamp_seconds("es")).drop("es"))
    out = IC.spike_attribution(ev).collect()
    assert all(r.spike_hour == 0 for r in out)


def test_latency_percentiles_hand_computed(spark):
    """Discrete percentiles off the milli-histogram: p50 of ten values
    is the 5th smallest (ceil rule); p95/p99 of ten are the max."""
    from ai_log_analyzer_spark.functions import incidents as IC
    vals = [0.010, 0.020, 0.030, 0.040, 0.050,
            0.060, 0.070, 0.080, 0.090, 1.000]
    rows = [(i, 100 + i, "api", vals[i]) for i in range(10)]
    ev = (spark.createDataFrame(
        rows, "event_id long, es long, event_type string, value double")
        .withColumn("ts", F.timestamp_seconds("es")).drop("es"))
    r = IC.latency_percentiles(ev).collect()[0]
    assert r.event_type == "api" and r.n_events == 10
    assert r.p50_milli == 50          # cum >= ceil(10/2)=5 → 5th value
    assert r.p95_milli == 1000        # ceil(9.5)=10 → the max
    assert r.p99_milli == 1000
    assert r.max_milli == 1000
    assert r.mean_milli == (sum(int(round(v * 1000)) for v in vals)) // 10


def test_latency_percentiles_duplicate_values_collapse(spark):
    """Duplicates collapse into one histogram row; percentiles stay
    exact through the collapsed cumulative counts."""
    from ai_log_analyzer_spark.functions import incidents as IC
    rows = [(i, 100 + i, "q", 0.005 if i < 7 else 0.100)
            for i in range(8)]
    ev = (spark.createDataFrame(
        rows, "event_id long, es long, event_type string, value double")
        .withColumn("ts", F.timestamp_seconds("es")).drop("es"))
    r = IC.latency_percentiles(ev).collect()[0]
    assert r.p50_milli == 5 and r.p95_milli == 100 and r.n_events == 8


def test_tail_sampling_error_sessions_always_kept(spark):
    """A session with one error among many events is kept as 'error';
    clean sessions split deterministically between sampled/dropped and
    the ppm shares sum to 1e6 (up to floor)."""
    from ai_log_analyzer_spark.functions import incidents as IC
    rows = []
    eid = 0
    for k in range(20):                       # 20 clean sessions
        for j in range(3):
            rows.append((eid, k, 100 + j, "view")); eid += 1
    rows.append((eid, 99, 200, "error")); eid += 1   # 1 error session
    rows.append((eid, 99, 201, "view")); eid += 1
    ev = (spark.createDataFrame(
        rows, "event_id long, user_id long, es long, event_type string")
        .withColumn("ts", F.timestamp_seconds("es")).drop("es"))
    out = {r.keep_reason: r for r in IC.tail_sampling(
        ev, sample_num=1, sample_den=10).collect()}
    assert out["error"].n_sessions == 1 and out["error"].n_events == 2
    n_clean = (out.get("sampled").n_sessions if "sampled" in out else 0) \
        + (out.get("dropped").n_sessions if "dropped" in out else 0)
    assert n_clean == 20
    assert sum(r.pct_sessions_ppm for r in out.values()) \
        >= 1_000_000 - len(out)
    # determinism: the same input yields the identical decision table
    out2 = {r.keep_reason: r.n_sessions for r in IC.tail_sampling(
        ev, sample_num=1, sample_den=10).collect()}
    assert out2 == {k: r.n_sessions for k, r in out.items()}


def test_alert_exemplars_min_by_is_deterministic(spark):
    """The exemplar is the min-event-id row's payload, independent of
    partition order."""
    from ai_log_analyzer_spark.functions import incidents as IC
    rows = [(5, 7, 500, "a"), (2, 3, 200, "a"), (9, 1, 900, "a"),
            (4, 6, 400, "b")]
    ev = (spark.createDataFrame(
        rows, "event_id long, user_id long, es long, event_type string")
        .withColumn("ts", F.timestamp_seconds("es")).drop("es")
        .repartition(4))
    out = {r.event_type: r for r in IC.alert_exemplars(ev).collect()}
    a = out["a"]
    assert (a.exemplar_id, a.exemplar_key, a.exemplar_sec) == (2, 3, 200)
    assert a.n_events == 3 and a.n_keys == 3
    assert out["b"].exemplar_id == 4


def test_json_key_coverage_partial_key_flags(spark):
    """A key present in only some of a type's events reads partial
    coverage in exact ppm; full-coverage keys don't flag."""
    from ai_log_analyzer_spark.functions import incidents as IC
    rows = [(1, 10, "a", '{"k": 1, "v": 2}'),
            (2, 20, "a", '{"k": 3}'),
            (3, 30, "a", '{"k": 5, "v": 9}'),
            (4, 40, "b", '{"z": 0}')]
    ev = (spark.createDataFrame(
        rows, "event_id long, es long, event_type string, props string")
        .withColumn("ts", F.timestamp_seconds("es")).drop("es"))
    out = {(r.event_type, r.key): r
           for r in IC.json_key_coverage(ev).collect()}
    assert out[("a", "k")].coverage_ppm == 1_000_000
    assert out[("a", "k")].is_partial == 0
    assert out[("a", "v")].n_with_key == 2
    assert out[("a", "v")].coverage_ppm == 666_666
    assert out[("a", "v")].is_partial == 1
    assert out[("b", "z")].coverage_ppm == 1_000_000


def test_incident_summary_composes_components(spark):
    """The capstone row carries the exemplar, the spike driver (rank-1
    by excess, tie to smallest key), and the best partner; a type with
    no surviving correlation pair keeps NULL partner columns."""
    from ai_log_analyzer_spark.functions import incidents as IC
    rows = []
    eid = 0
    # types a+b co-fire in 3 baskets (keys 1-3, hour 0) → partners;
    # type c fires alone (no pair survives min_co=2)
    for k in (1, 2, 3):
        rows.append((eid, k, 100 + eid, "a")); eid += 1
        rows.append((eid, k, 100 + eid, "b")); eid += 1
    rows.append((eid, 8, 100, "c")); eid += 1
    # spike hour for c: hour 5 with driver key 9
    for j in range(4):
        rows.append((eid, 9, 5 * 3600 + j, "c")); eid += 1
    ev = (spark.createDataFrame(
        rows, "event_id long, user_id long, es long, event_type string")
        .withColumn("ts", F.timestamp_seconds("es")).drop("es"))
    out = {r.event_type: r for r in IC.incident_summary(ev).collect()}
    assert out["a"].top_partner == "b" and out["b"].top_partner == "a"
    assert out["a"].top_partner_lift_ppm == out["b"].top_partner_lift_ppm
    c = out["c"]
    assert c.top_partner is None and c.top_partner_lift_ppm is None
    assert c.spike_hour == 5 and c.spike_total == 4
    assert c.top_driver_key == 9
    assert c.exemplar_id == 6          # first c event has id 6
    assert c.n_events == 5 and c.n_keys == 2


def test_delivery_dedup_stats_hand_computed(spark):
    """Three copies of one id and two of another: dup ids, redundant
    rows, worst copy count, exact ppm."""
    from ai_log_analyzer_spark.functions import incidents as IC
    rows = [(1, 1, 10, "a"), (1, 1, 11, "a"), (1, 1, 12, "a"),
            (2, 1, 20, "a"), (2, 1, 21, "a"),
            (3, 2, 30, "b"), (4, 2, 40, "b")]
    ev = (spark.createDataFrame(
        rows, "event_id long, user_id long, es long, event_type string")
        .withColumn("ts", F.timestamp_seconds("es")).drop("es"))
    r = IC.delivery_dedup_stats(ev).collect()[0]
    assert (r.n_rows, r.n_ids, r.n_dup_ids) == (7, 4, 2)
    assert (r.n_dup_rows, r.max_copies) == (3, 3)
    assert r.dup_ppm == 428_571


def test_lateness_profile_hand_computed(spark):
    """Lateness = running-max event time at arrival minus own event
    time, per key; in-order keys contribute zeros."""
    from ai_log_analyzer_spark.functions import incidents as IC
    rows = [
        # key 1 arrives in id order with ts 100, 50, 120, 110:
        # late = 0, 50, 0, 10
        (1, 1, 100), (2, 1, 50), (3, 1, 120), (4, 1, 110),
        # key 2 fully in order: late = 0, 0
        (5, 2, 10), (6, 2, 20),
    ]
    ev = (spark.createDataFrame(rows, "event_id long, user_id long, es long")
          .withColumn("ts", F.timestamp_seconds("es")).drop("es"))
    r = IC.lateness_profile(ev).collect()[0]
    assert r.n_events == 6 and r.n_late == 2
    assert r.late_ppm == 333_333
    # sorted lateness: 0,0,0,0,10,50 → p50 = 0 (3rd), p95/p99 = 50
    assert r.p50_late_s == 0
    assert r.p95_late_s == 50 and r.p99_late_s == 50
    assert r.max_late_s == 50


# ── data-layout planning (functions/layout.py) ─────────────────────────

def test_morton_key_is_a_grid_bijection(spark):
    """The arithmetic Morton key maps the 64×64 grid 1:1 onto
    [0, 4096) and its div-64 file covers exactly an 8×8 tile."""
    from ai_log_analyzer_spark.functions import layout as LY
    grid = spark.range(64).selectExpr("id as x").crossJoin(
        spark.range(64).selectExpr("id as y"))
    z = grid.select(LY._morton(F.col("x"), F.col("y")).alias("z"),
                    "x", "y")
    stats = z.agg(F.countDistinct("z"), F.min("z"), F.max("z")).collect()[0]
    assert tuple(stats) == (4096, 0, 4095)
    tile = (z.withColumn("f", F.expr("z div 64"))
            .groupBy("f")
            .agg((F.max("x") - F.min("x") + 1).alias("wx"),
                 (F.max("y") - F.min("y") + 1).alias("wy"),
                 F.count("*").alias("n")))
    bad = tile.where("wx != 8 or wy != 8 or n != 64").count()
    assert bad == 0 and tile.count() == 64


def test_zorder_layout_bounds_both_dims(spark):
    """Under the Z-order layout every file's x and y widths are ≤ 8;
    row totals are conserved across both layouts."""
    from ai_log_analyzer_spark.functions import layout as LY
    n = 5000
    ev = spark.range(n).selectExpr(
        "id as event_id",
        "cast(id * 977 % 4096 as long) as user_id",
        "timestamp_micros(1700000000000000 + id * 3600000000) as ts")
    out = LY.zorder_layout(ev).cache()
    zf = out.where("layout = 'zorder'")
    assert zf.where("width_x > 8 or width_y > 8").count() == 0
    totals = {r.layout: r.s for r in
              out.groupBy("layout").agg(F.sum("n_rows").alias("s")).collect()}
    assert totals == {"time": n, "zorder": n}
    # the time-cut layout leaves user extents unbounded (≫ 8) on this
    # user-shuffled stream — the pruning argument the audit exists for
    worst = out.where("layout = 'time'").agg(F.max("width_x")).collect()[0][0]
    assert worst > 8


def test_range_partition_bounds_exact_ntile(spark):
    """Tiles are NTILE-exact: first n%k tiles one row larger, bounds
    non-overlapping and monotone, all rows covered."""
    from ai_log_analyzer_spark.functions import layout as LY
    n, k = 1003, 16
    ev = spark.range(n).selectExpr(
        "id as event_id",
        "cast((id * 37 % 500) as double) / 100 as value")
    out = LY.range_partition_bounds(ev, k=k).orderBy("tile").collect()
    assert [r.tile for r in out] == list(range(1, k + 1))
    q, rem = divmod(n, k)
    assert [r.n_rows for r in out] == [q + 1] * rem + [q] * (k - rem)
    for a, b in zip(out, out[1:]):
        assert a.hi_cents <= b.lo_cents
    assert sum(r.n_rows for r in out) == n


def test_compaction_plan_groups_accumulate_to_target(spark):
    """Groups cut exactly where the running per-source byte total
    crosses target multiples; files stay in file order within groups;
    every small file is flagged."""
    from ai_log_analyzer_spark.functions import layout as LY
    # source a: files of 10,10,10,10 bytes (ids 0..79, 2 docs/file of
    # 5 bytes) target 25 → cum-before 0,10,20,30 → grps 0,0,0,1
    rows = [(i, "a", 5) for i in range(80)] + \
           [(100 + i, "b", 30) for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    out = LY.compaction_plan(docs, docs_per_file=20, target_bytes=25) \
        .orderBy("source", "file_idx").collect()
    a = [(r.file_idx, r.bytes, r.grp, r.is_small) for r in out
         if r.source == "a"]
    assert a == [(0, 100, 0, False), (1, 100, 4, False),
                 (2, 100, 8, False), (3, 100, 12, False)]
    # b: ids 100-139 → file 5 (100..119) and 6 (120..139), 600 B each
    b = [(r.file_idx, r.bytes, r.grp, r.is_small) for r in out
         if r.source == "b"]
    assert b == [(5, 600, 0, False), (6, 600, 24, False)]
    # small-file flagging: single tiny file
    tiny = spark.createDataFrame([(0, "c", 3)],
                                 "doc_id long, source string, n_chars long")
    t = LY.compaction_plan(tiny, docs_per_file=20, target_bytes=25).collect()[0]
    assert t.is_small and t.grp == 0 and t.n_docs == 1
    # small files MERGE: 5 files × 20 B, target 25 → cum-before
    # 0,20,40,60,80 → grps 0,0,1,2,3 (first two coalesce)
    small = spark.createDataFrame(
        [(i, "d", 1) for i in range(100)],
        "doc_id long, source string, n_chars long")
    d = [(r.file_idx, r.grp, r.is_small) for r in
         LY.compaction_plan(small, docs_per_file=20, target_bytes=25)
         .orderBy("file_idx").collect()]
    assert d == [(0, 0, True), (1, 0, True), (2, 1, True),
                 (3, 2, True), (4, 3, True)]


def test_skew_profile_hand_computed(spark):
    """Grid 3 keys over 10 rows: counts 6,3,1 → top1 600000 ppm,
    rec_salts = ceil(6 / (10/3)) = 2."""
    from ai_log_analyzer_spark.functions import salting as SAL
    rows = [(i, "a") for i in range(6)] + [(6, "b"), (7, "b"), (8, "b"),
                                           (9, "c")]
    df = spark.createDataFrame(rows, "event_id long, k string")
    r = SAL.skew_profile(df, "k").collect()[0]
    assert (r.n_keys, r.n_rows, r.max_count, r.min_count) == (3, 10, 6, 1)
    assert r.top1_share_ppm == 600_000
    assert r.rec_salts == 2
    # uniform key → no salting recommended
    u = spark.createDataFrame([(i, i % 4) for i in range(8)],
                              "event_id long, k long")
    assert SAL.skew_profile(u, "k").collect()[0].rec_salts == 1


def test_delta_bitwidth_audit_hand_computed(spark):
    """Block of ts 0,3,10,10 µs → deltas 3,7,0 → max 7 → 3 bits;
    single-row block → max delta 0 → 1 bit; out-of-order rows use
    |Δ|."""
    from ai_log_analyzer_spark.functions import layout as LY
    rows = [(0, 0), (1, 3), (2, 10), (3, 10),     # block 0
            (1000, 5),                             # block 1: single row
            (2000, 100), (2001, 68)]               # block 2: |Δ| = 32
    ev = spark.createDataFrame(rows, "event_id long, es long") \
        .selectExpr("event_id", "timestamp_micros(es) as ts")
    out = {r.blk: r for r in LY.delta_bitwidth_audit(ev).collect()}
    assert out[0].max_abs_delta_us == 7 and out[0].delta_bits == 3
    assert out[1].max_abs_delta_us == 0 and out[1].delta_bits == 1
    assert out[2].max_abs_delta_us == 32 and out[2].delta_bits == 6
    assert out[0].savings_ppm == (64 - 3) * 1_000_000 // 64
    assert all(r.raw_bits == 64 for r in out.values())


# ── planner statistics (functions/stats.py) ────────────────────────────

def test_table_stats_profile_hand_computed(spark):
    from ai_log_analyzer_spark.functions import stats as ST
    df = spark.createDataFrame(
        [(1, 10), (2, 10), (3, None), (3, 30)], "a long, b long")
    out = {r.col_name: r for r in
           ST.table_stats_profile(df, ["a", "b"]).collect()}
    a, b = out["a"], out["b"]
    assert (a.n_rows, a.n_nonnull, a.ndv, a.min_val, a.max_val) \
        == (4, 4, 3, 1, 3)
    assert (b.n_rows, b.n_nonnull, b.ndv, b.min_val, b.max_val) \
        == (4, 3, 2, 10, 30)


def test_join_filter_audit_hand_computed(spark):
    """Probe rows 1,1,2,2,2,3; build keys {2,9} → common 1 of 3 probe
    keys, 3 of 6 rows survive → 500000 ppm."""
    from ai_log_analyzer_spark.functions import stats as ST
    probe = spark.createDataFrame([(1,), (1,), (2,), (2,), (2,), (3,)],
                                  "k long")
    build = spark.createDataFrame([(2,), (9,)], "k long")
    r = ST.join_filter_audit(probe, build, "k", "k").collect()[0]
    assert (r.ndv_probe, r.ndv_build, r.ndv_common) == (3, 2, 1)
    assert (r.probe_rows, r.surviving_rows) == (6, 3)
    assert r.selectivity_ppm == 500_000


# ── data contracts (functions/contracts.py) ────────────────────────────

def test_fk_integrity_audit_counts_danglers(spark):
    """Child keys {1:2 rows, 2:1, 9:3}; parent {1,2} → key 9 dangles
    with 3 rows → 500000 ppm on 6 rows."""
    from ai_log_analyzer_spark.functions import contracts as CT
    child = spark.createDataFrame([(1,), (1,), (2,), (9,), (9,), (9,)],
                                  "fk long")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    edges = [("child->parent", "c", "fk", "p", "pk")]
    r = CT.fk_integrity_audit({"c": child, "p": parent},
                              edges=edges).collect()[0]
    assert r.edge == "child->parent"
    assert (r.child_rows, r.n_child_keys) == (6, 3)
    assert (r.dangling_keys, r.dangling_rows) == (1, 3)
    assert r.dangling_ppm == 500_000


def test_data_contract_audit_flags_every_rule(spark):
    """One clean row + one violator per rule (incl. a NULL value, which
    must count as a violation)."""
    from ai_log_analyzer_spark.functions import contracts as CT
    rows = [
        (0, 1.0, "click", "2024-06-01 00:00:00", 5, '{"k": 1}'),   # clean
        (1, -2.0, "click", "2024-06-01 00:00:00", 5, '{"k": 1}'),  # value
        (2, None, "click", "2024-06-01 00:00:00", 5, '{"k": 1}'),  # null value
        (3, 1.0, "hack", "2024-06-01 00:00:00", 5, '{"k": 1}'),    # enum
        (4, 1.0, "view", "2031-01-01 00:00:00", 5, '{"k": 1}'),    # ts window
        (5, 1.0, "view", "2024-06-01 00:00:00", -7, '{"k": 1}'),   # id range
        (6, 1.0, "view", "2024-06-01 00:00:00", 5, "not json"),    # json
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, value double, event_type string, "
              "s string, user_id long, props string") \
        .selectExpr("event_id", "value", "event_type",
                    "cast(s as timestamp_ntz) as ts", "user_id", "props")
    out = {r.rule: r for r in CT.data_contract_audit(ev).collect()}
    assert all(r.n_rows == 7 for r in out.values())
    assert out["value_nonnegative"].violations == 2      # -2 and NULL
    assert out["type_in_enum"].violations == 1
    assert out["ts_in_window"].violations == 1
    assert out["user_id_in_range"].violations == 1
    assert out["props_json_object"].violations == 1
    assert out["type_in_enum"].violation_ppm == 1_000_000 // 7


def test_ingestion_completeness_hand_computed(spark):
    """Corpus hours 0..5 (span 6).  Type a observed {0,1,5} → missing
    3, internal gap 3 (2,3,4), edge gaps 0/0 → max 3.  Type b observed
    {3} → missing 5, edge gaps 3 and 2 → max 3."""
    from ai_log_analyzer_spark.functions import incidents as IC
    rows = [("a", 0), ("a", 0), ("a", 1), ("a", 5), ("b", 3)]
    ev = (spark.createDataFrame(rows, "event_type string, h long")
          .selectExpr("event_type",
                      "cast(timestamp_seconds(h * 3600) as timestamp_ntz)"
                      " as ts"))
    out = {r.event_type: r for r in
           IC.ingestion_completeness(ev).collect()}
    a, b = out["a"], out["b"]
    assert (a.span_hours, a.observed_hours, a.missing_hours) == (6, 3, 3)
    assert a.coverage_ppm == 500_000 and a.max_gap_hours == 3
    assert (b.span_hours, b.observed_hours, b.missing_hours) == (6, 1, 5)
    assert b.max_gap_hours == 3


def test_dup_size_histogram_hand_computed(spark):
    """Texts: x×3, y×2, z×1 → sizes {3:1, 2:1, 1:1}; removable 2+1 of
    6 rows → 333333 and 166666 ppm."""
    from ai_log_analyzer_spark.functions import dedup as D
    rows = [(0, "x"), (1, "x"), (2, "x"), (3, "y"), (4, "y"), (5, "z")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.group_size: r for r in D.dup_size_histogram(docs).collect()}
    assert out[3].n_groups == 1 and out[3].removable_rows == 2
    assert out[3].removable_ppm == 333_333
    assert out[2].removable_rows == 1 and out[2].removable_ppm == 166_666
    assert out[1].n_groups == 1 and out[1].removable_rows == 0
    assert sum(r.n_rows for r in out.values()) == 6


def test_pipeline_health_scorecard_flags_failures(spark):
    """A stream with a duplicated id, a contract violation, and a
    2/6-hour coverage hole fails exactly those checks."""
    from ai_log_analyzer_spark.functions import incidents as IC
    rows = [
        (0, 1.0, "click", 0, 5, '{"k": 1}'),
        (0, 1.0, "click", 0, 5, '{"k": 1}'),       # duplicate id
        (1, -3.0, "click", 1, 5, '{"k": 1}'),      # contract violation
        (2, 1.0, "view", 5, 5, '{"k": 1}'),        # hours {0,1,5}: 50%
    ]
    ev = (spark.createDataFrame(
        rows, "event_id long, value double, event_type string, "
              "h long, user_id long, props string")
        .selectExpr("event_id", "value", "event_type",
                    "cast(timestamp_seconds(h * 3600) as timestamp_ntz)"
                    " as ts", "user_id", "props"))
    out = {r.check_name: r for r in IC.pipeline_health(ev).collect()}
    assert len(out) == 4
    assert not out["ingestion_coverage_min_ppm"].ok      # 50% < 90%
    assert not out["contract_violation_max_ppm"].ok
    assert not out["delivery_dup_ppm"].ok                # 250000 ppm
    assert out["delivery_dup_ppm"].value == 250_000
    assert out["lateness_p99_s"].ok                      # in order


def test_layout_ops_empty_input(spark):
    """Empty inputs yield empty results with the right schema — no
    crashes from the min/max bounds paths."""
    from ai_log_analyzer_spark.functions import layout as LY
    ev = spark.createDataFrame(
        [], "event_id long, user_id long, ts timestamp_ntz, value double")
    assert LY.zorder_layout(ev).count() == 0
    assert LY.delta_bitwidth_audit(ev).count() == 0
    rb = LY.range_partition_bounds(ev)
    assert rb.count() == 0
    assert set(rb.columns) == {"tile", "n_rows", "lo_cents", "hi_cents"}
    docs = spark.createDataFrame([],
                                 "doc_id long, source string, n_chars long")
    assert LY.compaction_plan(docs).count() == 0


def test_apdex_score_hand_computed(spark):
    """T = 100.00: values 50 (sat), 150 (tol), 250 (tol), 900 (fru) →
    apdex = (1 + 2/2)/4 = 0.5."""
    from ai_log_analyzer_spark.functions import incidents as IC
    rows = [(0, "a", 50.0), (1, "a", 150.0), (2, "a", 250.0),
            (3, "a", 900.0)]
    ev = spark.createDataFrame(rows,
                               "event_id long, event_type string, "
                               "value double")
    r = IC.apdex_score(ev).collect()[0]
    assert (r.n, r.satisfied, r.tolerating, r.frustrated) == (4, 1, 2, 1)
    assert r.apdex_ppm == 500_000


def test_volume_movers_densifies_and_flags(spark):
    """Type a: day counts 4, 0 (silent), 2 → changes -100% (mover)
    then appearance-from-silence (mover, NULL ppm)."""
    from ai_log_analyzer_spark.functions import incidents as IC
    rows = [("a", 0)] * 4 + [("a", 2)] * 2
    ev = (spark.createDataFrame(rows, "event_type string, day long")
          .selectExpr("event_type",
                      "cast(timestamp_seconds(day * 86400 + 60) as "
                      "timestamp_ntz) as ts"))
    out = {r.day_idx: r for r in IC.volume_movers(ev).collect()}
    assert len(out) == 2
    d1, d2 = out[1], out[2]
    assert (d1.n, d1.prev_n, d1.change_ppm, bool(d1.is_mover)) \
        == (0, 4, -1_000_000, True)
    assert (d2.n, d2.prev_n, d2.change_ppm, bool(d2.is_mover)) \
        == (2, 0, None, True)
    # small wiggle is not a mover
    rows2 = [("b", 0)] * 10 + [("b", 1)] * 11
    ev2 = (spark.createDataFrame(rows2, "event_type string, day long")
           .selectExpr("event_type",
                       "cast(timestamp_seconds(day * 86400) as "
                       "timestamp_ntz) as ts"))
    r = IC.volume_movers(ev2).collect()[0]
    assert r.change_ppm == 100_000 and not r.is_mover


def test_capacity_profile_hand_computed(spark):
    """Type a: hours 0→3, 1→3, 5→2 (span 6, total 8); peak tie 3
    breaks to hour 0; peak/mean = 3·6/8 = 2.25."""
    from ai_log_analyzer_spark.functions import incidents as IC
    rows = [("a", 0)] * 3 + [("a", 1)] * 3 + [("a", 5)] * 2
    ev = (spark.createDataFrame(rows, "event_type string, h long")
          .selectExpr("event_type",
                      "cast(timestamp_seconds(h * 3600) as timestamp_ntz)"
                      " as ts"))
    r = IC.capacity_profile(ev).collect()[0]
    assert (r.total, r.span_hours, r.max_hourly) == (8, 6, 3)
    assert r.peak_hour_idx == 0          # tie → earliest
    assert r.peak_to_mean_ppm == 2_250_000


def test_stickiness_ratio_hand_computed(spark):
    """Days 0..2 (span 3): users/day {1,2}, {1}, {} + day 2 user 3 →
    DAU sum 2+1+1 = 4, span users {1,2,3} = 3 → 4/(3·3) ppm."""
    from ai_log_analyzer_spark.functions import incidents as IC
    rows = [("a", 0, 1), ("a", 0, 2), ("a", 1, 1), ("a", 2, 3)]
    ev = (spark.createDataFrame(rows,
                                "event_type string, d long, user_id long")
          .selectExpr("event_type",
                      "cast(timestamp_seconds(d * 86400) as timestamp_ntz)"
                      " as ts", "user_id"))
    r = IC.stickiness_ratio(ev).collect()[0]
    assert (r.span_days, r.dau_sum, r.span_users) == (3, 4, 3)
    assert r.stickiness_ppm == 4 * 1_000_000 // 9
