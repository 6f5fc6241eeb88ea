"""Edge-semantics tests for the round-5 curation operators: Gopher
rules, BPE pair counts, exact histogram percentiles, DSIR weights,
mixture manifest, cross-source priority dedup.  The corpus-level
Spark-vs-DuckDB parity for each lives in test_driver_contract.py;
these pin the boundary cases the sf corpus doesn't hit."""

import pytest
from pyspark.sql import functions as F

from ai_log_analyzer_spark.functions import dedup as D
from ai_log_analyzer_spark.functions import sampling as SA
from ai_log_analyzer_spark.functions import text as TX


def _docs(spark, rows, cols=("doc_id", "text")):
    return spark.createDataFrame(rows, list(cols))


def test_gopher_flags_boundaries(spark):
    rows = [
        (1, "abc def ghi jkl mno"),          # 5 words, mwl=3 → all pass
        (2, "ab cd ef gh ij"),               # mwl=2 < 3 → f_mean_word_len=0
        (3, ""),                             # empty → n_words=0, keep=0
        (4, "the of # aaa bbb ccc ddd eee ff gg"),  # 1 sym / 10 words: pass
        (5, "the of # aaa bbb ccc ddd eee ff"),     # 1 sym / 9 words: fail
        (6, "11 22 the of aaa bbb ccc dd ee ff"),     # alpha 8/10: pass
        (7, "111 222 333 the of aaa bbb cc dd ee"),   # alpha 7/10: fail
        (8, "abc def ghi jkl mno pqr"),      # no stop words → f_stop=0
    ]
    out = {r.doc_id: r for r in TX.gopher_flags(_docs(spark, rows)).collect()}
    assert out[1].n_words == 5 and out[1].f_mean_word_len == 1
    assert out[2].f_mean_word_len == 0
    assert out[3].n_words == 0 and out[3].keep == 0
    assert out[4].f_symbol_ratio == 1
    assert out[5].f_symbol_ratio == 0
    assert out[6].f_alpha_words == 1
    assert out[7].f_alpha_words == 0
    assert out[8].f_stop_words == 0 and out[8].keep == 0


def test_gopher_keep_is_conjunction(spark):
    rows = [(1, "the cat sat of the mat with word")]   # passes everything
    r = TX.gopher_flags(_docs(spark, rows)).collect()[0]
    flags = [r.f_word_count, r.f_mean_word_len, r.f_symbol_ratio,
             r.f_alpha_words, r.f_stop_words]
    assert r.keep == int(all(flags)) == 1


def test_bpe_pair_counts_known_corpus(spark):
    # within-word adjacent pairs of "abab": ab, ba, ab → ab×2, ba×1
    rows = [(1, "abab abab ab"), (2, "abab ab")]
    out = {r.pair: r.pair_count
           for r in TX.bpe_pair_counts(_docs(spark, rows), "text").collect()}
    # word freqs: abab×3, ab×2 → ab pairs = 3*2 + 2*1 = 8, ba = 3*1 = 3
    assert out == {"ab": 8, "ba": 3}


def test_bpe_pair_counts_rank_ties_break_lexically(spark):
    rows = [(1, "xy yz")]   # both pairs count 1
    out = TX.bpe_pair_counts(_docs(spark, rows), "text").collect()
    assert [(r.pair, r.rank) for r in out] == [("xy", 1), ("yz", 2)]


def test_token_percentiles_discrete_definition(spark):
    # group g: token counts [1,2,3,4] → n=4, p50 needs cum>=2 → 2;
    # p90 needs cum>=ceil(3.6)=4 → 4
    rows = [("g", "a"), ("g", "a b"), ("g", "a b c"), ("g", "a b c d")]
    df = spark.createDataFrame(rows, ["source", "text"])
    r = TX.token_percentiles(df).collect()[0]
    assert (r.n_docs, r.sum_tokens, r.p50_tokens, r.p90_tokens,
            r.max_tokens) == (4, 10, 2, 4, 4)


def test_token_percentiles_single_doc(spark):
    df = spark.createDataFrame([("s", "a b c")], ["source", "text"])
    r = TX.token_percentiles(df).collect()[0]
    assert (r.p50_tokens, r.p90_tokens, r.max_tokens) == (3, 3, 3)


def test_dsir_weights_favor_target_tokens(spark):
    # target slice speaks only 'aa', raw background only 'bb': a doc of
    # 'aa' must out-weight a doc of 'bb'
    rows = [(1, "aa aa aa", "en"), (2, "aa aa", "en"),
            (3, "bb bb bb", "xx"), (4, "bb bb bb bb", "xx")]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = {r.doc_id: r.dsir_weight
           for r in SA.dsir_weights(df, target=F.col("lang") == "en")
           .collect()}
    assert out[1] > 0 > out[3]
    assert out[1] == out[2]          # same single-bucket content
    assert out[3] == out[4]


def test_dsir_weights_empty_text_excluded(spark):
    df = spark.createDataFrame([(1, "", "en"), (2, "aa", "en")],
                               ["doc_id", "text", "lang"])
    got = SA.dsir_weights(df, target=F.col("lang") == "en").collect()
    assert [r.doc_id for r in got] == [2]


def test_mixture_epochs_exact_integers(spark):
    # tokens: s1=100, s2=400 → isqrt 10, 20 → ppm 333333/666666;
    # budget 300 → targets 99, 199; epochs 990000, 497500
    rows = [("s1", " ".join(["w"] * 100)), ("s2", " ".join(["w"] * 400))]
    df = spark.createDataFrame(rows, ["source", "text"])
    out = {r.source: r for r in SA.mixture_epochs(df, 300).collect()}
    assert out["s1"].weight_ppm == 333333
    assert out["s2"].weight_ppm == 666666
    assert out["s1"].target_tokens == 99
    assert out["s2"].target_tokens == 199
    assert out["s1"].epochs_ppm == 990000
    assert out["s2"].epochs_ppm == 497500


def test_mixture_epochs_upsampled_source_exceeds_1e6(spark):
    rows = [("tiny", "w w"), ("big", " ".join(["w"] * 800))]
    df = spark.createDataFrame(rows, ["source", "text"])
    out = {r.source: r for r in SA.mixture_epochs(df, 800).collect()}
    assert out["tiny"].epochs_ppm > 1_000_000     # multi-epoch upsample


def test_cross_dedup_priority_survivor(spark):
    rows = [(10, "src5", "same text"), (3, "src2", "same text"),
            (7, "src2", "same text"), (1, "src9", "unique")]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    prio = F.regexp_extract(F.col("source"), r"([0-9]+)$", 1).cast("long")
    out = {r.doc_id: r for r in
           D.cross_dedup_priority(df, priority=prio).collect()}
    # src2 (priority 2) beats src5; within src2 min doc_id=3 wins
    assert out[10].keep_id == 3 and out[10].is_kept == 0
    assert out[3].is_kept == 1
    assert out[7].keep_id == 3 and out[7].is_kept == 0
    assert out[1].is_kept == 1


def test_cross_dedup_priority_whitespace_insensitive(spark):
    rows = [(1, "src3", "Hello  World"), (2, "src1", "hello world")]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    prio = F.regexp_extract(F.col("source"), r"([0-9]+)$", 1).cast("long")
    out = {r.doc_id: r for r in
           D.cross_dedup_priority(df, priority=prio).collect()}
    assert out[1].keep_id == 2 and out[2].is_kept == 1


def test_c4_filters_line_rules(spark):
    page = ("one two three four five.\n"      # kept: 5 words + '.'
            "short line.\n"                   # dropped: 2 words
            "six seven eight nine ten eleven\n"  # dropped: no terminal
            'quoted one two three four five"\n'  # kept: ends in "
            "ask one two three four five?")   # kept: ends in ?
    r = TX.c4_filters(_docs(spark, [(1, page)])).collect()[0]
    assert (r.n_lines, r.n_kept) == (5, 3)
    # sentences counted over KEPT text only: '.', '?' → 2 (quote ignored)
    assert r.n_sentences == 2 and r.keep == 0     # < 3 sentences
    assert r.clean_text.count("\n") == 2


def test_c4_filters_page_flags(spark):
    good = "\n".join(f"alpha beta gamma delta epsilon{t}"
                     for t in (".", "!", "?"))
    rows = [(1, good),
            (2, good + "\nmore Lorem Ipsum filler."),
            (3, good + "\nvar x = { a: 1 };")]
    out = {r.doc_id: r for r in
           TX.c4_filters(_docs(spark, rows)).collect()}
    assert out[1].keep == 1
    assert out[2].has_lorem == 1 and out[2].keep == 0
    assert out[3].has_brace == 1 and out[3].keep == 0


def test_c4_filters_empty_survivors(spark):
    r = TX.c4_filters(_docs(spark, [(1, "tiny\nlines only")])).collect()[0]
    assert (r.n_kept, r.clean_text, r.keep) == (0, "", 0)


def test_ccnet_buckets_terciles(spark):
    # 9 docs, one lang, three distinct fluency tiers: repeated common
    # bigrams score higher than one-off transitions
    rows = ([(i, "a b a b a b a b", "en") for i in range(3)] +
            [(i, "a b c d a b", "en") for i in range(3, 6)] +
            [(i, f"q{i} r{i} s{i} t{i}", "en") for i in range(6, 9)])
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = {r.doc_id: r.bucket for r in TX.ccnet_buckets(df).collect()}
    assert all(out[i] == "head" for i in range(3))
    assert all(out[i] == "middle" for i in range(3, 6))
    assert all(out[i] == "tail" for i in range(6, 9))


def test_ccnet_buckets_ties_share_bucket(spark):
    # 4 identical docs + 2 worse: the identical group must land in ONE
    # bucket even though a pure row-ntile would split it
    rows = ([(i, "x y x y x y", "en") for i in range(4)] +
            [(i, f"u{i} v{i} w{i}", "en") for i in range(4, 6)])
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = {r.doc_id: r.bucket for r in TX.ccnet_buckets(df).collect()}
    assert len({out[i] for i in range(4)}) == 1
    assert all(out[i] == "tail" for i in range(4, 6))


def test_ccnet_buckets_per_language(spark):
    # each lang gets its own tercile cutoffs over its own docs: per
    # lang, 1 fluent doc (head), 2 mid (middle), 2 token-salad (tail)
    rows = []
    for base, lg, a, b in [(0, "en", "x", "y"), (100, "fr", "c", "d")]:
        rows.append((base, " ".join([a, b] * 5), lg))
        rows += [(base + i, " ".join([a + "p", b + "q"] * 2), lg)
                 for i in (1, 2)]
        rows += [(base + i, f"{lg}u{i} {lg}v{i} {lg}w{i} {lg}z{i}", lg)
                 for i in (3, 4)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = {r.doc_id: r.bucket for r in TX.ccnet_buckets(df).collect()}
    for base in (0, 100):
        assert out[base] == "head"
        assert out[base + 1] == out[base + 2] == "middle"
        assert out[base + 3] == out[base + 4] == "tail"


def test_vocab_coverage_exact_integer_ceil(spark):
    # en: freqs {a:6, b:2, c:1, d:1} -> total 10, distinct 4.
    #   p50: bar 5 -> class c=6 crosses: k = 0 + ceil(500/600) = 1
    #   p90: bar 9 -> after a(6)+b(2)=8 < 9; class c=1 (2 toks) crosses:
    #        k = 2 + ceil((900-800)/100) = 3
    # fr: uniform freqs {u,v,w,x}=1 -> total 4; p50 -> 2, p90 -> 4
    #     (single class c=1, k = ceil(p*4/100))
    rows = [(1, "a a a b", "en"), (2, "a a a b c d", "en"),
            (3, "u v", "fr"), (4, "w x", "fr")]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = {r.lang: r for r in TX.vocab_coverage(df).collect()}
    en, fr = out["en"], out["fr"]
    assert (en.total_tokens, en.n_distinct, en.toks_p50, en.toks_p90) \
        == (10, 4, 1, 3)
    assert (fr.total_tokens, fr.n_distinct, fr.toks_p50, fr.toks_p90) \
        == (4, 4, 2, 4)


def test_vocab_coverage_sql_parity_handcrafted():
    import duckdb
    con = duckdb.connect()
    con.execute("CREATE TABLE d (lang VARCHAR, text VARCHAR)")
    for lang, text in [("en", "a a a b"), ("en", "a a a b c d"),
                       ("fr", "u v"), ("fr", "w x")]:
        con.execute("INSERT INTO d VALUES (?, ?)", [lang, text])
    rows = {r[0]: r for r in con.sql(
        TX.vocab_coverage_sql("d", "text", "lang")).fetchall()}
    assert rows["en"] == ("en", 10, 4, 1, 3)
    assert rows["fr"] == ("fr", 4, 4, 2, 4)


def test_script_stats_histogram_and_argmax(spark):
    rows = [(1, "abc Привет"),          # latin 3, cyrillic 6 -> cyrillic
            (2, "你好 ab 12 !"),          # cjk 2, latin 2, other 3 -> tie:
                                         # name order (cjk after latin) ->
                                         # latin wins (first in order)
            (3, "   "),                  # all zero -> none
            (4, "안녕 Γειά")]             # hangul 2, greek 4 -> greek
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in TX.script_stats(df).collect()}
    assert out[1].n_latin == 3 and out[1].n_cyrillic == 6
    assert out[1].dominant_script == "cyrillic"
    assert out[2].n_cjk == 2 and out[2].n_latin == 2
    assert out[2].n_other == 3  # '1', '2', '!'
    assert out[2].dominant_script == "latin"  # tie -> earlier name
    assert out[3].dominant_script == "none"
    assert out[4].dominant_script == "greek"


def test_script_stats_sql_parity_handcrafted():
    import duckdb
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    for r in [(1, "abc Привет"), (2, "你好 ab 12 !"), (3, "   "),
              (4, "안녕 Γειά")]:
        con.execute("INSERT INTO d VALUES (?, ?)", list(r))
    rows = {r[0]: r for r in con.sql(
        TX.script_stats_sql("d", "text", "doc_id")).fetchall()}
    assert rows[1][-1] == "cyrillic" and rows[1][1] == 3 and rows[1][2] == 6
    assert rows[2][-1] == "latin" and rows[2][-2] == 3
    assert rows[3][-1] == "none"
    assert rows[4][-1] == "greek"


def test_snapshot_diff_statuses(spark):
    from ai_log_analyzer_spark.functions import snapshots as SN
    old = spark.createDataFrame(
        [("u1", "hello world"), ("u2", "old text"), ("u3", "same")],
        ["url", "text"])
    new = spark.createDataFrame(
        [("u2", "new text"),          # changed
         ("u3", "  same  "),          # formatting-only -> unchanged
         ("u4", "brand new")],        # added; u1 removed
        ["url", "text"])
    out = {r.url: r.status for r in SN.snapshot_diff(old, new).collect()}
    assert out == {"u1": "removed", "u2": "changed",
                   "u3": "unchanged", "u4": "added"}


def test_source_overlap_exact_jaccard(spark):
    rows = [("s1", "a"), ("s1", "b"), ("s1", "c"),
            ("s2", "b"), ("s2", "c"), ("s2", "d"),
            ("s3", "zzz"),
            ("s1", "b  ")]  # formatting dup of s1's 'b' -> same fp
    df = spark.createDataFrame(rows, ["source", "text"])
    out = {(r.source_a, r.source_b): r
           for r in D.source_overlap(df).collect()}
    r = out[("s1", "s2")]
    # s1 = {a,b,c}, s2 = {b,c,d}: shared 2, union 4 -> 500000 ppm
    assert (r.n_a, r.n_b, r.n_shared, r.jaccard_ppm) == (3, 3, 2, 500000)
    assert ("s1", "s3") not in out  # zero-overlap pairs are absent


def test_dup_passage_positional_semantics(spark):
    """Stride-1 positional dup detection: a passage duplicated at a
    DIFFERENT alignment in a later doc is caught (the fixed-window
    segment_dedup failure mode); within-doc repeats of a self-owned
    n-gram are not duplicates; n_pos counts positions (multiplicity)."""
    d1 = "a b c d e f"                 # owns every 3-gram, 4 positions
    d2 = "x b c d e y"                 # 'b c d'+'c d e' dup of d1, shifted
    d3 = "p q r p q r p q"             # self-repeats only -> 0 dups
    df = spark.createDataFrame(
        [(1, d1), (2, d2), (3, d3)], ["doc_id", "text"])
    out = {r.doc_id: r for r in D.dup_passage_stats(df, n=3).collect()}
    assert (out[1].n_pos, out[1].n_dup_pos) == (4, 0)
    assert (out[2].n_pos, out[2].n_dup_pos) == (4, 2)   # b c d / c d e
    assert (out[3].n_pos, out[3].n_dup_pos) == (6, 0)   # self-owned repeats
    assert out[2].dup_ratio == 0.5
    # a doc shorter than n has no positions and is absent
    df2 = spark.createDataFrame([(1, "a b"), (2, "a b c")],
                                ["doc_id", "text"])
    out2 = {r.doc_id for r in D.dup_passage_stats(df2, n=3).collect()}
    assert out2 == {2}
