"""Rank-level diagnostics and fusion for retrieval / quality signals.

Two published primitives every curation + search stack ends up needing:

* **Kendall-τ signal agreement** (Kendall 1938): before replacing an
  expensive quality signal with a cheap one (or gating a corpus on a
  distilled classifier), you measure rank agreement between the two on
  a deterministic sample.  τ is pairwise — concordant vs discordant
  pairs — so it is exact in integer arithmetic end-to-end, unlike
  Pearson/Spearman coefficients which need sqrt.

* **Reciprocal-rank fusion** (Cormack, Clarke & Büttcher SIGIR 2009):
  the standard zero-training way to combine two retrieval systems —
  here BM25 relevance with the frozen quality classifier's ranking,
  i.e. quality-weighted retrieval, the shape web search and targeted
  data selection both use.  RRF(d) = Σ_s 1/(k + rank_s(d)), k = 60;
  computed in integer micro-units (1e6 div (60 + rank)) so fusion is
  exact and the DuckDB oracle can never diverge on float rounding.

Scale notes are on each function; the τ pair stage is the only
quadratic piece and is bounded by the deterministic hash-sample rate,
never by corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .hashing import hash32, hash32_sql
from .text import (CLF_BUCKETS, STOPWORDS, WS, _bucket_weight_milli,
                   bm25_rank, token_count, token_count_sql)

# ---------------------------------------------------------------------------
# Kendall-τ agreement between two frozen quality signals
# ---------------------------------------------------------------------------
# Signal A: the frozen linear classifier's mean token weight in SHIFTED
# ppm — ((_sm + 1000·n)·1000) div n ∈ [0, 2·10⁶], every integer
# division non-negative so Spark `div` (truncate) and DuckDB `//`
# (floor) agree.  Signal B: stopword rate in ppm — (n_stop·10⁶) div n.
# τ_a = (C − D) / P over all P = m(m−1)/2 sampled pairs; C − D can be
# negative, so the reported ratio is SHIFTED ppm again:
# ((C − D + P)·10⁶) div P ∈ [0, 2·10⁶] (10⁶ = τ of 0).

TAU_SAMPLE_MOD = 5          # keep doc when hash32(id) % 5 == 0 (~20%)


def kendall_tau_signals(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id",
                        sample_mod: int = TAU_SAMPLE_MOD) -> DataFrame:
    """One row: (n_docs, n_pairs, concordant, discordant, tied,
    tau_shifted_ppm) — Kendall τ_a between the classifier score and
    the stopword rate on the hash-sampled docs.

    Scale: the corpus reduces to one integer pair (a, b) per SAMPLED
    doc (one explode+groupBy for A — classifier_score's exact shuffle
    shape — and a codegen'd projection for B); the O(m²) pair join
    runs over the m sampled rows only, so the sample modulus — not the
    corpus — bounds the quadratic stage.  At 10¹² docs you'd sample
    ~10⁴ rows (mod ≈ 10⁸) and the pair stage is 5·10⁷ cheap integer
    comparisons, embarrassingly parallel."""
    base = (df.filter(F.trim(F.col(text_col)) != "")
            .filter(F.pmod(hash32(F.col(id_col).cast("string")),
                           F.lit(sample_mod)) == 0))
    toks = base.select(F.col(id_col).alias("doc_id"),
                       F.explode(F.split(F.trim(F.col(text_col)), WS))
                       .alias("w"))
    bucket = F.pmod(hash32(F.col("w")), F.lit(CLF_BUCKETS))
    sig_a = (toks.select("doc_id", _bucket_weight_milli(bucket).alias("m"))
             .groupBy("doc_id")
             .agg(F.count("*").cast("long").alias("n_toks"),
                  F.sum("m").alias("_sm"))
             .withColumn("a", F.expr("((_sm + 1000 * n_toks) * 1000)"
                                     " div n_toks")))
    stop_rx = r"\b(" + "|".join(STOPWORDS) + r")\b"
    n_stop = F.size(F.regexp_extract_all(F.lower(F.col(text_col)),
                                         F.lit(stop_rx), 0)).cast("long")
    nt = token_count(F.col(text_col)).cast("long")
    # integer `div` needs expr(); Column `/` is float division
    sig_b = (base.select(F.col(id_col).alias("doc_id"),
                         (n_stop * F.lit(1_000_000)).alias("_num"),
                         F.greatest(nt, F.lit(1)).alias("_den"))
             .select("doc_id", F.expr("_num div _den").alias("b")))
    sig = sig_a.select("doc_id", "a").join(sig_b, "doc_id")
    s1 = sig.select(F.col("doc_id").alias("id1"), F.col("a").alias("a1"),
                    F.col("b").alias("b1"))
    s2 = sig.select(F.col("doc_id").alias("id2"), F.col("a").alias("a2"),
                    F.col("b").alias("b2"))
    pairs = s1.join(s2, F.col("id1") < F.col("id2"))
    da = F.col("a1") - F.col("a2")
    db = F.col("b1") - F.col("b2")
    agg = pairs.agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum(((da > 0) & (db > 0) | (da < 0) & (db < 0)).cast("long"))
        .cast("long").alias("concordant"),
        F.sum(((da > 0) & (db < 0) | (da < 0) & (db > 0)).cast("long"))
        .cast("long").alias("discordant"))
    n_docs = sig.agg(F.count("*").cast("long").alias("n_docs"))
    return (agg.crossJoin(F.broadcast(n_docs))
            .withColumn("tied",
                        (F.col("n_pairs") - F.col("concordant")
                         - F.col("discordant")).cast("long"))
            .withColumn("tau_shifted_ppm",
                        F.expr("((concordant - discordant + n_pairs)"
                               " * 1000000) div greatest(n_pairs, 1)")
                        .cast("long"))
            .select("n_docs", "n_pairs", "concordant", "discordant",
                    "tied", "tau_shifted_ppm"))


def kendall_tau_signals_sql(table: str = "documents",
                            text_expr: str = "text",
                            id_expr: str = "doc_id",
                            sample_mod: int = TAU_SAMPLE_MOD) -> str:
    stop_rx = r"\b(" + "|".join(STOPWORDS) + r")\b"
    nt = token_count_sql(text_expr)
    bucket = f"({hash32_sql('w')} % {CLF_BUCKETS})"
    salted = f"'clfw|' || {bucket}::VARCHAR"
    milli = f"(({hash32_sql(salted)} % 2001) - 1000)"
    return f"""
WITH base AS (
  SELECT {id_expr} AS doc_id, {text_expr} AS txt FROM {table}
  WHERE trim({text_expr}) <> ''
    AND {hash32_sql(f'{id_expr}::VARCHAR')} % {sample_mod} = 0),
tok AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(txt), '\\s+')) AS w
  FROM base),
sig_a AS (
  SELECT doc_id, count(*)::BIGINT AS n_toks, sum({milli})::BIGINT AS _sm
  FROM tok GROUP BY 1),
a AS (
  SELECT doc_id, ((_sm + 1000 * n_toks) * 1000) // n_toks AS a
  FROM sig_a),
b AS (
  SELECT doc_id,
         (len(regexp_extract_all(lower(txt), '{stop_rx}')) * 1000000)
           // greatest({nt.replace(text_expr, 'txt')}, 1) AS b
  FROM base),
sig AS (SELECT doc_id, a.a, b.b FROM a JOIN b USING (doc_id)),
pairs AS (
  SELECT s1.a - s2.a AS da, s1.b - s2.b AS db
  FROM sig s1 JOIN sig s2 ON s1.doc_id < s2.doc_id),
agg AS (
  SELECT count(*)::BIGINT AS n_pairs,
         sum(CASE WHEN (da > 0 AND db > 0) OR (da < 0 AND db < 0)
                  THEN 1 ELSE 0 END)::BIGINT AS concordant,
         sum(CASE WHEN (da > 0 AND db < 0) OR (da < 0 AND db > 0)
                  THEN 1 ELSE 0 END)::BIGINT AS discordant
  FROM pairs),
nd AS (SELECT count(*)::BIGINT AS n_docs FROM sig)
SELECT n_docs, n_pairs, concordant, discordant,
       (n_pairs - concordant - discordant)::BIGINT AS tied,
       ((concordant - discordant + n_pairs) * 1000000
        // greatest(n_pairs, 1))::BIGINT AS tau_shifted_ppm
FROM agg, nd
"""


# ---------------------------------------------------------------------------
# Reciprocal-rank fusion of BM25 relevance and the quality ranking
# ---------------------------------------------------------------------------

RRF_K = 60                 # the constant from Cormack et al. 2009
RRF_POOL_K = 20            # per-system candidate pool depth


def rrf_fusion(df: DataFrame, query_terms: list[str], top_k: int = 10,
               pool_k: int = RRF_POOL_K, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """(doc_id, rank_bm25, rank_quality, rrf_micro, fused_rank): top-k
    docs by RRF over two systems — BM25 on ``query_terms`` and the
    frozen classifier's quality ranking (shifted-ppm score desc).
    A rank of 0 means "not in that system's top-``pool_k`` pool" and
    contributes nothing.

    Scale: each system's pool is a TakeOrderedAndProject (never a
    global sort); the fusion joins two ≤pool_k-row sides — driver-
    trivial at any corpus size; every score is an exact integer."""
    bm = (bm25_rank(df, query_terms, top_k=pool_k,
                    text_col=text_col, id_col=id_col)
          .select("doc_id", F.col("rank").cast("long").alias("rank_bm25")))
    base = df.filter(F.trim(F.col(text_col)) != "")
    toks = base.select(F.col(id_col).alias("doc_id"),
                       F.explode(F.split(F.trim(F.col(text_col)), WS))
                       .alias("w"))
    bucket = F.pmod(hash32(F.col("w")), F.lit(CLF_BUCKETS))
    qual = (toks.select("doc_id", _bucket_weight_milli(bucket).alias("m"))
            .groupBy("doc_id")
            .agg(F.count("*").cast("long").alias("n_toks"),
                 F.sum("m").alias("_sm"))
            .withColumn("shifted_ppm",
                        F.expr("((_sm + 1000 * n_toks) * 1000)"
                               " div n_toks")))
    qtop = (qual.orderBy(F.col("shifted_ppm").desc(), F.col("doc_id"))
            .limit(pool_k)
            .withColumn("rank_quality",
                        F.row_number().over(
                            Window.orderBy(F.desc("shifted_ppm"),
                                           F.asc("doc_id")))
                        .cast("long"))
            .select("doc_id", "rank_quality"))
    fused = (bm.join(qtop, "doc_id", "full_outer")
             .withColumn("rank_bm25",
                         F.coalesce("rank_bm25", F.lit(0)).cast("long"))
             .withColumn("rank_quality",
                         F.coalesce("rank_quality", F.lit(0)).cast("long"))
             .withColumn("rrf_micro", F.expr(
                 f"(CASE WHEN rank_bm25 > 0 THEN 1000000 div ({RRF_K} +"
                 f" rank_bm25) ELSE 0 END) + (CASE WHEN rank_quality > 0"
                 f" THEN 1000000 div ({RRF_K} + rank_quality) ELSE 0 END)")
                 .cast("long")))
    top = fused.orderBy(F.col("rrf_micro").desc(), F.col("doc_id")) \
        .limit(top_k)
    w = Window.orderBy(F.desc("rrf_micro"), F.asc("doc_id"))
    return (top.withColumn("fused_rank",
                           F.row_number().over(w).cast("long"))
            .select("doc_id", "rank_bm25", "rank_quality", "rrf_micro",
                    "fused_rank"))


def rrf_fusion_sql(query_terms: list[str], top_k: int = 10,
                   pool_k: int = RRF_POOL_K, table: str = "documents",
                   text_expr: str = "text",
                   id_expr: str = "doc_id") -> str:
    from .text import bm25_rank_sql
    bm25 = bm25_rank_sql(query_terms, top_k=pool_k, table=table,
                         text_expr=text_expr, id_expr=id_expr)
    bucket = f"({hash32_sql('w')} % {CLF_BUCKETS})"
    salted = f"'clfw|' || {bucket}::VARCHAR"
    milli = f"(({hash32_sql(salted)} % 2001) - 1000)"
    return f"""
WITH bm AS (
  SELECT doc_id, rank::BIGINT AS rank_bm25 FROM ({bm25})),
tok AS (
  SELECT {id_expr} AS doc_id,
         unnest(regexp_split_to_array(trim({text_expr}), '\\s+')) AS w
  FROM {table} WHERE trim({text_expr}) <> ''),
qual AS (
  SELECT doc_id, count(*)::BIGINT AS n_toks, sum({milli})::BIGINT AS _sm
  FROM tok GROUP BY 1),
shifted AS (
  SELECT doc_id, ((_sm + 1000 * n_toks) * 1000) // n_toks AS shifted_ppm
  FROM qual),
qtop AS (
  SELECT doc_id,
         (row_number() OVER (ORDER BY shifted_ppm DESC, doc_id))::BIGINT
           AS rank_quality
  FROM shifted QUALIFY rank_quality <= {pool_k}),
fused AS (
  SELECT coalesce(bm.doc_id, qtop.doc_id) AS doc_id,
         coalesce(bm.rank_bm25, 0)::BIGINT AS rank_bm25,
         coalesce(qtop.rank_quality, 0)::BIGINT AS rank_quality,
         ((CASE WHEN coalesce(bm.rank_bm25, 0) > 0
                THEN 1000000 // ({RRF_K} + bm.rank_bm25) ELSE 0 END)
        + (CASE WHEN coalesce(qtop.rank_quality, 0) > 0
                THEN 1000000 // ({RRF_K} + qtop.rank_quality)
                ELSE 0 END))::BIGINT AS rrf_micro
  FROM bm FULL OUTER JOIN qtop ON bm.doc_id = qtop.doc_id)
SELECT doc_id, rank_bm25, rank_quality, rrf_micro,
       (row_number() OVER (ORDER BY rrf_micro DESC, doc_id))::BIGINT
         AS fused_rank
FROM fused QUALIFY fused_rank <= {top_k}
"""


# ---------------------------------------------------------------------------
# Cohen's κ agreement between two binary quality gates
# ---------------------------------------------------------------------------
# Kendall-τ compares the signals as RANKINGS; Cohen's κ (Cohen 1960)
# compares them as the binary keep/drop DECISIONS the pipeline actually
# takes, correcting for chance agreement — the standard inter-annotator
# statistic, here applied to two filter rules.  Gate A = the frozen
# classifier's shifted-ppm score ≥ 10⁶ (positive mean token weight);
# gate B = the stopword rule (stopword_ratio ≥ CAL_STOP_THRESH) that
# classifier_calibration uses as its gold label.
#
# Exactness: κ = (N·(a+d) − pe_num) / (N² − pe_num) with
# pe_num = (a+b)(a+c) + (c+d)(b+d) — a ratio of integers.  The
# numerator can be negative, so the report is SHIFTED ppm:
# ((num + den)·10⁶) div den ∈ [0, 2·10⁶] (10⁶ = κ of 0).


def cohens_kappa_gates(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """One row: (n_docs, n_both_pos, n_a_only, n_b_only, n_both_neg,
    kappa_shifted_ppm) — chance-corrected agreement of the two gates.

    Scale: gate A is one explode+groupBy(doc_id) (the classifier-score
    shuffle shape), gate B a codegen'd projection; the 2×2 table is a
    single scalar aggregate — no per-pair stage at all, so this runs
    on the FULL corpus at any size (unlike τ, which samples)."""
    from .text import CAL_STOP_THRESH, quality_features
    base = df.filter(F.trim(F.col(text_col)) != "")
    toks = base.select(F.col(id_col).alias("doc_id"),
                       F.explode(F.split(F.trim(F.col(text_col)), WS))
                       .alias("w"))
    bucket = F.pmod(hash32(F.col("w")), F.lit(CLF_BUCKETS))
    gate_a = (toks.select("doc_id", _bucket_weight_milli(bucket).alias("m"))
              .groupBy("doc_id")
              .agg(F.count("*").cast("long").alias("n_toks"),
                   F.sum("m").alias("_sm"))
              .withColumn("a_pos",
                          F.expr("((_sm + 1000 * n_toks) * 1000)"
                                 " div n_toks") >= 1_000_000)
              .select("doc_id", "a_pos"))
    gate_b = (quality_features(base, text_col=text_col)
              .select(F.col(id_col).alias("doc_id"),
                      (F.col("stopword_ratio") >= CAL_STOP_THRESH)
                      .alias("b_pos")))
    cells = (gate_a.join(gate_b, "doc_id")
             .agg(F.sum((F.col("a_pos") & F.col("b_pos")).cast("long"))
                  .cast("long").alias("n_both_pos"),
                  F.sum((F.col("a_pos") & ~F.col("b_pos")).cast("long"))
                  .cast("long").alias("n_a_only"),
                  F.sum((~F.col("a_pos") & F.col("b_pos")).cast("long"))
                  .cast("long").alias("n_b_only"),
                  F.sum((~F.col("a_pos") & ~F.col("b_pos")).cast("long"))
                  .cast("long").alias("n_both_neg")))
    return (cells
            .withColumn("n_docs",
                        (F.col("n_both_pos") + F.col("n_a_only")
                         + F.col("n_b_only") + F.col("n_both_neg"))
                        .cast("long"))
            .withColumn("_pe", F.expr(
                "(n_both_pos + n_a_only) * (n_both_pos + n_b_only)"
                " + (n_b_only + n_both_neg) * (n_a_only + n_both_neg)"))
            .withColumn("_num", F.expr(
                "n_docs * (n_both_pos + n_both_neg) - _pe"))
            .withColumn("_den", F.expr("n_docs * n_docs - _pe"))
            .withColumn("kappa_shifted_ppm", F.expr(
                "((_num + _den) * 1000000) div greatest(_den, 1)")
                .cast("long"))
            .select("n_docs", "n_both_pos", "n_a_only", "n_b_only",
                    "n_both_neg", "kappa_shifted_ppm"))


def cohens_kappa_gates_sql(table: str = "documents",
                           text_expr: str = "text",
                           id_expr: str = "doc_id") -> str:
    from .text import CAL_STOP_THRESH, quality_features_sql
    bucket = f"({hash32_sql('w')} % {CLF_BUCKETS})"
    salted = f"'clfw|' || {bucket}::VARCHAR"
    milli = f"(({hash32_sql(salted)} % 2001) - 1000)"
    qf = quality_features_sql(text_expr)
    return f"""
WITH ck_tok AS (
  SELECT {id_expr} AS doc_id,
         unnest(regexp_split_to_array(trim({text_expr}), '\\s+')) AS w
  FROM {table} WHERE trim({text_expr}) <> ''),
ck_a AS (
  SELECT doc_id,
         ((sum({milli}) + 1000 * count(*)) * 1000) // count(*)
           >= 1000000 AS a_pos
  FROM ck_tok GROUP BY 1),
ck_b AS (
  SELECT {id_expr} AS doc_id,
         {qf['stopword_ratio']} >= {CAL_STOP_THRESH} AS b_pos
  FROM {table} WHERE trim({text_expr}) <> ''),
ck_cells AS (
  SELECT sum(CASE WHEN a_pos AND b_pos THEN 1 ELSE 0 END)::BIGINT
           AS n_both_pos,
         sum(CASE WHEN a_pos AND NOT b_pos THEN 1 ELSE 0 END)::BIGINT
           AS n_a_only,
         sum(CASE WHEN NOT a_pos AND b_pos THEN 1 ELSE 0 END)::BIGINT
           AS n_b_only,
         sum(CASE WHEN NOT a_pos AND NOT b_pos THEN 1 ELSE 0 END)::BIGINT
           AS n_both_neg
  FROM ck_a JOIN ck_b USING (doc_id)),
ck_k AS (
  SELECT *,
         (n_both_pos + n_a_only + n_b_only + n_both_neg)::BIGINT AS n_docs,
         (n_both_pos + n_a_only) * (n_both_pos + n_b_only)
           + (n_b_only + n_both_neg) * (n_a_only + n_both_neg) AS _pe
  FROM ck_cells)
SELECT n_docs, n_both_pos, n_a_only, n_b_only, n_both_neg,
       (((n_docs * (n_both_pos + n_both_neg) - _pe)
         + (n_docs * n_docs - _pe)) * 1000000
        // greatest(n_docs * n_docs - _pe, 1))::BIGINT
         AS kappa_shifted_ppm
FROM ck_k
"""


# ---------------------------------------------------------------------------
# Empirical-Bayes shrunk group means.  Ranking domains (or sources) by
# raw mean quality over-rewards tiny groups — a 2-page domain with two
# lucky pages outranks a solid 10⁵-page site.  The standard fix is
# shrinkage toward the global mean with a pseudo-count prior
# (James-Stein / Dirichlet smoothing): shrunk = (Σq + k·μ)/(n + k).
# Kept in EXACT integers (μ = global Σq div N, floor division on both
# engines) so the ranking is reproducible bit-for-bit.


def shrunk_group_means(df, group_col: str = "grp",
                       score_col: str = "score_ppm", k: int = 20):
    """(grp, n_items, mean_ppm, shrunk_ppm) per group: raw integer
    mean and the k-pseudo-count shrunk mean toward the global mean.

    Scale shape: ONE partial-aggregable groupBy(group) — the corpus
    collapses to the group table; the global mean is a 1-row broadcast
    agg OF that table (no second corpus scan)."""
    g = (df.groupBy(F.col(group_col).alias("grp"))
         .agg(F.count("*").cast("long").alias("n_items"),
              F.sum(F.col(score_col).cast("long")).alias("_s")))
    tot = g.agg(F.sum("n_items").alias("_n"), F.sum("_s").alias("_ss"))
    return (g.crossJoin(F.broadcast(tot))
            .select("grp", "n_items",
                    F.expr("_s div n_items").cast("long").alias("mean_ppm"),
                    F.expr(f"(_s + {k} * (_ss div _n)) div (n_items + {k})")
                    .cast("long").alias("shrunk_ppm")))


def shrunk_group_means_sql(table: str, group_expr: str, score_expr: str,
                           k: int = 20) -> str:
    """DuckDB oracle: identical integer folds."""
    return f"""
sg_g AS (
  SELECT {group_expr} AS grp, count(*)::BIGINT AS n_items,
         sum(({score_expr})::BIGINT)::BIGINT AS s
  FROM {table} GROUP BY 1),
sg_tot AS (SELECT sum(n_items)::BIGINT AS n, sum(s)::BIGINT AS ss FROM sg_g),
sg AS (
  SELECT grp, n_items, (s // n_items)::BIGINT AS mean_ppm,
         ((s + {k} * (t.ss // t.n)) // (n_items + {k}))::BIGINT
           AS shrunk_ppm
  FROM sg_g, sg_tot t)"""
