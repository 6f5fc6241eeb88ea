"""Text-analysis operators for the training-data pipeline (task spec:
language-ID, quality scoring, token counting, document fingerprinting).

Everything is pure Catalyst (``pyspark.sql.functions`` — JVM-side,
whole-stage codegen); regex dialects are kept to the common subset of
Java regex (Spark) and RE2 (DuckDB) so each operator has an exact SQL
oracle.  No per-row Python UDFs anywhere in this module; the one
Arrow-vectorized kernel (repetition_stats, r6) computes exact integers
per batch — see its docstring.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .hashing import hash32

WS = r"\s+"
BPE_ISH = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# frozen marker lexicons for the n-gram language-ID heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "les", "et", "est"],
    "es": ["el", "los", "las", "y", "es"],
    "zh": ["de", "shi", "le", "bu", "wo"],
}

STOPWORDS = ["the", "a", "of", "to", "and", "in", "is", "it", "on", "for"]


def token_count(text: Column) -> Column:
    """Whitespace token count (0 for empty/blank)."""
    t = F.trim(text)
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, WS)))


def token_count_sql(expr: str) -> str:
    return (f"CASE WHEN trim({expr}) = '' THEN 0 "
            f"ELSE len(regexp_split_to_array(trim({expr}), '\\s+')) END")


def bpe_token_count(text: Column) -> Column:
    """BPE-ish subword-boundary token count: letter runs, digit runs,
    single punctuation marks."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH), 0))


def bpe_token_count_sql(expr: str) -> str:
    return f"len(regexp_extract_all({expr}, '{BPE_ISH}'))"


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 over whitespace-normalized lowercase."""
    return F.md5(F.regexp_replace(F.lower(F.trim(text)), WS, " "))


def fingerprint_sql(expr: str) -> str:
    return f"md5(regexp_replace(lower(trim({expr})), '\\s+', ' ', 'g'))"


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation-ratio / stopword-ratio / mean-word-length —
    the classic cheap quality signals, all codegen'd."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = token_count(t)
    n_punct = F.length(t) - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    stop_rx = r"\b(" + "|".join(STOPWORDS) + r")\b"
    n_stop = F.size(F.regexp_extract_all(F.lower(t), F.lit(stop_rx), 0))
    return (df
            .withColumn("n_chars", n_chars.cast("long"))
            .withColumn("n_tokens", n_tokens.cast("long"))
            .withColumn("punct_ratio", F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6))
            .withColumn("stopword_ratio", F.round(n_stop / F.greatest(n_tokens, F.lit(1)), 6))
            .withColumn("mean_word_len", F.round(
                (F.length(F.regexp_replace(t, WS, ""))) / F.greatest(n_tokens, F.lit(1)), 6)))


def quality_features_sql(text_expr: str) -> dict:
    stop_rx = r"\b(" + "|".join(STOPWORDS) + r")\b"
    n_tokens = token_count_sql(text_expr)
    return {
        "n_chars": f"length({text_expr})",
        "n_tokens": n_tokens,
        "punct_ratio": (f"round((length({text_expr}) - length(regexp_replace({text_expr}, '[^\\w\\s]', '', 'g')))"
                        f" / greatest(length({text_expr}), 1), 6)"),
        "stopword_ratio": (f"round(len(regexp_extract_all(lower({text_expr}), '{stop_rx}'))"
                           f" / greatest({n_tokens}, 1), 6)"),
        "mean_word_len": (f"round(length(regexp_replace({text_expr}, '\\s+', '', 'g'))"
                          f" / greatest({n_tokens}, 1), 6)"),
    }


# PII scrubbing for web-scale training data: (name, regex, replacement),
# applied IN ORDER, most-specific first — email/ip/ssn run before the
# greedy phone pattern so their digit runs are already gone when phone
# matching sees the text.  Patterns stay in the Java-regex ∩ RE2 subset
# so the DuckDB oracle is exact.
PII_RULES = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("ssn_like", r"\b\d{3}-\d{2}-\d{4}\b", "<ID>"),
    ("phone", r"\+?\d[\d -]{7,14}\d", "<PHONE>"),
]


def pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds per-rule redaction counts and the scrubbed text's
    fingerprint — the standard pre-training privacy pass, pure Catalyst
    (sequential regexp_replace chain, codegen'd; counts BEFORE each
    replacement so overlapping rules count what they actually ate)."""
    scrubbed = F.col(text_col)
    out = df
    for name, rx, repl in PII_RULES:
        out = out.withColumn(
            f"n_{name}", F.size(F.regexp_extract_all(scrubbed, F.lit(rx), 0)))
        scrubbed = F.regexp_replace(scrubbed, rx, repl)
    return out.withColumn("scrub_fingerprint", F.md5(scrubbed))


def pii_scrub_sql(text_expr: str) -> dict:
    """Column exprs mirroring ``pii_scrub`` (same rule order)."""
    cols = {}
    scrubbed = text_expr
    for name, rx, repl in PII_RULES:
        cols[f"n_{name}"] = f"len(regexp_extract_all({scrubbed}, '{rx}'))"
        scrubbed = f"regexp_replace({scrubbed}, '{rx}', '{repl}', 'g')"
    cols["scrub_fingerprint"] = f"md5({scrubbed})"
    return cols


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-lexicon language ID: argmax over per-language marker hit
    counts; ties and zero hits → 'und'.  Deterministic tie-break by
    language code order."""
    t = F.lower(F.col(text_col))
    scores = []
    for lang in sorted(LANG_MARKERS):
        rx = r"\b(" + "|".join(LANG_MARKERS[lang]) + r")\b"
        scores.append(F.size(F.regexp_extract_all(t, F.lit(rx), 0)).alias(f"score_{lang}"))
    out = df.select("*", *scores)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in sorted(LANG_MARKERS)])
    guess = F.lit("und")
    for lang in sorted(LANG_MARKERS, reverse=True):
        guess = F.when((F.col(f"score_{lang}") == best) & (best > 0), lang).otherwise(guess)
    return out.withColumn("lang_guess", guess)


def lang_id_sql(text_expr: str) -> tuple[list[str], str]:
    """Returns (score select-exprs, guess expr) mirroring ``lang_id``."""
    scores = []
    for lang in sorted(LANG_MARKERS):
        rx = r"\b(" + "|".join(LANG_MARKERS[lang]) + r")\b"
        scores.append(f"len(regexp_extract_all(lower({text_expr}), '{rx}')) AS score_{lang}")
    langs = sorted(LANG_MARKERS)
    best = "greatest(" + ", ".join(f"score_{lang}" for lang in langs) + ")"
    # same fold as lang_id: build from 'und' upward so the lowest lang
    # code wins ties (outermost CASE)
    guess = "'und'"
    for lang in sorted(LANG_MARKERS, reverse=True):
        guess = (f"CASE WHEN score_{lang} = {best} AND {best} > 0 "
                 f"THEN '{lang}' ELSE {guess} END")
    return scores, guess


# ---------------------------------------------------------------------------
# HTML text extraction (north star: "parse over the html/text byte
# columns" of Common-Crawl-style pages).  Comments go first (they may
# contain anything), then script/style blocks (their content is not
# text, case-insensitive — real crawls carry <SCRIPT>), then tags, then
# entity decoding (AFTER tag strip so a decoded &lt;b&gt; never reads
# as markup; &amp; LAST so double-escaped text decodes exactly one
# level), then whitespace collapse.  Patterns avoid backreferences so
# they sit in the Java-regex ∩ RE2 subset and the DuckDB oracle is
# exact; (?s) makes `.` cross newlines in multi-line documents.
# ---------------------------------------------------------------------------

COMMENT_RE = r"(?s)<!--.*?-->"
SCRIPT_RE = r"(?is)<script[^>]*>.*?</script>"
STYLE_RE = r"(?is)<style[^>]*>.*?</style>"
TAG_RE = r"<[^>]+>"

# the standard named entities + their decimal numeric twins; a full
# numeric decoder (&#NNNN; → any codepoint) needs computed replacement
# text, which neither regexp_replace dialect can express — the bounded
# chain covers the forms that dominate real markup
HTML_ENTITIES = (
    (r"&lt;|&#60;", "<"),
    (r"&gt;|&#62;", ">"),
    (r"&quot;|&#34;", '"'),
    (r"&apos;|&#39;", "'"),
    (r"&nbsp;|&#160;", " "),
    (r"&amp;|&#38;", "&"),
)


def html_text(html: Column) -> Column:
    """Visible text of an html string: drop comments and script/style
    blocks (case-insensitive), strip tags, decode the standard
    entities, collapse whitespace.  Pure Catalyst — at 100 TB this is a
    codegen'd projection over the scan, no shuffle, no Python."""
    s = F.regexp_replace(html, COMMENT_RE, " ")
    s = F.regexp_replace(s, SCRIPT_RE, " ")
    s = F.regexp_replace(s, STYLE_RE, " ")
    s = F.regexp_replace(s, TAG_RE, " ")
    for pat, repl in HTML_ENTITIES:
        s = F.regexp_replace(s, pat, repl)
    return F.trim(F.regexp_replace(s, WS, " "))


def html_text_sql(expr: str) -> str:
    s = f"regexp_replace({expr}, '{COMMENT_RE}', ' ', 'g')"
    s = f"regexp_replace({s}, '{SCRIPT_RE}', ' ', 'g')"
    s = f"regexp_replace({s}, '{STYLE_RE}', ' ', 'g')"
    s = f"regexp_replace({s}, '{TAG_RE}', ' ', 'g')"
    for pat, repl in HTML_ENTITIES:
        lit = repl.replace("'", "''")
        s = f"regexp_replace({s}, '{pat}', '{lit}', 'g')"
    return f"trim(regexp_replace({s}, '\\s+', ' ', 'g'))"


def html_tag_count(html: Column) -> Column:
    """Markup-density signal: number of tags in the raw html (cheap
    boilerplate-detection feature)."""
    return F.size(F.regexp_extract_all(html, F.lit(TAG_RE), 0)).cast("long")


def html_tag_count_sql(expr: str) -> str:
    return f"len(regexp_extract_all({expr}, '{TAG_RE}'))"


def html_extract(df: DataFrame, html_col: str = "html") -> DataFrame:
    """``html: binary`` → extracted text + tag count (the input-contract
    page shape carries html as bytes; decode happens JVM-side)."""
    s = F.decode(F.col(html_col), "UTF-8")
    return (df
            .withColumn("extracted", html_text(s))
            .withColumn("n_tags", html_tag_count(s)))


# ---------------------------------------------------------------------------
# Within-document repetition ratio — the standard "spammy page" quality
# signal for pre-training corpora: share of word n-grams that are
# repeats of an earlier n-gram in the same document.  Per-row projection
# over token arrays (sequence/transform/array_distinct) — zero shuffle,
# zero Python; survives any scale trivially.
# ---------------------------------------------------------------------------

def repetition_stats(df: DataFrame, n: int = 3, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_ngrams, n_distinct, rep_ratio) per document with at
    least one n-gram (shorter docs carry no signal and are dropped,
    matching the oracle's UNNEST semantics).

    r6 OPTIMIZATION (guide §4.2): the counts used to be an interpreted
    HOF chain (transform+slice+concat_ws, evaluated once for size and
    AGAIN under array_distinct — 29.6 s at the driver's sf1.0).  The
    two integers are now computed per batch in an Arrow-vectorized
    kernel with identical tokenize/shingle semantics (split-on-\\s+ of
    the space-trimmed text, ' '-joined n-grams, distinct = set), and
    the float division + 6-dp round stay in the SAME Catalyst
    expressions as before — integers are exact, so the output is
    bit-identical (oracle mirror re-verified at 3 SFs)."""
    import re

    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    # re.ASCII: Java's \s is ASCII-only; Python's default is Unicode —
    # keep the tokenizer byte-identical to the Catalyst split
    ws_re = re.compile(WS, re.ASCII)
    res_t = T.StructType([
        T.StructField("n_ngrams", T.LongType(), False),
        T.StructField("n_distinct", T.LongType(), False),
    ])

    @pandas_udf(res_t)
    def _counts(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for texts in batches:
            nn, nd = [], []
            for t in texts:
                if t is None:
                    nn.append(0)
                    nd.append(0)
                    continue
                toks = ws_re.split(t.strip(" "))
                m = len(toks) - n + 1
                if m <= 0:
                    nn.append(0)
                    nd.append(0)
                    continue
                nn.append(m)
                nd.append(len({" ".join(toks[i:i + n])
                               for i in range(m)}))
            yield pd.DataFrame({"n_ngrams": nn, "n_distinct": nd})

    return (df
            .select(F.col(id_col).alias("doc_id"),
                    _counts(F.col(text_col)).alias("_c"))
            .select("doc_id",
                    F.col("_c.n_ngrams").alias("n_ngrams"),
                    F.col("_c.n_distinct").alias("n_distinct"))
            .filter(F.col("n_ngrams") > 0)
            .withColumn("rep_ratio", F.round(
                F.lit(1.0) - F.col("n_distinct") / F.col("n_ngrams"), 6)))


# ---------------------------------------------------------------------------
# Corpus-frequency scoring — a self-supervised quality signal: documents
# made of corpus-common tokens score high mean term frequency, documents
# of rare/garbage tokens score low.  All aggregates are exact integers
# until one final division, so the DuckDB oracle matches bit-for-bit.
# ---------------------------------------------------------------------------

def corpus_tf_score(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_toks, sum_tf, mean_tf): per-doc sum/mean of corpus-wide
    token frequencies.

    Scale shape: one explode + one groupBy(word) for the frequency
    table, then a broadcast join back onto the token stream (the
    frequency side is vocabulary-sized — ~10⁶ rows even at web scale
    after any sane token-length cap, far under the broadcast limit; if a
    pipeline genuinely exceeds it, swap the hint for a shuffle join and
    let AQE's skew-join split the stop-word keys), then one
    groupBy(doc_id) whose key is uniform — no skew."""
    toks = (df
            .filter(F.trim(F.col(text_col)) != "")
            .select(F.col(id_col).alias("doc_id"),
                    F.explode(F.split(F.trim(F.col(text_col)), WS)).alias("word")))
    freq = toks.groupBy("word").agg(F.count("*").alias("c"))
    return (toks.join(F.broadcast(freq), "word")
            .groupBy("doc_id")
            .agg(F.count("*").cast("long").alias("n_toks"),
                 F.sum("c").cast("long").alias("sum_tf"))
            .withColumn("mean_tf", F.round(F.col("sum_tf") / F.col("n_toks"), 6)))


CORPUS_TF_SQL = """
WITH tok AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
             FROM documents WHERE trim(text) <> ''),
freq AS (SELECT word, count(*) AS c FROM tok GROUP BY 1)
SELECT doc_id, count(*)::BIGINT AS n_toks, sum(c)::BIGINT AS sum_tf,
       round(sum(c)::BIGINT / count(*), 6) AS mean_tf
FROM tok JOIN freq USING (word) GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# Bigram language-model scoring — the CCNet-style perplexity-proxy
# quality filter (Wenzek et al., "CCNet: Extracting High Quality
# Monolingual Datasets from Web Crawl Data", LREC 2020 — there a KenLM
# 5-gram; here a corpus-self-trained bigram model with add-one
# smoothing, which keeps every count an exact integer and the score
# SQL-expressible).  Fluent text built from corpus-common transitions
# scores high (avg log-prob near 0); token salad scores low.
# ---------------------------------------------------------------------------

def bigram_lm_score(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_bigrams, lm_score) for every doc with ≥2 tokens.

    Model (all counts corpus-wide, from the same bigram stream):
    P(w2|w1) = (C(w1 w2) + 1) / (C(w1·) + V) with C(w1·) the count of
    w1 as a bigram context and V the corpus vocabulary size;
    lm_score = mean over the doc's bigrams of ln P.

    Determinism contract: each per-bigram ln is rounded to integer
    MICRO-nats (round(ln·10⁶) → long) before the per-doc sum, so the
    aggregate is an order-independent exact integer sum — float
    summation order can never flip the 6-dp rounding of the final mean
    (the flagship-fixture lesson).  The ln argument itself is a ratio
    of exact integers, identical IEEE division in Spark and DuckDB.

    Scale: one explode (linear); the per-bigram corpus count is a
    ``count(*) over (partition by bg)`` window, NOT a groupBy + join
    back — the count table is bigram-string-keyed (too large to
    broadcast at web scale) and a self-join would shuffle the exploded
    stream on ``bg`` TWICE (once into the agg, once as the probe) and
    recompute the explode for each branch; the window pays one shuffle
    + one sort of the stream and reads it once (measured 14.9 → ~9 s at
    sf0.1/local[32], and ccnet_buckets inherits the win).  Stop-bigrams
    like "of the" are the skew tail of that one shuffle; AQE handles
    them.  Context counts and V are vocabulary-sized / scalar →
    broadcast.  Final groupBy(doc_id) is uniform."""
    toks = F.split(F.trim(F.col(text_col)), WS)
    # zip the token array against itself shifted by one — O(n) per doc.
    # The previous index-sequence form called F.slice(toks, i+1, 2) per
    # position: an O(n) copy inside an interpreted HOF lambda, O(n²) per
    # doc (measured 9.6 s for the sf0.1 stream on one core; this form
    # plus the adapter spread takes the full query 15.6 → ~3 s warm).
    pairs = F.when(F.size(toks) >= 2, F.zip_with(
        F.slice(toks, 1, F.size(toks) - 1),
        F.slice(toks, 2, F.size(toks) - 1),
        lambda a, b: F.struct(a.alias("w1"),
                              F.concat_ws(" ", a, b).alias("bg"))))
    bgs = F.coalesce(pairs, F.array().cast(
        "array<struct<w1:string,bg:string>>"))
    stream = (df.filter(F.trim(F.col(text_col)) != "")
              .select(F.col(id_col).alias("doc_id"),
                      F.explode(bgs).alias("b"))
              .select("doc_id", F.col("b.w1").alias("w1"),
                      F.col("b.bg").alias("bg")))
    c1 = stream.groupBy("w1").agg(F.count("*").alias("c1"))
    vocab = (df.filter(F.trim(F.col(text_col)) != "")
             .select(F.explode(F.split(F.trim(F.col(text_col)), WS))
                     .alias("w"))
             .agg(F.countDistinct("w").alias("v")))
    micro = F.round(F.log((F.col("c2") + 1) / (F.col("c1") + F.col("v"))) *
                    1e6, 0).cast("long")
    wbg = Window.partitionBy("bg")
    return (stream.withColumn("c2", F.count("*").over(wbg))
            .join(F.broadcast(c1), "w1")
            .crossJoin(F.broadcast(vocab))
            .select("doc_id", micro.alias("m"))
            .groupBy("doc_id")
            .agg(F.count("*").cast("long").alias("n_bigrams"),
                 F.sum("m").alias("_sm"))
            .select("doc_id", "n_bigrams",
                    F.round(F.col("_sm") / (F.col("n_bigrams") * F.lit(1e6)),
                            6).alias("lm_score")))


def bigram_lm_sql(table: str = "documents", text_expr: str = "text",
                  id_expr: str = "doc_id") -> str:
    """Oracle: identical counts + micro-nat rounding in DuckDB."""
    return f"""
WITH toks AS (
  SELECT {id_expr} AS doc_id,
         regexp_split_to_array(trim({text_expr}), '\\s+') AS a
  FROM {table} WHERE trim({text_expr}) <> ''
), stream AS (
  SELECT doc_id, a[i + 1] AS w1, a[i + 1] || ' ' || a[i + 2] AS bg
  FROM toks, unnest(generate_series(0, len(a) - 2)) AS u(i)
  WHERE len(a) >= 2
), c2 AS (SELECT bg, count(*)::BIGINT AS c2 FROM stream GROUP BY bg),
c1 AS (SELECT w1, count(*)::BIGINT AS c1 FROM stream GROUP BY w1),
vocab AS (
  SELECT count(DISTINCT w)::BIGINT AS v
  FROM (SELECT unnest(regexp_split_to_array(trim({text_expr}), '\\s+')) AS w
        FROM {table} WHERE trim({text_expr}) <> '')
), terms AS (
  SELECT s.doc_id,
         round(ln((c2.c2 + 1)::DOUBLE / (c1.c1 + vocab.v)) * 1e6)::BIGINT AS m
  FROM stream s JOIN c2 USING (bg) JOIN c1 USING (w1), vocab
)
SELECT doc_id, count(*)::BIGINT AS n_bigrams,
       round(sum(m) / (count(*) * 1e6), 6) AS lm_score
FROM terms GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# Frozen linear text classifier — the fastText-style quality-filter
# plumbing (hash tokens → bucket weights → mean → threshold) used by
# production pretraining curations (DCLM / FineWeb-Edu style model
# filters).  No training libraries exist in this environment, so the
# weight table is a FROZEN deterministic pseudo-random function of the
# bucket id — the Spark-side plumbing (hashing-trick bucketing, exact
# integer aggregation, zero joins) is the real, tested artifact; swap
# `_bucket_weight_milli` for a broadcast of real learned weights to
# deploy a trained model unchanged.
# ---------------------------------------------------------------------------

CLF_BUCKETS = 1024


def _bucket_weight_milli(bucket: Column) -> Column:
    """Frozen weight in integer MILLI-units ∈ [-1000, 1000]: a pure
    md5-derived function of the bucket id (portable to the oracle)."""
    return F.pmod(hash32(F.concat(F.lit("clfw|"), bucket.cast("string"))),
                  F.lit(2001)) - 1000


def classifier_score(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id",
                     n_buckets: int = CLF_BUCKETS) -> DataFrame:
    """(doc_id, n_toks, clf_score, clf_label) per non-empty doc.

    score = mean over tokens of weight(bucket(token)); label = score>0.
    The weight is a pure expression of the token (hash → bucket →
    milli-weight), so the WHOLE op is: explode → per-row integer
    projection → one uniform groupBy(doc_id) — no weight-table join at
    all, and the sum aggregates exact integers (order-independent; the
    one division happens after aggregation).  At 100 TB this is the
    cheapest possible shape: one shuffle, fixed-width rows."""
    toks = (df.filter(F.trim(F.col(text_col)) != "")
            .select(F.col(id_col).alias("doc_id"),
                    F.explode(F.split(F.trim(F.col(text_col)), WS))
                    .alias("w")))
    bucket = F.pmod(hash32(F.col("w")), F.lit(n_buckets))
    milli = _bucket_weight_milli(bucket)
    return (toks.select("doc_id", milli.alias("m"))
            .groupBy("doc_id")
            .agg(F.count("*").cast("long").alias("n_toks"),
                 F.sum("m").alias("_sm"))
            .select("doc_id", "n_toks",
                    F.round(F.col("_sm") / (F.col("n_toks") * F.lit(1000.0)),
                            6).alias("clf_score"),
                    (F.col("_sm") > 0).alias("clf_label")))


def classifier_score_sql(table: str = "documents", text_expr: str = "text",
                         id_expr: str = "doc_id",
                         n_buckets: int = CLF_BUCKETS) -> str:
    from .hashing import hash32_sql
    bucket = f"({hash32_sql('w')} % {n_buckets})"
    salted = f"'clfw|' || {bucket}::VARCHAR"
    milli = f"(({hash32_sql(salted)} % 2001) - 1000)"
    return f"""
WITH tok AS (
  SELECT {id_expr} AS doc_id,
         unnest(regexp_split_to_array(trim({text_expr}), '\\s+')) AS w
  FROM {table} WHERE trim({text_expr}) <> ''
)
SELECT doc_id, count(*)::BIGINT AS n_toks,
       round(sum({milli}) / (count(*) * 1000.0), 6) AS clf_score,
       (sum({milli}) > 0) AS clf_label
FROM tok GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# BM25 keyword ranking — the exact-match complement to the ANN
# similarity-search family (Robertson/Spärck Jones; the standard
# Okapi BM25 with k1 = 1.2, b = 0.75 kept as exact rationals 6/5, 3/4).
# ---------------------------------------------------------------------------

def bm25_rank(df: DataFrame, query_terms: list[str], top_k: int = 20,
              text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, score, rank): top-k docs for a bag-of-words query.

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)),
    idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)) — the Lucene form of the
    Okapi idf, non-negative even for terms in over half the corpus
    (the classic Robertson idf goes negative there).  Every input to the float
    formula is an exact integer (tf, df, dl, N) or an exact rational
    (avgdl = Σdl/N evaluated in double — identical IEEE in both
    engines); each per-term contribution is rounded to integer
    micro-units before the per-doc sum, so aggregation order can never
    flip the final 6-dp score, and ranking ties break on doc_id.

    Scale: the token stream is filtered to the query terms BEFORE any
    shuffle (a literal isin — Catalyst pushes it into the scan
    projection), so the heavy corpus reduces to |terms|·avg-tf rows;
    df/N/avgdl are a handful of broadcast scalars; the final top-k is a
    TakeOrdered over per-doc scores, never a global sort."""
    k1_num, k1_den = 6, 5            # k1 = 1.2
    b_num, b_den = 3, 4              # b = 0.75
    terms = [str(t) for t in query_terms]
    base = df.filter(F.trim(F.col(text_col)) != "")
    dl = base.select(F.col(id_col).alias("doc_id"),
                     token_count(F.col(text_col)).cast("long").alias("dl"))
    stats = dl.agg(F.count("*").alias("n_docs"),
                   F.sum("dl").alias("tot_dl"))
    tok = (base.select(F.col(id_col).alias("doc_id"),
                       F.explode(F.split(F.trim(F.col(text_col)), WS))
                       .alias("w"))
           .filter(F.col("w").isin(terms)))
    tf = tok.groupBy("doc_id", "w").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("w").agg(F.count("*").alias("df"))
    avgdl = F.col("tot_dl") / F.col("n_docs")
    idf = F.log(1 + (F.col("n_docs") - F.col("df") + 0.5) /
                (F.col("df") + 0.5))
    denom = (F.col("tf") +
             F.lit(k1_num) / F.lit(k1_den) *
             (1 - F.lit(b_num) / F.lit(b_den) +
              F.lit(b_num) / F.lit(b_den) * F.col("dl") / avgdl))
    contrib = idf * F.col("tf") * (1 + F.lit(k1_num) / F.lit(k1_den)) / denom
    micro = F.round(contrib * 1e6, 0).cast("long")
    scored = (tf.join(dl, "doc_id")
              .join(F.broadcast(dfreq), "w")
              .crossJoin(F.broadcast(stats))
              .select("doc_id", micro.alias("m"))
              .groupBy("doc_id")
              .agg(F.sum("m").alias("_sm"))
              .select("doc_id",
                      F.round(F.col("_sm") / F.lit(1e6), 6).alias("score")))
    from pyspark.sql import Window
    # distributed top-k: orderBy().limit(k) compiles to
    # TakeOrderedAndProject (per-partition partial take-k, tiny driver
    # merge) — a global row_number window here would funnel the ENTIRE
    # n_docs-row score table through one partition.  The rank window
    # then runs over ≤ top_k rows (constant-bounded, not data-bounded);
    # (score desc, doc_id) is a total order, so limit-then-rank equals
    # rank-then-filter row-for-row.
    topk = scored.orderBy(F.col("score").desc(), F.col("doc_id")) \
        .limit(top_k)
    w_rank = Window.orderBy(F.col("score").desc(), F.col("doc_id"))
    return topk.withColumn("rank", F.row_number().over(w_rank))


def bm25_rank_sql(query_terms: list[str], top_k: int = 20,
                  table: str = "documents", text_expr: str = "text",
                  id_expr: str = "doc_id") -> str:
    nt = token_count_sql(text_expr)
    terms_sql = ", ".join("'" + t.replace("'", "''") + "'"
                          for t in query_terms)
    return f"""
WITH base AS (
  SELECT {id_expr} AS doc_id, {text_expr} AS txt FROM {table}
  WHERE trim({text_expr}) <> ''
), dl AS (
  SELECT doc_id, {nt.replace(text_expr, 'txt')}::BIGINT AS dl FROM base
), stats AS (
  SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS tot_dl FROM dl
), tok AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(txt), '\\s+')) AS w
  FROM base
), tf AS (
  SELECT doc_id, w, count(*)::BIGINT AS tf FROM tok
  WHERE w IN ({terms_sql}) GROUP BY doc_id, w
), dfreq AS (
  SELECT w, count(*)::BIGINT AS df FROM tf GROUP BY w
), terms AS (
  SELECT tf.doc_id,
         round(ln(1 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
               * tf.tf * (1 + 6.0/5.0)
               / (tf.tf + 6.0/5.0 * (1 - 3.0/4.0
                  + 3.0/4.0 * dl.dl / (stats.tot_dl::DOUBLE / stats.n_docs)))
               * 1e6)::BIGINT AS m
  FROM tf JOIN dl USING (doc_id) JOIN dfreq USING (w), stats
), scored AS (
  SELECT doc_id, round(sum(m) / 1e6, 6) AS score FROM terms GROUP BY doc_id
)
SELECT doc_id, score,
       (row_number() OVER (ORDER BY score DESC, doc_id))::INT AS rank
FROM scored QUALIFY rank <= {top_k}
"""


# ---------------------------------------------------------------------------
# Gopher quality rules (Rae et al. 2021, "Scaling Language Models:
# Methods, Analysis & Insights from Training Gopher", table A1 — the
# standard rule-based pre-filter every web curation runs before model
# filters).  Every ratio test is evaluated in EXACT INTEGER arithmetic
# (a/b >= t  ⇔  a*den >= t_num*b) so the DuckDB oracle can never
# diverge on float rounding, and every rule is a pure codegen'd
# projection — zero shuffles, zero UDFs, scan-fused at any scale.
# ---------------------------------------------------------------------------

# frozen thresholds: (min_words, max_words) adapted to the synthetic
# corpus scale (the published 50..100k is a knob, not a semantic);
# mean word length in [3, 10]; symbol-to-word <= 1/10; words with an
# alphabetic character >= 8/10; >= 2 stop words present.
GOPHER_MIN_WORDS = 5
GOPHER_MAX_WORDS = 100_000
GOPHER_MWL_LO, GOPHER_MWL_HI = 3, 10
GOPHER_SYM_NUM, GOPHER_SYM_DEN = 1, 10
GOPHER_ALPHA_NUM, GOPHER_ALPHA_DEN = 8, 10
GOPHER_MIN_STOP = 2


def gopher_flags(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_words, f_word_count, f_mean_word_len, f_symbol_ratio,
    f_alpha_words, f_stop_words, keep) — one 0/1 flag per Gopher rule
    plus the conjunction.  Flags are LONG 0/1 (not boolean) so the
    value-hash canonicalization is engine-independent."""
    t = F.trim(F.col(text_col))
    toks = F.split(t, WS)
    n_words = F.when(t == "", F.lit(0)).otherwise(F.size(toks)).cast("long")
    # total word chars (whitespace removed) for the mean-word-length test
    word_chars = F.length(F.regexp_replace(t, WS, "")).cast("long")
    # symbols: '#' occurrences + '...' runs (each run counts once)
    n_sym = (F.size(F.regexp_extract_all(t, F.lit(r"#|\.{3}"), 0))
             .cast("long"))
    alpha_rx = r"(^|\s)\S*[A-Za-z]\S*"   # words containing >=1 alpha char
    n_alpha = F.size(F.regexp_extract_all(t, F.lit(alpha_rx), 0)).cast("long")
    stop_rx = r"\b(" + "|".join(STOPWORDS) + r")\b"
    n_stop = F.size(F.regexp_extract_all(F.lower(t), F.lit(stop_rx), 0)) \
        .cast("long")

    f_wc = n_words.between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
    f_mwl = ((word_chars >= GOPHER_MWL_LO * n_words) &
             (word_chars <= GOPHER_MWL_HI * n_words) & (n_words > 0))
    f_sym = (n_sym * GOPHER_SYM_DEN) <= (GOPHER_SYM_NUM * n_words)
    f_alpha = (n_alpha * GOPHER_ALPHA_DEN) >= (GOPHER_ALPHA_NUM * n_words)
    f_stop = n_stop >= GOPHER_MIN_STOP
    keep = f_wc & f_mwl & f_sym & f_alpha & f_stop
    return df.select(
        F.col(id_col).alias("doc_id"), n_words.alias("n_words"),
        f_wc.cast("long").alias("f_word_count"),
        f_mwl.cast("long").alias("f_mean_word_len"),
        f_sym.cast("long").alias("f_symbol_ratio"),
        f_alpha.cast("long").alias("f_alpha_words"),
        f_stop.cast("long").alias("f_stop_words"),
        keep.cast("long").alias("keep"))


def gopher_flags_sql(table: str = "documents", text_expr: str = "text",
                     id_expr: str = "doc_id") -> str:
    """Oracle: same integer-arithmetic rules in DuckDB."""
    stop_rx = r"\b(" + "|".join(STOPWORDS) + r")\b"
    return f"""
WITH base AS (
  SELECT {id_expr} AS doc_id,
         CASE WHEN trim({text_expr}) = '' THEN 0
              ELSE len(regexp_split_to_array(trim({text_expr}), '\\s+')) END
           ::BIGINT AS n_words,
         length(regexp_replace(trim({text_expr}), '\\s+', '', 'g'))::BIGINT
           AS word_chars,
         len(regexp_extract_all(trim({text_expr}), '#|\\.{{3}}'))::BIGINT
           AS n_sym,
         len(regexp_extract_all(trim({text_expr}),
             '(^|\\s)[^ \\t\\n]*[A-Za-z][^ \\t\\n]*'))::BIGINT AS n_alpha,
         len(regexp_extract_all(lower(trim({text_expr})), '{stop_rx}'))
           ::BIGINT AS n_stop
  FROM {table}
), flags AS (
  SELECT doc_id, n_words,
         (n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS})
           AS f_word_count,
         (word_chars >= {GOPHER_MWL_LO} * n_words AND
          word_chars <= {GOPHER_MWL_HI} * n_words AND n_words > 0)
           AS f_mean_word_len,
         (n_sym * {GOPHER_SYM_DEN} <= {GOPHER_SYM_NUM} * n_words)
           AS f_symbol_ratio,
         (n_alpha * {GOPHER_ALPHA_DEN} >= {GOPHER_ALPHA_NUM} * n_words)
           AS f_alpha_words,
         (n_stop >= {GOPHER_MIN_STOP}) AS f_stop_words
  FROM base
)
SELECT doc_id, n_words,
       f_word_count::BIGINT AS f_word_count,
       f_mean_word_len::BIGINT AS f_mean_word_len,
       f_symbol_ratio::BIGINT AS f_symbol_ratio,
       f_alpha_words::BIGINT AS f_alpha_words,
       f_stop_words::BIGINT AS f_stop_words,
       (f_word_count AND f_mean_word_len AND f_symbol_ratio AND
        f_alpha_words AND f_stop_words)::BIGINT AS keep
FROM flags
"""


# ---------------------------------------------------------------------------
# Tokenizer-prep: the first BPE merge iteration as a relational plan.
# A real BPE train loop re-runs this count over evolving symbol
# sequences; each iteration is exactly this shape (word-freq table ×
# adjacent-pair explode × global count), so the one-iteration operator
# is the distributed building block (Sennrich et al. 2016).
# ---------------------------------------------------------------------------

def bpe_pair_counts(df: DataFrame, text_col: str = "text",
                    top_k: int = 20) -> DataFrame:
    """(pair, pair_count, rank): the top-k most frequent adjacent
    CHARACTER pairs over the corpus, each word weighted by its corpus
    frequency — the statistic BPE's first merge maximizes.

    Scale shape: the corpus collapses to its word-frequency table
    first (one groupBy, vocabulary-sized — Heaps' law sublinear), so
    the pair explode runs over |vocab| rows, not |corpus| rows; the
    pair count reduces over a pair-keyed groupBy with map-side
    partials, and only top-k survive a tiny global sort."""
    words = (df.filter(F.trim(F.col(text_col)) != "")
             .select(F.explode(F.split(F.trim(F.col(text_col)), WS))
                     .alias("w"))
             .filter(F.col("w") != "")
             .groupBy("w").agg(F.count("*").alias("wc")))
    idxs = F.when(F.length("w") >= 2,
                  F.sequence(F.lit(1), F.length("w") - 1)) \
        .otherwise(F.array().cast("array<int>"))
    pairs = (words
             .select("wc", F.explode(
                 F.transform(idxs,
                             lambda i: F.col("w").substr(i, F.lit(2))))
                 .alias("pair"))
             .groupBy("pair").agg(F.sum("wc").cast("long")
                                  .alias("pair_count")))
    # distributed top-k (TakeOrderedAndProject) then rank the ≤ top_k
    # survivors — same bounded-window pattern as bm25_rank; the pair
    # table is vocabulary-substring-sized but still grows with corpus
    # vocabulary, so it must not cross a single-partition window
    topk = pairs.orderBy(F.desc("pair_count"), F.asc("pair")).limit(top_k)
    w = Window.orderBy(F.desc("pair_count"), F.asc("pair"))
    return (topk.withColumn("rank", F.row_number().over(w).cast("int"))
            .select("pair", "pair_count", "rank"))


def bpe_pair_counts_sql(table: str = "documents", text_expr: str = "text",
                        top_k: int = 20) -> str:
    return f"""
WITH words AS (
  SELECT w, count(*)::BIGINT AS wc
  FROM (SELECT unnest(regexp_split_to_array(trim({text_expr}), '\\s+')) AS w
        FROM {table} WHERE trim({text_expr}) <> '')
  WHERE w <> '' GROUP BY w
), pairs AS (
  SELECT substr(w, i, 2) AS pair, sum(wc)::BIGINT AS pair_count
  FROM words, unnest(generate_series(1, length(w) - 1)) AS u(i)
  WHERE length(w) >= 2 GROUP BY 1
)
SELECT pair, pair_count,
       (row_number() OVER (ORDER BY pair_count DESC, pair))::INT AS rank
FROM pairs QUALIFY rank <= {top_k}
"""


# ---------------------------------------------------------------------------
# Corpus statistics: exact per-group token-count percentiles via the
# VALUE-HISTOGRAM cumulative trick — never a per-group row sort.
# ---------------------------------------------------------------------------

def token_percentiles(df: DataFrame, group_col: str = "source",
                      text_col: str = "text") -> DataFrame:
    """(group, n_docs, sum_tokens, p50_tokens, p90_tokens, max_tokens)
    with DISCRETE percentiles: p_q = min{v : cum_count(v) >= ceil(q*n)}.

    Scale: percentile-by-sort is the classic skew trap (one mega-group
    = one mega-sort-partition).  Token counts are small integers, so
    the histogram groupBy(group, n_toks) first collapses the corpus to
    |groups| x |distinct counts| rows; the cumulative window then runs
    over those TINY histogram rows (bounded by the token-count range,
    not the corpus), making the per-group window O(distinct values) —
    the exact-percentile analogue of a fixed-width histogram sketch."""
    t = F.trim(F.col(text_col))
    n_toks = F.when(t == "", F.lit(0)).otherwise(
        F.size(F.split(t, WS))).cast("long")
    hist = (df.select(F.col(group_col).alias("grp"), n_toks.alias("v"))
            .groupBy("grp", "v").agg(F.count("*").alias("c")))
    wcum = Window.partitionBy("grp").orderBy("v") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wtot = Window.partitionBy("grp")
    h = (hist.withColumn("cum", F.sum("c").over(wcum))
         .withColumn("n", F.sum("c").over(wtot))
         .withColumn("tot", F.sum(F.col("v") * F.col("c")).over(wtot)))
    # ceil(q*n) in exact integers: ceil(a/b) = -floordiv(-a, b)
    need50 = -F.floor(F.lit(-1) * F.col("n") / 2)
    need90 = -F.floor(F.lit(-9) * F.col("n") / 10)
    return (h.groupBy("grp")
            .agg(F.max("n").cast("long").alias("n_docs"),
                 F.max("tot").cast("long").alias("sum_tokens"),
                 F.min(F.when(F.col("cum") >= need50, F.col("v")))
                 .cast("long").alias("p50_tokens"),
                 F.min(F.when(F.col("cum") >= need90, F.col("v")))
                 .cast("long").alias("p90_tokens"),
                 F.max("v").cast("long").alias("max_tokens"))
            .withColumnRenamed("grp", "source"))


def token_percentiles_sql(table: str = "documents",
                          group_expr: str = "source",
                          text_expr: str = "text") -> str:
    return f"""
WITH hist AS (
  SELECT {group_expr} AS grp,
         CASE WHEN trim({text_expr}) = '' THEN 0
              ELSE len(regexp_split_to_array(trim({text_expr}), '\\s+')) END
           ::BIGINT AS v,
         count(*)::BIGINT AS c
  FROM {table} GROUP BY 1, 2
), cum AS (
  SELECT grp, v, c,
         sum(c) OVER (PARTITION BY grp ORDER BY v
                      ROWS UNBOUNDED PRECEDING) AS cum,
         sum(c) OVER (PARTITION BY grp) AS n,
         sum(v * c) OVER (PARTITION BY grp) AS tot
  FROM hist
)
SELECT grp AS source, max(n)::BIGINT AS n_docs,
       max(tot)::BIGINT AS sum_tokens,
       min(CASE WHEN cum >= -floor(-n / 2.0) THEN v END)::BIGINT
         AS p50_tokens,
       min(CASE WHEN cum >= -floor(-9.0 * n / 10.0) THEN v END)::BIGINT
         AS p90_tokens,
       max(v)::BIGINT AS max_tokens
FROM cum GROUP BY grp
"""


# ---------------------------------------------------------------------------
# CCNet head/middle/tail perplexity buckets (Wenzek et al., LREC 2020):
# after LM-scoring every document, CCNet splits each language's corpus
# into thirds by perplexity and most pipelines keep only head+middle.
# The LM here is the corpus-self-trained bigram model of
# bigram_lm_score (same exact-integer determinism contract); terciles
# are computed on the score quantized to MILLI-nats so the per-lang
# cutoff computation runs over a BOUNDED histogram (score range is a
# few tens of nats -> tens of thousands of distinct milli values), not
# a per-language row sort — the skew-proof exact-percentile shape of
# token_percentiles.
# ---------------------------------------------------------------------------

def ccnet_buckets(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id",
                  lang_col: str = "lang") -> DataFrame:
    """(doc_id, lang, score_milli, bucket) for every doc with ≥1
    bigram; bucket ∈ head|middle|tail by per-language thirds, best
    scores (highest mean log-prob = lowest perplexity) first.

    Quantization: score_milli = floor(round(lm_score·10⁶)/1000) — the
    6-dp score exactly recovers its micro-nat integer, and integer
    floor-division to milli-nats is engine-identical.  Bucket rule
    (frozen): with cum = count of docs at values ≥ this value
    (value-group inclusive) and n = language total, a VALUE GROUP is
    head iff 3·cum ≤ n, middle iff 3·cum ≤ 2n, else tail — every doc
    with the same (lang, score) lands in the same bucket, ties pushed
    toward the worse bucket.

    Scale shape: bigram scoring as bigram_lm_score; one uniform
    doc_id join to recover lang; the tercile window runs over
    histogram rows only (|langs| × |distinct milli scores|, bounded by
    the score RANGE not the corpus); the bucket map is tiny →
    broadcast joined back.  No per-language row sort anywhere."""
    scored = bigram_lm_score(df, text_col=text_col, id_col=id_col)
    langs = df.select(F.col(id_col).alias("doc_id"),
                      F.col(lang_col).alias("lang"))
    milli = F.floor(F.round(F.col("lm_score") * 1e6, 0) / 1000.0) \
        .cast("long")
    d = (scored.join(langs, "doc_id")
         .select("doc_id", "lang", milli.alias("score_milli")))
    hist = d.groupBy("lang", "score_milli").agg(F.count("*").alias("c"))
    wcum = Window.partitionBy("lang").orderBy(F.desc("score_milli")) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wtot = Window.partitionBy("lang")
    h = (hist.withColumn("cum", F.sum("c").over(wcum))
         .withColumn("n", F.sum("c").over(wtot)))
    bucket = (F.when(3 * F.col("cum") <= F.col("n"), F.lit("head"))
              .when(3 * F.col("cum") <= 2 * F.col("n"), F.lit("middle"))
              .otherwise(F.lit("tail")))
    bmap = h.select("lang", "score_milli", bucket.alias("bucket"))
    return (d.join(F.broadcast(bmap), ["lang", "score_milli"])
            .select("doc_id", "lang", "score_milli", "bucket"))


def ccnet_buckets_sql(table: str = "documents", text_expr: str = "text",
                      id_expr: str = "doc_id",
                      lang_expr: str = "lang") -> str:
    """Oracle: identical bigram model, quantization and bucket rule."""
    return f"""
WITH toks AS (
  SELECT {id_expr} AS doc_id,
         regexp_split_to_array(trim({text_expr}), '\\s+') AS a
  FROM {table} WHERE trim({text_expr}) <> ''
), stream AS (
  SELECT doc_id, a[i + 1] AS w1, a[i + 1] || ' ' || a[i + 2] AS bg
  FROM toks, unnest(generate_series(0, len(a) - 2)) AS u(i)
  WHERE len(a) >= 2
), c2 AS (SELECT bg, count(*)::BIGINT AS c2 FROM stream GROUP BY bg),
c1 AS (SELECT w1, count(*)::BIGINT AS c1 FROM stream GROUP BY w1),
vocab AS (
  SELECT count(DISTINCT w)::BIGINT AS v
  FROM (SELECT unnest(regexp_split_to_array(trim({text_expr}), '\\s+'))
          AS w
        FROM {table} WHERE trim({text_expr}) <> '')
), terms AS (
  SELECT s.doc_id,
         round(ln((c2.c2 + 1)::DOUBLE / (c1.c1 + vocab.v)) * 1e6)::BIGINT
           AS m
  FROM stream s JOIN c2 USING (bg) JOIN c1 USING (w1), vocab
), scored AS (
  SELECT doc_id, round(sum(m) / (count(*) * 1e6), 6) AS lm_score
  FROM terms GROUP BY doc_id
), d AS (
  SELECT s.doc_id, t.{lang_expr} AS lang,
         floor(round(s.lm_score * 1e6) / 1000.0)::BIGINT AS score_milli
  FROM scored s JOIN {table} t ON s.doc_id = t.{id_expr}
), hist AS (
  SELECT lang, score_milli, count(*)::BIGINT AS c
  FROM d GROUP BY lang, score_milli
), cum AS (
  SELECT lang, score_milli,
         sum(c) OVER (PARTITION BY lang ORDER BY score_milli DESC
                      ROWS UNBOUNDED PRECEDING) AS cum,
         sum(c) OVER (PARTITION BY lang) AS n
  FROM hist
), bmap AS (
  SELECT lang, score_milli,
         CASE WHEN 3 * cum <= n THEN 'head'
              WHEN 3 * cum <= 2 * n THEN 'middle'
              ELSE 'tail' END AS bucket
  FROM cum
)
SELECT d.doc_id, d.lang, d.score_milli, bmap.bucket
FROM d JOIN bmap USING (lang, score_milli)
"""


# ---------------------------------------------------------------------------
# C4 heuristic cleaning rules (Raffel et al. 2020, JMLR — the
# "Colossal Clean Crawled Corpus" line/page filters): keep only lines
# that end in terminal punctuation and have ≥ C4_MIN_LINE_WORDS words;
# drop pages with < C4_MIN_SENTENCES sentences, any "lorem ipsum", or
# a curly brace (code).  Pure codegen'd projection — split + a
# higher-order array filter + regexp counts; zero shuffles, zero UDFs.
# (The span-level cross-doc dedup of C4 is the existing segment-dedup
# operator; this is the per-page rule set.)
# ---------------------------------------------------------------------------

C4_MIN_LINE_WORDS = 5
C4_MIN_SENTENCES = 3
C4_TERMINAL_RX = '[.!?"]$'


def c4_filters(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_lines, n_kept, n_sentences, has_lorem, has_brace,
    keep, clean_text): the C4 rule set over newline-delimited pages.
    Flags are LONG 0/1; clean_text is the kept lines re-joined with
    a newline ('' when nothing survives)."""
    lines = F.split(F.col(text_col), r"\n")
    keep_line = lambda ln: (
        (F.trim(ln) != "") &
        (F.size(F.split(F.trim(ln), WS)) >= C4_MIN_LINE_WORDS) &
        F.trim(ln).rlike(C4_TERMINAL_RX))
    kept = F.filter(lines, keep_line)
    clean = F.array_join(kept, "\n")
    n_sent = F.size(F.regexp_extract_all(clean, F.lit(r"[.!?]"), 0)) \
        .cast("long")
    has_lorem = F.lower(F.col(text_col)).contains("lorem ipsum")
    has_brace = F.col(text_col).rlike(r"[{}]")
    keep = ((n_sent >= C4_MIN_SENTENCES) & ~has_lorem & ~has_brace)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
        n_sent.alias("n_sentences"),
        has_lorem.cast("long").alias("has_lorem"),
        has_brace.cast("long").alias("has_brace"),
        keep.cast("long").alias("keep"),
        clean.alias("clean_text"))


def c4_filters_sql(table: str = "documents", text_expr: str = "text",
                   id_expr: str = "doc_id") -> str:
    """Oracle: same line filter / sentence count / page flags."""
    return f"""
WITH base AS (
  SELECT {id_expr} AS doc_id, {text_expr} AS t,
         string_split({text_expr}, chr(10)) AS lines
  FROM {table}
), f AS (
  SELECT doc_id, t, lines,
         list_filter(lines, ln ->
           trim(ln) <> ''
           AND len(regexp_split_to_array(trim(ln), '\\s+'))
               >= {C4_MIN_LINE_WORDS}
           AND regexp_matches(trim(ln), '{C4_TERMINAL_RX}')) AS kept
  FROM base
), g AS (
  SELECT doc_id, len(lines)::BIGINT AS n_lines,
         len(kept)::BIGINT AS n_kept,
         coalesce(array_to_string(kept, chr(10)), '') AS clean_text,
         len(regexp_extract_all(
             coalesce(array_to_string(kept, chr(10)), ''),
             '[.!?]'))::BIGINT AS n_sentences,
         (position('lorem ipsum' IN lower(t)) > 0) AS has_lorem,
         regexp_matches(t, '[{{}}]') AS has_brace
  FROM f
)
SELECT doc_id, n_lines, n_kept, n_sentences,
       has_lorem::BIGINT AS has_lorem, has_brace::BIGINT AS has_brace,
       (n_sentences >= {C4_MIN_SENTENCES} AND NOT has_lorem
        AND NOT has_brace)::BIGINT AS keep,
       clean_text
FROM g
"""


# ---------------------------------------------------------------------------
# Frozen-merge BPE encoding (tokenizer APPLY, the counterpart of the
# bpe_pair_counts tokenizer-TRAIN statistic)
# ---------------------------------------------------------------------------

# rank-ordered merge table: in a real pipeline this comes out of the
# bpe_pair_counts job; frozen here so both engines encode identically
BPE_MERGES = [("e", "r"), ("t", "h"), ("a", "n"), ("i", "n"), ("o", "n")]


def bpe_encode_counts(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_words, n_bpe_tokens): encode every word with the
    frozen BPE merge table (chars spaced apart, then each merge
    replace-all in rank order — textbook greedy BPE apply) and count
    the resulting subword tokens.

    Scale shape: a pure per-row projection — the merge chain compiles
    to a fixed Catalyst expression tree (replace is codegen'd), zero
    shuffles, zero Python.  A production tokenizer has 10⁴-10⁵ merges,
    past what an expression chain should hold; at that size the same
    loop moves into an Arrow-batched pandas UDF with the merge table
    broadcast once (the multimodal decode pattern), but the relational
    skeleton — stateless projection, explode-free counting — is
    unchanged."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")

    def enc_len(w):
        s = F.trim(F.regexp_replace(w, "(.)", "$1 "))
        for a, b in BPE_MERGES:
            s = F.replace(s, F.lit(f"{a} {b}"), F.lit(f"{a}{b}"))
        return F.size(F.split(s, " "))

    empty = F.trim(F.col(text_col)) == ""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.when(empty, F.lit(0)).otherwise(F.size(toks))
        .cast("long").alias("n_words"),
        F.when(empty, F.lit(0)).otherwise(
            F.aggregate(F.transform(toks, enc_len), F.lit(0),
                        lambda acc, x: acc + x))
        .cast("long").alias("n_bpe_tokens"))


def bpe_encode_sql(table: str = "documents", text_expr: str = "text",
                   id_expr: str = "doc_id") -> str:
    """DuckDB mirror of ``bpe_encode_counts`` (regexp_replace needs the
    explicit 'g' flag there; replace() is replace-all in both)."""
    enc = "trim(regexp_replace(w, '(.)', '\\1 ', 'g'))"
    for a, b in BPE_MERGES:
        enc = f"replace({enc}, '{a} {b}', '{a}{b}')"
    return f"""
SELECT {id_expr} AS doc_id,
       CASE WHEN trim({text_expr}) = '' THEN 0
            ELSE len(toks) END::BIGINT AS n_words,
       CASE WHEN trim({text_expr}) = '' THEN 0
            ELSE list_sum(list_transform(toks,
                   w -> len(string_split({enc}, ' ')))) END::BIGINT
         AS n_bpe_tokens
FROM (SELECT {id_expr}, {text_expr},
             regexp_split_to_array(trim({text_expr}), '\\s+') AS toks
      FROM {table})
"""


def vocab_coverage(df: DataFrame, text_col: str = "text",
                   lang_col: str = "lang",
                   pcts: tuple[int, ...] = (50, 90)) -> DataFrame:
    """(lang, total_tokens, n_distinct, toks_p<p>...) — per-language
    vocabulary coverage curve: the number of top-frequency token types
    needed to cover p% of the language's token mass (the statistic
    tokenizer/vocab sizing is planned from).

    Scale shape — the classic reason this is NOT "sort the vocabulary
    and cumsum": the per-(lang, tok) frequency table is vocab-sized
    (10⁷-10⁸ rows at web scale), but the WINDOW here runs over the
    per-language FREQUENCY-VALUE histogram — (lang, c, n_toks) — whose
    size is the number of distinct frequency values (≤ a few thousand
    per language regardless of corpus size, by the long-tail shape).
    Two uniform-key shuffles (token agg, histogram agg) and one tiny
    window; never a vocabulary-scale global sort.

    Within a frequency class, tokens are interchangeable (each
    contributes exactly c), so the answer is exact without breaking
    ties: k = prev_toks + ceil((p·total − 100·prev_mass) / (100·c)),
    evaluated in integer arithmetic (`div`) on the first class whose
    cumulative mass crosses the bar, minimized over qualifying classes."""
    toks = (df.select(F.col(lang_col).alias("lang"),
                      F.explode(F.split(F.trim(F.col(text_col)),
                                        r"\s+")).alias("tok"))
            .filter(F.col("tok") != ""))
    tf = toks.groupBy("lang", "tok").agg(F.count("*").alias("c"))
    hist = tf.groupBy("lang", "c").agg(F.count("*").alias("n_toks"))
    w = (Window.partitionBy("lang").orderBy(F.col("c").desc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wtot = Window.partitionBy("lang")
    cum = (hist
           .withColumn("cls_mass", F.col("c") * F.col("n_toks"))
           .withColumn("cum_mass", F.sum("cls_mass").over(w))
           .withColumn("cum_toks", F.sum("n_toks").over(w))
           .withColumn("total_tokens", F.sum("cls_mass").over(wtot))
           .withColumn("n_distinct", F.sum("n_toks").over(wtot)))
    aggs = [F.max("total_tokens").alias("total_tokens"),
            F.max("n_distinct").alias("n_distinct")]
    for p in pcts:
        need = (F.col("total_tokens") * p
                - (F.col("cum_mass") - F.col("cls_mass")) * 100)
        k = (F.col("cum_toks") - F.col("n_toks")
             + F.expr(f"(cast(total_tokens * {p} as bigint) "
                      f" - (cum_mass - cls_mass) * 100 "
                      f" + c * 100 - 1) div (c * 100)"))
        # only the CROSSING class (prev below the bar, cum at/above it)
        # yields a valid k — later classes would produce negative ceils
        qualifies = (
            (F.col("cum_mass") * 100 >= F.col("total_tokens") * p)
            & ((F.col("cum_mass") - F.col("cls_mass")) * 100
               < F.col("total_tokens") * p))
        aggs.append(F.min(F.when(qualifies, k)).cast("long")
                    .alias(f"toks_p{p}"))
    return cum.groupBy("lang").agg(*aggs)


def vocab_coverage_sql(table: str = "documents", text_expr: str = "text",
                       lang_expr: str = "lang",
                       pcts: tuple[int, ...] = (50, 90)) -> str:
    """DuckDB mirror of ``vocab_coverage`` — same histogram + window +
    integer-ceil recipe (`//` = DuckDB integer division on BIGINT)."""
    pcols = []
    for p in pcts:
        k = (f"cum_toks - n_toks + "
             f"(total_tokens * {p} - (cum_mass - cls_mass) * 100 "
             f" + c * 100 - 1) // (c * 100)")
        pcols.append(
            f"min(CASE WHEN cum_mass * 100 >= total_tokens * {p} "
            f"AND (cum_mass - cls_mass) * 100 < total_tokens * {p} "
            f"THEN {k} END)::BIGINT AS toks_p{p}")
    return f"""
WITH toks AS (
  SELECT {lang_expr} AS lang, t.tok
  FROM {table},
       UNNEST(regexp_split_to_array(trim({text_expr}), '\\s+')) AS t(tok)
  WHERE t.tok <> ''
),
tf AS (SELECT lang, tok, count(*)::BIGINT AS c FROM toks GROUP BY 1, 2),
hist AS (SELECT lang, c, count(*)::BIGINT AS n_toks FROM tf GROUP BY 1, 2),
cum AS (
  SELECT lang, c, n_toks, c * n_toks AS cls_mass,
         sum(c * n_toks) OVER (PARTITION BY lang ORDER BY c DESC)
           ::BIGINT AS cum_mass,
         sum(n_toks) OVER (PARTITION BY lang ORDER BY c DESC)
           ::BIGINT AS cum_toks,
         sum(c * n_toks) OVER (PARTITION BY lang)::BIGINT AS total_tokens,
         sum(n_toks) OVER (PARTITION BY lang)::BIGINT AS n_distinct
  FROM hist
)
SELECT lang, max(total_tokens)::BIGINT AS total_tokens,
       max(n_distinct)::BIGINT AS n_distinct,
       {", ".join(pcols)}
FROM cum GROUP BY lang
"""


# Unicode script classes for multilingual curation routing.  Ranges use
# \x{....} syntax — the hex-codepoint form BOTH Java regex (Spark) and
# RE2 (DuckDB) accept (Java's \uXXXX form is not RE2-portable).  BMP
# core blocks only: the dominant crawl mass; extension blocks (CJK ext
# B+, supplementary planes) are counted as 'other' and documented here
# as the fidelity upgrade path.
SCRIPT_RANGES = (
    ("latin", "A-Za-z"),
    ("cyrillic", "\\x{0400}-\\x{04FF}"),
    ("greek", "\\x{0370}-\\x{03FF}"),
    ("arabic", "\\x{0600}-\\x{06FF}"),
    ("cjk", "\\x{4E00}-\\x{9FFF}"),
    ("hangul", "\\x{AC00}-\\x{D7AF}"),
)


def script_stats(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_<script>..., n_other, dominant_script) — per-document
    Unicode script histogram + argmax, the routing signal multilingual
    curation branches on (CJK → different tokenizer/quality rules than
    Latin).  Counts are regexp_extract_all sizes per script class over
    the raw text; 'other' = non-whitespace chars in no class (digits,
    punctuation, unlisted blocks).  Ties break by script-name order,
    all-zero → 'none'.  Pure codegen projection — no shuffle, no
    Python, linear in bytes at any corpus size."""
    t = F.col(text_col)
    names = [n for n, _ in SCRIPT_RANGES]
    counts = {n: F.size(F.regexp_extract_all(t, F.lit(f"[{r}]"), F.lit(0)))
                 .cast("long") for n, r in SCRIPT_RANGES}
    nonws = F.length(F.regexp_replace(t, r"\s", ""))
    other = (nonws - sum(counts.values())).cast("long")
    best = F.greatest(*[counts[n] for n in names])
    dom = F.lit("none")
    for n in reversed(names):
        dom = F.when((counts[n] == best) & (best > 0), n).otherwise(dom)
    return df.select(
        F.col(id_col).alias("doc_id"),
        *[counts[n].alias(f"n_{n}") for n in names],
        other.alias("n_other"),
        dom.alias("dominant_script"))


def script_stats_sql(table: str = "documents", text_expr: str = "text",
                     id_expr: str = "doc_id") -> str:
    """DuckDB mirror of ``script_stats`` (same \\x{..} class ranges)."""
    names = [n for n, _ in SCRIPT_RANGES]
    cnt = {n: f"len(regexp_extract_all({text_expr}, '[{r}]'))::BIGINT"
           for n, r in SCRIPT_RANGES}
    nonws = f"len(regexp_replace({text_expr}, '\\s', '', 'g'))"
    other = f"({nonws} - ({' + '.join(cnt[n] for n in names)}))::BIGINT"
    best = "greatest(" + ", ".join(cnt[n] for n in names) + ")"
    dom = "'none'"
    for n in reversed(names):
        dom = (f"CASE WHEN {cnt[n]} = {best} AND {best} > 0 "
               f"THEN '{n}' ELSE {dom} END")
    return f"""
SELECT {id_expr} AS doc_id,
       {", ".join(f"{cnt[n]} AS n_{n}" for n in names)},
       {other} AS n_other,
       {dom} AS dominant_script
FROM {table}
"""


# ---------------------------------------------------------------------------
# Zipf-slope corpus statistics.  Natural corpora obey Zipf's law
# (freq ∝ rank^s with s ≈ -1); machine-generated, template-spam, and
# over-deduplicated corpora show up as slope/fit anomalies, so curation
# dashboards track the fitted log-log slope per source/snapshot as a
# distribution-drift alarm (a standard corpus-linguistics diagnostic —
# e.g. Piantadosi, "Zipf's word frequency law in natural language",
# Psychon Bull Rev 2014).  OLS on (ln rank, ln freq) over the top-N
# vocabulary reduces to six sums — pure aggregation, no model library.


def zipf_stats(df: DataFrame, text_col: str = "text",
               top_n: int = 1000) -> DataFrame:
    """Single row (n_types, n_tokens, n_fit, zipf_slope,
    zipf_intercept, zipf_r2): exact vocabulary/token counts plus the
    least-squares fit of ln(freq) on ln(rank) over the ``top_n``
    most-frequent words (rank ties broken by word — deterministic).

    Scale shape: one word-frequency groupBy (map-side combine), one
    distributed TakeOrderedAndProject for the top-N (never a global
    sort — the rank window runs over ≤ top_n survivors), and one
    scalar aggregation for the six OLS sums.  Floats appear only in
    the final six-sum fold over ≤ top_n doubles; both engines round
    the fitted coefficients to 6 dp."""
    words = (df.select(F.explode(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("word"))
        .filter(F.col("word") != ""))
    freq = words.groupBy("word").agg(F.count("*").alias("freq"))
    totals = freq.agg(F.count("*").cast("long").alias("n_types"),
                      F.sum("freq").cast("long").alias("n_tokens"))
    topk = freq.orderBy(F.desc("freq"), F.asc("word")).limit(top_n)
    w = Window.orderBy(F.desc("freq"), F.asc("word"))
    ranked = (topk.withColumn("rank", F.row_number().over(w))
              .select(F.log(F.col("rank").cast("double")).alias("x"),
                      F.log(F.col("freq").cast("double")).alias("y")))
    sums = ranked.agg(F.count("*").cast("double").alias("n"),
                      F.sum("x").alias("sx"), F.sum("y").alias("sy"),
                      F.sum(F.col("x") * F.col("y")).alias("sxy"),
                      F.sum(F.col("x") * F.col("x")).alias("sxx"),
                      F.sum(F.col("y") * F.col("y")).alias("syy"))
    den_x = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    den_y = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    slope = cov / den_x
    return (totals.crossJoin(F.broadcast(sums))
            .select("n_types", "n_tokens",
                    F.col("n").cast("long").alias("n_fit"),
                    F.round(slope, 6).alias("zipf_slope"),
                    F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6)
                    .alias("zipf_intercept"),
                    F.round(cov * cov / (den_x * den_y), 6).alias("zipf_r2")))


def zipf_stats_sql(table: str = "documents", text_expr: str = "text",
                   top_n: int = 1000) -> str:
    """DuckDB oracle: identical tokenization, ranking, and OLS sums;
    yields ``zipf``."""
    return f"""zw AS (
  SELECT word, count(*)::BIGINT AS freq
  FROM (SELECT unnest(regexp_split_to_array(trim(lower({text_expr})), '\\s+'))
          AS word FROM {table})
  WHERE word <> '' GROUP BY word
),
ztot AS (SELECT count(*)::BIGINT AS n_types, sum(freq)::BIGINT AS n_tokens
         FROM zw),
zr AS (
  SELECT ln((row_number() OVER (ORDER BY freq DESC, word))::DOUBLE) AS x,
         ln(freq::DOUBLE) AS y
  FROM zw ORDER BY freq DESC, word LIMIT {top_n}
),
zs AS (
  SELECT count(*)::DOUBLE AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
  FROM zr
),
zipf AS (
  SELECT t.n_types, t.n_tokens, s.n::BIGINT AS n_fit,
         round((s.n * s.sxy - s.sx * s.sy) / (s.n * s.sxx - s.sx * s.sx), 6)
           AS zipf_slope,
         round((s.sy - ((s.n * s.sxy - s.sx * s.sy) /
                        (s.n * s.sxx - s.sx * s.sx)) * s.sx) / s.n, 6)
           AS zipf_intercept,
         round(((s.n * s.sxy - s.sx * s.sy) * (s.n * s.sxy - s.sx * s.sy)) /
               ((s.n * s.sxx - s.sx * s.sx) * (s.n * s.syy - s.sy * s.sy)), 6)
           AS zipf_r2
  FROM ztot t, zs s
)"""


# ---------------------------------------------------------------------------
# TF-IDF keyword extraction.  Corpus curation tags every document with
# its most-distinctive terms (topic bucketing, mixture audits, search
# facets); the classic extractor is top-k terms by tf·idf (Spärck
# Jones 1972).  Pure relational: one (doc, word) count, one vocab-sized
# doc-frequency agg, one doc-partitioned window over the doc's own
# vocabulary — never a global sort.


def tfidf_keywords(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", top_k: int = 3) -> DataFrame:
    """(doc_id, rank, word, tf, score): the ``top_k`` highest-tf·idf
    terms per non-empty document; score = tf · ln(n_docs/df), rounded
    6 dp, rank ties broken by word (deterministic).

    Scale shape: tf is one (doc, word) groupBy with map-side combine;
    df is a vocab-sized agg OF tf (no second corpus scan); the join
    back to tf is word-keyed (stop words are the skew tail — AQE
    skew-split case); the rank window partitions by doc_id — millions
    of tiny groups.  The ordering key is the ROUNDED score on both
    engines, so 1-ulp libm differences in ln cannot reorder ranks."""
    base = df.filter(F.trim(F.col(text_col)) != "")
    words = base.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+"))
        .alias("word"))
    tf = words.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("word").agg(F.count("*").alias("df"))
    totals = tf.agg(F.countDistinct("doc_id").alias("n_docs"))
    scored = (tf.join(dfreq, "word")
              .crossJoin(F.broadcast(totals))
              .withColumn("score", F.round(
                  F.col("tf") * F.log(F.col("n_docs").cast("double") /
                                      F.col("df")), 6)))
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("word"))
    return (scored.withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= top_k)
            .select("doc_id", "rank", "word",
                    F.col("tf").cast("long").alias("tf"), "score"))


def tfidf_keywords_sql(table: str = "documents", text_expr: str = "text",
                       top_k: int = 3) -> str:
    """DuckDB oracle: identical tf/df/score and rank ordering; yields
    ``tfidf_kw``."""
    return f"""kw_words AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(trim(lower({text_expr})), '\\s+'))
           AS word
  FROM {table} WHERE trim({text_expr}) <> ''
),
kw_tf AS (SELECT doc_id, word, count(*)::BIGINT AS tf
          FROM kw_words GROUP BY 1, 2),
kw_df AS (SELECT word, count(*)::BIGINT AS df FROM kw_tf GROUP BY 1),
kw_nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM kw_tf),
kw_scored AS (
  SELECT t.doc_id, t.word, t.tf,
         round(t.tf * ln(n.n_docs::DOUBLE / d.df), 6) AS score
  FROM kw_tf t JOIN kw_df d USING (word), kw_nd n
),
tfidf_kw AS (
  SELECT doc_id, rank, word, tf, score FROM (
    SELECT doc_id, word, tf, score,
           (row_number() OVER (PARTITION BY doc_id
                               ORDER BY score DESC, word))::INT AS rank
    FROM kw_scored
  ) WHERE rank <= {top_k}
)"""


# ---------------------------------------------------------------------------
# Tokenizer fertility.  The standard tokenizer-evaluation statistic
# (e.g. the XLM-R / multilingual-tokenizer literature): subword tokens
# emitted PER WHITESPACE WORD ("fertility") and characters per subword
# token, aggregated per language.  High-fertility languages are
# under-served by the merge table and over-billed in training compute —
# mixture planners reweight on exactly this number.  Reuses the frozen
# BPE merge chain of ``bpe_encode_counts`` — a pure codegen projection,
# one lang groupBy, zero Python.


def bpe_fertility(df: DataFrame, text_col: str = "text",
                  lang_col: str = "lang") -> DataFrame:
    """(lang, n_docs, n_words, n_bpe_tokens, n_chars, fertility,
    chars_per_token) per language over non-empty docs: fertility =
    n_bpe_tokens/n_words, chars_per_token = n_chars/n_bpe_tokens
    (both rounded 6 dp; n_chars counts non-whitespace chars)."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")

    def enc_len(w):
        s = F.trim(F.regexp_replace(w, "(.)", "$1 "))
        for a, b in BPE_MERGES:
            s = F.replace(s, F.lit(f"{a} {b}"), F.lit(f"{a}{b}"))
        return F.size(F.split(s, " "))

    per = (df.filter(F.trim(F.col(text_col)) != "")
           .select(F.col(lang_col).alias("lang"),
                   F.size(toks).cast("long").alias("_w"),
                   F.aggregate(F.transform(toks, enc_len), F.lit(0),
                               lambda acc, x: acc + x)
                   .cast("long").alias("_b"),
                   F.aggregate(F.transform(toks, F.length), F.lit(0),
                               lambda acc, x: acc + x)
                   .cast("long").alias("_c")))
    return (per.groupBy("lang")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.sum("_w").cast("long").alias("n_words"),
                 F.sum("_b").cast("long").alias("n_bpe_tokens"),
                 F.sum("_c").cast("long").alias("n_chars"))
            .withColumn("fertility", F.round(
                F.col("n_bpe_tokens") / F.col("n_words"), 6))
            .withColumn("chars_per_token", F.round(
                F.col("n_chars") / F.col("n_bpe_tokens"), 6)))


def bpe_fertility_sql(table: str = "documents", text_expr: str = "text",
                      lang_expr: str = "lang") -> str:
    """DuckDB oracle: the same merge chain and per-lang sums; yields
    ``fertility``."""
    enc = "trim(regexp_replace(w, '(.)', '\\1 ', 'g'))"
    for a, b in BPE_MERGES:
        enc = f"replace({enc}, '{a} {b}', '{a}{b}')"
    return f"""fert_per AS (
  SELECT {lang_expr} AS lang,
         len(toks)::BIGINT AS _w,
         list_sum(list_transform(toks,
             w -> len(string_split({enc}, ' '))))::BIGINT AS _b,
         list_sum(list_transform(toks, w -> len(w)))::BIGINT AS _c
  FROM (SELECT {lang_expr}, {text_expr},
               regexp_split_to_array(trim({text_expr}), '\\s+') AS toks
        FROM {table} WHERE trim({text_expr}) <> '')
),
fertility AS (
  SELECT lang, count(*)::BIGINT AS n_docs, sum(_w)::BIGINT AS n_words,
         sum(_b)::BIGINT AS n_bpe_tokens, sum(_c)::BIGINT AS n_chars,
         round(sum(_b) / sum(_w), 6) AS fertility,
         round(sum(_c) / sum(_b), 6) AS chars_per_token
  FROM fert_per GROUP BY lang
)"""


# ---------------------------------------------------------------------------
# Per-source corpus report.  The dataset-card rollup every curation run
# publishes per source: volume (docs/tokens), language spread, and the
# exact-duplicate rate against the WHOLE corpus (a source whose docs
# are mostly owned by earlier sources is contributing nothing new —
# the first-screen signal in mixture planning).


def source_report(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", source_col: str = "source",
                  lang_col: str = "lang") -> DataFrame:
    """(source, n_docs, n_tokens, n_langs, n_dup_docs, dup_ppm) per
    source; a doc is a duplicate iff its normalized-content fingerprint
    is owned (min doc_id, corpus-wide) by an EARLIER doc — cross-source
    duplicates count against the later source, same first-owner rule as
    the dedup operators.

    Scale shape: one fingerprint projection (codegen), one window-min
    shuffle on fingerprint (never a groupBy + join-back), one uniform
    source groupBy."""
    base = df.select(F.col(id_col).alias("doc_id"),
                     F.col(source_col).alias("source"),
                     F.col(lang_col).alias("lang"),
                     token_count(F.col(text_col)).cast("long").alias("_t"),
                     fingerprint(F.col(text_col)).alias("_fp"))
    first = F.min("doc_id").over(Window.partitionBy("_fp"))
    return (base.withColumn("_dup", (F.col("doc_id") > first).cast("long"))
            .groupBy("source")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.sum("_t").cast("long").alias("n_tokens"),
                 F.countDistinct("lang").cast("long").alias("n_langs"),
                 F.sum("_dup").cast("long").alias("n_dup_docs"))
            .withColumn("dup_ppm",
                        F.expr("(n_dup_docs * 1000000L) div n_docs")
                        .cast("long")))


def source_report_sql(table: str = "documents", text_expr: str = "text") -> str:
    """DuckDB oracle: same fingerprint first-owner + per-source sums;
    yields ``srcrep``."""
    return f"""sr_base AS (
  SELECT doc_id, source, lang,
         ({token_count_sql(text_expr)})::BIGINT AS t,
         {fingerprint_sql(text_expr)} AS fp
  FROM {table}
),
sr_own AS (SELECT *, min(doc_id) OVER (PARTITION BY fp) AS first_doc
           FROM sr_base),
srcrep AS (
  SELECT source, count(*)::BIGINT AS n_docs, sum(t)::BIGINT AS n_tokens,
         count(DISTINCT lang)::BIGINT AS n_langs,
         sum(CASE WHEN doc_id > first_doc THEN 1 ELSE 0 END)::BIGINT
           AS n_dup_docs,
         ((sum(CASE WHEN doc_id > first_doc THEN 1 ELSE 0 END) * 1000000)
          // count(*))::BIGINT AS dup_ppm
  FROM sr_own GROUP BY source
)"""


# ---------------------------------------------------------------------------
# Trigram stupid-backoff LM scoring (Brants et al., "Large Language
# Models in Machine Translation", EMNLP 2007 — public algorithm): the
# score S is a relative frequency with a fixed α=0.4 penalty per
# backoff level, no normalization — THE web-scale LM-quality filter
# (it is literally the paper's "cheap to train on trillions of
# tokens" model).  The corpus is hash-split into train/held-out so
# backoff genuinely fires (scoring the training corpus with itself
# never backs off — every observed trigram has count >= 1).
# ---------------------------------------------------------------------------

# round(ln(0.4)·10⁶): the per-level backoff penalty as a FROZEN integer
# constant — adding integers sidesteps cross-engine ln(0.4·x) vs
# ln(0.4)+ln(x) float-association drift entirely.
LN_ALPHA_MICRO = -916291


def stupid_backoff_score(df: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id", held_pct: int = 20,
                         salt: str = "sb-v1") -> DataFrame:
    """(doc_id, n_trigrams, backed_off_ppm, sb_score) for every
    HELD-OUT doc (hash32(id|salt) % 100 < held_pct) with >= 3 tokens;
    counts come from the train split only.

        S(w3|w1w2) = c(w1w2w3)/c(w1w2)            if trigram seen
                   = 0.4 · c(w2w3)/c(w2)          elif bigram seen
                   = 0.4² · (c(w3)+1)/(N+V)       else (add-one floor)

    sb_score = mean ln S in integer micro-nats (per-position round,
    order-free integer sum — the bigram_lm determinism contract);
    backed_off_ppm = share of positions that left level 1.

    Scale shape: the trigram and bigram count tables are corpus-keyed
    (NEVER broadcast) — the held stream shuffle-joins them on the gram
    string, partial-aggregated map-side; unigram counts and (N, V) are
    vocabulary-sized / scalar → broadcast.  Stop-gram keys ("of the")
    are the one skew tail — AQE's case."""
    toks = F.split(F.trim(F.col(text_col)), WS)
    h = hash32(F.concat(F.col(id_col).cast("string"), F.lit("|" + salt)))
    base = (df.filter(F.trim(F.col(text_col)) != "")
            .select(F.col(id_col).alias("doc_id"), toks.alias("a"),
                    (F.pmod(h, F.lit(100)) < held_pct).alias("_held")))
    tri = F.when(F.size("a") >= 3, F.zip_with(
        F.slice("a", 1, F.size("a") - 2),
        F.zip_with(F.slice("a", 2, F.size("a") - 2),
                   F.slice("a", 3, F.size("a") - 2),
                   lambda b, c: F.concat_ws(" ", b, c)),
        lambda w1, bc: F.struct(
            F.concat_ws(" ", w1, bc).alias("tg"),
            F.concat_ws(" ", w1, F.split(bc, " ").getItem(0)).alias("ctx"),
            bc.alias("bg"),
            F.split(bc, " ").getItem(0).alias("w2"),
            F.split(bc, " ").getItem(1).alias("w3"))))
    train = base.filter(~F.col("_held"))
    held = (base.filter(F.col("_held"))
            .select("doc_id", F.explode(F.coalesce(tri, F.array().cast(
                "array<struct<tg:string,ctx:string,bg:string,"
                "w2:string,w3:string>>"))).alias("t"))
            .select("doc_id", "t.tg", "t.ctx", "t.bg", "t.w2", "t.w3"))
    tr_toks = train.select("doc_id", F.explode("a").alias("w"))
    c1 = tr_toks.groupBy("w").agg(F.count("*").alias("c1"))
    nv = tr_toks.agg(F.count("*").alias("n_total"),
                     F.countDistinct("w").alias("v"))
    bg_pairs = F.when(F.size("a") >= 2, F.zip_with(
        F.slice("a", 1, F.size("a") - 1), F.slice("a", 2, F.size("a") - 1),
        lambda x, y: F.concat_ws(" ", x, y)))
    c2 = (train.select(F.explode(F.coalesce(bg_pairs, F.array().cast(
        "array<string>"))).alias("bg"))
          .groupBy("bg").agg(F.count("*").alias("c2")))
    c3 = (train.select(F.explode(F.coalesce(tri, F.array().cast(
        "array<struct<tg:string,ctx:string,bg:string,"
        "w2:string,w3:string>>"))).alias("t"))
          .groupBy(F.col("t.tg").alias("tg")).agg(F.count("*").alias("c3")))
    j = (held
         .join(c3, "tg", "left")
         .join(c2.select(F.col("bg").alias("ctx"), F.col("c2").alias("cctx")),
               "ctx", "left")
         .join(c2, "bg", "left")
         .join(F.broadcast(c1.select(F.col("w").alias("w2"),
                                     F.col("c1").alias("c1w2"))), "w2", "left")
         .join(F.broadcast(c1.select(F.col("w").alias("w3"),
                                     F.col("c1").alias("c1w3"))), "w3", "left")
         .crossJoin(F.broadcast(nv)))
    lvl1 = F.round(F.log(F.col("c3") / F.col("cctx")) * 1e6, 0)
    lvl2 = F.round(F.log(F.col("c2") / F.col("c1w2")) * 1e6, 0) + \
        F.lit(LN_ALPHA_MICRO)
    lvl3 = F.round(F.log((F.coalesce("c1w3", F.lit(0)) + 1) /
                         (F.col("n_total") + F.col("v"))) * 1e6, 0) + \
        F.lit(2 * LN_ALPHA_MICRO)
    m = F.when(F.col("c3").isNotNull(), lvl1) \
        .when(F.col("c2").isNotNull(), lvl2).otherwise(lvl3).cast("long")
    backed = F.when(F.col("c3").isNotNull(), 0).otherwise(1)
    return (j.select("doc_id", m.alias("m"), backed.alias("b"))
            .groupBy("doc_id")
            .agg(F.count("*").cast("long").alias("n_trigrams"),
                 F.sum("b").alias("_nb"), F.sum("m").alias("_sm"))
            .select("doc_id", "n_trigrams",
                    F.expr("(_nb * 1000000L) div n_trigrams").cast("long")
                    .alias("backed_off_ppm"),
                    F.round(F.col("_sm") / (F.col("n_trigrams") * F.lit(1e6)),
                            6).alias("sb_score")))


def stupid_backoff_sql(table: str = "documents", text_expr: str = "text",
                       id_expr: str = "doc_id", held_pct: int = 20,
                       salt: str = "sb-v1") -> str:
    """Oracle: identical split, streams, counts, CASE ladder and
    micro-nat rounding in DuckDB."""
    from .hashing import hash32_sql
    h = hash32_sql(f"{id_expr}::VARCHAR || '|{salt}'")
    return f"""
WITH sb_base AS (
  SELECT {id_expr} AS doc_id,
         regexp_split_to_array(trim({text_expr}), '\\s+') AS a,
         ({h} % 100) < {held_pct} AS held
  FROM {table} WHERE trim({text_expr}) <> ''
), sb_held AS (
  SELECT doc_id,
         a[i + 1] || ' ' || a[i + 2] || ' ' || a[i + 3] AS tg,
         a[i + 1] || ' ' || a[i + 2] AS ctx,
         a[i + 2] || ' ' || a[i + 3] AS bg,
         a[i + 2] AS w2, a[i + 3] AS w3
  FROM sb_base, unnest(generate_series(0, len(a) - 3)) AS u(i)
  WHERE held AND len(a) >= 3
), sb_c3 AS (
  SELECT a[i + 1] || ' ' || a[i + 2] || ' ' || a[i + 3] AS tg,
         count(*)::BIGINT AS c3
  FROM sb_base, unnest(generate_series(0, len(a) - 3)) AS u(i)
  WHERE NOT held AND len(a) >= 3 GROUP BY 1
), sb_c2 AS (
  SELECT a[i + 1] || ' ' || a[i + 2] AS bg, count(*)::BIGINT AS c2
  FROM sb_base, unnest(generate_series(0, len(a) - 2)) AS u(i)
  WHERE NOT held AND len(a) >= 2 GROUP BY 1
), sb_c1 AS (
  SELECT w, count(*)::BIGINT AS c1 FROM (
    SELECT unnest(a) AS w FROM sb_base WHERE NOT held) GROUP BY 1
), sb_nv AS (
  SELECT count(*)::BIGINT AS n_total, count(DISTINCT w)::BIGINT AS v
  FROM (SELECT unnest(a) AS w FROM sb_base WHERE NOT held)
), sb_terms AS (
  SELECT s.doc_id,
         (CASE WHEN c3.c3 IS NOT NULL THEN
            round(ln(c3.c3::DOUBLE / cx.c2) * 1e6)
          WHEN b2.c2 IS NOT NULL THEN
            round(ln(b2.c2::DOUBLE / u2.c1) * 1e6) + ({LN_ALPHA_MICRO})
          ELSE
            round(ln((coalesce(u3.c1, 0) + 1)::DOUBLE /
                     (nv.n_total + nv.v)) * 1e6) + ({2 * LN_ALPHA_MICRO})
          END)::BIGINT AS m,
         (CASE WHEN c3.c3 IS NOT NULL THEN 0 ELSE 1 END) AS b
  FROM sb_held s
  LEFT JOIN sb_c3 c3 USING (tg)
  LEFT JOIN sb_c2 cx ON cx.bg = s.ctx
  LEFT JOIN sb_c2 b2 ON b2.bg = s.bg
  LEFT JOIN sb_c1 u2 ON u2.w = s.w2
  LEFT JOIN sb_c1 u3 ON u3.w = s.w3
  CROSS JOIN sb_nv nv
)
SELECT doc_id, count(*)::BIGINT AS n_trigrams,
       ((sum(b) * 1000000) // count(*))::BIGINT AS backed_off_ppm,
       round(sum(m) / (count(*) * 1e6), 6) AS sb_score
FROM sb_terms GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# Cross-snapshot token-distribution drift: the corpus-monitoring stage
# that catches a crawl whose content shifted (spam wave, encoding
# regression, seasonal topic swing) BEFORE it trains a model.  Per
# token, the add-one-smoothed log-odds ratio between two snapshots in
# integer micro-nats; the output is vocabulary-sized at any corpus
# size.
# ---------------------------------------------------------------------------


def token_drift(df_a: DataFrame, df_b: DataFrame, text_col: str = "text") \
        -> DataFrame:
    """(token, cnt_a, cnt_b, lr_micro) over the union vocabulary:
    lr_micro = round(10⁶ · ln(p_a/p_b)) with p_x = (cnt_x+1)/(N_x+V),
    V the union vocabulary size — one ln of a ratio of exact integers
    (identical IEEE in Spark and DuckDB).

    Scale shape: one explode per side, ONE token-keyed groupBy with
    side-conditional sums (never two count tables joined), the (N_a,
    N_b, V) totals a broadcast 1-row crossJoin off the same aggregate
    tree."""
    def _stream(d: DataFrame, side: int) -> DataFrame:
        return (d.filter(F.trim(F.col(text_col)) != "")
                .select(F.explode(F.split(F.trim(F.col(text_col)), WS))
                        .alias("token"), F.lit(side).alias("side")))
    s = _stream(df_a, 0).unionAll(_stream(df_b, 1))
    counts = (s.groupBy("token")
              .agg(F.sum(F.when(F.col("side") == 0, 1).otherwise(0))
                   .cast("long").alias("cnt_a"),
                   F.sum(F.when(F.col("side") == 1, 1).otherwise(0))
                   .cast("long").alias("cnt_b")))
    tot = counts.agg(F.sum("cnt_a").alias("n_a"), F.sum("cnt_b").alias("n_b"),
                     F.count("*").alias("v"))
    # products in DOUBLE: (cnt+1)·(N+V) exceeds int64 at 10¹²-token
    # scale (ANSI overflow); double mul/div is IEEE-identical in both
    # engines so the ln argument still matches the oracle bit-for-bit
    lr = F.round(F.log(((F.col("cnt_a") + 1).cast("double") *
                        (F.col("n_b") + F.col("v"))) /
                       ((F.col("cnt_b") + 1).cast("double") *
                        (F.col("n_a") + F.col("v")))) * 1e6, 0).cast("long")
    return (counts.crossJoin(F.broadcast(tot))
            .select("token", "cnt_a", "cnt_b", lr.alias("lr_micro")))


def token_drift_sql(table_a: str, table_b: str, text_expr: str = "text") -> str:
    """Oracle: identical union stream, conditional counts, smoothing."""
    return f"""
WITH td_s AS (
  SELECT unnest(regexp_split_to_array(trim({text_expr}), '\\s+')) AS token,
         0 AS side
  FROM {table_a} WHERE trim({text_expr}) <> ''
  UNION ALL
  SELECT unnest(regexp_split_to_array(trim({text_expr}), '\\s+')) AS token,
         1 AS side
  FROM {table_b} WHERE trim({text_expr}) <> ''
), td_c AS (
  SELECT token,
         sum(CASE WHEN side = 0 THEN 1 ELSE 0 END)::BIGINT AS cnt_a,
         sum(CASE WHEN side = 1 THEN 1 ELSE 0 END)::BIGINT AS cnt_b
  FROM td_s GROUP BY token
), td_t AS (
  SELECT sum(cnt_a)::BIGINT AS n_a, sum(cnt_b)::BIGINT AS n_b,
         count(*)::BIGINT AS v FROM td_c
)
SELECT token, cnt_a, cnt_b,
       round(ln(((cnt_a + 1)::DOUBLE * (n_b + v)) /
                ((cnt_b + 1)::DOUBLE * (n_a + v))) * 1e6)::BIGINT AS lr_micro
FROM td_c, td_t
"""


# ---------------------------------------------------------------------------
# Classifier calibration (reliability-diagram buckets)
# ---------------------------------------------------------------------------
# A quality-filter model is only as good as its calibration: before
# thresholding the corpus on clf_score you check score buckets against
# an independent label (here the stopword-ratio rule — the cheap
# signal model filters are distilled FROM in CCNet/DCLM-style stacks).
# Output = the reliability diagram's table: per score-decile doc
# count, mean score and empirical positive rate.
#
# Exactness: the mean classifier score is re-derived in SHIFTED ppm —
# shifted = ((_sm + 1000·n_toks)·1000) div n_toks ∈ [0, 2·10⁶] — so
# every integer division has non-negative operands (Spark's `div`
# truncates toward zero, DuckDB's `//` floors: they agree only above
# zero).  Bucketing and rates are integer arithmetic end-to-end.
#
# Scale: one explode+groupBy(doc_id) for the score (classifier_score's
# shape), one codegen'd projection for the label, one 10-key groupBy.

CAL_STOP_THRESH = 0.05     # stopword_ratio >= this = "gold positive"


def classifier_calibration(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id",
                           n_buckets: int = CLF_BUCKETS) -> DataFrame:
    """(bucket, n_docs, mean_score_ppm_shifted, n_pos, pos_rate_ppm)
    over score deciles 0-9 (shifted score 0..2e6 → bucket
    = shifted·10 div 2000001)."""
    toks = (df.filter(F.trim(F.col(text_col)) != "")
            .select(F.col(id_col).alias("doc_id"),
                    F.explode(F.split(F.trim(F.col(text_col)), WS))
                    .alias("w")))
    bucket = F.pmod(hash32(F.col("w")), F.lit(n_buckets))
    milli = _bucket_weight_milli(bucket)
    scores = (toks.select("doc_id", milli.alias("m"))
              .groupBy("doc_id")
              .agg(F.count("*").cast("long").alias("n_toks"),
                   F.sum("m").alias("_sm"))
              .withColumn("shifted_ppm",
                          F.expr("((_sm + 1000 * n_toks) * 1000)"
                                 " div n_toks")))
    labels = (quality_features(df.filter(F.trim(F.col(text_col)) != ""),
                               text_col=text_col)
              .select(F.col(id_col).alias("doc_id"),
                      (F.col("stopword_ratio") >= CAL_STOP_THRESH)
                      .alias("gold")))
    joined = scores.join(labels, "doc_id")
    return (joined
            .withColumn("bucket",
                        F.expr("(shifted_ppm * 10) div 2000001")
                        .cast("long"))
            .groupBy("bucket")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.expr("sum(shifted_ppm) div count(*)")
                 .cast("long").alias("mean_score_ppm_shifted"),
                 F.sum(F.col("gold").cast("long")).cast("long")
                 .alias("n_pos"))
            .withColumn("pos_rate_ppm",
                        F.expr("(n_pos * 1000000) div n_docs")
                        .cast("long")))


def classifier_calibration_sql(table: str = "documents",
                               text_expr: str = "text",
                               id_expr: str = "doc_id",
                               n_buckets: int = CLF_BUCKETS) -> str:
    from .hashing import hash32_sql
    bucket = f"({hash32_sql('w')} % {n_buckets})"
    salted = f"'clfw|' || {bucket}::VARCHAR"
    milli = f"(({hash32_sql(salted)} % 2001) - 1000)"
    qf = quality_features_sql(text_expr)
    return f"""
WITH tok AS (
  SELECT {id_expr} AS doc_id,
         unnest(regexp_split_to_array(trim({text_expr}), '\\s+')) AS w
  FROM {table} WHERE trim({text_expr}) <> ''),
scores AS (
  SELECT doc_id, count(*)::BIGINT AS n_toks, sum({milli})::BIGINT AS _sm
  FROM tok GROUP BY 1),
shifted AS (
  SELECT doc_id,
         ((_sm + 1000 * n_toks) * 1000) // n_toks AS shifted_ppm
  FROM scores),
labels AS (
  SELECT {id_expr} AS doc_id,
         ({qf['stopword_ratio']} >= {CAL_STOP_THRESH}) AS gold
  FROM {table} WHERE trim({text_expr}) <> ''),
buckets AS (
  SELECT (s.shifted_ppm * 10) // 2000001 AS bucket, s.shifted_ppm,
         l.gold
  FROM shifted s JOIN labels l USING (doc_id))
SELECT bucket::BIGINT AS bucket, count(*)::BIGINT AS n_docs,
       (sum(shifted_ppm) // count(*))::BIGINT AS mean_score_ppm_shifted,
       sum(CASE WHEN gold THEN 1 ELSE 0 END)::BIGINT AS n_pos,
       (sum(CASE WHEN gold THEN 1 ELSE 0 END) * 1000000 // count(*))::BIGINT
         AS pos_rate_ppm
FROM buckets GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Flesch reading ease (Flesch 1948) — the classic readability score,
# still a standard column in dataset cards and a cheap quality-floor
# filter.  FRE = 206.835 − 1.015·(W/S) − 84.6·(Syl/W), with the usual
# mechanical conventions: sentences = runs of [.!?] (min 1), words =
# whitespace tokens, syllables(word) = vowel-group count of the
# lowercased word (min 1).
#
# Exactness: reported in integer MICRO-points —
#     fre_micro = 206835000 − (1015000·W) div S − (84600000·Syl) div W
# Every division has non-negative operands (W, S, Syl ≥ 1), so Spark
# `div` (truncate) and DuckDB `//` (floor) agree; the subtraction may
# go negative but is never divided again.
#
# Scale: one explode+groupBy(doc_id) for the syllable sum (the
# classifier_score shuffle shape) + a codegen'd projection for the
# sentence count — one shuffle of fixed-width rows, no UDFs.
# ---------------------------------------------------------------------------

_VOWEL_RX = r"[aeiouy]+"
_SENT_RX = r"[.!?]+"


def flesch_reading_ease(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_words, n_sents, n_syll, fre_micro, fre_band) per
    non-empty doc; fre_band = the classic 0-5 difficulty bucket
    (5 = very easy ≥ 90, 0 = very confusing < 30)."""
    base = df.filter(F.trim(F.col(text_col)) != "")
    toks = base.select(F.col(id_col).alias("doc_id"),
                       F.explode(F.split(F.trim(F.col(text_col)), WS))
                       .alias("w"))
    syl = F.greatest(
        F.size(F.regexp_extract_all(F.lower(F.col("w")),
                                    F.lit(_VOWEL_RX), 0)).cast("long"),
        F.lit(1))
    words = (toks.select("doc_id", syl.alias("syl"))
             .groupBy("doc_id")
             .agg(F.count("*").cast("long").alias("n_words"),
                  F.sum("syl").cast("long").alias("n_syll")))
    sents = base.select(
        F.col(id_col).alias("doc_id"),
        F.greatest(F.size(F.regexp_extract_all(F.col(text_col),
                                               F.lit(_SENT_RX), 0))
                   .cast("long"), F.lit(1)).alias("n_sents"))
    return (words.join(sents, "doc_id")
            .withColumn("fre_micro",
                        F.expr("206835000 - (1015000 * n_words) div n_sents"
                               " - (84600000 * n_syll) div n_words")
                        .cast("long"))
            .withColumn("fre_band", F.expr(
                "CASE WHEN fre_micro >= 90000000 THEN 5"
                " WHEN fre_micro >= 80000000 THEN 4"
                " WHEN fre_micro >= 70000000 THEN 3"
                " WHEN fre_micro >= 60000000 THEN 2"
                " WHEN fre_micro >= 30000000 THEN 1 ELSE 0 END")
                .cast("long")))


def flesch_sql(table: str = "documents", text_expr: str = "text",
               id_expr: str = "doc_id") -> str:
    return f"""
WITH base AS (
  SELECT {id_expr} AS doc_id, {text_expr} AS txt FROM {table}
  WHERE trim({text_expr}) <> ''),
tok AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(txt), '\\s+')) AS w
  FROM base),
words AS (
  SELECT doc_id, count(*)::BIGINT AS n_words,
         sum(greatest(len(regexp_extract_all(lower(w), '{_VOWEL_RX}')),
                      1))::BIGINT AS n_syll
  FROM tok GROUP BY 1),
sents AS (
  SELECT doc_id,
         greatest(len(regexp_extract_all(txt, '{_SENT_RX}')), 1)::BIGINT
           AS n_sents
  FROM base),
scored AS (
  SELECT doc_id, n_words, n_sents, n_syll,
         (206835000 - (1015000 * n_words) // n_sents
          - (84600000 * n_syll) // n_words)::BIGINT AS fre_micro
  FROM words JOIN sents USING (doc_id))
SELECT doc_id, n_words, n_sents, n_syll, fre_micro,
       (CASE WHEN fre_micro >= 90000000 THEN 5
             WHEN fre_micro >= 80000000 THEN 4
             WHEN fre_micro >= 70000000 THEN 3
             WHEN fre_micro >= 60000000 THEN 2
             WHEN fre_micro >= 30000000 THEN 1 ELSE 0 END)::BIGINT
         AS fre_band
FROM scored
"""


# ---------------------------------------------------------------------------
# LLM-watermark screening (Kirchenbauer et al. ICML 2023)
# ---------------------------------------------------------------------------
# Web text increasingly contains model output; the unigram-seeded
# green-list watermark is detectable WITHOUT the generating model:
# token t_i is "green" iff hash(t_{i-1} ‖ t_i) lands in the green half
# of the vocabulary (γ = 1/2 here).  Human text is green ~γT of the
# time; watermarked text is biased high, and the one-proportion z-test
# z = (g − γT)/√(Tγ(1−γ)) flags it.  For γ = 1/2 that is
# z = (2g − T)/√T, so "z > 4" is EXACTLY the integer predicate
# (2g − T) > 0 AND (2g − T)² > 16·T — no float, no sqrt.
#
# Scale: the green count is a pure per-row array expression over the
# token list (zero shuffle, whole-stage codegen); at 100 TB this is a
# mapper-only scan column you compute alongside the other per-doc
# quality features.

WM_Z2_THRESH = 16          # flag when z² > 16, i.e. z > 4


def watermark_screen(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_scored, n_green, green_ppm, wm_flagged) per non-empty
    doc: bigram-seeded green-list counts and the z>4 screening flag.
    Docs with <2 tokens score 0 pairs and are never flagged."""
    # r6 (guide §4.2): the green count ran an interpreted
    # filter(sequence) lambda with a JVM md5 per token pair; the Arrow
    # kernel computes the identical integers (same space-only trim +
    # ASCII-\s+ split as the dedup kernels, hash32 = the Catalyst
    # conv(substring(md5)) value, same '|' pair seed, % 2 == pmod on
    # the non-negative hash).  Downstream ppm/flag algebra unchanged.
    import hashlib
    import re as _re2

    ws_re = _re2.compile(WS, _re2.ASCII)
    id_type = dict(df.dtypes)[id_col]

    def _wm_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        md5 = hashlib.md5
        for pdf in batches:
            ids, nsc, ngr = [], [], []
            for did, txt in zip(pdf[id_col].to_numpy(),
                                pdf[text_col].to_numpy()):
                if txt is None or txt.strip(" ") == "":
                    continue
                toks = ws_re.split(txt.strip(" "))
                nt = len(toks)
                g = 0
                if nt >= 2:
                    prev = toks[0]
                    for t in toks[1:]:
                        h = int(md5((prev + "|" + t).encode("utf-8"))
                                .hexdigest()[:8], 16)
                        if h % 2 == 0:
                            g += 1
                        prev = t
                ids.append(did)
                nsc.append(nt - 1)
                ngr.append(g)
            yield pd.DataFrame({
                "doc_id": ids,
                "n_scored": pd.array(nsc, dtype="int64"),
                "n_green": pd.array(ngr, dtype="int64"),
            })

    out = df.select(F.col(id_col), F.col(text_col)).mapInPandas(
        _wm_fn, f"doc_id {id_type}, n_scored long, n_green long")
    return (out
            .withColumn("green_ppm",
                        F.expr("(n_green * 1000000)"
                               " div greatest(n_scored, 1)").cast("long"))
            .withColumn("wm_flagged",
                        (F.col("n_scored") > 0)
                        & (2 * F.col("n_green") > F.col("n_scored"))
                        & ((2 * F.col("n_green") - F.col("n_scored"))
                           * (2 * F.col("n_green") - F.col("n_scored"))
                           > WM_Z2_THRESH * F.col("n_scored"))))


def watermark_screen_sql(table: str = "documents",
                         text_expr: str = "text",
                         id_expr: str = "doc_id") -> str:
    from .hashing import hash32_sql
    ph = hash32_sql("(toks[i - 1] || '|' || toks[i])")
    return f"""
WITH wm_t AS (
  SELECT {id_expr} AS doc_id,
         regexp_split_to_array(trim({text_expr}), '\\s+') AS toks,
         len(regexp_split_to_array(trim({text_expr}), '\\s+')) AS n
  FROM {table} WHERE trim({text_expr}) <> ''),
wm_g AS (
  SELECT doc_id, (n - 1)::BIGINT AS n_scored,
         (CASE WHEN n >= 2
               THEN len(list_filter(range(2, n + 1), i -> {ph} % 2 = 0))
               ELSE 0 END)::BIGINT AS n_green
  FROM wm_t)
SELECT doc_id, n_scored, n_green,
       (n_green * 1000000 // greatest(n_scored, 1))::BIGINT AS green_ppm,
       (n_scored > 0 AND 2 * n_green > n_scored
        AND (2 * n_green - n_scored) * (2 * n_green - n_scored)
            > {WM_Z2_THRESH} * n_scored) AS wm_flagged
FROM wm_g
"""


# ---------------------------------------------------------------------------
# Distinct-n diversity (Li et al. NAACL 2016) per source
# ---------------------------------------------------------------------------
# distinct-1 / distinct-2 — the fraction of unigram / bigram tokens
# that are unique — is the standard corpus-diversity number on dataset
# cards, and the signal that catches template-farm sources (huge doc
# counts, tiny n-gram inventories) that per-doc quality filters miss.
#
# Exactness: counts of distinct 32-bit md5 lanes — identical collision
# behavior on both engines; ratios in integer ppm.
#
# Scale: two explode+groupBy(source) passes with map-side partial
# aggregation; the distinct counts shuffle (source, hash) pairs, never
# strings.  (Spark's count(DISTINCT) plans as a two-phase expand —
# exact, unlike approx_count_distinct, which the oracle could not
# mirror.)


def distinct_n_diversity(df: DataFrame, group_col: str = "source",
                         text_col: str = "text") -> DataFrame:
    """(source, n_tokens, distinct_tokens, n_bigrams, distinct_bigrams,
    distinct1_ppm, distinct2_ppm) per source."""
    from .hashing import hash32
    base = df.filter(F.trim(F.col(text_col)) != "")
    toks = F.split(F.trim(F.col(text_col)), WS)
    uni = (base.select(F.col(group_col).alias("source"),
                       F.explode(toks).alias("w"))
           .groupBy("source")
           .agg(F.count("*").cast("long").alias("n_tokens"),
                F.countDistinct(hash32(F.col("w"))).cast("long")
                .alias("distinct_tokens")))
    idxs = F.when(F.size(toks) >= 2,
                  F.sequence(F.lit(0), F.size(toks) - 2)) \
        .otherwise(F.array().cast("array<int>"))
    grams = F.transform(idxs, lambda i: F.concat_ws(
        " ", F.slice(toks, i + 1, 2)))
    bi = (base.select(F.col(group_col).alias("source"),
                      F.explode(grams).alias("g"))
          .groupBy("source")
          .agg(F.count("*").cast("long").alias("n_bigrams"),
               F.countDistinct(hash32(F.col("g"))).cast("long")
               .alias("distinct_bigrams")))
    return (uni.join(bi, "source", "left")
            .withColumn("n_bigrams",
                        F.coalesce("n_bigrams", F.lit(0)).cast("long"))
            .withColumn("distinct_bigrams",
                        F.coalesce("distinct_bigrams", F.lit(0))
                        .cast("long"))
            .withColumn("distinct1_ppm",
                        F.expr("(distinct_tokens * 1000000)"
                               " div greatest(n_tokens, 1)").cast("long"))
            .withColumn("distinct2_ppm",
                        F.expr("(distinct_bigrams * 1000000)"
                               " div greatest(n_bigrams, 1)").cast("long")))


def distinct_n_diversity_sql(table: str = "documents",
                             group_expr: str = "source",
                             text_expr: str = "text") -> str:
    from .hashing import hash32_sql
    return f"""
WITH dn_base AS (
  SELECT {group_expr} AS source, trim({text_expr}) AS txt
  FROM {table} WHERE trim({text_expr}) <> ''),
dn_uni AS (
  SELECT source, count(*)::BIGINT AS n_tokens,
         count(DISTINCT {hash32_sql('w')})::BIGINT AS distinct_tokens
  FROM (SELECT source,
               unnest(regexp_split_to_array(txt, '\\s+')) AS w
        FROM dn_base)
  GROUP BY 1),
dn_bi AS (
  SELECT source, count(*)::BIGINT AS n_bigrams,
         count(DISTINCT {hash32_sql('g')})::BIGINT AS distinct_bigrams
  FROM (SELECT source, array_to_string(toks[i : i + 1], ' ') AS g
        FROM (SELECT source,
                     regexp_split_to_array(txt, '\\s+') AS toks
              FROM dn_base),
             UNNEST(range(1, greatest(len(toks) - 1, 0) + 1)) AS t(i))
  GROUP BY 1)
SELECT u.source, n_tokens, distinct_tokens,
       coalesce(n_bigrams, 0)::BIGINT AS n_bigrams,
       coalesce(distinct_bigrams, 0)::BIGINT AS distinct_bigrams,
       (distinct_tokens * 1000000 // greatest(n_tokens, 1))::BIGINT
         AS distinct1_ppm,
       (coalesce(distinct_bigrams, 0) * 1000000
        // greatest(coalesce(n_bigrams, 0), 1))::BIGINT AS distinct2_ppm
FROM dn_uni u LEFT JOIN dn_bi b ON u.source = b.source
"""


# ---------------------------------------------------------------------------
# Character index-of-coincidence gibberish filter (Friedman 1922)
# ---------------------------------------------------------------------------
# The gibberish signal every crawl-cleaning stack needs: base64 blobs,
# hex dumps, and key-mashed junk have near-uniform character
# distributions, while natural language is strongly non-uniform.
# Shannon entropy needs floating-point logs (not exactly mirrorable
# across engines); the index of coincidence
#     IC = Σ c·(c−1) / (n·(n−1))
# — the collision probability of two random character draws, the
# Rényi-2 analogue Friedman used for cipher analysis — carries the
# same signal in EXACT integer arithmetic.  Uniform-random [a-z0-9]
# reads ~1/36 ≈ 27,778 ppm; English text ~65,000-75,000 ppm;
# single-char spam → 1,000,000.
#
# Scale: the alphabet is frozen (36 symbols), so per-symbol counts are
# 36 length(replace(...)) terms — a pure per-row codegen projection,
# zero shuffle, zero explode (verified plan: Scan → Project).  At
# 100 TB this is a mapper-only scan column beside the other per-doc
# quality features.  Exactness bound: Σc(c−1)·10⁶ stays inside int64
# for docs up to ~3·10⁶ alnum chars; for longer docs cast the sum to
# decimal(38,0) on both engines.

IC_ALPHABET = "abcdefghijklmnopqrstuvwxyz0123456789"
IC_LO_PPM = 35_000       # below: too uniform → random-junk suspect
IC_HI_PPM = 250_000      # above: too repetitive → spam suspect
IC_MIN_CHARS = 20        # IC is noise on shorter docs


def char_ic_stats(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_alnum, distinct_alnum, ic_ppm, top_char_ppm,
    gibberish) per non-empty doc: index of coincidence over the
    lowercased [a-z0-9] character stream, the share of the most
    frequent symbol, and the out-of-band gibberish flag."""
    cs = F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]", "")
    base = (df.filter(F.trim(F.col(text_col)) != "")
            .select(F.col(id_col).alias("doc_id"), cs.alias("cs")))
    cnt_cols = [(F.length("cs") - F.length(F.replace(F.col("cs"), F.lit(ch))))
                .cast("long").alias(f"ic_c{i}")
                for i, ch in enumerate(IC_ALPHABET)]
    counts = base.select("doc_id", F.length("cs").cast("long").alias("n_alnum"),
                         *cnt_cols)
    names = [f"ic_c{i}" for i in range(len(IC_ALPHABET))]
    coin_num = None
    distinct = None
    for nm in names:
        t = F.col(nm) * (F.col(nm) - 1)
        d = F.when(F.col(nm) > 0, F.lit(1)).otherwise(F.lit(0))
        coin_num = t if coin_num is None else coin_num + t
        distinct = d if distinct is None else distinct + d
    top = F.greatest(*[F.col(nm) for nm in names])
    out = counts.select(
        "doc_id", "n_alnum",
        distinct.cast("long").alias("distinct_alnum"),
        F.when(F.col("n_alnum") >= 2,
               (coin_num * 1_000_000)
               .cast("long"))
        .otherwise(F.lit(0)).alias("_num"),
        top.cast("long").alias("_top"))
    return (out
            .withColumn("ic_ppm",
                        F.expr("_num div greatest(n_alnum * (n_alnum - 1),"
                               " 1)").cast("long"))
            .withColumn("top_char_ppm",
                        F.expr("(_top * 1000000) div greatest(n_alnum, 1)")
                        .cast("long"))
            .withColumn("gibberish",
                        (F.col("n_alnum") >= IC_MIN_CHARS)
                        & ((F.col("ic_ppm") < IC_LO_PPM)
                           | (F.col("ic_ppm") > IC_HI_PPM)))
            .select("doc_id", "n_alnum", "distinct_alnum", "ic_ppm",
                    "top_char_ppm", "gibberish"))


def char_ic_sql(table: str = "documents", text_expr: str = "text",
                id_expr: str = "doc_id") -> str:
    cnts = ",\n         ".join(
        f"(length(cs) - length(replace(cs, '{ch}', '')))::BIGINT AS ic_c{i}"
        for i, ch in enumerate(IC_ALPHABET))
    names = [f"ic_c{i}" for i in range(len(IC_ALPHABET))]
    coin = " + ".join(f"{nm} * ({nm} - 1)" for nm in names)
    dist = " + ".join(f"(CASE WHEN {nm} > 0 THEN 1 ELSE 0 END)"
                      for nm in names)
    top = "greatest(" + ", ".join(names) + ")"
    return f"""
WITH ic_base AS MATERIALIZED (
  SELECT {id_expr} AS doc_id,
         regexp_replace(lower({text_expr}), '[^a-z0-9]', '', 'g') AS cs
  FROM {table} WHERE trim({text_expr}) <> ''),
ic_cnt AS MATERIALIZED (
  SELECT doc_id, length(cs)::BIGINT AS n_alnum,
         {cnts}
  FROM ic_base),
ic_agg AS (
  SELECT doc_id, n_alnum,
         ({dist})::BIGINT AS distinct_alnum,
         (CASE WHEN n_alnum >= 2 THEN ({coin}) * 1000000 ELSE 0 END)::BIGINT
           AS icnum,
         {top}::BIGINT AS topc
  FROM ic_cnt)
SELECT doc_id, n_alnum, distinct_alnum,
       (icnum // greatest(n_alnum * (n_alnum - 1), 1))::BIGINT AS ic_ppm,
       (topc * 1000000 // greatest(n_alnum, 1))::BIGINT AS top_char_ppm,
       (n_alnum >= {IC_MIN_CHARS}
        AND (icnum // greatest(n_alnum * (n_alnum - 1), 1) < {IC_LO_PPM}
             OR icnum // greatest(n_alnum * (n_alnum - 1), 1) > {IC_HI_PPM}))
         AS gibberish
FROM ic_agg
"""


# ---------------------------------------------------------------------------
# Heaps'-law vocabulary growth.  Curation pipelines size tokenizer
# vocabularies and detect template-farm corpora from how fast the type
# count grows with token mass: V(n) = K·n^β (Heaps 1978; β≈0.5 for
# natural text, → 0 for boilerplate, → 1 for id-spam).  The classic
# estimator needs a corpus ORDER and cumulative distinct counts — a
# sequential scan at first sight.  Distributed form: the type count at
# checkpoint t is |{w : first_owner(w) ≤ t}| where first_owner is a
# plain min(doc_id) per word, and the token mass at t is a conditional
# sum over per-doc token counts.  Both are single partial-aggregable
# folds; the k checkpoints are k conditional sums inside ONE aggregate
# (no k-fold row blow-up), so the whole statistic costs one vocab
# groupBy + two scalar aggs at any corpus size.


def heaps_law_fit(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", k: int = 10) -> DataFrame:
    """Single row (n_ckpt, n_types, n_tokens, heaps_beta, heaps_lnk,
    heaps_r2): exact type/token counts at ``k`` doc-id checkpoints
    (t_i = max_id·i div k) and the OLS fit of ln(types) on ln(tokens)
    over the checkpoints with nonzero mass.  β is the Heaps exponent;
    coefficients rounded 6 dp on both engines (zipf_stats precedent).

    Scale shape: first_owner is one word-keyed groupBy (map-side min);
    per-doc token counts are a projection; each checkpoint row is a
    conditional sum inside one aggregate — the corpus never fans out
    by k.  The OLS fold runs over ≤ k doubles."""
    toks = df.select(F.col(id_col).cast("long").alias("doc_id"),
                     token_count(F.col(text_col)).cast("long").alias("n_tok"))
    maxid = toks.agg(F.max("doc_id").alias("max_id"))
    words = (df.select(F.col(id_col).cast("long").alias("doc_id"),
                       F.explode(F.split(F.trim(F.lower(F.col(text_col))),
                                         WS)).alias("word"))
             .filter(F.col("word") != ""))
    owner = words.groupBy("word").agg(F.min("doc_id").alias("first_doc"))

    def _ck(i: int) -> Column:
        return F.expr(f"(max_id * {i}) div {k}")

    tok_sums = (toks.crossJoin(F.broadcast(maxid))
                .agg(*[F.sum(F.when(F.col("doc_id") <= _ck(i),
                                    F.col("n_tok")).otherwise(F.lit(0)))
                       .cast("long").alias(f"tk{i}")
                       for i in range(1, k + 1)]))
    typ_sums = (owner.crossJoin(F.broadcast(maxid))
                .agg(*[F.sum(F.when(F.col("first_doc") <= _ck(i), 1)
                             .otherwise(0)).cast("long").alias(f"ty{i}")
                       for i in range(1, k + 1)]))
    pts = (tok_sums.crossJoin(F.broadcast(typ_sums))
           .select(F.explode(F.array(*[
               F.struct(F.col(f"tk{i}").alias("toks"),
                        F.col(f"ty{i}").alias("typs"))
               for i in range(1, k + 1)])).alias("p"))
           .select(F.col("p.toks").alias("toks"), F.col("p.typs").alias("typs"))
           .filter((F.col("toks") > 0) & (F.col("typs") > 0))
           .select(F.log(F.col("toks").cast("double")).alias("x"),
                   F.log(F.col("typs").cast("double")).alias("y"),
                   "toks", "typs"))
    sums = pts.agg(F.count("*").cast("double").alias("n"),
                   F.sum("x").alias("sx"), F.sum("y").alias("sy"),
                   F.sum(F.col("x") * F.col("y")).alias("sxy"),
                   F.sum(F.col("x") * F.col("x")).alias("sxx"),
                   F.sum(F.col("y") * F.col("y")).alias("syy"),
                   F.max("toks").cast("long").alias("n_tokens"),
                   F.max("typs").cast("long").alias("n_types"))
    den_x = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    den_y = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    # degenerate folds, mirrored in the oracle: constant x (den_x = 0,
    # e.g. a 1-checkpoint fit) → slope 0 / flat intercept; constant y
    # (den_y = 0, the template-farm case: types frozen at every
    # checkpoint) → the 0-slope fit is exact, r² = 1 by convention
    slope = F.when(den_x > 0, cov / den_x).otherwise(F.lit(0.0))
    r2 = F.when(den_x * den_y > 0, cov * cov / (den_x * den_y)) \
        .otherwise(F.lit(1.0))
    return sums.select(
        F.col("n").cast("long").alias("n_ckpt"), "n_types", "n_tokens",
        F.round(slope, 6).alias("heaps_beta"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6)
        .alias("heaps_lnk"),
        F.round(r2, 6).alias("heaps_r2"))


def heaps_law_sql(table: str = "documents", text_expr: str = "text",
                  id_expr: str = "doc_id", k: int = 10) -> str:
    """DuckDB oracle: identical checkpoints, conditional sums, and OLS
    fold."""
    tk = ",\n         ".join(
        f"sum(CASE WHEN doc_id <= (max_id * {i}) // {k} THEN n_tok "
        f"ELSE 0 END)::BIGINT AS tk{i}" for i in range(1, k + 1))
    ty = ",\n         ".join(
        f"sum(CASE WHEN first_doc <= (max_id * {i}) // {k} THEN 1 "
        f"ELSE 0 END)::BIGINT AS ty{i}" for i in range(1, k + 1))
    pairs = ", ".join(f"struct_pack(toks := tk{i}, typs := ty{i})"
                      for i in range(1, k + 1))
    return f"""
WITH h_toks AS (
  SELECT {id_expr}::BIGINT AS doc_id,
         ({token_count_sql(text_expr)})::BIGINT AS n_tok
  FROM {table}),
h_max AS (SELECT max(doc_id) AS max_id FROM h_toks),
h_words AS (
  SELECT {id_expr}::BIGINT AS doc_id, word
  FROM (SELECT {id_expr},
               unnest(regexp_split_to_array(trim(lower({text_expr})),
                                            '\\s+')) AS word
        FROM {table})
  WHERE word <> ''),
h_owner AS (SELECT word, min(doc_id) AS first_doc FROM h_words GROUP BY word),
h_tk AS (SELECT {tk} FROM h_toks, h_max),
h_ty AS (SELECT {ty} FROM h_owner, h_max),
h_pts AS (
  SELECT ln((p.toks)::DOUBLE) AS x, ln((p.typs)::DOUBLE) AS y,
         p.toks AS toks, p.typs AS typs
  FROM (SELECT unnest([{pairs}]) AS p FROM h_tk, h_ty)
  WHERE p.toks > 0 AND p.typs > 0),
h_sums AS (
  SELECT count(*)::DOUBLE AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy,
         max(toks)::BIGINT AS n_tokens, max(typs)::BIGINT AS n_types
  FROM h_pts),
h_fit AS (
  SELECT n, sx, sy, n_tokens, n_types,
         CASE WHEN n * sxx - sx * sx > 0
              THEN (n * sxy - sx * sy) / (n * sxx - sx * sx)
              ELSE 0.0 END AS slope,
         CASE WHEN (n * sxx - sx * sx) * (n * syy - sy * sy) > 0
              THEN ((n * sxy - sx * sy) * (n * sxy - sx * sy)) /
                   ((n * sxx - sx * sx) * (n * syy - sy * sy))
              ELSE 1.0 END AS r2
  FROM h_sums)
SELECT n::BIGINT AS n_ckpt, n_types, n_tokens,
       round(slope, 6) AS heaps_beta,
       round((sy - slope * sx) / n, 6) AS heaps_lnk,
       round(r2, 6) AS heaps_r2
FROM h_fit
"""


# ---------------------------------------------------------------------------
# Per-document unigram Shannon entropy.  char_ic_stats is the exact-
# integer Rényi-2 stand-in at the CHARACTER level; the word-level
# Shannon number is the standard repetition/diversity quality feature
# (low H → keyword-stuffed or template text even when the char
# distribution looks natural).  H = ln n − (Σ c·ln c)/n needs only the
# per-doc word counts, so the whole operator is one (doc, word)
# groupBy plus one doc-keyed fold — no vocabulary table, no join.


def doc_entropy(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_tokens, n_types, entropy_nats, entropy_norm) per
    non-empty doc: unigram Shannon entropy in nats and the
    Pielou-evenness normalization H/ln(n_types) (0.0 for single-type
    docs), both rounded 6 dp on both engines.

    Scale shape: one (doc_id, word) groupBy with map-side combine, one
    uniform doc_id groupBy; floats only in the final per-doc fold over
    that doc's own vocabulary (zipf_stats precedent)."""
    words = (df.filter(F.trim(F.col(text_col)) != "")
             .select(F.col(id_col).alias("doc_id"),
                     F.explode(F.split(F.trim(F.lower(F.col(text_col))),
                                       WS)).alias("word"))
             .filter(F.col("word") != ""))
    wc = words.groupBy("doc_id", "word").agg(F.count("*").alias("c"))
    agg = wc.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_types"),
        F.sum(F.col("c").cast("double")
              * F.log(F.col("c").cast("double"))).alias("sclc"))
    h = (F.log(F.col("n_tokens").cast("double"))
         - F.col("sclc") / F.col("n_tokens").cast("double"))
    return agg.select(
        "doc_id", "n_tokens", "n_types",
        F.round(h, 6).alias("entropy_nats"),
        F.round(F.when(F.col("n_types") > 1,
                       h / F.log(F.col("n_types").cast("double")))
                .otherwise(F.lit(0.0)), 6).alias("entropy_norm"))


def doc_entropy_sql(table: str = "documents", text_expr: str = "text",
                    id_expr: str = "doc_id") -> str:
    """DuckDB oracle: identical tokenization and entropy fold."""
    return f"""
WITH de_words AS (
  SELECT {id_expr} AS doc_id, word
  FROM (SELECT {id_expr},
               unnest(regexp_split_to_array(trim(lower({text_expr})),
                                            '\\s+')) AS word
        FROM {table} WHERE trim({text_expr}) <> '')
  WHERE word <> ''),
de_wc AS (
  SELECT doc_id, word, count(*)::BIGINT AS c
  FROM de_words GROUP BY doc_id, word),
de_agg AS (
  SELECT doc_id, sum(c)::BIGINT AS n_tokens, count(*)::BIGINT AS n_types,
         sum(c::DOUBLE * ln(c::DOUBLE)) AS sclc
  FROM de_wc GROUP BY doc_id)
SELECT doc_id, n_tokens, n_types,
       round(ln(n_tokens::DOUBLE) - sclc / n_tokens::DOUBLE, 6)
         AS entropy_nats,
       round(CASE WHEN n_types > 1
                  THEN (ln(n_tokens::DOUBLE) - sclc / n_tokens::DOUBLE)
                       / ln(n_types::DOUBLE)
                  ELSE 0.0 END, 6) AS entropy_norm
FROM de_agg
"""


# ---------------------------------------------------------------------------
# Jensen-Shannon divergence between source unigram distributions.
# source_ruzicka measures set-weighted overlap; JS is the
# information-theoretic counterpart (symmetric, bounded by ln 2) that
# mixture designers use to decide whether two sources are near-clones
# or genuinely complementary before assigning sampling weights.
# Identity used to avoid materializing disjoint-support terms:
#   JS(a,b) = ln2·(2 − P∩ − Q∩)/2 + Σ_{w∈both} ½[p·ln(2p/(p+q)) +
#             q·ln(2q/(p+q))]
# where P∩/Q∩ are the probability masses of the SHARED vocabulary —
# so only the inner join on word is ever computed; tokens unique to
# one side enter through the exact scalar masses.


def source_js_divergence(df: DataFrame, text_col: str = "text",
                         source_col: str = "source") -> DataFrame:
    """(source_a, source_b, shared_types, js_nats, js_norm_ppm) for
    every unordered source pair (a < b): unigram Jensen-Shannon
    divergence in nats (6 dp) and its ln2-normalized integer-ppm form.

    Scale shape: one (source, word) groupBy (vocab × sources rows);
    the pair stage is a word-keyed self-join with fan-out bounded by
    the source count, never the corpus; per-source totals broadcast."""
    words = (df.select(F.col(source_col).alias("src"),
                       F.explode(F.split(F.trim(F.lower(F.col(text_col))),
                                         WS)).alias("word"))
             .filter(F.col("word") != ""))
    wc = words.groupBy("src", "word").agg(F.count("*").alias("c"))
    tot = wc.groupBy("src").agg(F.sum("c").cast("long").alias("t"))
    a = (wc.alias("a")
         .join(F.broadcast(tot.alias("ta")), F.col("a.src") == F.col("ta.src"))
         .select(F.col("a.src").alias("src_a"), F.col("a.word").alias("word"),
                 F.col("a.c").alias("ca"), F.col("ta.t").alias("tta")))
    b = (wc.alias("b")
         .join(F.broadcast(tot.alias("tb")), F.col("b.src") == F.col("tb.src"))
         .select(F.col("b.src").alias("src_b"), F.col("b.word").alias("wordb"),
                 F.col("b.c").alias("cb"), F.col("tb.t").alias("ttb")))
    both = a.join(b, (F.col("word") == F.col("wordb"))
                  & (F.col("src_a") < F.col("src_b")))
    p = F.col("ca").cast("double") / F.col("tta").cast("double")
    q = F.col("cb").cast("double") / F.col("ttb").cast("double")
    term = (p * F.log(F.lit(2.0) * p / (p + q))
            + q * F.log(F.lit(2.0) * q / (p + q))) / F.lit(2.0)
    shared = both.groupBy("src_a", "src_b").agg(
        F.count("*").cast("long").alias("shared_types"),
        F.sum(term).alias("inner_js"),
        F.sum(p).alias("pmass"), F.sum(q).alias("qmass"))
    ln2 = 0.6931471805599453
    js = (F.lit(ln2) * (F.lit(2.0) - F.col("pmass") - F.col("qmass"))
          / F.lit(2.0) + F.col("inner_js"))
    return shared.select(
        F.col("src_a").alias("source_a"), F.col("src_b").alias("source_b"),
        "shared_types",
        F.round(js, 6).alias("js_nats"),
        F.round(js * F.lit(1_000_000.0) / F.lit(ln2), 0).cast("long")
        .alias("js_norm_ppm"))


def source_js_sql(table: str = "documents", text_expr: str = "text",
                  source_expr: str = "source") -> str:
    """DuckDB oracle: identical decomposition (inner join + shared
    masses), same constants and rounding."""
    return f"""
WITH js_words AS (
  SELECT {source_expr} AS src, word
  FROM (SELECT {source_expr},
               unnest(regexp_split_to_array(trim(lower({text_expr})),
                                            '\\s+')) AS word
        FROM {table})
  WHERE word <> ''),
js_wc AS (
  SELECT src, word, count(*)::BIGINT AS c
  FROM js_words GROUP BY src, word),
js_tot AS (SELECT src, sum(c)::BIGINT AS t FROM js_wc GROUP BY src),
js_both AS (
  SELECT a.src AS src_a, b.src AS src_b,
         a.c::DOUBLE / ta.t::DOUBLE AS p,
         b.c::DOUBLE / tb.t::DOUBLE AS q
  FROM js_wc a
  JOIN js_tot ta ON a.src = ta.src
  JOIN js_wc b ON a.word = b.word AND a.src < b.src
  JOIN js_tot tb ON b.src = tb.src),
js_shared AS (
  SELECT src_a, src_b, count(*)::BIGINT AS shared_types,
         sum((p * ln(2.0 * p / (p + q)) + q * ln(2.0 * q / (p + q))) / 2.0)
           AS inner_js,
         sum(p) AS pmass, sum(q) AS qmass
  FROM js_both GROUP BY src_a, src_b)
SELECT src_a AS source_a, src_b AS source_b, shared_types,
       round(0.6931471805599453 * (2.0 - pmass - qmass) / 2.0 + inner_js, 6)
         AS js_nats,
       round((0.6931471805599453 * (2.0 - pmass - qmass) / 2.0 + inner_js)
             * 1000000.0 / 0.6931471805599453, 0)::BIGINT AS js_norm_ppm
FROM js_shared
"""


# ---------------------------------------------------------------------------
# χ²-distinctive vocabulary per source.  tfidf_keywords tags each
# DOCUMENT; mixture audits need the SOURCE-level counterpart — which
# words a source uses far more than the corpus baseline predicts
# (Dunning 1993 / Kilgarriff 2001 corpus-comparison statistics; the
# one-cell χ² (o−e)²/e is the standard screen).  Everything heavy is
# one (source, word) count; the word baseline is an agg OF that table
# (no second corpus scan — the tfidf_keywords trick), and the rank
# window partitions by source over its own candidate vocabulary.


def source_keywords_chi2(df: DataFrame, text_col: str = "text",
                         source_col: str = "source", top_k: int = 5,
                         min_count: int = 5) -> DataFrame:
    """(source, rank, word, obs, chi2) — the ``top_k`` most
    overrepresented words per source by one-cell χ² = (o−e)²/e with
    e = T_s·C_w/N; only words with o ≥ min_count and o > e qualify.
    χ² rounded 6 dp; rank ties broken by word (deterministic: the
    window orders by the ROUNDED statistic, zipf/tfidf precedent).

    Scale note: a source's candidate vocabulary can approach the
    corpus vocabulary, so the final rank runs two-phase (the
    quota_sample superset proof): phase 1 ranks within (source,
    input-partition) — any per-partition top-k is a superset of the
    global top-k — bounding phase 2 to top_k × n_partitions rows."""
    words = (df.select(F.col(source_col).alias("source"),
                       F.explode(F.split(F.trim(F.lower(F.col(text_col))),
                                         WS)).alias("word"))
             .filter(F.col("word") != ""))
    sw = words.groupBy("source", "word").agg(F.count("*").alias("o"))
    wtot = sw.groupBy("word").agg(F.sum("o").alias("cw"))
    stot = sw.groupBy("source").agg(F.sum("o").alias("ts"))
    ntot = sw.agg(F.sum("o").alias("n"))
    e = (F.col("ts").cast("double") * F.col("cw").cast("double")
         / F.col("n").cast("double"))
    cand = (sw.join(wtot, "word")
            .join(F.broadcast(stot), "source")
            .crossJoin(F.broadcast(ntot))
            .filter((F.col("o") >= min_count)
                    & (F.col("o").cast("double") > e))
            .select("source", "word", "o",
                    F.round((F.col("o").cast("double") - e)
                            * (F.col("o").cast("double") - e) / e, 6)
                    .alias("chi2")))
    w1 = Window.partitionBy("source", "_pid") \
        .orderBy(F.desc("chi2"), F.asc("word"))
    pre = (cand.withColumn("_pid", F.spark_partition_id())
           .withColumn("_rn1", F.row_number().over(w1))
           .filter(F.col("_rn1") <= top_k))
    w2 = Window.partitionBy("source").orderBy(F.desc("chi2"), F.asc("word"))
    return (pre.withColumn("rank", F.row_number().over(w2))
            .filter(F.col("rank") <= top_k)
            .select("source", "rank", "word",
                    F.col("o").cast("long").alias("obs"), "chi2"))


def source_keywords_chi2_sql(table: str = "documents",
                             text_expr: str = "text",
                             source_expr: str = "source", top_k: int = 5,
                             min_count: int = 5) -> str:
    """DuckDB oracle: identical counts, expectation, rounding, rank."""
    return f"""
WITH x2_words AS (
  SELECT {source_expr} AS source, word
  FROM (SELECT {source_expr},
               unnest(regexp_split_to_array(trim(lower({text_expr})),
                                            '\\s+')) AS word
        FROM {table})
  WHERE word <> ''),
x2_sw AS (
  SELECT source, word, count(*)::BIGINT AS o
  FROM x2_words GROUP BY source, word),
x2_w AS (SELECT word, sum(o)::BIGINT AS cw FROM x2_sw GROUP BY word),
x2_s AS (SELECT source, sum(o)::BIGINT AS ts FROM x2_sw GROUP BY source),
x2_n AS (SELECT sum(o)::BIGINT AS n FROM x2_sw),
x2_cand AS (
  SELECT sw.source, sw.word, sw.o,
         round((sw.o::DOUBLE - s.ts::DOUBLE * w.cw::DOUBLE / n.n::DOUBLE)
               * (sw.o::DOUBLE - s.ts::DOUBLE * w.cw::DOUBLE / n.n::DOUBLE)
               / (s.ts::DOUBLE * w.cw::DOUBLE / n.n::DOUBLE), 6) AS chi2
  FROM x2_sw sw
  JOIN x2_w w USING (word)
  JOIN x2_s s USING (source)
  CROSS JOIN x2_n n
  WHERE sw.o >= {min_count}
    AND sw.o::DOUBLE > s.ts::DOUBLE * w.cw::DOUBLE / n.n::DOUBLE),
x2_rank AS (
  SELECT source, word, o, chi2,
         row_number() OVER (PARTITION BY source
                            ORDER BY chi2 DESC, word) AS rank
  FROM x2_cand)
SELECT source, rank::BIGINT AS rank, word, o::BIGINT AS obs, chi2
FROM x2_rank WHERE rank <= {top_k}
"""


# ---------------------------------------------------------------------------
# Paragraph-level language mixing.  Document-grain language ID hides
# code-switched pages (boilerplate in one language wrapping content in
# another) — a known contaminant of "monolingual" training splits.
# Segment the text at sentence boundaries, vote the marker lexicons
# per segment, and report how much of the document disagrees with its
# own majority language.


def lang_mixing_stats(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_segs, n_lang_segs, major_lang, mixing_ppm) per
    non-empty doc: '.'-delimited segments voted by the frozen marker
    lexicons (lang_id's exact fold), the majority language over
    decided segments (ties → lexicographically smallest code, exact
    integer mode), and the ppm of decided segments disagreeing with
    the majority.  Docs with zero decided segments report 'und' / 0.

    Scale shape: explode + per-row regex counts (codegen) + two
    uniform doc_id groupBys; the mode is a partial-aggregable
    max_by(struct) — segment rows never survive the second exchange."""
    segs = (df.filter(F.trim(F.col(text_col)) != "")
            .select(F.col(id_col).alias("doc_id"),
                    F.explode(F.split(F.col(text_col), r"\.")).alias("seg"))
            .filter(F.trim(F.col("seg")) != ""))
    t = F.lower(F.col("seg"))
    scores = []
    for lang in sorted(LANG_MARKERS):
        rx = r"\b(" + "|".join(LANG_MARKERS[lang]) + r")\b"
        scores.append(F.size(F.regexp_extract_all(t, F.lit(rx), 0))
                      .alias(f"s_{lang}"))
    voted = segs.select("doc_id", *scores)
    best = F.greatest(*[F.col(f"s_{lang}") for lang in sorted(LANG_MARKERS)])
    guess = F.lit("und")
    for lang in sorted(LANG_MARKERS, reverse=True):
        guess = F.when((F.col(f"s_{lang}") == best) & (best > 0),
                       F.lit(lang)).otherwise(guess)
    g = voted.select("doc_id", guess.alias("seg_lang"))
    per = (g.groupBy("doc_id", "seg_lang").agg(F.count("*").alias("c")))
    # majority over DECIDED segments: min_by((−c, code)) so the
    # smallest code wins count ties — exact, partial-aggregable
    dec = per.filter(F.col("seg_lang") != "und")
    major = dec.groupBy("doc_id").agg(
        F.expr("min_by(seg_lang, struct(-c, seg_lang))").alias("major_lang"),
        F.max("c").alias("_maxc"))
    tot = per.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_segs"),
        F.sum(F.when(F.col("seg_lang") != "und", F.col("c"))
              .otherwise(F.lit(0))).cast("long").alias("n_lang_segs"))
    out = (tot.join(major, "doc_id", "left")
           .select("doc_id", "n_segs", "n_lang_segs",
                   F.coalesce(F.col("major_lang"), F.lit("und"))
                   .alias("major_lang"),
                   F.coalesce(F.col("_maxc"), F.lit(0)).cast("long")
                   .alias("_maxc")))
    return out.select(
        "doc_id", "n_segs", "n_lang_segs", "major_lang",
        F.expr("((n_lang_segs - _maxc) * 1000000)"
               " div greatest(n_lang_segs, 1)").cast("long")
        .alias("mixing_ppm"))


def lang_mixing_sql(table: str = "documents", text_expr: str = "text",
                    id_expr: str = "doc_id") -> str:
    """DuckDB oracle: identical segmentation, votes, mode tie-break."""
    langs = sorted(LANG_MARKERS)
    scores = []
    for lang in langs:
        rx = r"\b(" + "|".join(LANG_MARKERS[lang]) + r")\b"
        scores.append(f"len(regexp_extract_all(lower(seg), '{rx}'))"
                      f" AS s_{lang}")
    best = "greatest(" + ", ".join(f"s_{lang}" for lang in langs) + ")"
    guess = "'und'"
    for lang in sorted(langs, reverse=True):
        guess = (f"CASE WHEN s_{lang} = {best} AND {best} > 0 "
                 f"THEN '{lang}' ELSE {guess} END")
    return f"""
WITH lm_segs AS (
  SELECT doc_id, seg FROM (
    SELECT {id_expr} AS doc_id,
           unnest(string_split({text_expr}, '.')) AS seg
    FROM {table} WHERE trim({text_expr}) <> '')
  WHERE trim(seg) <> ''),
lm_votes AS (
  SELECT doc_id, {', '.join(scores)} FROM lm_segs),
lm_guess AS (
  SELECT doc_id, {guess} AS seg_lang FROM lm_votes),
lm_per AS (
  SELECT doc_id, seg_lang, count(*)::BIGINT AS c
  FROM lm_guess GROUP BY doc_id, seg_lang),
lm_ranked AS (
  SELECT doc_id, seg_lang, c,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY c DESC, seg_lang) AS rn
  FROM lm_per WHERE seg_lang <> 'und'),
lm_major AS (
  SELECT doc_id, seg_lang AS major_lang, c::BIGINT AS maxc
  FROM lm_ranked WHERE rn = 1),
lm_tot AS (
  SELECT doc_id, sum(c)::BIGINT AS n_segs,
         sum(CASE WHEN seg_lang <> 'und' THEN c ELSE 0 END)::BIGINT
           AS n_lang_segs
  FROM lm_per GROUP BY doc_id)
SELECT t.doc_id, t.n_segs, t.n_lang_segs,
       coalesce(m.major_lang, 'und') AS major_lang,
       ((t.n_lang_segs - coalesce(m.maxc, 0)) * 1000000
        // greatest(t.n_lang_segs, 1))::BIGINT AS mixing_ppm
FROM lm_tot t LEFT JOIN lm_major m USING (doc_id)
"""
