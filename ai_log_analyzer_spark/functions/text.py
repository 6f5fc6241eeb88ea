"""Text-analysis operators for the training-data pipeline (task spec:
language-ID, quality scoring, token counting, document fingerprinting).

Everything is pure Catalyst (``pyspark.sql.functions`` — JVM-side,
whole-stage codegen); regex dialects are kept to the common subset of
Java regex (Spark) and RE2 (DuckDB) so each operator has an exact SQL
oracle.  No Python UDFs anywhere in this module.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
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
    matching the oracle's UNNEST semantics)."""
    toks = F.split(F.trim(F.col(text_col)), WS)
    idxs = F.when(F.size(toks) >= n, F.sequence(F.lit(0), F.size(toks) - n)) \
        .otherwise(F.array().cast("array<int>"))
    grams = F.transform(idxs, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    return (df
            .select(F.col(id_col).alias("doc_id"),
                    F.size(grams).cast("long").alias("n_ngrams"),
                    F.size(F.array_distinct(grams)).cast("long").alias("n_distinct"))
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

    Scale: one explode (linear), bigram counts = one groupBy with
    map-side partials; the count table joins back on the bigram string
    itself — too large to broadcast at web scale, so a shuffle join on
    a near-uniform key (stop-bigrams like "of the" are the skew tail;
    AQE's skew join splits them).  Context counts and V are
    vocabulary-sized / scalar → broadcast.  Final groupBy(doc_id) is
    uniform."""
    toks = F.split(F.trim(F.col(text_col)), WS)
    idxs = F.when(F.size(toks) >= 2, F.sequence(F.lit(0), F.size(toks) - 2)) \
        .otherwise(F.array().cast("array<int>"))
    bgs = F.transform(idxs, lambda i: F.struct(
        F.element_at(toks, i + 1).alias("w1"),
        F.concat_ws(" ", F.slice(toks, i + 1, 2)).alias("bg")))
    stream = (df.filter(F.trim(F.col(text_col)) != "")
              .select(F.col(id_col).alias("doc_id"),
                      F.explode(bgs).alias("b"))
              .select("doc_id", F.col("b.w1").alias("w1"),
                      F.col("b.bg").alias("bg")))
    c2 = stream.groupBy("bg").agg(F.count("*").alias("c2"))
    c1 = stream.groupBy("w1").agg(F.count("*").alias("c1"))
    vocab = (df.filter(F.trim(F.col(text_col)) != "")
             .select(F.explode(F.split(F.trim(F.col(text_col)), WS))
                     .alias("w"))
             .agg(F.countDistinct("w").alias("v")))
    micro = F.round(F.log((F.col("c2") + 1) / (F.col("c1") + F.col("v"))) *
                    1e6, 0).cast("long")
    return (stream.join(c2, "bg")
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
    w_rank = Window.orderBy(F.col("score").desc(), F.col("doc_id"))
    return (scored.withColumn("rank", F.row_number().over(w_rank))
            .filter(F.col("rank") <= top_k))


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
