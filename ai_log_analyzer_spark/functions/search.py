"""Positional inverted index + exact phrase search.

The retrieval primitive bm25_topk doesn't cover: bag-of-words scoring
can't answer "docs containing these words ADJACENT, in order" — that
needs per-term posting lists carrying positions and an m-way
intersection with offset alignment (the classic search-engine phrase
query; see e.g. the Lucene/Zipf literature on positional postings).

Spark-first shape: ONE posexplode builds the positional index
(doc_id, pos, tok); each phrase term's posting list is a filter over
it, re-anchored to ``pos - term_offset``; the m-way intersection is a
chain of equi-joins on (doc_id, anchor) — co-partitioned after the
first shuffle, so terms 2..m join without re-exchange.  The classic
rare-term-first ordering cuts intermediate size; at corpus scale the
index is the thing you materialize (bucketed by tok) and the joins
prune to the phrase's postings only — never a full-corpus scan per
query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def positional_index(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """(doc_id, pos, tok) 0-based positional postings — one stateless
    posexplode, no shuffle."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    return (df.select(F.col(id_col).alias("doc_id"),
                      F.posexplode(toks).alias("pos", "tok"))
            .filter(F.col("tok") != ""))


def phrase_search(df: DataFrame, phrase: str, k: int = 10,
                  text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_hits, rnk): top-k docs by exact-phrase occurrence
    count.  Every term's postings are re-anchored to the phrase start
    (pos - offset) and intersected by equi-join on (doc_id, anchor);
    n_hits counts distinct anchors that survive all m terms."""
    words = phrase.split()
    idx = positional_index(df, text_col=text_col, id_col=id_col)
    anchors = None
    for j, w in enumerate(words):
        postings = (idx.filter(F.col("tok") == w)
                    .select("doc_id", (F.col("pos") - j).alias("anchor")))
        anchors = postings if anchors is None else \
            anchors.join(postings, ["doc_id", "anchor"])
    hits = anchors.groupBy("doc_id").agg(F.count("*").alias("n_hits"))
    # two-phase global top-k: a common phrase can match millions of
    # docs, and a bare Window.orderBy would single-task them all.
    # Phase 1 ranks within each shuffle partition (any per-partition
    # top-k is a superset of the global top-k); phase 2 sorts the
    # ≤ k·n_partitions survivors only.
    w1 = Window.partitionBy(F.spark_partition_id()) \
        .orderBy(F.desc("n_hits"), F.asc("doc_id"))
    cand = (hits.withColumn("_rn1", F.row_number().over(w1))
            .filter(F.col("_rn1") <= k))
    w2 = Window.orderBy(F.desc("n_hits"), F.asc("doc_id"))
    return (cand.withColumn("rnk", F.row_number().over(w2))
            .filter(F.col("rnk") <= k)
            .select("doc_id", "n_hits", "rnk"))


def phrase_search_sql(phrase: str, k: int = 10, table: str = "documents",
                      text_expr: str = "text",
                      id_expr: str = "doc_id") -> str:
    """Oracle: same postings, anchors and rank."""
    words = phrase.split()
    terms = []
    for j, w in enumerate(words):
        terms.append(
            f"t{j} AS (SELECT doc_id, pos - {j} AS anchor FROM idx "
            f"WHERE tok = '{w}')")
    joins = "t0"
    for j in range(1, len(words)):
        joins += f" JOIN t{j} USING (doc_id, anchor)"
    return f"""
WITH idx AS (
  SELECT doc_id, i - 1 AS pos, toks[i] AS tok
  FROM (SELECT {id_expr} AS doc_id,
               regexp_split_to_array(trim({text_expr}), '\\s+') AS toks
        FROM {table}),
       UNNEST(range(1, len(toks) + 1)) AS t(i)
  WHERE toks[i] <> ''),
{", ".join(terms)},
hits AS (
  SELECT doc_id, count(*) AS n_hits FROM {joins} GROUP BY 1)
SELECT doc_id, n_hits, rnk FROM (
  SELECT doc_id, n_hits,
         row_number() OVER (ORDER BY n_hits DESC, doc_id) AS rnk
  FROM hits)
WHERE rnk <= {k}
"""
