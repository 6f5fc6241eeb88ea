"""Parity suite for the all-JVM codegen'd id-only parse
(operators/parse.parse_template_ids_jvm): per-row equality with the
Arrow-batched Matcher path on both engine corpora, plan shape (no
Python eval nodes), and the dispatch cap."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from ai_log_analyzer_spark import grammar
from ai_log_analyzer_spark.operators import fit as fit_op
from ai_log_analyzer_spark.operators import parse as parse_op
from ai_log_analyzer_spark.sources import pages as pages_src


def _ids(df) -> pd.Series:
    pdf = df.select("host", "seq_no", "template_id").toPandas()
    return (pdf.sort_values(["host", "seq_no"]).reset_index(drop=True)
            ["template_id"])


@pytest.fixture(scope="module")
def grammar_pages(spark):
    # 20k rows covers every template incl. the wildcard-bearing ones
    return pages_src.pages_to_spark(spark, grammar.generate_pages(20000))


@pytest.fixture(scope="module")
def grammar_catalog(grammar_pages):
    return fit_op.fit_catalog(grammar_pages)


def test_jvm_equals_arrow_on_grammar_corpus(grammar_pages, grammar_catalog):
    """The load-bearing parity: the grammar catalog has literal-first,
    wildcard and mask-bearing templates; every row's decision must be
    identical between the codegen CASE and the Matcher UDF."""
    a = _ids(parse_op.parse_template_ids_arrow(grammar_pages, grammar_catalog))
    j = _ids(parse_op.parse_template_ids_jvm(grammar_pages, grammar_catalog))
    pd.testing.assert_series_equal(a, j)
    assert a.notna().all()


def test_jvm_equals_arrow_on_documents_corpus(spark):
    """Word-salad shapes (what Drain mines from web text, not the log
    grammar): parity at the dispatch cap, and the full ~500-template
    web catalog must NOT be eligible — a CASE that wide OOMs janino
    inside larger DAGs (observed at 8g driver heap), so the dispatcher
    has to route it to the Arrow path."""
    from ai_log_analyzer_spark.queries import pages_from_documents
    pages = pages_from_documents(spark, "/root/testdata/sf0.001")
    cat = fit_op.fit_catalog(pages)
    assert not parse_op.jvm_parse_eligible(cat)
    capped = cat.head(parse_op.JVM_PARSE_MAX_TEMPLATES)
    a = _ids(parse_op.parse_template_ids_arrow(pages, capped))
    j = _ids(parse_op.parse_template_ids_jvm(pages, capped))
    pd.testing.assert_series_equal(a, j)


def test_jvm_dead_letter_and_whitespace_quirks(spark, grammar_catalog):
    """Unknown shapes → NULL; leading whitespace dead-letters (the
    Matcher's ^-anchored match rejects it) — both paths must agree on
    the quirk, not just on clean lines."""
    rows = [
        ("h", 0, "zzz never a template shape 123 !!!"),
        ("h", 1, ""),
        ("h", 2, "   "),
        ("h", 3, " Interface eth0 link down"),        # leading space
        ("h", 4, "Interface eth0  link   down"),      # inner runs
        ("h", 5, "Interface eth0 link down "),        # trailing space
        ("h", 6, "Connection from 10.0.0.1 port 80 closed"),
        # trailing NON-space whitespace: F.trim strips only spaces, so a
        # naive token count inflates by one and the JVM path dead-letters
        # a row the Python Matcher parses (round-4 advice)
        ("h", 7, "Interface eth0 link down\n"),
        ("h", 8, "Interface eth0 link down\t"),
        ("h", 9, "Interface eth0 link down \n "),
        ("h", 10, "\nInterface eth0 link down"),      # leading newline
        ("h", 11, "\t\n "),                           # all-whitespace
    ]
    df = (spark.createDataFrame(rows, ["host", "seq_no", "text"])
          .withColumn("url", F.lit("u")).withColumn("lang", F.lit("en"))
          .withColumn("warc_ts", F.current_timestamp()))
    a = _ids(parse_op.parse_template_ids_arrow(df, grammar_catalog))
    j = _ids(parse_op.parse_template_ids_jvm(df, grammar_catalog))
    pd.testing.assert_series_equal(a, j)
    assert pd.isna(a.iloc[0]) and pd.isna(a.iloc[1])


def test_jvm_path_has_no_python_eval(grammar_pages, grammar_catalog):
    plan = parse_op.parse_template_ids_jvm(
        grammar_pages, grammar_catalog)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_dispatch_cap_and_env_kill_switch(grammar_pages, grammar_catalog,
                                          monkeypatch):
    assert parse_op.jvm_parse_eligible(grammar_catalog)
    monkeypatch.setenv("SPARK_GRAFT_JVM_PARSE", "0")
    assert not parse_op.jvm_parse_eligible(grammar_catalog)
    monkeypatch.setenv("SPARK_GRAFT_JVM_PARSE", "5")
    assert not parse_op.jvm_parse_eligible(grammar_catalog)  # cap < |catalog|
    monkeypatch.delenv("SPARK_GRAFT_JVM_PARSE")
    # the dispatcher routes through the JVM path for this catalog: same
    # result, no Python eval in the plan
    plan = parse_op.parse_template_ids(
        grammar_pages, grammar_catalog)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan


def test_catalog_token_is_content_keyed(grammar_catalog):
    """The matcher/broadcast cache key is a CONTENT fingerprint: equal
    catalogs (even distinct objects / permuted rows) share a token, so
    repeat parses hit the worker-side Matcher; any change to what the
    Matcher consumes produces a fresh token."""
    t1 = parse_op._catalog_token(grammar_catalog)
    t2 = parse_op._catalog_token(
        grammar_catalog.sample(frac=1.0, random_state=7))  # permuted copy
    assert t1 == t2
    mutated = grammar_catalog.copy()
    mutated.loc[mutated.index[0], "template"] = "something <:NAME:> else"
    assert parse_op._catalog_token(mutated) != t1


def test_broadcast_cache_reuses_and_evicts(spark, grammar_catalog):
    sc = spark.sparkContext
    tok = parse_op._catalog_token(grammar_catalog)
    b1 = parse_op._broadcast_for(sc, tok, grammar_catalog)
    b2 = parse_op._broadcast_for(sc, tok, grammar_catalog)
    assert b1 is b2
    # overflow the LRU: the original entry is evicted and a fresh
    # request re-broadcasts instead of returning a dead handle
    for i in range(parse_op._MATCHER_CACHE_CAP):
        parse_op._broadcast_for(sc, f"{tok}-fill{i}", grammar_catalog)
    b3 = parse_op._broadcast_for(sc, tok, grammar_catalog)
    assert b3 is not b1
    assert (b3.value["template_id"] == grammar_catalog["template_id"]).all()
