"""Drain kernel + oracle pipeline behavior (SURVEY.md §5.1 core).

Covers: 0-based contiguous ids, online merge-to-wildcard, exact-match
inference path (no new clusters, most-specific-wins), canonical refit
determinism, windowing quirks (lead-2 label, n-w-1 sample count), and
count-vector semantics — the reference behaviors cited in SURVEY.md §2.
"""

import numpy as np
import pandas as pd
import pytest

from ai_log_analyzer_spark import grammar, masking, scorer
from ai_log_analyzer_spark.catalog import Matcher, fit_local, freeze, from_rows, to_rows
from ai_log_analyzer_spark.drain import Drain, canonical_refit
from ai_log_analyzer_spark.oracle import pipeline as O


def test_ids_zero_based_contiguous():
    t = Drain()
    a = t.add("User alice logged in from 1.2.3.4 in 10 ms")
    b = t.add("Service auth started on port 80")
    assert (a, b) == (0, 1)


def test_merge_to_wildcard():
    # variable slot at position ≥ depth-2 merges to <*>; a slot inside the
    # first 2 tokens splits leaves (fixed-depth prefix-tree semantics —
    # same as drain3 with depth=4)
    t = Drain()
    t.add("Job jobA submitted by alice with priority 3")
    t.add("Job jobA submitted by bob with priority 5")
    assert len(t.clusters) == 1
    assert t.clusters[0].tokens[4] == masking.WILDCARD
    assert t.clusters[0].count == 2
    t.add("Job jobB submitted by carol with priority 1")
    assert len(t.clusters) == 2  # token[1] is a tree level → new leaf


def test_different_token_counts_never_merge():
    t = Drain()
    t.add("Interface eth0 link down")
    t.add("Interface eth0 link up at 100 Mbps")
    assert len(t.clusters) == 2


def test_match_exact_no_create():
    t = Drain()
    t.add("Job jobA submitted by alice with priority 3")
    t.add("Job jobA submitted by bob with priority 5")
    n = len(t.clusters)
    c = t.match("Job jobA submitted by carol with priority 9")
    assert c is t.clusters[0]
    assert len(t.clusters) == n
    assert t.match("Totally unseen line shape here") is None


def test_matcher_most_specific_wins():
    t = Drain()
    t.add("Service auth started on port 80")          # literal 'auth'
    entries = freeze(t)
    # craft: add a same-length all-wildcard-ish competitor
    t2 = Drain()
    t2.add("Service auth started on port 80")
    t2.add("Service kafka exploded on port 80")  # merges? sim=4/6=0.67 → merge
    entries2 = freeze(t2)
    m = Matcher(entries2)
    out = m.match_frame(pd.Series(["Service auth started on port 99"]))
    assert out["template_id"].iloc[0] is not pd.NA


def test_canonical_refit_idempotent_and_order_free():
    lines = [grammar._render(tmpl, np.random.default_rng(i))[0]
             for i, tmpl in enumerate(grammar.TEMPLATES * 3)]
    t_all = fit_local(lines)
    partials = [(c.template, c.count, c.example) for c in t_all.clusters]
    cat1 = to_rows(freeze(canonical_refit(partials)))
    cat2 = to_rows(freeze(canonical_refit(list(reversed(partials)))))
    pd.testing.assert_frame_equal(cat1, cat2)
    # refit of the refit is stable
    t = canonical_refit(partials)
    partials2 = [(c.template, c.count, c.example) for c in t.clusters]
    cat3 = to_rows(freeze(canonical_refit(partials2)))
    assert list(cat3["template"]) == list(cat1["template"])


def test_catalog_rows_roundtrip():
    pages = grammar.generate_pages(500)
    entries = O.fit_catalog(pages)
    rows = to_rows(entries)
    back = from_rows(rows)
    assert [e.template for e in back] == [e.template for e in entries]
    assert [e.extract_re.pattern for e in back] == [e.extract_re.pattern for e in entries]


def test_oracle_parse_full_match_and_byte_identity(pages_df, oracle_result):
    p = oracle_result.parsed
    assert p["template_id"].notna().all()
    entries = from_rows(oracle_result.catalog)
    for i in range(0, len(p), 17):
        row = p.iloc[i]
        e = entries[int(row.template_id)]
        assert masking.substitute(e.tokens, row.params) == pages_df.iloc[i]["text"]
        assert row.extracted_text == masking.PARAM_SEP.join(row.params)


def test_window_sample_count_and_lead2():
    """n - w - 1 samples per series; label skips the adjacent event
    (reference dataset.py:69-77 off-by-one, replicated)."""
    n, w = 30, scorer.WINDOW_SIZE
    df = pd.DataFrame({
        "host": "h", "seq_no": range(n), "url": [f"u{i}" for i in range(n)],
        "warc_ts": pd.Timestamp("2024-01-01"),
        "template_id": [i % 3 for i in range(n)], "lang": "en",
    })
    scored = O.window_score(df, num_classes=3)
    assert len(scored) == n - w - 1
    first = scored.iloc[0]
    assert list(first.window_ids) == [i % 3 for i in range(w)]
    assert first.label_id == (w - 1 + scorer.LABEL_LEAD) % 3


def test_count_vectors():
    win = np.array([[0, 1, 1, 2], [2, 2, 2, 2]])
    cv = scorer.count_vectors(win, 4)
    assert cv.tolist() == [[1, 2, 1, 0], [0, 0, 4, 0]]


def test_severity_rule_buckets(oracle_result):
    got = set(oracle_result.scored["severity"].unique())
    assert got <= set(scorer.SEVERITIES)
    assert {"crit", "high"} <= got  # anomalies present in fixture corpus


def test_empty_and_blank_lines_no_crash():
    """Blank/whitespace-only lines are routine in real logs: fit must not
    ZeroDivisionError once an empty-token cluster exists (round-2 fix in
    drain._seq_sim), and inference must dead-letter or match, not crash."""
    from ai_log_analyzer_spark.drain import Drain

    tree = Drain()
    tree.add("hello world")
    tree.add("")
    tree.add("   ")          # whitespace-only → same zero-token cluster
    tree.add("\t\n")
    empties = [c for c in tree.clusters if len(c.tokens) == 0]
    assert len(empties) == 1 and empties[0].count == 3
    assert tree.match("") is empties[0]
    assert tree.match("hello world").template == "hello world"
