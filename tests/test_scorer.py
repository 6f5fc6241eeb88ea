"""Unit pins for the frozen scorer's decision kernel (ADVICE r2):
tie-inclusive top-k membership (documented deviation from the
reference's argsort[:k] selection, LSTM.py:131) and the out-of-range
label guard."""

import numpy as np
import pytest

from ai_log_analyzer_spark import scorer


def test_topk_membership_strict_rank():
    logits = np.array([[5.0, 4.0, 3.0, 2.0, 1.0]])
    # k=2: labels 0,1 in; 2,3,4 out
    for lab, expect in [(0, True), (1, True), (2, False), (4, False)]:
        assert scorer.topk_membership(logits, np.array([lab]), k=2)[0] is np.bool_(expect)


def test_topk_membership_tie_inclusive():
    """A label whose logit exactly TIES the k-th value is in-top-k —
    both tied labels count, even though argsort[:k] would admit only
    one of them (the documented batch-shape-independent semantics)."""
    logits = np.array([[5.0, 3.0, 3.0, 1.0]])
    # k=2: strictly-greater counts are 0 (lab 0), 1 (labs 1 and 2) → all in
    assert scorer.topk_membership(logits, np.array([1]), k=2)[0]
    assert scorer.topk_membership(logits, np.array([2]), k=2)[0]
    # k=1: labs 1/2 have one strictly greater → out; only lab 0 in
    assert scorer.topk_membership(logits, np.array([0]), k=1)[0]
    assert not scorer.topk_membership(logits, np.array([1]), k=1)[0]
    # a full row of ties is entirely in-top-k at any k >= 1
    flat = np.array([[2.0, 2.0, 2.0]])
    assert scorer.topk_membership(flat, np.array([2]), k=1)[0]


def test_topk_membership_k_clamped_to_classes():
    logits = np.array([[1.0, 0.0]])
    assert scorer.topk_membership(logits, np.array([1]), k=10)[0]


def test_label_out_of_range_raises_clear_error():
    """ADVICE r2: an out-of-range label (stale catalog) must raise a
    clear ValueError, not a bare IndexError deep in fancy indexing."""
    logits = np.zeros((2, 4))
    with pytest.raises(ValueError, match="label_ids out of range"):
        scorer.topk_membership(logits, np.array([1, 4]))
    with pytest.raises(ValueError, match="label_ids out of range"):
        scorer.topk_membership(logits, np.array([-1, 0]))


def test_score_end_to_end_uses_guard():
    win = np.zeros((1, scorer.WINDOW_SIZE), dtype=np.int64)
    with pytest.raises(ValueError, match="label_ids out of range"):
        scorer.score(win, np.array([99]), num_classes=5)
