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
        assert bool(scorer.topk_membership(logits, np.array([lab]), k=2)[0]) == expect


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


def test_weight_memory_linear_in_classes():
    """r3 verdict item 1: scorer memory must be O(C·h), not O(C²).
    Doubling num_classes must ~double total weight bytes (a full-rank
    C×C term would quadruple it), and the absolute footprint at C must
    stay under the 4·C·max(HIDDEN, LOGIT_RANK)·4-byte linear bound."""
    for c in (512, 1024, 2048):
        total = sum(a.nbytes for a in scorer.load_weights(c))
        bound = 4 * c * max(scorer.HIDDEN, scorer.LOGIT_RANK) * 4
        assert total <= bound, (c, total, bound)
    b1 = sum(a.nbytes for a in scorer.load_weights(1024))
    b2 = sum(a.nbytes for a in scorer.load_weights(2048))
    assert b2 <= 2.05 * b1


def test_seed_weight_cache_installs_broadcast_weights():
    w = scorer.load_weights(64)
    scorer._WEIGHT_CACHE.pop((64, scorer.SEED))
    scorer.seed_weight_cache(64, w)
    got = scorer.load_weights(64)
    assert all(a is b for a, b in zip(w, got))


def test_anomaly_score_unchanged_by_logit_factorization():
    """w1/w2 are drawn before mu/mv from the same PCG64 stream, so the
    reconstruction error is bit-identical to the pre-r4 full-rank model
    — pin the first draws directly."""
    rng = np.random.default_rng(np.random.PCG64(scorer.SEED))
    w1_ref = (rng.standard_normal((scorer.HIDDEN, 32)) / np.sqrt(32)).astype(np.float32)
    w1, _, mu, mv = scorer.load_weights(32)
    np.testing.assert_array_equal(w1, w1_ref)
    assert mu.shape == (32, scorer.LOGIT_RANK)
    assert mv.shape == (scorer.LOGIT_RANK, 32)


def test_score_chunking_identity():
    """r6: score() slices batches larger than SCORE_CHUNK into row
    blocks (a pure working-set optimization).  Contract pinned here:
    (a) batches at or under SCORE_CHUNK take the byte-identical
    monolithic path (so every value-checked SF, whose host series are
    well under the bound, cannot drift on any CPU); (b) the blocked
    path agrees with the monolithic one to within the f32 GEMM noise
    band the flagship fixture's 1e-4 hash grid was designed around
    (<=5e-7 absolute), with identical top-k decisions at this seed."""
    for c, n in ((97, 1300), (513, 2049), (4992, 3000)):
        rng = np.random.default_rng(7)
        win = rng.integers(0, c, size=(n, scorer.WINDOW_SIZE)).astype(np.int64)
        lab = rng.integers(0, c, size=n).astype(np.int64)
        err_b, anom_b = scorer.score(win, lab, c)
        old = scorer.SCORE_CHUNK
        try:
            scorer.SCORE_CHUNK = n + 1   # monolithic reference
            err_m, anom_m = scorer.score(win, lab, c)
        finally:
            scorer.SCORE_CHUNK = old
        np.testing.assert_allclose(err_b, err_m, rtol=0, atol=5e-7)
        np.testing.assert_array_equal(anom_b, anom_m)
        # (a): under the bound both calls ARE the same code path
        e1, a1 = scorer.score(win[:old], lab[:old], c)
        try:
            scorer.SCORE_CHUNK = 10 ** 9
            e2, a2 = scorer.score(win[:old], lab[:old], c)
        finally:
            scorer.SCORE_CHUNK = old
        np.testing.assert_array_equal(e1, e2)
        np.testing.assert_array_equal(a1, a2)
