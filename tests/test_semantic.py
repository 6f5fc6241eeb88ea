"""Semantic template vectors + nearest-id remap (SURVEY.md D9/D10,
O10-O16, O21, O22, O33)."""

import numpy as np
import pandas as pd

from ai_log_analyzer_spark import semantic


def test_preprocess_strips_masks_digits_stopwords():
    ws = semantic.preprocess_template(
        "Connection from <:IP:> port <:NUM:> closedNow at blk_42 the end")
    assert "<:ip:>" not in " ".join(ws)
    assert ws == ["connection", "port", "closed", "now", "blk", "end"]


def test_camel_to_words():
    assert semantic.camel_to_words("getUserName") == "get user name"
    assert semantic.camel_to_words("HTTPServerError") == "http server error"


def test_word_vec_deterministic_unit():
    a, b = semantic.word_vec("kafka"), semantic.word_vec("kafka")
    assert np.allclose(a, b)
    assert abs(np.linalg.norm(a) - 1.0) < 1e-9
    assert not np.allclose(a, semantic.word_vec("redis"))


def test_template_vectors_shape_and_determinism():
    cat = pd.DataFrame({
        "template_id": [0, 1, 2],
        "template": ["Service auth started on port <:NUM:>",
                     "Interface <*> link down",
                     "<:NUM:>"],   # params only → zero vector
        "freq": [10, 5, 1],
    })
    v1 = semantic.template_vectors(cat, dim=32)
    v2 = semantic.template_vectors(cat, dim=32)
    assert v1["semantic_vec"].map(tuple).tolist() == \
        v2["semantic_vec"].map(tuple).tolist()
    assert all(len(v) == 32 for v in v1["semantic_vec"])
    assert np.allclose(v1["semantic_vec"].iloc[2], 0.0)
    assert not np.allclose(v1["semantic_vec"].iloc[0], v1["semantic_vec"].iloc[1])


def test_nearest_id_remap():
    known = pd.DataFrame({"template_id": [0, 1],
                          "semantic_vec": [[1.0, 0.0], [0.0, 1.0]]})
    new = pd.DataFrame({"template_id": [7, 8],
                        "semantic_vec": [[0.9, 0.1], [0.1, 0.9]]})
    assert semantic.nearest_id_remap(known, new) == {7: 0, 8: 1}


def test_window_semantic_matrix_gather():
    vecs = np.arange(12.0).reshape(4, 3)  # 4 templates, dim 3
    win = np.array([[0, 1], [3, 3]])
    out = semantic.window_semantic_matrix(win, vecs)
    assert out.shape == (2, 2, 3)
    assert np.allclose(out[1, 0], vecs[3])
