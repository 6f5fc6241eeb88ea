"""Semantic template vectors (SURVEY.md D9/D10/O14-O16/O21/O22/O33).

The reference builds a 300-d fastText TF-IDF-weighted vector per
template (/root/reference/ailoganalyzer/dataset/template_miner.py:
104-150) using a shelve word→vec store (dbm_vec.py) and spaCy stop-word
filtering (utils_semantic_vec.py).  Offline substitutions (SURVEY.md §7
REPLACE): deterministic pseudo-fastText vectors (unit-normalized PCG64
stream seeded by crc32(word)), a frozen stop-word list, and a proper
word-keyed TF·IDF join — fixing the reference's zip-scramble bug
(template_miner.py:99) instead of reproducing it.

The catalog is tiny (≪ data), so this runs as a numpy step in the
catalog job and ships to executors inside the broadcast catalog — the
Spark-scale consumers (O33 window→semantic matrix) just gather rows
from the broadcast matrix, zero shuffle.
"""

from __future__ import annotations

import re
import zlib
from typing import Dict, List

import numpy as np
import pandas as pd

from . import masking

VEC_DIM = 300

# frozen minimal English stop-word list (replaces runtime spaCy,
# utils_semantic_vec.py:24-31)
STOP_WORDS = frozenset("""
a an and are as at be by for from has he in is it its of on that the to was
were will with this these those i you we they them his her our your not no
""".split())

_CAMEL_1 = re.compile(r"(.)([A-Z][a-z]+)")
_CAMEL_2 = re.compile(r"([a-z0-9])([A-Z])")
_NON_WORD = re.compile(r"[\W_0-9]+")


def camel_to_words(s: str) -> str:
    """camelCase → space-separated lower (reference utils_semantic_vec.py:
    7-12 semantics, two-pass sub + lower)."""
    s = _CAMEL_1.sub(r"\1 \2", s)
    s = _CAMEL_2.sub(r"\1 \2", s)
    return s.lower()


def preprocess_template(template: str) -> List[str]:
    """Template string → content words: strip masked params (O10),
    camel→snake (O11), strip non-word/digits (O12), collapse whitespace
    (O13), stop-word filter (O14)."""
    s = re.sub(r"<:.*?:>", "", template)
    s = s.replace(masking.WILDCARD, "")
    s = camel_to_words(s)
    s = _NON_WORD.sub(" ", s)
    return [w for w in s.split() if w and w not in STOP_WORDS]


def word_vec(word: str, dim: int = VEC_DIM) -> np.ndarray:
    """Deterministic pseudo-fastText vector: unit-normalized PCG64
    stream seeded by crc32(word) (FIXTURES.md F4)."""
    rng = np.random.Generator(np.random.PCG64(zlib.crc32(word.encode())))
    v = rng.standard_normal(dim)
    return v / np.linalg.norm(v)


def template_vectors(catalog_rows: pd.DataFrame,
                     dim: int = VEC_DIM) -> pd.DataFrame:
    """(template_id, semantic_vec) — TF·IDF-weighted mean word vector.

    TF = word count / template length (template_miner.py:88-91);
    IDF = ln(Σ corpus word counts / corpus count[word])
    (template_miner.py:93-96) with corpus counts weighted by template
    frequency (template_miner.py:78-84); weights normalized to sum 1
    (template_miner.py:141-146).  Word↔IDF pairing is BY WORD — the
    deterministic fix of the reference's value-zip scramble."""
    words_per_tmpl: Dict[int, List[str]] = {}
    corpus_counts: Dict[str, int] = {}
    for r in catalog_rows.itertuples(index=False):
        ws = preprocess_template(r.template)
        words_per_tmpl[int(r.template_id)] = ws
        for w in ws:
            corpus_counts[w] = corpus_counts.get(w, 0) + int(r.freq)
    total = float(sum(corpus_counts.values())) or 1.0

    vecs = {w: word_vec(w, dim) for w in corpus_counts}
    out_ids, out_vecs = [], []
    for tid, ws in sorted(words_per_tmpl.items()):
        if not ws:
            out_ids.append(tid)
            out_vecs.append(np.zeros(dim, dtype=np.float32))
            continue
        n = len(ws)
        tf = {w: ws.count(w) / n for w in set(ws)}
        weights = np.array([tf[w] * np.log(total / corpus_counts[w])
                            for w in sorted(set(ws))])
        if weights.sum() > 0:
            weights = weights / weights.sum()
        v = np.zeros(dim)
        for w, wt in zip(sorted(set(ws)), weights):
            v += wt * vecs[w]
        out_ids.append(tid)
        out_vecs.append(v.astype(np.float32))
    return pd.DataFrame({"template_id": out_ids,
                         "semantic_vec": [v.tolist() for v in out_vecs]})


def nearest_id_remap(known_vecs: pd.DataFrame,
                     new_vecs: pd.DataFrame) -> Dict[int, int]:
    """O22: map unseen template ids to the Euclidean-nearest known id
    (the INTENT of the reference's crashy id remap, dataset.py:79-98)."""
    kv = np.stack(known_vecs["semantic_vec"].map(np.asarray))
    kid = known_vecs["template_id"].to_numpy()
    out = {}
    for r in new_vecs.itertuples(index=False):
        d = np.linalg.norm(kv - np.asarray(r.semantic_vec), axis=1)
        out[int(r.template_id)] = int(kid[int(np.argmin(d))])
    return out


def window_semantic_matrix(window_ids: np.ndarray,
                           vec_matrix: np.ndarray) -> np.ndarray:
    """O33: (n, w) id windows → (n, w, dim) semantic tensors by gather
    from the broadcast template-vector matrix — zero shuffle."""
    return vec_matrix[window_ids]
