"""Frozen template catalog + vectorized batch matcher.

The catalog is the engine's D2/D13 (SURVEY.md §1): the deterministic,
immutable output of the fit phase, broadcast to executors for matching.
``Matcher.match_frame`` is the ONE matching implementation — the
single-node oracle and the Spark ``mapInPandas`` parse stage both call
it, so per-row disagreement between them is impossible by construction;
parity tests then exercise the *distributed* concerns (partitioning,
fit-merge, shuffles).

Matching semantics = the reference's inference path
(/root/reference/ailoganalyzer/dataset/template_miner.py:59-66): exact
match only (wildcards match any single token), no new clusters; among
multiple exact matches the most specific template (fewest param slots)
wins, ties broken by lowest template_id.  Unmatched rows get NULL
template_id (dead-letter) instead of the reference's crash.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import List, Optional

import numpy as np
import pandas as pd

from . import masking
from .drain import Drain


@dataclass
class CatalogEntry:
    template_id: int
    tokens: List[str]
    template: str
    token_count: int
    n_params: int
    match_re: re.Pattern      # on MASKED text (template selection)
    extract_re: re.Pattern    # on RAW text (param capture)
    mask_names: List[str]
    example: str
    freq: int


def _match_regex(tokens: List[str]) -> str:
    """Regex over the *masked* line equivalent to exact token match."""
    parts = [r"\S+" if t == masking.WILDCARD else re.escape(t) for t in tokens]
    return "^" + r"\s+".join(parts) + "$"


def freeze(tree: Drain) -> List[CatalogEntry]:
    """Canonical catalog from a fitted tree: ids assigned by
    (token_count, template string) sort — 0-based contiguous, matching
    the reference's ``cluster_id - 1`` convention (template_miner.py:47)."""
    entries = []
    for tid, c in enumerate(tree.sorted_catalog()):
        names = masking.param_mask_names(c.tokens)
        entries.append(CatalogEntry(
            template_id=tid,
            tokens=list(c.tokens),
            template=c.template,
            token_count=len(c.tokens),
            n_params=len(names),
            match_re=re.compile(_match_regex(c.tokens)),
            extract_re=re.compile(masking.template_regex(c.tokens)),
            mask_names=names,
            example=c.example,
            freq=c.count,
        ))
    return entries


def to_rows(entries: List[CatalogEntry]) -> pd.DataFrame:
    """Serializable form (CATALOG schema) for the parquet snapshot table."""
    return pd.DataFrame({
        "template_id": [e.template_id for e in entries],
        "template": [e.template for e in entries],
        "token_count": np.array([e.token_count for e in entries], dtype="int32"),
        "regex": [e.extract_re.pattern for e in entries],
        "example": [e.example for e in entries],
        "freq": np.array([e.freq for e in entries], dtype="int64"),
    })


def from_rows(df: pd.DataFrame) -> List[CatalogEntry]:
    entries = []
    for r in df.sort_values("template_id").itertuples(index=False):
        tokens = r.template.split(" ")
        names = masking.param_mask_names(tokens)
        entries.append(CatalogEntry(
            template_id=int(r.template_id), tokens=tokens, template=r.template,
            token_count=int(r.token_count), n_params=len(names),
            match_re=re.compile(_match_regex(tokens)),
            extract_re=re.compile(r.regex), mask_names=names,
            example=getattr(r, "example", ""), freq=int(getattr(r, "freq", 0)),
        ))
    return entries


class Matcher:
    def __init__(self, entries: List[CatalogEntry]):
        self.entries = entries
        self.by_count: dict[int, List[CatalogEntry]] = {}
        for e in entries:
            self.by_count.setdefault(e.token_count, []).append(e)
        for lst in self.by_count.values():
            # specificity order: fewest param slots first, then id
            lst.sort(key=lambda e: (e.n_params, e.template_id))
        self._cand_cache: dict[tuple, List[CatalogEntry]] = {}

    def _candidates(self, count: int, tok0: str) -> List[CatalogEntry]:
        """Prefix-tree-equivalent pruning: templates of this token count
        whose first token is ``tok0`` literally, or is a param slot
        (wildcard / mask-bearing) that could cover it.  Preserves the
        (n_params, template_id) decision order of the full list."""
        key = (count, tok0)
        got = self._cand_cache.get(key)
        if got is None:
            got = [e for e in self.by_count.get(count, [])
                   if e.tokens[0] == tok0 or e.tokens[0] == masking.WILDCARD
                   or masking.MASK_SCAN_RE.search(e.tokens[0]) is not None]
            self._cand_cache[key] = got
        return got

    def match_frame(self, text: pd.Series) -> pd.DataFrame:
        """Vectorized batch match: returns a DataFrame aligned to
        ``text.index`` with columns template_id (nullable Int64), params
        (list[str]), mask_names (list[str]), extracted_text (str|None).

        All inner-loop indexing is positional numpy (no pandas label
        alignment — profiled at ~40% of batch time)."""
        orig_index = text.index
        t = text.reset_index(drop=True)
        masked = t
        for _name, rx in masking._COMPILED:
            masked = masked.str.replace(rx, masking.MASK_PREFIX + _name + masking.MASK_SUFFIX, regex=True)
        toks = masked.str.split()
        # separator = space: a token can never contain one ("\x00" would
        # be silently dropped by pandas string concat)
        key = toks.str.len().astype(str) + " " + toks.str[0].fillna("")

        n = len(t)
        masked_np = masked.to_numpy()
        text_np = t.to_numpy()
        tid = np.full(n, -1, dtype=np.int64)
        params = np.empty(n, dtype=object)

        for k, pos in pd.Series(range(n)).groupby(key.to_numpy(), sort=False).indices.items():
            cnt_s, t0 = k.split(" ", 1)
            candidates = self._candidates(int(cnt_s), t0)
            remaining = np.asarray(pos)
            for e in candidates:
                if remaining.size == 0:
                    break
                rx = e.match_re
                hit = np.fromiter((rx.match(s) is not None
                                   for s in masked_np[remaining]),
                                  dtype=bool, count=remaining.size)
                hit_pos = remaining[hit]
                if hit_pos.size == 0:
                    continue
                tid[hit_pos] = e.template_id
                if e.n_params:
                    erx = e.extract_re
                    for p in hit_pos:
                        m = erx.match(text_np[p])
                        params[p] = list(m.groups()) if m else None
                else:
                    for p in hit_pos:
                        params[p] = []
                remaining = remaining[~hit]

        mask_names = np.empty(n, dtype=object)
        ext_text = np.empty(n, dtype=object)
        for i in range(n):
            ti = tid[i]
            if ti >= 0 and params[i] is not None:
                mask_names[i] = self.entries[ti].mask_names
                ext_text[i] = masking.PARAM_SEP.join(params[i])
            else:
                params[i] = None
        tid_arr = pd.array(tid, dtype="Int64")
        tid_arr[tid < 0] = pd.NA
        return pd.DataFrame({
            "template_id": tid_arr,
            "params": params,
            "mask_names": mask_names,
            "extracted_text": ext_text,
        }, index=orig_index)


def fit_local(lines, counts=None) -> Drain:
    """Single-process online fit in the given order (oracle + per-partition
    local fit share this)."""
    tree = Drain()
    if counts is None:
        for ln in lines:
            tree.add(ln)
    else:
        for ln, c in zip(lines, counts):
            tree.add(ln, count=c)
    return tree
