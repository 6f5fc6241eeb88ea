"""Fixed-depth prefix-tree log-template miner (Drain), pure Python.

A from-scratch implementation of the published algorithm:
He, Zhu, Zheng, Lyu — "Drain: An Online Log Parsing Approach with Fixed
Depth Tree", ICWS 2017 — with drain3's default knobs (depth=4,
sim_th=0.4, max_children=100, wildcard ``<*>``) as used, un-overridden,
by the reference (/root/reference/ailoganalyzer/dataset/template_miner.py:33).
The reference delegates all of this to the external drain3 package; no
code is copied from either.

This kernel is deliberately single-process: Spark distribution happens
around it (per-partition local fit inside ``mapInPandas`` + a canonical
driver-side merge — see operators/fit.py), never inside it.

Template ids are 0-based and contiguous, matching the reference's
``cluster_id - 1`` convention (template_miner.py:47,61).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

from .masking import WILDCARD, mask_line, tokenize

DEPTH = 4          # total tree depth incl. root+length level (drain3 default)
SIM_TH = 0.4       # similarity threshold (drain3 default)
MAX_CHILDREN = 100  # per internal node (drain3 default)

_HAS_DIGIT = re.compile(r"\d")


@dataclass(eq=False)
class Cluster:
    tokens: List[str]
    count: int = 0
    example: str = ""   # first raw line that formed/joined the cluster
    idx: int = -1       # insertion index within this tree (0-based)

    @property
    def template(self) -> str:
        return " ".join(self.tokens)


@dataclass
class _Node:
    children: Dict[str, "_Node"] = field(default_factory=dict)
    clusters: List[Cluster] = field(default_factory=list)


def _seq_sim(template: List[str], tokens: List[str]) -> Tuple[float, int]:
    """(similarity, n_params): fraction of positions with equal tokens;
    wildcard positions count as params, not as similarity (Drain paper §3)."""
    if not template:
        # zero-token cluster (blank/whitespace-only line): identical to a
        # zero-token input by definition — avoids ZeroDivisionError once
        # an empty cluster exists (blank lines are routine in real logs)
        return (1.0 if not tokens else 0.0), 0
    sim = 0
    n_params = 0
    for t, s in zip(template, tokens):
        if t == WILDCARD:
            n_params += 1
        elif t == s:
            sim += 1
    return sim / len(template), n_params


def _merge(template: List[str], tokens: List[str]) -> List[str]:
    return [t if t == s or t == WILDCARD else WILDCARD
            for t, s in zip(template, tokens)]


class Drain:
    def __init__(self, depth: int = DEPTH, sim_th: float = SIM_TH,
                 max_children: int = MAX_CHILDREN):
        self.depth = depth            # internal token levels = depth - 2
        self.sim_th = sim_th
        self.max_children = max_children
        self.root: Dict[int, _Node] = {}   # level 1: token count
        self.clusters: List[Cluster] = []

    # -- tree walk -------------------------------------------------------
    def _leaf(self, tokens: List[str], create: bool) -> Optional[_Node]:
        n_tok = len(tokens)
        node = self.root.get(n_tok)
        if node is None:
            if not create:
                return None
            node = self.root[n_tok] = _Node()
        max_levels = min(self.depth - 2, n_tok)
        for i in range(max_levels):
            tok = tokens[i]
            if _HAS_DIGIT.search(tok):
                tok = WILDCARD
            child = node.children.get(tok)
            if child is None:
                if not create:
                    child = node.children.get(WILDCARD)
                    if child is None:
                        return None
                elif WILDCARD in node.children and tok != WILDCARD and \
                        len(node.children) >= self.max_children:
                    child = node.children[WILDCARD]
                else:
                    if tok != WILDCARD and len(node.children) + 1 >= self.max_children:
                        tok = WILDCARD
                    child = node.children.get(tok)
                    if child is None:
                        child = node.children[tok] = _Node()
            node = child
        return node

    def _best(self, leaf: _Node, tokens: List[str]) -> Optional[Cluster]:
        best, best_sim, best_params = None, -1.0, -1
        for c in leaf.clusters:
            sim, n_params = _seq_sim(c.tokens, tokens)
            if sim > best_sim or (sim == best_sim and n_params > best_params):
                best, best_sim, best_params = c, sim, n_params
        if best is not None and best_sim >= self.sim_th:
            return best
        return None

    # -- public API ------------------------------------------------------
    def add(self, raw_line: str, count: int = 1) -> int:
        """Online fit: mask → tokenize → descend → match-or-create.
        Returns the cluster's current index (0-based)."""
        masked = mask_line(raw_line)
        tokens = tokenize(masked)
        leaf = self._leaf(tokens, create=True)
        cluster = self._best(leaf, tokens)
        if cluster is None:
            cluster = Cluster(tokens=list(tokens), count=count,
                              example=raw_line, idx=len(self.clusters))
            leaf.clusters.append(cluster)
            self.clusters.append(cluster)
        else:
            merged = _merge(cluster.tokens, tokens)
            cluster.tokens[:] = merged
            cluster.count += count
        return cluster.idx

    def match(self, raw_line: str) -> Optional[Cluster]:
        """Inference path: exact match only (non-wildcard tokens must be
        equal), never creates clusters — the reference's ``transform``
        contract (template_miner.py:59-66), minus its unmatched-log crash."""
        masked = mask_line(raw_line)
        tokens = tokenize(masked)
        leaf = self._leaf(tokens, create=False)
        if leaf is None:
            return None
        best, best_wc = None, None
        for c in leaf.clusters:
            if len(c.tokens) != len(tokens):
                continue
            if all(t == WILDCARD or t == s for t, s in zip(c.tokens, tokens)):
                wc = sum(1 for t in c.tokens if t == WILDCARD)
                if best is None or wc < best_wc:
                    best, best_wc = c, wc
        return best

    def sorted_catalog(self) -> List[Cluster]:
        """Canonical id order: (token_count, template string)."""
        return sorted(self.clusters, key=lambda c: (len(c.tokens), c.template))


def canonical_refit(partials: List[Tuple[str, int, str]]) -> Drain:
    """Merge partial catalogs deterministically.

    ``partials``: (template_string, count, example) rows from per-partition
    local fits.  Feeding the *template strings* (already masked; wildcards
    intact) through a fresh tree in sorted order makes the result
    independent of partition count and arrival order — the determinism
    guarantee behind property test 3c (SURVEY.md §7).
    """
    tree = Drain()
    for tmpl, count, example in sorted(partials, key=lambda p: (len(p[0].split()), p[0])):
        masked = mask_line(tmpl)
        tokens = tokenize(masked)
        leaf = tree._leaf(tokens, create=True)
        cluster = tree._best(leaf, tokens)
        if cluster is None:
            cluster = Cluster(tokens=list(tokens), count=count,
                              example=example, idx=len(tree.clusters))
            leaf.clusters.append(cluster)
            tree.clusters.append(cluster)
        else:
            cluster.tokens[:] = _merge(cluster.tokens, tokens)
            cluster.count += count
    return tree
