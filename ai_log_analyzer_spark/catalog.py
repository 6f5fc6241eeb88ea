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
    extract_pattern: str      # regex SOURCE on RAW text (param capture)
    mask_names: List[str]
    example: str
    freq: int
    # compiled lazily: eager compilation of 2 regexes × catalog
    # cardinality cost ~5.7 s at 5k templates (measured, r4) and ran
    # TWICE per job (freeze on the driver, from_rows per worker); the
    # matcher's candidate pruning touches only a handful of entries per
    # distinct masked form, so lazy compile does O(forms) work instead
    # of O(catalog).  r6: match_pattern (the selection regex SOURCE) is
    # itself lazy — the Matcher's dict/token-compare path never touches
    # it, and building 10⁴ escaped regex sources per worker was ~half of
    # from_rows' wall; only the ≤200-template JVM parse path renders it.
    _match_re: Optional[re.Pattern] = None
    _extract_re: Optional[re.Pattern] = None
    _match_pattern: Optional[str] = None

    @property
    def match_pattern(self) -> str:
        if self._match_pattern is None:
            self._match_pattern = _match_regex(self.tokens)
        return self._match_pattern

    @property
    def match_re(self) -> re.Pattern:
        if self._match_re is None:
            self._match_re = re.compile(self.match_pattern)
        return self._match_re

    @property
    def extract_re(self) -> re.Pattern:
        if self._extract_re is None:
            self._extract_re = re.compile(self.extract_pattern)
        return self._extract_re


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
            extract_pattern=masking.template_regex(c.tokens),
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
        "regex": [e.extract_pattern for e in entries],
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
            extract_pattern=r.regex, mask_names=names,
            example=getattr(r, "example", ""), freq=int(getattr(r, "freq", 0)),
        ))
    return entries


_RE_WS = re.compile(r"\s+")   # unicode \s — the match_pattern dialect


class Matcher:
    # masked-form memo bound: log corpora have 10^2-10^4 distinct masked
    # forms; the cap only matters on adversarial input (cache bypass, not
    # eviction, so the decision rule never changes)
    FORM_CACHE_CAP = 1 << 16

    def __init__(self, entries: List[CatalogEntry]):
        self.entries = entries
        self.by_count: dict[int, List[CatalogEntry]] = {}
        for e in entries:
            self.by_count.setdefault(e.token_count, []).append(e)
        for lst in self.by_count.values():
            # specificity order: fewest param slots first, then id
            lst.sort(key=lambda e: (e.n_params, e.template_id))
        # r6 OPTIMIZATION (decision rule UNCHANGED, regexes GONE): the
        # match_pattern regex is structurally per-token — escaped
        # literals joined by \s+, whole-token <*> as \S+ — so matching
        # reduces to a positional token compare over the \s+-split form
        # (wildcard = any non-empty token; no leading/trailing \s).
        # Templates with no whole-token wildcard (the overwhelming
        # majority) resolve via ONE dict probe on the token tuple;
        # wildcard-bearing templates fall back to the ordered compare.
        # The old path lazily re.compile()d ~the whole catalog on first
        # touch (~0.6 ms/template — 30 s of pure regex compilation per
        # worker at a 50k-template catalog); equality is pinned by
        # tests/test_parse_jvm.py + engine parity + the rewrite suite.
        self._lit_map: dict[tuple, CatalogEntry] = {}
        self._wild_by_count: dict[int, List[CatalogEntry]] = {}
        for e in entries:
            if masking.WILDCARD in e.tokens:
                self._wild_by_count.setdefault(e.token_count, []).append(e)
            else:
                self._lit_map.setdefault(tuple(e.tokens), e)
        for lst in self._wild_by_count.values():
            lst.sort(key=lambda e: (e.n_params, e.template_id))
        self._cand_cache: dict[tuple, List[CatalogEntry]] = {}
        # masked form -> template_id (-1 = dead-letter); persists across
        # batches inside one python worker, so steady-state batches do
        # ZERO template-selection work
        self._form_cache: dict[str, int] = {}
        # template_id -> token-slice extraction plan (built lazily)
        self._ext_plan: dict[int, list] = {}

    @staticmethod
    def _tok0_ok(e: CatalogEntry, tok0: str) -> bool:
        """The prefix-pruning predicate of the old candidate lists."""
        t0 = e.tokens[0] if e.tokens else None
        return (t0 == tok0 or t0 == masking.WILDCARD
                or (t0 is not None
                    and masking.MASK_SCAN_RE.search(t0) is not None))

    def _wild_candidates(self, count: int, tok0) -> List[CatalogEntry]:
        key = (count, tok0)
        got = self._cand_cache.get(key)
        if got is None:
            lst = self._wild_by_count.get(count, [])
            got = (lst if tok0 is None
                   else [e for e in lst if self._tok0_ok(e, tok0)])
            self._cand_cache[key] = got
        return got

    @staticmethod
    def _wild_match(tt: List[str], ft: List[str]) -> bool:
        if len(tt) != len(ft):
            return False
        for a, b in zip(tt, ft):
            if a == masking.WILDCARD:
                if not b:          # \S+ needs >= 1 char
                    return False
            elif a != b:
                return False
        return True

    def _match_form(self, form: str) -> int:
        """Decision rule for ONE masked form: among templates of the same
        token count (pruned by first token), first full match in
        (n_params, template_id) order wins; -1 = dead-letter."""
        toks = form.split()
        count = len(toks)
        tok0 = toks[0] if toks else None
        # regex-dialect tokenization: ^tok(\s+tok)*$ admits no leading/
        # trailing whitespace, so empty edge tokens from re.split make
        # every compare fail, exactly like the old anchored regex —
        # EXCEPT one trailing "\n", which Python's "$" matches before
        # (the round-4 dead-letter alignment depends on this quirk)
        if form.endswith("\n"):
            form = form[:-1]
        rtoks = _RE_WS.split(form) if form else []
        key = tuple(rtoks)
        lit = self._lit_map.get(key)
        if lit is not None and (lit.token_count != count
                                or (toks and not self._tok0_ok(lit, tok0))):
            # bucketing uses str.split counts — a candidate outside the
            # form's (count, tok0) bucket was never tried by the old path
            lit = None
        for e in self._wild_candidates(count, tok0):
            if lit is not None and ((lit.n_params, lit.template_id)
                                    < (e.n_params, e.template_id)):
                return lit.template_id
            if self._wild_match(e.tokens, rtoks):
                return e.template_id
        return lit.template_id if lit is not None else -1

    def _plan_for(self, tid: int) -> list:
        """Token-slice extraction plan: (token_pos, kind, payload) per
        param-bearing token.  kind 'wild' → param = raw token; 'mask' →
        param = raw token, UNLESS the raw token literally equals the mask
        token (pathological self-masking text → extraction fails, exactly
        like the anchored-regex path); 'multi' → embedded masks/wildcards
        inside one token, resolved by an anchored token-level regex
        (payload = (compiled_re, n_groups)).

        Equivalence with the line-level ``extract_re`` path: tokens join
        on \\s+ and no mask pattern matches whitespace, so captures never
        cross token boundaries; a whole-token mask in a MATCHED masked
        form implies masking replaced the entire raw token, i.e. the raw
        token fullmatches the mask pattern (pinned by the parity suite +
        round-trip property test)."""
        got = self._ext_plan.get(tid)
        if got is None:
            got = []
            for pos, tok in enumerate(self.entries[tid].tokens):
                pieces = masking._token_pieces(tok)
                kinds = [k for k, _v in pieces]
                if kinds == ["lit"]:
                    continue
                if kinds == ["wild"]:
                    got.append((pos, "wild", None))
                elif kinds == ["mask"]:
                    got.append((pos, "mask", tok))
                else:
                    rx = []
                    n_groups = 0
                    for kind, val in pieces:
                        if kind == "mask":
                            rx.append("(" + masking._MASK_PATTERNS[val] + ")")
                            n_groups += 1
                        elif kind == "wild":
                            rx.append(r"(\S+)")
                            n_groups += 1
                        else:
                            rx.append(re.escape(val))
                    got.append((pos, "multi",
                                (re.compile("^" + "".join(rx) + "$"), n_groups)))
            self._ext_plan[tid] = got
        return got

    def _ids_for_series(self, t: pd.Series) -> np.ndarray:
        """Shared template-selection kernel: masked-form factorize +
        memoized per-form decision.  Returns int64 ids, -1 = dead-letter."""
        masked = masking.mask_series(t)
        n = len(t)
        codes, uniques = pd.factorize(masked, sort=False)
        cache = self._form_cache
        u_tid = np.empty(len(uniques), dtype=np.int64)
        for j, form in enumerate(uniques):
            got = cache.get(form)
            if got is None:
                got = self._match_form(form)
                if len(cache) < self.FORM_CACHE_CAP:
                    cache[form] = got
            u_tid[j] = got
        if n == 0 or len(uniques) == 0:
            return np.full(n, -1, dtype=np.int64)
        tid = u_tid[codes]
        tid[codes < 0] = -1   # null text rows → dead-letter
        return tid

    def match_ids(self, text: pd.Series) -> pd.Series:
        """Template-id-only fast path: IDENTICAL decision rule to
        match_frame (same masking, same memoized form match — equality
        pinned by tests/test_engine_parity.py), skipping parameter
        extraction entirely.  This is projection pushdown INTO the
        vectorized parse: the windows→score branch of the flagship DAG
        prunes extracted_text immediately, so building + Arrow-shipping
        the strings was pure waste (round-1 verdict: cut bytes/doc
        through the bound stages)."""
        tid = self._ids_for_series(text.reset_index(drop=True))
        out = pd.array(tid, dtype="Int64")
        out[tid < 0] = pd.NA
        return pd.Series(out, index=text.index)

    def match_frame(self, text: pd.Series,
                    with_params: bool = True) -> pd.DataFrame:
        """Vectorized batch match: returns a DataFrame aligned to
        ``text.index`` with columns template_id (nullable Int64),
        extracted_text (str|None), and — when ``with_params`` — params
        (list[str]) and mask_names (list[str]).

        Fast path (round 2): rows are FACTORIZED on their masked form,
        so template selection runs once per distinct form (memoized
        across batches), and parameter extraction is one vectorized
        ``str.replace`` per matched template instead of a per-row Python
        loop.  Identical decision rule and byte-identical extracted_text
        vs the round-1 per-row path (pinned by the parity suite)."""
        orig_index = text.index
        t = text.reset_index(drop=True)
        n = len(t)
        tid = self._ids_for_series(t)

        ext_text = np.full(n, None, dtype=object)
        params = np.full(n, None, dtype=object)
        mask_names = np.full(n, None, dtype=object)
        # per-row extraction: plain C-level str.split + token picks (no
        # pandas machinery in the loop — profiled 4x faster); regex only
        # for the rare multi-piece tokens
        sep = masking.PARAM_SEP
        text_np = t.to_numpy()
        plans = {int(v): (self.entries[int(v)], self._plan_for(int(v)))
                 for v in (np.unique(tid[tid >= 0]) if n else ())}
        for p in range(n):
            ti = tid[p]
            if ti < 0:
                continue
            e, plan = plans[int(ti)]
            if not plan:
                ext_text[p] = ""
                if with_params:
                    params[p] = []
                    mask_names[p] = e.mask_names
                continue
            toks = text_np[p].split()
            vals: list = []
            ok = True
            for tpos, kind, payload in plan:
                tok = toks[tpos]
                if kind == "multi":
                    mm = payload[0].match(tok)
                    if mm is None:
                        ok = False
                        break
                    vals.extend(mm.groups())
                elif kind == "mask" and tok == payload:
                    ok = False      # pathological self-masking text
                    break
                else:
                    vals.append(tok)
            if ok:
                ext_text[p] = sep.join(vals)
                if with_params:
                    params[p] = vals
                    mask_names[p] = e.mask_names

        tid_arr = pd.array(tid, dtype="Int64")
        tid_arr[tid < 0] = pd.NA
        cols = {"template_id": tid_arr}
        if with_params:
            cols["params"] = params
            cols["mask_names"] = mask_names
        cols["extracted_text"] = ext_text
        return pd.DataFrame(cols, index=orig_index)


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
