"""Single-node oracle: the parity referee for the Spark engine.

Pure pandas/numpy, one process, no Spark.  Re-creates the reference's
end-to-end behavior (fit → match/extract → enrich → window → score →
route) using the SAME shared kernels (masking / drain / catalog /
scorer) the Spark operators use, orchestrated sequentially.  Engine vs
oracle equality therefore tests exactly the distributed concerns:
partition-local fit + canonical merge, shuffle-based windowing, and the
fan-out routing — per SURVEY.md §5.1.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import List

import numpy as np
import pandas as pd

from .. import dims, masking, scorer
from ..catalog import CatalogEntry, Matcher, fit_local, freeze, to_rows
from ..drain import canonical_refit


@dataclass
class OracleResult:
    catalog: pd.DataFrame          # CATALOG rows
    parsed: pd.DataFrame           # PARSED rows (pandas dtypes)
    enriched: pd.DataFrame
    scored: pd.DataFrame           # SCORED + severity
    routed_counts: pd.DataFrame    # (severity, n_rows, n_urls)


def fit_catalog(pages: pd.DataFrame) -> List[CatalogEntry]:
    """Canonical fit — the SAME procedure as the distributed fit
    (operators/fit.py) run single-process: distinct masked line forms,
    sorted, fed through Drain with multiplicities, then canonical refit.
    Order-canonical by construction, so the k-partition engine catalog
    equals this one exactly (property test 3c)."""
    from ..drain import Drain

    masked = masking.mask_series(pages["text"])
    counts = masked.value_counts()
    tree = Drain()
    for form in sorted(counts.index):
        tree.add(form, count=int(counts[form]))
    partials = [(c.template, c.count, c.example) for c in tree.clusters]
    return freeze(canonical_refit(partials))


def parse(pages: pd.DataFrame, entries: List[CatalogEntry]) -> pd.DataFrame:
    m = Matcher(entries).match_frame(pages["text"])
    out = pages[["url", "warc_ts", "lang", "host", "seq_no"]].copy()
    out["template_id"] = m["template_id"]
    out["params"] = m["params"]
    out["mask_names"] = m["mask_names"]
    out["extracted_text"] = m["extracted_text"]
    return out


def enrich(parsed: pd.DataFrame, catalog_rows: pd.DataFrame,
           pages: pd.DataFrame) -> pd.DataFrame:
    df = parsed.merge(pages[["url"]], on="url")  # no-op; keeps url key explicit
    df["tld"] = df["url"].map(lambda u: (re.match(dims.TLD_REGEX, u) or [None, None])[1]
                              if re.match(dims.TLD_REGEX, u) else None)
    df = df.merge(dims.LANG_DIM, on="lang", how="left")
    df = df.merge(dims.TLD_DIM, on="tld", how="left")
    df = df.merge(dims.tmpl_freq_dim(catalog_rows), on="template_id", how="left")
    return df


def window_score(parsed: pd.DataFrame, num_classes: int) -> pd.DataFrame:
    """Sliding windows per host (w=10), label at lead 2, frozen scorer,
    severity bucket.  Row identity = the window's END event (url)."""
    w = scorer.WINDOW_SIZE
    rows = []
    ok = parsed[parsed["template_id"].notna()]
    for host, g in ok.groupby("host", sort=True):
        g = g.sort_values("seq_no", kind="mergesort")
        ids = g["template_id"].to_numpy(dtype=np.int64)
        n = len(ids)
        if n < w + scorer.LABEL_LEAD:
            continue
        # window end positions j = w-1 .. n-1-LABEL_LEAD  (count n - w - 1)
        ends = np.arange(w - 1, n - scorer.LABEL_LEAD)
        win = np.stack([ids[j - w + 1:j + 1] for j in ends])
        labels = ids[ends + scorer.LABEL_LEAD]
        err, anom = scorer.score(win, labels, num_classes)
        sev = scorer.severity(err, anom)
        sub = g.iloc[ends]
        rows.append(pd.DataFrame({
            "host": host,
            "seq_no": sub["seq_no"].to_numpy(),
            "url": sub["url"].to_numpy(),
            "warc_ts": sub["warc_ts"].to_numpy(),
            "template_id": ids[ends],
            "label_id": labels,
            "window_ids": list(win.tolist()),
            "anomaly_score": err,
            "is_anomaly": anom,
            "severity": sev,
        }))
    if not rows:
        return pd.DataFrame(columns=["host", "seq_no", "url", "warc_ts",
                                     "template_id", "label_id", "window_ids",
                                     "anomaly_score", "is_anomaly", "severity"])
    return pd.concat(rows, ignore_index=True)


def route_counts(scored: pd.DataFrame) -> pd.DataFrame:
    g = (scored.groupby("severity", sort=True)
         .agg(n_rows=("url", "size"), n_urls=("url", "nunique"))
         .reset_index())
    return g


def run(pages: pd.DataFrame) -> OracleResult:
    entries = fit_catalog(pages)
    catalog_rows = to_rows(entries)
    parsed = parse(pages, entries)
    enriched = enrich(parsed, catalog_rows, pages)
    scored = window_score(parsed, num_classes=len(entries))
    return OracleResult(catalog=catalog_rows, parsed=parsed, enriched=enriched,
                        scored=scored, routed_counts=route_counts(scored))
