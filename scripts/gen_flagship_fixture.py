"""Generate the committed expected-value fixture for the driver query
``flagship_scored`` (round-2 verdict item 4: the driver hashed only the
flagship's sink COUNTS; this fixture lets it hash the scorer's actual
per-row decisions).

Pure single-node oracle — pandas + the shared kernels (masking / drain /
catalog / scorer), no Spark: the SAME referee path test_engine_parity.py
pins against the distributed engine, run over the Common-Crawl-shaped
pages table derived from each sf dir's ``documents`` parquet (the exact
derivation __spark_entry__._pages_from_documents / queries.py use).  One
fixture file holds all three sf sizes, keyed by (n_docs, text_len_sum)
— the oracle SQL selects the slice matching count(*) and
sum(length(text)) of the documents table it runs against (n_docs alone
is ambiguous: sf0.001 and sf0.01 both hold 500 docs, different text).

Usage: python scripts/gen_flagship_fixture.py
Writes tests/fixtures/flagship_scored.parquet
"""

import os
import sys

# single-threaded BLAS BEFORE numpy import: the Spark workers run with
# one BLAS thread (conf.py), and multi-threaded GEMM accumulation order
# shifts the last ulp — enough to flip a 6-dp rounding on ~0.06% of
# rows at num_classes ~5000 (measured).  Same pinning ⇒ bit-identical.
for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ai_log_analyzer_spark import scorer  # noqa: E402
from ai_log_analyzer_spark.oracle import pipeline as O  # noqa: E402

BASE_TS = 1704067200
SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
           "/root/testdata/sf0.1"]
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures", "flagship_scored.parquet")


def pages_from_documents_pandas(sf_dir: str) -> pd.DataFrame:
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    return pd.DataFrame({
        "url": ("https://" + docs["source"].astype(str) + ".example.com/d/"
                + docs["doc_id"].astype(str)),
        "warc_ts": pd.to_datetime(BASE_TS + docs["doc_id"].astype("int64"),
                                  unit="s"),
        "text": docs["text"],
        "lang": docs["lang"],
        "host": docs["source"],
        "seq_no": docs["doc_id"].astype("int64"),
    })


def one_sf(sf_dir: str) -> pd.DataFrame:
    pages = pages_from_documents_pandas(sf_dir)
    entries = O.fit_catalog(pages)
    parsed = O.parse(pages, entries)
    scored = O.window_score(parsed, num_classes=len(entries))
    sev = scorer.severity(scored["anomaly_score"].to_numpy(),
                          scored["is_anomaly"].to_numpy())
    out = pd.DataFrame({
        "host": scored["host"],
        "seq_no": scored["seq_no"].astype("int64"),
        "template_id": scored["template_id"].astype("int64"),
        "label_id": scored["label_id"].astype("int64"),
        # UNROUNDED f64: the consuming oracle SQL applies the hash grid
        # (round 4 dp) itself, so Spark and DuckDB each round exactly
        # once with the same half-up rule — storing a pre-rounded value
        # would double-round (1.26234999→6dp 1.262350→4dp 1.2624 vs
        # direct 1.2623)
        "anomaly_score": scored["anomaly_score"].to_numpy(),
        "severity": sev.astype(str),
        "n_docs": np.int64(len(pages)),
        "text_len_sum": np.int64(pages["text"].str.len().sum()),
    })
    print(f"{sf_dir}: {len(pages)} docs -> {len(entries)} templates, "
          f"{len(out)} scored rows, severities "
          f"{out['severity'].value_counts().to_dict()}")
    return out


def main():
    frames = [one_sf(d) for d in SF_DIRS]
    all_rows = pd.concat(frames, ignore_index=True)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    all_rows.to_parquet(OUT, index=False)
    print(f"wrote {len(all_rows)} rows -> {OUT}")


if __name__ == "__main__":
    main()
