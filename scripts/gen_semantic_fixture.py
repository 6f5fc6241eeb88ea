"""Generate tests/fixtures/semantic_template_vectors.parquet — the
expected-value oracle for the ``semantic_template_vectors`` driver query
(round-1 verdict item 7: value-level oracle instead of rows-only).

The PCG64-seeded pseudo-fastText word vectors are not SQL-computable, so
the oracle is this committed fixture: expected (template_id, template,
freq, vec_norm) rows per scale factor, keyed by the corpus size
(n_events) so ONE oracle SQL string works at any sf the driver picks:

    SELECT ... FROM read_parquet(fixture) WHERE n_events = (SELECT count(*) FROM events)

The template aggregation here runs in DuckDB (independent of the Spark
path); the vector math is the same frozen semantic module both the Spark
query and tests/test_semantic.py pin.

Rerun after any change to ai_log_analyzer_spark/semantic.py:
    python scripts/gen_semantic_fixture.py
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ai_log_analyzer_spark import semantic  # noqa: E402

OUT = os.path.join(REPO, "tests", "fixtures",
                   "semantic_template_vectors.parquet")


def expected_for(events_parquet: str) -> pd.DataFrame:
    con = duckdb.connect()
    tmpl = con.execute(f"""
        SELECT event_type || ' occurred value <:NUM:>' AS template,
               count(*) AS freq
        FROM read_parquet('{events_parquet}')
        GROUP BY 1 ORDER BY template
    """).fetchdf().reset_index(names="template_id")
    n_events = con.execute(
        f"SELECT count(*) FROM read_parquet('{events_parquet}')").fetchone()[0]
    vecs = semantic.template_vectors(tmpl, dim=32)
    out = tmpl.merge(vecs, on="template_id")
    out["vec_norm"] = out["semantic_vec"].map(
        lambda v: round(float(sum(x * x for x in v)) ** 0.5, 6))
    out["n_events"] = int(n_events)
    return out[["n_events", "template_id", "template", "freq", "vec_norm"]]


def main():
    frames = []
    for sf in ("0.001", "0.01", "0.1"):
        path = f"/root/testdata/sf{sf}/events.parquet"
        if os.path.exists(path):
            frames.append(expected_for(path))
    fixture = pd.concat(frames, ignore_index=True)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    fixture.to_parquet(OUT, index=False)
    print(f"wrote {OUT}: {len(fixture)} rows, "
          f"n_events values {sorted(fixture.n_events.unique().tolist())}")


if __name__ == "__main__":
    main()
