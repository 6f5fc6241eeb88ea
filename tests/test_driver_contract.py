"""Mirror of the driver's correctness gate: run every ``queries()``
entry on Spark AND its ``oracle_sql()`` on DuckDB over the same parquet
tables, compare row count, column names, and order-insensitive values
(SURVEY.md §5.4)."""

import math
import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as E

SF_DIR = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")
# data-bound oracles (kmeans-IVF) must embed literals from THIS corpus
os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = SF_DIR
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6).astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("boolean")
        else:
            # DuckDB HUGEINT (sum of ints) arrives as object-dtype ints
            num = pd.to_numeric(df[c], errors="coerce")
            if num.notna().equals(df[c].notna()) and len(df):
                df[c] = (num.round(6).astype("float64")
                         if num.dtype.kind == "f" else num.astype("Int64"))
            else:
                df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


ALL = sorted(E.queries().keys())


@pytest.mark.parametrize("name", ALL)
def test_query_vs_oracle(spark, duck, name):
    qs, osql = E.queries(), E.oracle_sql()
    got = qs[name](spark, SF_DIR).toPandas()
    if name not in osql:
        assert len(got) >= 0  # rows-only check (non-SQL-expressible op)
        return
    exp = duck.sql(osql[name]).df()
    assert sorted(got.columns) == sorted(exp.columns), \
        f"{name}: columns {sorted(got.columns)} vs {sorted(exp.columns)}"
    assert len(got) == len(exp), f"{name}: rows {len(got)} vs {len(exp)}"
    g, e = _canon(got), _canon(exp)
    if not g.equals(e):
        diff = (g != e) & ~(g.isna() & e.isna())
        bad = diff.any(axis=1)
        raise AssertionError(
            f"{name}: value mismatch in {int(bad.sum())} rows\n"
            f"got:\n{g[bad].head(5)}\nexp:\n{e[bad].head(5)}")


def test_entry_smoke(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(df.columns) == {"severity", "n_rows", "n_urls"}
