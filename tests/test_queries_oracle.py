"""Oracle-differential gate: every registry query vs its DuckDB twin
at sf0.001 (the driver runs the same comparison at sf0.01 —
tools/check_correctness.py mirrors it for larger scales)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from vbb_data_pipeline_spark.queries import all_queries

SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

REGISTRY = all_queries()


@pytest.fixture(scope="module")
def oracle():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        elif str(df[c].dtype) in ("int32", "Int64", "Int32", "uint64"):
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype) == "float32":
            df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, oracle):
    spec = REGISTRY[name]
    got = spec.fn(spark, SF).toPandas()
    if spec.oracle is None:
        assert len(got) >= 0  # rows-only check (driver does the same)
        return
    exp = oracle.sql(spec.oracle).df()
    assert len(got) == len(exp), f"rowcount {len(got)} vs {len(exp)}"
    assert sorted(got.columns) == sorted(exp.columns)
    a, b = _canon(got), _canon(exp)
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
