"""Table profiler vs DuckDB differential (exact mode) + plan shape."""

from __future__ import annotations

import duckdb

from vbb_data_pipeline_spark.operators.quality import profile_table

SF = "/root/testdata/sf0.001"


def test_profile_matches_oracle_exact(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    got = {
        r.column: (r.dtype, r.n, r.n_null, r.n_distinct, r.min_value, r.max_value)
        for r in profile_table(orders, exact_distinct=True).collect()
    }
    con = duckdb.connect()
    for col in ["o_orderkey", "o_orderstatus", "o_totalprice"]:
        n, nn, nd, mn, mx = con.sql(
            f"""
            SELECT count(*),
                   count(*) - count({col}),
                   count(DISTINCT {col}),
                   CAST(min({col}) AS VARCHAR),
                   CAST(max({col}) AS VARCHAR)
            FROM read_parquet('{SF}/orders.parquet')
            """
        ).fetchone()
        dtype, gn, gnn, gnd, gmn, gmx = got[col]
        assert (gn, gnn, gnd) == (n, nn, nd), col
        # numeric formatting differs (13710.0 vs 13710.00); compare as float
        if dtype in ("double", "float"):
            assert abs(float(gmn) - float(mn)) < 1e-9
            assert abs(float(gmx) - float(mx)) < 1e-9
        else:
            assert (gmn, gmx) == (mn, mx), col


def test_profile_nulls_and_complex_types(spark):
    df = spark.createDataFrame(
        [(1, None, ["a"]), (2, "x", ["b", "c"]), (3, None, None)],
        "k long, v string, arr array<string>",
    )
    got = {r.column: r for r in profile_table(df, exact_distinct=True).collect()}
    assert got["v"].n_null == 2 and got["v"].n_distinct == 1
    assert got["arr"].n_null == 1
    assert got["arr"].min_value is None  # complex type: counts only
    assert got["k"].min_value == "1" and got["k"].max_value == "3"


def test_profile_is_single_scan(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    df = profile_table(orders, exact_distinct=False)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1


def test_profile_hostile_column_names(spark):
    """Quote/backtick/dot-bearing column names must neither break the
    unpivot nor mislabel rows (ADVICE r3: the old string-SQL stack()
    interpolated raw names into quoted literals)."""
    df = spark.createDataFrame(
        [(1, "x"), (2, None)],
        ["it's", "a.b`c"],
    )
    got = {r["column"]: r for r in profile_table(df, exact_distinct=True).collect()}
    assert set(got) == {"it's", "a.b`c"}
    assert got["it's"]["n_null"] == 0 and got["it's"]["n_distinct"] == 2
    assert got["a.b`c"]["n_null"] == 1 and got["a.b`c"]["n_distinct"] == 1
    assert got["it's"]["min_value"] == "1" and got["it's"]["max_value"] == "2"
