#!/usr/bin/env python
"""Local mimic of the driver's correctness gate.

Runs every registry query on Spark and its DuckDB oracle on the same
parquet tables, then compares row count, schema (normalized dtype
names), and an order-insensitive value comparison (exact, like a
value hash would be). Usage:

    python tools/check_correctness.py [--sf /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import sys
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def normalize_dtype(t: str) -> str:
    t = str(t).lower()
    aliases = {
        "int32": "int",
        "int64": "bigint",
        "integer": "int",
        "object": "string",
        "str": "string",
        "varchar": "string",
        "float64": "double",
        "float32": "float",
        "bool": "boolean",
        "datetime64[ns]": "timestamp",
        "datetime64[us]": "timestamp",
        "date32[day][pyarrow]": "date",
    }
    return aliases.get(t, t)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        if str(df[c].dtype) in ("int32", "int64", "Int64", "Int32", "uint64"):
            df[c] = df[c].astype("int64")
        if str(df[c].dtype) == "float32":
            df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--json",
        default=None,
        help="write a CORRECTNESS-style JSON artifact (per-entry "
        "rows/schema/values match flags) to this path",
    )
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from vbb_data_pipeline_spark.queries import all_queries
    from vbb_data_pipeline_spark.session import get_spark

    registry = all_queries()
    names = args.names or sorted(registry)

    spark = get_spark("check-correctness")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    n_pass = n_fail = n_rows_only = 0
    failures: list[str] = []
    report: dict[str, dict] = {}

    def record(name, *, rows=None, schema=None, values=None,
               spark_rows=None, oracle_rows=None, err=None):
        report[name] = {
            "rows_match": rows,
            "schema_match": schema,
            "hash_match": values,  # exact value compare, the hash twin
            "spark_rows": spark_rows,
            "oracle_rows": oracle_rows,
            "err": err,
        }

    for name in names:
        spec = registry[name]
        try:
            sdf = spec.fn(spark, args.sf)
            spark_pd = sdf.toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error")
            traceback.print_exc(limit=3)
            n_fail += 1
            failures.append(name)
            record(name, err=f"spark: {type(e).__name__}: {e}"[:300])
            continue
        if spec.oracle is None:
            print(f"rows  {name}: rows-only check, {len(spark_pd)} rows")
            n_rows_only += 1
            record(name, spark_rows=len(spark_pd))
            continue
        try:
            oracle_pd = con.sql(spec.oracle).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error")
            traceback.print_exc(limit=3)
            n_fail += 1
            failures.append(name)
            record(name, spark_rows=len(spark_pd),
                   err=f"duckdb: {type(e).__name__}: {e}"[:300])
            continue

        problems = []
        if len(spark_pd) != len(oracle_pd):
            problems.append(f"rowcount {len(spark_pd)} vs {len(oracle_pd)}")
        if sorted(spark_pd.columns) != sorted(oracle_pd.columns):
            problems.append(
                f"columns {sorted(spark_pd.columns)} vs {sorted(oracle_pd.columns)}"
            )
        if not problems:
            a, b = canon(spark_pd), canon(oracle_pd)
            sa = {c: normalize_dtype(a[c].dtype) for c in a.columns}
            sb = {c: normalize_dtype(b[c].dtype) for c in b.columns}
            if sa != sb:
                problems.append(f"dtypes {sa} vs {sb}")
            elif not a.equals(b):
                neq = (a != b) & ~(a.isna() & b.isna())
                bad_cols = [c for c in a.columns if neq[c].any()]
                n_bad = int(neq.any(axis=1).sum())
                problems.append(f"values differ: {n_bad} rows, cols {bad_cols}")
                for c in bad_cols[:3]:
                    idx = neq[c].idxmax()
                    problems.append(f"  e.g. {c}[{idx}]: {a[c][idx]!r} vs {b[c][idx]!r}")
        rows_ok = len(spark_pd) == len(oracle_pd)
        schema_ok = sorted(spark_pd.columns) == sorted(oracle_pd.columns)
        record(
            name,
            rows=rows_ok,
            schema=schema_ok and not any("dtypes" in p for p in problems),
            values=not problems,
            spark_rows=len(spark_pd),
            oracle_rows=len(oracle_pd),
        )
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            n_fail += 1
            failures.append(name)
        else:
            print(f"ok    {name} ({len(spark_pd)} rows)")
            n_pass += 1

    print(f"\n{n_pass} ok, {n_rows_only} rows-only, {n_fail} failed")
    if failures:
        print("failed:", " ".join(failures))
    if args.json:
        import json

        with open(args.json, "w") as fh:
            json.dump(report, fh, indent=2)
        print(f"wrote {args.json}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
