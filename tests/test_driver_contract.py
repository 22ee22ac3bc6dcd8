"""Driver-contract guards: the external driver builds its OWN
SparkSession (untuned, possibly non-UTC); the engine must produce
oracle-identical results anyway. Probes: a non-UTC session timezone
and a driver-built (default-config) SparkSession, each run against
the DuckDB oracle."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def non_utc(spark):
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    yield spark
    spark.conf.set("spark.sql.session.timeZone", prev)


_TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def _compare(sdf, oracle_sql):
    con = duckdb.connect()
    for t in _TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    got = sdf.toPandas()
    exp = con.sql(oracle_sql).df()
    cols = sorted(got.columns)
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = exp[cols].sort_values(cols).reset_index(drop=True)
    for c in cols:
        if str(a[c].dtype).startswith("datetime"):
            a[c] = a[c].astype("datetime64[us]")
        if str(b[c].dtype).startswith("datetime"):
            b[c] = b[c].astype("datetime64[us]")
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


#: Every registry entry whose semantics touch event time, date
#: arithmetic, windows, or timestamp wire formats — each must be
#: oracle-identical under a non-UTC driver session (load_table pins
#: the session zone to UTC; this sweep is the proof that the pin
#: covers the whole timestamp surface, not two hand-picked probes).
TS_ENTRIES = [
    "service_filters",
    "flagship_expand_events",
    "t_session_window",
    "pivot_unpivot_events",
    "json_wire_roundtrip",
    "window_functions_battery",
    "asof_purchase_context",
    "orders_evolution_battery",
    "q4_q21_exists_battery",
    "q6_q12_q17_q18_battery",
    "stream_window_battery",
    "stream_state_battery",
]


@pytest.mark.parametrize("name", TS_ENTRIES)
def test_timestamp_entries_survive_non_utc_session(non_utc, name):
    """load_table pins UTC, so event-time windows, interval
    arithmetic, and wire formats must not shift when the driver's
    session zone differs (verify probe #1, widened to the full
    timestamp-sensitive surface)."""
    from vbb_data_pipeline_spark.queries import all_queries

    spec = all_queries()[name]
    _compare(spec.fn(non_utc, SF), spec.oracle)


def test_entry_is_stable(spark):
    """entry() returns the same count and schema on repeat calls
    (driver smoke, verify probe #2)."""
    import importlib.util
    from pathlib import Path

    p = Path(__file__).resolve().parent.parent / "__spark_entry__.py"
    s = importlib.util.spec_from_file_location("entry_mod", p)
    m = importlib.util.module_from_spec(s)
    s.loader.exec_module(m)
    df1 = m.entry(spark)
    df2 = m.entry(spark)
    assert df1.count() == df2.count() > 0
    assert df1.schema == df2.schema
