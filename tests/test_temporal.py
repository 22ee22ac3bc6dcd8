"""Calendar→arrivals expansion (G1) and temporal scalar semantics —
the reference-derived edge cases from SURVEY.md §5/§7: month-boundary
day enumeration, >24:00:00 times, weekday flags, corrected AND
validity."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from vbb_data_pipeline_spark.functions.temporal import (
    date_from_int,
    date_int,
    event_timestamp,
    iso_dow,
)
from vbb_data_pipeline_spark.operators.temporal import expand_arrivals, expand_days


def test_date_int_roundtrip(spark):
    df = spark.createDataFrame([("2024-02-29",)], "d string").select(
        F.col("d").cast("date").alias("d")
    )
    out = df.select(
        date_int("d").alias("i"), date_from_int(date_int("d")).alias("rt")
    ).head()
    assert out.i == 20240229
    assert out.rt == dt.date(2024, 2, 29)


def test_iso_dow(spark):
    # 2024-01-01 is a Monday, 2024-01-07 a Sunday
    df = spark.createDataFrame(
        [("2024-01-01",), ("2024-01-07",)], "d string"
    ).select(F.col("d").cast("date").alias("d"))
    rows = df.select(iso_dow("d").alias("x")).collect()
    assert [r.x for r in rows] == [1, 7]


def test_event_timestamp_over_24h(spark):
    """25:01:30 on service day 2024-01-31 = 01:01:30 on Feb 1 —
    the GTFS service-day overflow the INTERVAL DDL type encodes
    (05-create-schema.sh:149-150)."""
    df = spark.createDataFrame([("2024-01-31", 25 * 3600 + 90)], "d string, s long")
    out = df.select(
        event_timestamp(F.col("d").cast("date"), F.col("s")).alias("ts")
    ).head()
    assert out.ts == dt.datetime(2024, 2, 1, 1, 1, 30)


def test_expand_days_inclusive_and_empty(spark):
    df = spark.createDataFrame(
        [("2024-01-30", "2024-02-02"), ("2024-03-05", "2024-03-01")],
        "a string, b string",
    ).select(F.col("a").cast("date").alias("a"), F.col("b").cast("date").alias("b"))
    out = expand_days(df, F.col("a"), F.col("b")).collect()
    days = sorted(r.day for r in out)
    # inclusive, crosses the month boundary correctly, empty when a > b
    assert days == [
        dt.date(2024, 1, 30),
        dt.date(2024, 1, 31),
        dt.date(2024, 2, 1),
        dt.date(2024, 2, 2),
    ]


def _expected_arrivals():
    """Hand-computed expected set for window [2024-01-28, 2024-02-06)
    over the conftest corpus.

    svc_wk (mon-fri, valid 2024-01-25..2024-03-05, run 1):
      weekdays in window: Jan 29,30,31, Feb 1,2,5 — t1 arrivals at
      08:00:00 (s1/Alexanderplatz) and 25:01:30 → next day 01:01:30
      (s2/Potsdam).
    svc_we (sat+sun, valid 2024-02-01..2024-02-15): weekend days in
      window∩validity: Feb 3,4 — t2 at 12:00:00 (s1).
    svc_bad: degenerate validity (end < start) → nothing.
    run 2 svc_wk (valid Feb 10-20) → outside window → nothing.
    """
    exp = []
    for day in [
        dt.date(2024, 1, 29),
        dt.date(2024, 1, 30),
        dt.date(2024, 1, 31),
        dt.date(2024, 2, 1),
        dt.date(2024, 2, 2),
        dt.date(2024, 2, 5),
    ]:
        base = dt.datetime.combine(day, dt.time())
        exp.append((base + dt.timedelta(seconds=8 * 3600), "Alexanderplatz"))
        exp.append((base + dt.timedelta(seconds=25 * 3600 + 90), "Potsdam Hbf"))
    for day in [dt.date(2024, 2, 3), dt.date(2024, 2, 4)]:
        base = dt.datetime.combine(day, dt.time())
        exp.append((base + dt.timedelta(seconds=12 * 3600), "Alexanderplatz"))
    return sorted(exp)


def test_expand_arrivals_against_hand_computed(spark, gtfs, window_jan_feb):
    start, end = window_jan_feb
    out = expand_arrivals(
        gtfs["calendar"], gtfs["trips"], gtfs["stop_times"], gtfs["stops"], start, end
    ).collect()
    got = sorted((r.ts, r.stop_name) for r in out)
    assert got == _expected_arrivals()


def test_expand_arrivals_time_ordered(spark, gtfs, window_jan_feb):
    start, end = window_jan_feb
    out = expand_arrivals(
        gtfs["calendar"], gtfs["trips"], gtfs["stop_times"], gtfs["stops"], start, end
    ).collect()
    ts = [r.ts for r in out]
    assert ts == sorted(ts)
