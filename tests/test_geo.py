"""Haversine radius predicate — the reference's five golden rows
(GeoPredicateSpec.groovy:27-32, FIXTURES.md §B), including the real
Berlin pair Alexanderplatz↔Potsdam (30 km true / 25 km false). The
reference's own spec is stale and cannot compile (SURVEY.md §5);
these rows are its preserved intent."""

from __future__ import annotations

from pyspark.sql import functions as F

from vbb_data_pipeline_spark.functions.geo import haversine_m, within_radius

GOLDEN = [
    (0.0, 0.0, 0.0, 0.0, 0.0, True),
    (0.0, 0.0, 1_000_000.0, 1.0, 0.0, True),
    (0.0, 0.0, 1_000.0, 1.0, 0.0, False),
    (52.52437, 13.41053, 30_000.0, 52.39886, 13.06566, True),
    (52.52437, 13.41053, 25_000.0, 52.39886, 13.06566, False),
]


def test_golden_rows(spark):
    df = spark.createDataFrame(
        GOLDEN,
        "clat double, clon double, r double, lat double, lon double, expect boolean",
    )
    out = df.select(
        "expect",
        (
            haversine_m(F.col("lat"), F.col("lon"), F.col("clat"), F.col("clon"))
            <= F.col("r")
        ).alias("got"),
    ).collect()
    for row in out:
        assert row.got == row.expect


def test_within_radius_literal_center(spark):
    df = spark.createDataFrame([(52.39886, 13.06566)], "lat double, lon double")
    near = df.filter(within_radius(F.col("lat"), F.col("lon"), 52.52437, 13.41053, 30000))
    far = df.filter(within_radius(F.col("lat"), F.col("lon"), 52.52437, 13.41053, 25000))
    assert near.count() == 1 and far.count() == 0


def test_haversine_stays_codegen(spark):
    """The geo predicate must be a native expression (no Python UDF) —
    BatchEvalPython in the plan would mean a per-row Python round trip."""
    df = spark.createDataFrame([(1.0, 2.0)], "lat double, lon double")
    plan = df.filter(
        within_radius(F.col("lat"), F.col("lon"), 0.0, 0.0, 1000.0)
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
