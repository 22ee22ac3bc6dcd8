"""fan_out_scan sizing contract (r10): the width is derived from the
scan's size statistic, not blanket-set to the core count, and the gate
still no-ops once the scan already has >= cores splits."""

from __future__ import annotations

import math

from vbb_data_pipeline_spark.queries import fan_out_scan, load_table

SF_DIR = "/root/testdata/sf0.001"


def _stats_bytes(df) -> int:
    return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())


def test_fan_out_width_is_data_sized(spark):
    d = load_table(spark, SF_DIR, "documents")
    cores = spark.sparkContext.defaultParallelism
    expected = min(cores, max(2, math.ceil(_stats_bytes(d) / (64 << 10))))
    assert fan_out_scan(d).rdd.getNumPartitions() == expected


def test_fan_out_noop_when_scan_has_enough_splits(spark):
    d = load_table(spark, SF_DIR, "documents")
    wide = d.repartition(spark.sparkContext.defaultParallelism)
    # already >= cores partitions: fan_out_scan must not add an exchange
    assert fan_out_scan(wide) is wide


def test_fan_out_caps_at_default_parallelism(spark, monkeypatch):
    # a 1-byte target makes the bytes-derived width enormous; the cap
    # must clamp it to the live core count (scale-down safety: the
    # driver benches at lower core counts too)
    monkeypatch.setenv("SPARK_GRAFT_FANOUT_TARGET_BYTES", "1")
    d = load_table(spark, SF_DIR, "documents")
    cores = spark.sparkContext.defaultParallelism
    assert fan_out_scan(d).rdd.getNumPartitions() == cores
