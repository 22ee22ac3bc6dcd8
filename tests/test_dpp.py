"""Dynamic partition pruning: a dim-side filter must prune fact
partitions at RUNTIME when the fact table is partition-laid-out
(sources/layout.write_partitioned) — the scan-skipping mechanism that
makes star joins viable at 100 TB."""

from __future__ import annotations

from pyspark.sql import functions as F

from vbb_data_pipeline_spark.queries import load_table
from vbb_data_pipeline_spark.sources.layout import write_partitioned

SF = "/root/testdata/sf0.001"


def test_dim_filter_prunes_fact_partitions(spark, tmp_path):
    orders = load_table(spark, SF, "orders")
    fact = orders.withColumn("o_year", F.year("o_orderdate"))
    write_partitioned(fact, str(tmp_path / "orders_by_year"), ["o_year"])

    # the dim filter is on an attribute Catalyst CANNOT fold to a
    # static o_year predicate — pruning must happen at runtime from
    # the dim join side (DPP)
    year_dim = spark.createDataFrame(
        [(1992, "old"), (1995, "target"), (1998, "recent")],
        "o_year int, era string",
    )
    stored = spark.read.parquet(str(tmp_path / "orders_by_year"))
    joined = stored.join(
        F.broadcast(year_dim.filter(F.col("era") == "target")), "o_year"
    ).agg(F.count(F.lit(1)).alias("n"))

    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan
    n = joined.collect()[0].n
    exp = orders.filter(F.year("o_orderdate") == 1995).count()
    assert n == exp > 0
