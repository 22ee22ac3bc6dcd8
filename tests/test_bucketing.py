"""Bucketed-table co-located join: writing both join sides bucketed by
the key lets the sort-merge join read pre-shuffled data — zero
Exchange in the join plan. This is the storage-level answer to the
reference's FK-join workload at 100 TB (SURVEY.md §2.3 J1): the big
fact⋈fact shuffle happens once at write time, not per query."""

from __future__ import annotations

import pytest

from vbb_data_pipeline_spark.queries import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    o = load_table(spark, SF, "orders")
    li = load_table(spark, SF, "lineitem")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").option(
        "path", str(wh / "b_orders")
    ).mode("overwrite").saveAsTable("b_orders")
    li.selectExpr("l_orderkey", "l_extendedprice").write.bucketBy(
        8, "l_orderkey"
    ).sortBy("l_orderkey").option("path", str(wh / "b_lineitem")).mode(
        "overwrite"
    ).saveAsTable("b_lineitem")
    # disable broadcast so the planner exercises the bucketed
    # sort-merge path (the whole point at fact⋈fact scale, where
    # neither side broadcasts)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield spark
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(bucketed):
    spark = bucketed
    j = spark.table("b_lineitem").join(
        spark.table("b_orders"),
        spark.table("b_lineitem").l_orderkey == spark.table("b_orders").o_orderkey,
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_bucketed_groupby_has_no_exchange(bucketed):
    spark = bucketed
    agg = spark.table("b_lineitem").groupBy("l_orderkey").sum("l_extendedprice")
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
