"""Source/sink format coverage beyond parquet: ORC and JSON-lines
round trips preserve schema and values; compression is applied.

The reference knows only CSV-in-zip and Postgres; a Spark-first
engine inherits every built-in columnar/row format — these tests pin
the two most common interchange formats for 100 TB pipelines (ORC
for columnar parity, JSONL for wire/log interchange).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from vbb_data_pipeline_spark.queries import load_table

SF = "/root/testdata/sf0.001"


def _orders_subset(spark):
    return load_table(spark, SF, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"
    )


def test_orc_roundtrip(spark, tmp_path):
    src = _orders_subset(spark)
    path = str(tmp_path / "orders_orc")
    src.write.mode("overwrite").option("compression", "zlib").orc(path)
    back = spark.read.orc(path)
    assert back.schema == src.schema
    assert back.count() == src.count()
    a = src.agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))).collect()[0][0]
    b = back.agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))).collect()[0][0]
    assert a == b


def test_orc_predicate_pushdown(spark, tmp_path):
    src = _orders_subset(spark)
    path = str(tmp_path / "orders_orc2")
    src.write.mode("overwrite").orc(path)
    q = spark.read.orc(path).filter(F.col("o_orderkey") == 1).select("o_orderkey")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "o_orderkey" in plan.split("PushedFilters:")[1][:120]


def test_jsonl_roundtrip(spark, tmp_path):
    src = _orders_subset(spark)
    path = str(tmp_path / "orders_jsonl")
    src.write.mode("overwrite").option("compression", "gzip").json(path)
    # JSON is schemaless on disk: read back with the explicit schema
    # (the 100 TB practice — schema inference scans the data twice)
    back = spark.read.schema(src.schema).json(path)
    assert back.count() == src.count()
    assert back.schema == src.schema
    missing = src.join(back, ["o_orderkey"], "left_anti").count()
    assert missing == 0


def test_csv_roundtrip_with_header(spark, tmp_path):
    src = _orders_subset(spark).drop("o_orderdate")
    path = str(tmp_path / "orders_csv")
    src.write.mode("overwrite").option("header", "true").csv(path)
    back = spark.read.schema(src.schema).option("header", "true").csv(path)
    assert back.count() == src.count()
    assert back.schema == src.schema
