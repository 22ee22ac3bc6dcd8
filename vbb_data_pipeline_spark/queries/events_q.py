"""Event-stream-shaped batch queries: as-of join enrichment and
remaining table coverage (part/supplier joins).

The as-of join is the classic time-series operator Spark lacks
natively (SURVEY.md §2.3 gap list); operators/temporal.asof_join
implements it as union + event-time-windowed forward fill, verified
here against DuckDB's native ASOF JOIN.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vbb_data_pipeline_spark.operators import core as ops
from vbb_data_pipeline_spark.operators.temporal import asof_join
from vbb_data_pipeline_spark.queries import exact_sum, exact_sum_sql, load_table, register


@register(
    "asof_last_purchase",
    oracle="""
    WITH purchases AS (
        SELECT user_id, ts,
               max(value)    AS purchase_value
        FROM events
        WHERE event_type = 'purchase'
        GROUP BY user_id, ts
    )
    SELECT e.event_id, e.ts, e.user_id, e.event_type,
           p.ts            AS last_purchase_ts,
           p.purchase_value,
           CAST(date_diff('second', p.ts, e.ts) AS BIGINT) AS secs_since_purchase
    FROM events e
    ASOF LEFT JOIN purchases p
      ON e.user_id = p.user_id AND e.ts >= p.ts
    """,
    survey="§2.3 gap list: as-of join (backward, inclusive) — "
    "union + windowed forward-fill vs DuckDB native ASOF JOIN",
)
def asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purchase_value"))
    )
    joined = asof_join(
        e.select("event_id", "ts", "user_id", "event_type"),
        purchases,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_cols=["purchase_value"],
    )
    return joined.select(
        "event_id",
        "ts",
        "user_id",
        "event_type",
        F.col("_asof_ts").alias("last_purchase_ts"),
        "purchase_value",
        (F.unix_timestamp("ts") - F.unix_timestamp("_asof_ts"))
        .cast("long")
        .alias("secs_since_purchase"),
    )


@register(
    "j5_part_supplier_revenue",
    oracle=f"""
    SELECT p.p_brand, s.s_name,
           count(*) AS n_lines,
           {exact_sum_sql("l.l_extendedprice * (1 - l.l_discount)")} AS revenue
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    WHERE p.p_size >= 25
    GROUP BY p.p_brand, s.s_name
    """,
    survey="§2.3 J1 (fact ⋈ two dims, broadcast) + §2.4 A1; covers "
    "part/supplier tables",
)
def j5_part_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") >= 25)
    s = load_table(spark, sf_dir, "supplier")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).join(
        F.broadcast(s), li.l_suppkey == s.s_suppkey
    )
    return ops.aggregate(
        j,
        ["p_brand", "s_name"],
        F.count(F.lit(1)).alias("n_lines"),
        exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "revenue"
        ),
    )


@register(
    "lineitem_shipmode_stats",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_orderkey) AS BIGINT)  AS n_orders,
           CAST(count(DISTINCT l_suppkey) AS BIGINT)   AS n_suppliers,
           round(min(l_extendedprice), 2)              AS min_price,
           round(max(l_extendedprice), 2)              AS max_price,
           round(stddev_samp(l_discount), 6)           AS sd_discount
    FROM lineitem
    GROUP BY l_returnflag
    """,
    survey="§2.4 (distinct aggregates, min/max, stddev)",
    note="stddev over the same double set: both engines use numerically "
    "stable accumulation; rounded to 6",
)
def lineitem_shipmode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
        F.round(F.stddev_samp("l_discount"), 6).alias("sd_discount"),
    )
