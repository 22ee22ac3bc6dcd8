"""Flagship temporal query: the G1 calendar→events expansion restated
on the driver's tables (SURVEY.md §2.8, §7 slice 0).

The reference's core computation (GtfsDAO.java:83-123) is:
4-way join → enumerate concrete days of a validity window → weekday
flag filter (P4) → validity filter with *intended* AND semantics (P5,
diverging from the reference's `||` bug at GtfsDAO.java:115) → fuse
date + seconds-of-day into an event timestamp (F2, >24h-safe) → time
order (O1). The same plan shape here runs over
orders ⋈ customer ⋈ nation ⋈ region with deterministic surrogate
parameters derived from o_orderkey.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vbb_data_pipeline_spark.functions.temporal import event_timestamp, iso_dow
from vbb_data_pipeline_spark.operators.temporal import expand_days
from vbb_data_pipeline_spark.queries import load_table, register

FLAGSHIP_ORACLE = """
WITH joined AS (
    SELECT o.o_orderkey,
           c.c_name                     AS name,
           n.n_name                     AS nation,
           r.r_name                     AS region,
           CAST(o.o_orderdate AS DATE)  AS start_day,
           CAST(o.o_orderdate AS DATE) + CAST(o.o_orderkey % 5 + 2 AS INT) AS end_day,
           CAST(o.o_orderdate AS DATE) + CAST(o.o_orderkey % 3 + 2 AS INT) AS valid_end,
           (o.o_orderkey * 37) % 100000 AS secs,
           o.o_orderpriority
    FROM orders o
    JOIN customer c ON o.o_custkey   = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
),
expanded AS (
    SELECT j.*, CAST(g.d AS DATE) AS service_day
    FROM joined j,
         LATERAL unnest(generate_series(j.start_day, j.end_day,
                                        INTERVAL 1 DAY)) AS g(d)
)
SELECT CAST(service_day AS TIMESTAMP) + secs * INTERVAL 1 SECOND AS ts,
       name, nation, region, o_orderkey
FROM expanded
WHERE CASE
        WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN isodow(service_day) <= 5
        WHEN o_orderpriority = '3-MEDIUM'              THEN isodow(service_day) >= 6
        ELSE TRUE
      END
  AND service_day >= start_day
  AND service_day < valid_end
"""


@register(
    "flagship_expand_events",
    oracle=FLAGSHIP_ORACLE,
    survey="§2.8 G1 (calendar→arrivals expansion); §2.3 J1; §2.2 P4+P5 "
    "(corrected AND semantics); §2.7 F2 (>24h seconds); §2.5 O1",
)
def flagship_expand_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fan_out measured and rejected here (r10): repartitioning orders
    # ahead of the broadcast-join + explode chain tripled summed task
    # time (3.5 s -> 11 s per 3 runs: shuffle write/fetch of every
    # order row + per-task overheads) with NO wall-clock win — the
    # chain is cheap enough per row that the single-split scan stage
    # is not the bottleneck; the final range-sort exchange is.
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")

    joined = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            "o_orderkey",
            F.col("c_name").alias("name"),
            F.col("n_name").alias("nation"),
            F.col("r_name").alias("region"),
            F.to_date("o_orderdate").alias("start_day"),
            F.date_add(
                F.to_date("o_orderdate"), (F.col("o_orderkey") % 5 + 2).cast("int")
            ).alias("end_day"),
            F.date_add(
                F.to_date("o_orderdate"), (F.col("o_orderkey") % 3 + 2).cast("int")
            ).alias("valid_end"),
            ((F.col("o_orderkey") * 37) % 100000).alias("secs"),
            "o_orderpriority",
        )
    )

    # r10: enumerate only days that can survive the P5 validity filter
    # below — service_day < valid_end ⇒ the last useful day is
    # valid_end − 1, so cap the sequence end at
    # least(end_day, valid_end − 1) BEFORE the explode (guide §2:
    # don't compute rows you immediately throw away). Identical
    # output (the filter still applies), ~30% fewer generated rows
    # (avg days/order 5 → 3.6 under the %5/%3 surrogate windows);
    # valid_end ≥ start_day + 2 by construction, so the capped end
    # never drops below start_day.
    expanded = expand_days(
        joined,
        F.col("start_day"),
        F.least(F.col("end_day"), F.date_sub(F.col("valid_end"), 1)),
        out_col="service_day",
    )

    # P4 weekday-flag filter (priority-derived service pattern) and
    # P5 validity window with intended AND semantics.
    weekday_ok = (
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
            iso_dow(F.col("service_day")) <= 5,
        )
        .when(F.col("o_orderpriority") == "3-MEDIUM", iso_dow(F.col("service_day")) >= 6)
        .otherwise(F.lit(True))
    )
    valid = (F.col("service_day") >= F.col("start_day")) & (
        F.col("service_day") < F.col("valid_end")
    )

    return (
        expanded.filter(weekday_ok & valid)
        .select(
            event_timestamp(F.col("service_day"), F.col("secs")).alias("ts"),
            "name",
            "nation",
            "region",
            "o_orderkey",
        )
        .orderBy("ts", "o_orderkey")
    )
