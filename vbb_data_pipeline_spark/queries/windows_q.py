"""Window-function and time-window queries (SURVEY.md §2.5 O2, §2.9).

The streaming-shaped operators get batch-semantics twins here so the
DuckDB oracle can verify them (SURVEY.md §7 hard-part 6): `window()`
and `session_window()` produce identical results under batch groupBy,
and the same expressions run under Structured Streaming in
streaming/windows.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from vbb_data_pipeline_spark.queries import load_table, register


_W1_ORACLE = """
    SELECT o_custkey, o_orderkey, o_totalprice, rnk
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey ASC
               ) AS rnk
        FROM orders
    )
    WHERE rnk <= 3
    """


def w1_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rnk")
    )


_W2_ORACLE = """
    SELECT o_orderkey, o_custkey,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate ASC, o_orderkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 2) AS running_rev,
           (sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
               PARTITION BY o_custkey
               ORDER BY epoch(o_orderdate)
               RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW
           ) / 100.0) AS rolling_7d_rev
    FROM orders
    """


def w2_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    # Both windows share the o_custkey partitioning (one exchange);
    # ordering the rows-frame window by (unix_timestamp(o_orderdate),
    # o_orderkey) — the SAME total order as (o_orderdate, o_orderkey),
    # unix_timestamp being monotone — makes the range window's
    # required sort a strict prefix of it, so EnsureRequirements
    # plans ONE Sort instead of two (guide §2.4: operations keyed the
    # same way should establish the partitioning/ordering once).
    ts = F.unix_timestamp("o_orderdate")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(ts.asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wr = (
        Window.partitionBy("o_custkey")
        .orderBy(ts)
        .rangeBetween(-604800, Window.currentRow)
    )
    rolling = F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).over(wr) / 100.0
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_rev"),
        rolling.alias("rolling_7d_rev"),
    )


_W4_ORACLE = """
    SELECT o_orderkey,
           o_orderstatus,
           lag(o_orderkey)  OVER w                                AS prev_key,
           lead(o_orderkey) OVER w                                AS next_key,
           CAST(dense_rank() OVER (
               PARTITION BY o_orderstatus
               ORDER BY o_orderpriority ASC
           ) AS BIGINT)                                           AS prio_rank,
           CAST(ntile(4) OVER w AS BIGINT)                        AS quartile,
           round(percent_rank() OVER w, 6)                        AS pct_rank,
           round(cume_dist() OVER w, 6)                           AS cdist,
           first_value(o_orderkey) OVER (
               w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           )                                                      AS first_key
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_orderdate ASC, o_orderkey ASC)
    """


def w4_rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    wp = Window.partitionBy("o_orderstatus").orderBy(F.col("o_orderpriority").asc())
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.lag("o_orderkey").over(w).alias("prev_key"),
        F.lead("o_orderkey").over(w).alias("next_key"),
        F.dense_rank().over(wp).cast("long").alias("prio_rank"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.first("o_orderkey").over(wf).alias("first_key"),
    )




@register(
    "window_functions_battery",
    oracle=f"""
    SELECT a.*, b.o_orderstatus, b.prev_key, b.next_key, b.prio_rank,
           b.quartile, b.pct_rank, b.cdist, b.first_key,
           c.rnk AS topk_rnk
    FROM ({_W2_ORACLE}) a JOIN ({_W4_ORACLE}) b USING (o_orderkey)
    LEFT JOIN ({_W1_ORACLE}) c USING (o_orderkey)
    """,
    survey="§2.5 O2 + §2.5 extensions JOINED on o_orderkey (folded "
    "r5/r7 so every leg keeps a driver CORRECTNESS row) — [w2] ordered "
    "accumulation (the reference's priority-queue merge restated as "
    "a running window aggregate) + RANGE-frame rolling 7-day revenue "
    "per customer (value-based frames over event time alongside the "
    "ROWS frame, one window shuffle produces both); [w4] analytic "
    "window battery (lag/lead/dense_rank/ntile/percent_rank/"
    "cume_dist/first_value) — each leg keeps its own single window "
    "shuffle; [w1] top-k per group (row_number ≤ 3 per customer, "
    "folded r7 into the battery's 50-entry window as a LEFT JOIN leg: "
    "topk_rnk is the in-group rank where the order ranks, NULL "
    "otherwise) — the join key is the orders primary key so each fold "
    "adds exactly one broadcast-free equi-join",
    note="RANGE frame uses fixed-point per-row rounding so the "
    "windowed sum is order-independent (same recipe as exact_sum)",
)
def window_functions_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    w1 = w1_topk_per_group(spark, sf_dir).select(
        "o_orderkey", F.col("rnk").cast("long").alias("topk_rnk")
    )
    return (
        w2_running_revenue(spark, sf_dir)
        .join(w4_rank_functions(spark, sf_dir), "o_orderkey")
        .join(w1, "o_orderkey", "left")
    )


@register(
    "t_session_window",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR date_diff('second', lag(ts) OVER w, ts) > 1800
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC)
    ),
    sessions AS (
        SELECT user_id, ts,
               sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS sid
        FROM flagged
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + 1800 * INTERVAL 1 SECOND AS session_end,
           count(*) AS n_events
    FROM sessions
    GROUP BY user_id, sid
    """,
    survey="§2.9 (session_window — batch twin; Spark session end = "
    "last event + gap)",
)
def t_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
