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

from vbb_data_pipeline_spark.operators import core as ops
from vbb_data_pipeline_spark.queries import exact_sum, exact_sum_sql, load_table, register


@register(
    "w1_topk_per_group",
    oracle="""
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
    """,
    survey="§2.5 top-k per group (window row_number)",
)
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


@register(
    "w2_running_revenue",
    oracle="""
    SELECT o_orderkey, o_custkey,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate ASC, o_orderkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 2) AS running_rev
    FROM orders
    """,
    survey="§2.5 O2 (ordered accumulation — the priority-queue merge "
    "restated as a running window aggregate)",
)
def w2_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_rev"),
    )


@register(
    "w3_sessionize",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR date_diff('second', lag(ts) OVER w, ts) > 1800
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    ),
    sessions AS (
        SELECT user_id, ts,
               sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS session_id
        FROM flagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           min(ts) AS session_start, count(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_id
    """,
    survey="§2.9 extension (sessionization via lag + cumulative sum — "
    "batch twin of session windows)",
)
def w3_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    flagged = e.withColumn(
        "new_session",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
                > 1800
            ),
            1,
        ).otherwise(0),
    )
    wc = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sessions = flagged.withColumn(
        "session_id", F.sum("new_session").over(wc).cast("long")
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"), F.count(F.lit(1)).alias("n_events")
    )


@register(
    "w4_rank_functions",
    oracle="""
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
    """,
    survey="§2.5 extension: analytic window battery (lag/lead/"
    "dense_rank/ntile/percent_rank/cume_dist/first_value) — ordered "
    "accumulation generalizing the reference's priority-queue merge",
)
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
    "t_tumbling_window",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           count(*) AS n, {exact_sum_sql("value")} AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    survey="§2.9 (tumbling window agg — batch twin of the streaming "
    "window; same expression runs under readStream in "
    "streaming/windows.py)",
)
def t_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), exact_sum(F.col("value")).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@register(
    "t_sliding_window",
    oracle=f"""
    WITH buckets AS (
        SELECT e.*,
               TIMESTAMP '1970-01-01'
                 + CAST(floor(epoch(ts) / 1800) * 1800 AS BIGINT) * INTERVAL 1 SECOND
                 AS b
        FROM events e
    ),
    assigned AS (
        SELECT user_id, value, w.ws AS window_start
        FROM buckets,
             LATERAL unnest([b, b - 1800 * INTERVAL 1 SECOND]) AS w(ws)
        WHERE ts >= w.ws AND ts < w.ws + 3600 * INTERVAL 1 SECOND
    )
    SELECT window_start, count(*) AS n, {exact_sum_sql("value")} AS sum_value
    FROM assigned
    GROUP BY window_start
    """,
    survey="§2.9 (sliding window 1h/30m — batch twin)",
)
def t_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), exact_sum(F.col("value")).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "n", "sum_value")
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


@register(
    "w5_range_frame_rolling",
    oracle="""
    SELECT o_orderkey, o_custkey,
           (sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
               PARTITION BY o_custkey
               ORDER BY epoch(o_orderdate)
               RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW
           ) / 100.0) AS rolling_7d_rev
    FROM orders
    """,
    survey="§2.5 extension: RANGE-frame window (rolling 7-day revenue "
    "per customer) — value-based frames over event time, distinct "
    "from the ROWS frames in w2; frame bound = 604800s of epoch",
    note="fixed-point per-row rounding makes the windowed sum "
    "order-independent (same recipe as exact_sum)",
)
def w5_range_frame_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-604800, Window.currentRow)
    )
    rolling = F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).over(w) / 100.0
    return o.select(
        "o_orderkey", "o_custkey", rolling.alias("rolling_7d_rev")
    )
