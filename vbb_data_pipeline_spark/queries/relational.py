"""Core relational queries: projections, filters, joins, aggregates,
sorts, set ops, scalar functions (SURVEY.md §2.2-§2.7) — each with its
DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vbb_data_pipeline_spark.functions.geo import haversine_m
from vbb_data_pipeline_spark.functions.hashing import md5_long, md5_long_sql
from vbb_data_pipeline_spark.functions.temporal import iso_dow
from vbb_data_pipeline_spark.operators import core as ops
from vbb_data_pipeline_spark.queries import (
    exact_sum,
    exact_sum_sql,
    load_table,
    register,
)


# ---------------------------------------------------------------------------
# A-class aggregation: TPC-H Q1-style pricing summary
# ---------------------------------------------------------------------------
@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {exact_sum_sql("l_quantity")}                                        AS sum_qty,
           {exact_sum_sql("l_extendedprice")}                                   AS sum_base_price,
           {exact_sum_sql("l_extendedprice * (1 - l_discount)")}                AS sum_disc_price,
           {exact_sum_sql("l_extendedprice * (1 - l_discount) * (1 + l_tax)")}  AS sum_charge,
           round({exact_sum_sql("l_quantity")} / count(*), 4)                   AS avg_qty,
           round({exact_sum_sql("l_extendedprice")} / count(*), 4)              AS avg_price,
           round({exact_sum_sql("l_discount", 1000000)} / count(*), 4)          AS avg_disc,
           count(*)                                                             AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    survey="§2.4 A1 (groupBy aggregates); §2.2 P3 (range predicate)",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    filtered = ops.filter_rows(li, F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    n = F.count(F.lit(1))
    return ops.aggregate(
        filtered,
        ["l_returnflag", "l_linestatus"],
        exact_sum(F.col("l_quantity")).alias("sum_qty"),
        exact_sum(F.col("l_extendedprice")).alias("sum_base_price"),
        exact_sum(disc_price).alias("sum_disc_price"),
        exact_sum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
        F.round(exact_sum(F.col("l_quantity")) / n, 4).alias("avg_qty"),
        F.round(exact_sum(F.col("l_extendedprice")) / n, 4).alias("avg_price"),
        F.round(exact_sum(F.col("l_discount"), 1000000) / n, 4).alias("avg_disc"),
        n.alias("count_order"),
    )


# ---------------------------------------------------------------------------
# P3+P4: service filters (range predicate on orders, weekday on events)
# ---------------------------------------------------------------------------
@register(
    "service_filters",
    oracle="""
    SELECT 'range' AS kind, o_orderkey AS id, o_orderdate AS ts
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    UNION ALL
    SELECT 'weekday', event_id, ts
    FROM events
    WHERE isodow(ts) <= 5 AND event_type <> 'error'
    """,
    survey="§2.2 P3 (service-validity range predicate, GtfsDAO.java:47) "
    "+ §2.2 P4 (weekday service filter, GtfsDAO.java:108-112) — both "
    "predicates pushed to their parquet scans; tagged union",
)
def service_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    e = load_table(spark, sf_dir, "events")
    range_rows = ops.filter_rows(
        o,
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")),
    ).select(
        F.lit("range").alias("kind"),
        F.col("o_orderkey").alias("id"),
        F.col("o_orderdate").alias("ts"),
    )
    weekday_rows = ops.filter_rows(
        e, (iso_dow("ts") <= 5) & (F.col("event_type") != "error")
    ).select(
        F.lit("weekday").alias("kind"),
        F.col("event_id").alias("id"),
        F.col("ts"),
    )
    return ops.union_all(range_rows, weekday_rows)


# ---------------------------------------------------------------------------
# P6/F4: geo-radius predicate via native haversine
# ---------------------------------------------------------------------------
_GEO_CENTER = (10.0, 20.0)
_GEO_RADIUS_M = 5_000_000.0

_GEO_SQL_DIST = f"""
    2 * 6371000.0 * atan2(
        sqrt(
            sin(radians(lat - {_GEO_CENTER[0]}) / 2) * sin(radians(lat - {_GEO_CENTER[0]}) / 2)
            + cos(radians({_GEO_CENTER[0]})) * cos(radians(lat))
            * sin(radians(lon - {_GEO_CENTER[1]}) / 2) * sin(radians(lon - {_GEO_CENTER[1]}) / 2)
        ),
        sqrt(1 - (
            sin(radians(lat - {_GEO_CENTER[0]}) / 2) * sin(radians(lat - {_GEO_CENTER[0]}) / 2)
            + cos(radians({_GEO_CENTER[0]})) * cos(radians(lat))
            * sin(radians(lon - {_GEO_CENTER[1]}) / 2) * sin(radians(lon - {_GEO_CENTER[1]}) / 2)
        ))
    )
"""


@register(
    "p6_geo_radius",
    oracle=f"""
    WITH pts AS (
        SELECT event_id,
               CAST((user_id * 7) % 180 - 90 AS DOUBLE)   AS lat,
               CAST((event_id * 13) % 360 - 180 AS DOUBLE) AS lon
        FROM events
    )
    SELECT event_id, lat, lon,
           CAST(round({_GEO_SQL_DIST}) AS BIGINT) AS dist_m
    FROM pts
    WHERE {_GEO_SQL_DIST} <= {_GEO_RADIUS_M}
    """,
    survey="§2.2 P6 + §2.7 F4 (haversine radius, GeoPredicate.java:29-51)",
    note="coordinates synthesized deterministically from keys; distance "
    "rounded to whole metres before hashing (libm ulp differences)",
)
def p6_geo_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    pts = e.select(
        "event_id",
        ((F.col("user_id") * 7) % 180 - 90).cast("double").alias("lat"),
        ((F.col("event_id") * 13) % 360 - 180).cast("double").alias("lon"),
    )
    dist = haversine_m(
        F.col("lat"), F.col("lon"), F.lit(_GEO_CENTER[0]), F.lit(_GEO_CENTER[1])
    )
    return pts.filter(dist <= _GEO_RADIUS_M).select(
        "event_id",
        "lat",
        "lon",
        F.round(dist).cast("long").alias("dist_m"),
    )


# ---------------------------------------------------------------------------
# J1: multi-table equi-join (4-way, GtfsDAO.java:44-46 shape)
# ---------------------------------------------------------------------------
@register(
    "j1_dim_join_agg",
    oracle=f"""
    SELECT r.r_name, n.n_name,
           count(*)                                 AS n_orders,
           {exact_sum_sql("o.o_totalprice")}        AS revenue
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o   ON o.o_custkey   = c.c_custkey
    GROUP BY r.r_name, n.n_name
    """,
    survey="§2.3 J1 (4-table equi-join) + §2.4 A1",
    note="dims broadcast: fact side never shuffles for the join at scale",
)
def j1_dim_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    j = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return ops.aggregate(
        j,
        ["r_name", "n_name"],
        F.count(F.lit(1)).alias("n_orders"),
        exact_sum(F.col("o_totalprice")).alias("revenue"),
    )


# ---------------------------------------------------------------------------
# J2+J3: anti join (new-run detection shape, operators.py:68-90) + semi join
# ---------------------------------------------------------------------------
@register(
    "join_filters",
    oracle="""
    SELECT 'anti' AS kind, c_custkey, c_name, c_acctbal
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    UNION ALL
    SELECT 'semi', c_custkey, c_name, c_acctbal
    FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
    )
    """,
    survey="§2.3 J2 (left-anti join — new-run detection, "
    "database_loader/operators.py:68-90) + §2.3 J3 (left-semi join, "
    "EXISTS — conflict suppression); tagged union of both filter joins",
)
def join_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    all_orders = o.select(F.col("o_custkey").alias("c_custkey"))
    f_orders = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("c_custkey")
    )
    anti = ops.anti_join(c, all_orders, ["c_custkey"]).select(
        F.lit("anti").alias("kind"), "c_custkey", "c_name", "c_acctbal"
    )
    semi = ops.semi_join(c, f_orders, ["c_custkey"]).select(
        F.lit("semi").alias("kind"), "c_custkey", "c_name", "c_acctbal"
    )
    return ops.union_all(anti, semi)


# ---------------------------------------------------------------------------
# A1+A2: counts + order-independent XOR checksum (portable hash)
# ---------------------------------------------------------------------------
@register(
    "a2_group_checksum",
    oracle=f"""
    SELECT o_orderstatus,
           count(*) AS n,
           bit_xor({md5_long_sql("CAST(o_orderkey AS VARCHAR)")}) AS checksum
    FROM orders
    GROUP BY o_orderstatus
    """,
    survey="§2.4 A1 (counts) + A2 (XOR content checksum, "
    "data_provider/operators.py:145-152)",
    note="cross-engine md5-int64; the pure-Spark fast path would use "
    "crc32/xxhash64 (functions/hashing.crc32_xor_checksum)",
)
def a2_group_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return ops.aggregate(
        o,
        ["o_orderstatus"],
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(md5_long(F.col("o_orderkey").cast("string"))).alias("checksum"),
    )


# ---------------------------------------------------------------------------
# O1: deterministic global top-k (TakeOrderedAndProject)
# ---------------------------------------------------------------------------
@register(
    "o1_topk_orders",
    oracle="""
    SELECT 'top' AS page, o_orderkey, o_totalprice FROM (
        SELECT o_orderkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 100
    )
    UNION ALL
    SELECT 'page2', o_orderkey, o_totalprice FROM (
        SELECT o_orderkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 50 OFFSET 200
    )
    """,
    survey="§2.5 O1 (global sort) + top-k extension + §2.5 extension "
    "(deterministic pagination: total order + limit/offset) — "
    "TakeOrderedAndProject for the top page, offset paging on the "
    "same total order",
)
def o1_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    order = [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()]
    top = ops.topk(o, 100, *order).select(
        F.lit("top").alias("page"), "o_orderkey", "o_totalprice"
    )
    page2 = (
        o.orderBy(*order)
        .offset(200)
        .limit(50)
        .select(F.lit("page2").alias("page"), "o_orderkey", "o_totalprice")
    )
    return ops.union_all(top, page2)


# ---------------------------------------------------------------------------
# §2.6 set operations (union / intersect / except in one tagged result)
# ---------------------------------------------------------------------------
@register(
    "set_ops",
    oracle="""
    SELECT 'union' AS op, key FROM (
        SELECT c_custkey AS key FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
        UNION
        SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    )
    UNION ALL
    SELECT 'intersect', key FROM (
        SELECT o_custkey AS key FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
        INTERSECT
        SELECT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    )
    UNION ALL
    SELECT 'except', key FROM (
        SELECT o_custkey AS key FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
        EXCEPT
        SELECT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    )
    """,
    survey="§2.6 (union distinct / intersect / except — the "
    "reference's new-run set-difference shape); one tagged result "
    "covers all three set operators",
)
def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")

    def year(y: int) -> DataFrame:
        return o.filter(
            (F.col("o_orderdate") >= F.lit(f"{y}-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01").cast("timestamp"))
        ).select(F.col("o_custkey").alias("key"))

    auto = c.filter(F.col("c_mktsegment") == "AUTOMOBILE").select(
        F.col("c_custkey").alias("key")
    )
    rich = c.filter(F.col("c_acctbal") > 5000).select(
        F.col("c_custkey").alias("key")
    )
    union_d = ops.distinct_rows(ops.union_all(auto, rich))
    inter = ops.intersect(year(1995), year(1996))
    # EXCEPT is distinct set-difference in both engines.
    exc = ops.distinct_rows(year(1995)).exceptAll(ops.distinct_rows(year(1996)))
    tag = lambda df, t: df.select(F.lit(t).alias("op"), "key")  # noqa: E731
    return ops.union_all(
        ops.union_all(tag(union_d, "union"), tag(inter, "intersect")),
        tag(exc, "except"),
    )


# ---------------------------------------------------------------------------
# F3: day enumeration across month boundaries (the reference's bug zone)
# ---------------------------------------------------------------------------
@register(
    "f3_day_enumeration",
    oracle="""
    SELECT isodow(CAST(d AS DATE)) AS dow, count(*) AS n_days,
           CAST(min(CAST(d AS DATE)) AS TIMESTAMP) AS first_day,
           CAST(max(CAST(d AS DATE)) AS TIMESTAMP) AS last_day
    FROM (
        SELECT unnest(generate_series(DATE '2024-01-25', DATE '2024-03-05',
                                      INTERVAL 1 DAY)) AS d
    )
    GROUP BY 1
    """,
    survey="§2.7 F3 (detectWeekDays) — correct across month boundaries, "
    "diverging from GtfsDAO.java:75-78 numeric YYYYMMDD increments "
    "(SURVEY.md §7.2)",
)
def f3_day_enumeration(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-25").cast("date"), F.lit("2024-03-05").cast("date")
            )
        ).alias("d")
    )
    return base.groupBy(iso_dow("d").alias("dow")).agg(
        F.count(F.lit(1)).alias("n_days"),
        F.min(F.col("d").cast("timestamp")).alias("first_day"),
        F.max(F.col("d").cast("timestamp")).alias("last_day"),
    )


# ---------------------------------------------------------------------------
# F10/P9 + P2/F7: JSON parse → wire re-serialization round trip
# ---------------------------------------------------------------------------
@register(
    "json_wire_roundtrip",
    oracle="""
    SELECT event_id, event_type,
           CAST(json_extract_string(props, '$.k') AS INT) AS k,
           '{"name":"u' || CAST(user_id AS VARCHAR)
             || '","k":' || json_extract_string(props, '$.k')
             || ',"local-time":"' || strftime(ts, '%Y-%m-%d %H:%M:%S') || '"}'
           AS wire_json
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
    """,
    survey="§2.7 F10 (JSON serde, both directions) + §2.2 P9 "
    "(parse-or-drop, GeoPredicate.java:42-48) + §2.2 P2 (JSON wire "
    "projection/rename, GtfsArrival.java:20-36) + §2.7 F7 (timestamp "
    "wire formatting) — parse the props payload, drop non-parsing "
    "rows, re-serialize to the wire shape",
    note="wire JSON assembled with engine-neutral concat (to_json key "
    "order and float formatting are engine-specific)",
)
def json_wire_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    parsed = e.withColumn("_p", F.from_json("props", "k INT")).filter(
        F.col("_p.k").isNotNull()
    )
    return parsed.select(
        "event_id",
        "event_type",
        F.col("_p.k").alias("k"),
        F.concat(
            F.lit('{"name":"u'),
            F.col("user_id").cast("string"),
            F.lit('","k":'),
            F.col("_p.k").cast("string"),
            F.lit(',"local-time":"'),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss"),
            F.lit('"}'),
        ).alias("wire_json"),
    )


# ---------------------------------------------------------------------------
# Pivot (explicit value list) → unpivot round trip
# ---------------------------------------------------------------------------
_EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


@register(
    "pivot_unpivot_events",
    oracle="""
    WITH wide AS (
        SELECT user_id,
               CAST(count(*) FILTER (WHERE event_type = 'click')    AS BIGINT) AS click,
               CAST(count(*) FILTER (WHERE event_type = 'view')     AS BIGINT) AS view,
               CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
               CAST(count(*) FILTER (WHERE event_type = 'signup')   AS BIGINT) AS signup,
               CAST(count(*) FILTER (WHERE event_type = 'error')    AS BIGINT) AS error
        FROM events
        GROUP BY user_id
    )
    SELECT user_id, 'click' AS event_type, click AS n FROM wide
    UNION ALL SELECT user_id, 'view', view FROM wide
    UNION ALL SELECT user_id, 'purchase', purchase FROM wide
    UNION ALL SELECT user_id, 'signup', signup FROM wide
    UNION ALL SELECT user_id, 'error', error FROM wide
    """,
    survey="§2.4 extension (pivot with explicit values — no discovery "
    "scan) + §2.4 extension (unpivot/stack — the pivot inverse); one "
    "plan pivots events wide then stacks back to long, verifying the "
    "round trip",
)
def pivot_unpivot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    piv = ops.pivot_counts(e, "user_id", "event_type", _EVENT_TYPES)
    # pivot-count yields nulls for empty cells; normalize to 0 like FILTER
    wide = piv.select(
        "user_id",
        *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in _EVENT_TYPES],
    )
    stack_args = ", ".join(f"'{t}', {t}" for t in _EVENT_TYPES)
    return wide.selectExpr(
        "user_id",
        f"stack({len(_EVENT_TYPES)}, {stack_args}) AS (event_type, n)",
    )


# ---------------------------------------------------------------------------
# J1 variant: fact-fact join + top-k (TPC-H Q3 shape)
# ---------------------------------------------------------------------------
@register(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey,
           {exact_sum_sql("l.l_extendedprice * (1 - l.l_discount)")} AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15'
      AND l.l_shipdate  > TIMESTAMP '1995-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey ASC
    LIMIT 10
    """,
    survey="§2.3 J1 + §2.5 O1: fact⋈fact join with selective dim "
    "filter and top-k (TPC-H Q3 shape) — the filtered customer side "
    "broadcasts; lineitem⋈orders shuffles on orderkey with both "
    "filters pushed to the parquet scan",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cut = F.lit("1995-03-15").cast("timestamp")
    j = (
        li.filter(F.col("l_shipdate") > cut)
        .join(
            o.filter(F.col("o_orderdate") < cut),
            li.l_orderkey == o.o_orderkey,
        )
        .join(
            F.broadcast(c.filter(F.col("c_mktsegment") == "BUILDING")),
            o.o_custkey == c.c_custkey,
        )
    )
    return (
        j.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            exact_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


# ---------------------------------------------------------------------------
# J1 variant: 6-way snowflake join (TPC-H Q5 shape)
# ---------------------------------------------------------------------------
@register(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n.n_name,
           {exact_sum_sql("l.l_extendedprice * (1 - l.l_discount)")} AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey  = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey  = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1995-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-01-01'
    GROUP BY n.n_name
    """,
    survey="§2.3 J1 + J4 (FK web): 6-way snowflake join with "
    "local-supplier condition (TPC-H Q5 shape) — dims broadcast, the "
    "lineitem⋈orders shuffle is the only wide exchange",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    o_f = o.filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    j = (
        li.join(o_f, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r.filter(F.col("r_name") == "ASIA")), n.n_regionkey == r.r_regionkey)
    )
    return j.groupBy("n_name").agg(
        exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    )


# ---------------------------------------------------------------------------
# Correlated scalar subquery (decorrelated to window/join form)
# ---------------------------------------------------------------------------
@register(
    "scalar_subquery_filter",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders o
    WHERE o_totalprice > 1.5 * (
        SELECT (sum(CAST(round(o2.o_totalprice * 100) AS BIGINT)) / 100.0)
               / count(*)
        FROM orders o2
        WHERE o2.o_custkey = o.o_custkey
    )
    """,
    survey="§2.3 extension: correlated scalar subquery (per-key "
    "average), decorrelated to a window aggregate — one shuffle on "
    "the correlation key instead of a per-row subquery execution",
)
def scalar_subquery_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    avg_exact = (
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).over(w) / 100.0
    ) / F.count(F.lit(1)).over(w)
    return (
        o.withColumn("_avg", avg_exact)
        .filter(F.col("o_totalprice") > 1.5 * F.col("_avg"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# TPC-H Q18: large-volume customers (HAVING subquery -> semi-join)
# ---------------------------------------------------------------------------
_Q18_ORACLE = f"""
    WITH big AS (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING {exact_sum_sql("l_quantity")} > 300
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           o.o_totalprice,
           {exact_sum_sql("l.l_quantity")} AS sum_qty
    FROM lineitem l
    JOIN big USING (l_orderkey)
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
             o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderdate ASC, o.o_orderkey ASC
    LIMIT 100
    """


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(exact_sum(F.col("l_quantity")).alias("_s"))
        .filter(F.col("_s") > 300)
        .select("l_orderkey")
    )
    return (
        li.join(big, "l_orderkey", "left_semi")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
        )
        .agg(exact_sum(F.col("l_quantity")).alias("sum_qty"))
        .orderBy(
            F.col("o_totalprice").desc(),
            F.col("o_orderdate").asc(),
            F.col("o_orderkey").asc(),
        )
        .limit(100)
    )


# ---------------------------------------------------------------------------
# TPC-H Q17: small-quantity-order revenue (correlated scalar subquery
# -> per-key aggregate + broadcast join)
# ---------------------------------------------------------------------------
_Q17_ORACLE = f"""
    WITH avgs AS (
        SELECT l_partkey,
               ({exact_sum_sql("l_quantity")} / count(*)) AS avg_qty
        FROM lineitem GROUP BY l_partkey
    )
    SELECT round({exact_sum_sql("l.l_extendedprice")} / 7.0, 4)
               AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN avgs a ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#4' AND p.p_size < 15
      AND l.l_quantity < CAST('0.2' AS DOUBLE) * a.avg_qty
    """


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#4") & (F.col("p_size") < 15)
    )
    avgs = li.groupBy("l_partkey").agg(
        (exact_sum(F.col("l_quantity")) / F.count(F.lit(1))).alias("avg_qty")
    )
    return (
        li.join(F.broadcast(p.select("p_partkey")),
                li.l_partkey == F.col("p_partkey"))
        .join(avgs, "l_partkey")
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
        .agg(
            F.round(exact_sum(F.col("l_extendedprice")) / 7.0, 4).alias(
                "avg_yearly"
            )
        )
    )




@register(
    "q17_q18_quantity_battery",
    oracle=f"""
    SELECT 'q18' AS variant, t.c_name, t.c_custkey, t.o_orderkey,
           t.o_orderdate, t.o_totalprice, t.sum_qty,
           CAST(NULL AS DOUBLE) AS avg_yearly
    FROM ({_Q18_ORACLE}) t
    UNION ALL
    SELECT 'q17', CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT),
           CAST(NULL AS BIGINT), CAST(NULL AS TIMESTAMP),
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), t.avg_yearly
    FROM ({_Q17_ORACLE}) t
    """,
    survey="§2.4/§2.5/§2.7: TPC-H quantity-threshold pair (folded r5 "
    "so both keep a driver CORRECTNESS row) — [q18] large-volume "
    "customers: HAVING-subquery membership becomes a semi-join "
    "against a pre-aggregated key set, customer dim broadcasts, the "
    "fact table shuffles once on the join key, TakeOrderedAndProject "
    "for the top-100 (no global sort); [q17] small-quantity-order "
    "revenue: the correlated scalar subquery (per-part average) is "
    "decorrelated into one map-side-combinable aggregate joined back "
    "on the part key, the part filter broadcasts, single-row exact "
    "fixed-point answer",
)
def q17_q18_quantity_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    q18 = q18_large_orders(spark, sf_dir).select(
        F.lit("q18").alias("variant"),
        "c_name",
        "c_custkey",
        "o_orderkey",
        "o_orderdate",
        "o_totalprice",
        "sum_qty",
        F.lit(None).cast("double").alias("avg_yearly"),
    )
    q17 = q17_small_quantity_revenue(spark, sf_dir).select(
        F.lit("q17").alias("variant"),
        F.lit(None).cast("string").alias("c_name"),
        F.lit(None).cast("long").alias("c_custkey"),
        F.lit(None).cast("long").alias("o_orderkey"),
        F.lit(None).cast("timestamp_ntz").alias("o_orderdate"),
        F.lit(None).cast("double").alias("o_totalprice"),
        F.lit(None).cast("double").alias("sum_qty"),
        "avg_yearly",
    )
    return q18.unionByName(q17)


# ---------------------------------------------------------------------------
# TPC-H Q4-style: order priority checking (EXISTS -> semi-join)
# ---------------------------------------------------------------------------
@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
      AND o.o_orderdate < TIMESTAMP '1995-07-01'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
      )
    GROUP BY o_orderpriority
    """,
    survey="§2.4/§2.5: TPC-H Q4 — the correlated EXISTS (any lineitem "
    "shipped >30 days after the order date) becomes a LEFT SEMI join "
    "on the order key with the date predicate in the join condition; "
    "the orders date filter pushes to the scan and the single "
    "exchange is the tiny priority rollup",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01"))
        & (F.col("o_orderdate") < F.lit("1995-07-01"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    semi = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        # timestamp + interval (NOT date_add, which truncates to DATE
        # and would diverge from the oracle on non-midnight orderdates)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return semi.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )
