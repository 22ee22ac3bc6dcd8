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
    tag_union,
    tag_union_sql,
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
# Folded r7 into misc_q's ``engine_semantics_battery`` (F3 leg) so it
# keeps a driver CORRECTNESS row inside the 50-entry window.
F3_ORACLE = """
    SELECT isodow(CAST(d AS DATE)) AS dow, count(*) AS n_days,
           CAST(min(CAST(d AS DATE)) AS TIMESTAMP) AS first_day,
           CAST(max(CAST(d AS DATE)) AS TIMESTAMP) AS last_day
    FROM (
        SELECT unnest(generate_series(DATE '2024-01-25', DATE '2024-03-05',
                                      INTERVAL 1 DAY)) AS d
    )
    GROUP BY 1
    """


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
_Q3_ORACLE = f"""
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
    """


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
_Q5_ORACLE = f"""
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
    """


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


@register(
    "q3_q5_join_battery",
    oracle=tag_union_sql(
        [
            (
                "q3",
                f"""
                SELECT t.l_orderkey, t.o_orderdate, t.o_orderpriority,
                       CAST(NULL AS VARCHAR) AS n_name, t.revenue
                FROM ({_Q3_ORACLE}) t
                """,
            ),
            (
                "q5",
                f"""
                SELECT CAST(NULL AS BIGINT) AS l_orderkey,
                       CAST(NULL AS TIMESTAMP) AS o_orderdate,
                       CAST(NULL AS VARCHAR) AS o_orderpriority,
                       t.n_name, t.revenue
                FROM ({_Q5_ORACLE}) t
                """,
            ),
        ]
    ),
    survey="§2.3 J1 + §2.5 O1 + J4 (FK web), folded r5 so both legs "
    "stay inside the 50-entry driver window — [q3] fact⋈fact join "
    "with selective dim filter and top-k (TPC-H Q3): filtered "
    "customer broadcasts, lineitem⋈orders shuffles once on orderkey, "
    "TakeOrderedAndProject for the top-10; [q5] 6-way snowflake join "
    "with local-supplier condition (TPC-H Q5): all dims broadcast, "
    "the lineitem⋈orders shuffle is the only wide exchange",
)
def q3_q5_join_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    q3 = q3_shipping_priority(spark, sf_dir).select(
        "l_orderkey",
        "o_orderdate",
        "o_orderpriority",
        F.lit(None).cast("string").alias("n_name"),
        "revenue",
    )
    q5 = q5_local_supplier_volume(spark, sf_dir).select(
        F.lit(None).cast("long").alias("l_orderkey"),
        F.lit(None).cast("timestamp_ntz").alias("o_orderdate"),
        F.lit(None).cast("string").alias("o_orderpriority"),
        "n_name",
        "revenue",
    )
    return tag_union([("q3", q3), ("q5", q5)])


# ---------------------------------------------------------------------------
# Correlated scalar subquery (decorrelated to window/join form)
# ---------------------------------------------------------------------------
# Oracle for the scalar-subquery leg of subquery_battery (was its own
# registry entry through r4; folded so the four partsupp-CTE TPC-H
# shapes below fit the driver's 50-entry CORRECTNESS window).
_SCALAR_SUB_ORACLE = """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders o
    WHERE o_totalprice > 1.5 * (
        SELECT (sum(CAST(round(o2.o_totalprice * 100) AS BIGINT)) / 100.0)
               / count(*)
        FROM orders o2
        WHERE o2.o_custkey = o.o_custkey
    )
    """


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




# --- TPC-H Q6: forecast revenue change (pure scan-side filter + agg) ---
_Q6_ORACLE = f"""
    SELECT round({exact_sum_sql("l_extendedprice * l_discount", 10000)}, 4)
           AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: every predicate pushes to the parquet scan (range on
    shipdate, band on discount, threshold on quantity); the answer is
    one map-side-combinable fixed-point sum — zero wide exchanges."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.round(
            exact_sum(F.col("l_extendedprice") * F.col("l_discount"), 10000),
            4,
        ).alias("revenue")
    )


# --- TPC-H Q12: shipping-lateness priority counts -------------------------
# The corpus lineitem has no ship mode or commit/receipt dates; the
# shape keeps Q12's join + dual conditional aggregate with
# l_returnflag as the grouping dimension and shipdate-vs-orderdate
# lateness as the filter.
_Q12_ORACLE = """
    SELECT l.l_returnflag AS flag,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_cnt,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_cnt
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY 1
    """


def q12_late_shipment_priority(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q12: one fact-fact equi-join on the order key (lateness
    predicate in the join condition), then a tiny conditional-count
    rollup; the shipdate range pushes to the lineitem scan."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(
            o.select("o_orderkey", "o_orderdate", "o_orderpriority"),
            (li.l_orderkey == F.col("o_orderkey"))
            & (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
            ),
        )
        .groupBy(F.col("l_returnflag").alias("flag"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_cnt"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_cnt"),
        )
    )


@register(
    "q6_q12_q17_q18_battery",
    oracle=f"""
    SELECT 'q18' AS variant, t.c_name, t.c_custkey, t.o_orderkey,
           t.o_orderdate, t.o_totalprice, t.sum_qty,
           CAST(NULL AS DOUBLE) AS avg_yearly,
           CAST(NULL AS VARCHAR) AS flag, CAST(NULL AS BIGINT) AS high_cnt,
           CAST(NULL AS BIGINT) AS low_cnt, CAST(NULL AS DOUBLE) AS revenue
    FROM ({_Q18_ORACLE}) t
    UNION ALL
    SELECT 'q17', CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT),
           CAST(NULL AS BIGINT), CAST(NULL AS TIMESTAMP),
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), t.avg_yearly,
           CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT),
           CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE)
    FROM ({_Q17_ORACLE}) t
    UNION ALL
    SELECT 'q6', CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT),
           CAST(NULL AS BIGINT), CAST(NULL AS TIMESTAMP),
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           CAST(NULL AS DOUBLE), CAST(NULL AS VARCHAR),
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), t.revenue
    FROM ({_Q6_ORACLE}) t
    UNION ALL
    SELECT 'q12', CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT),
           CAST(NULL AS BIGINT), CAST(NULL AS TIMESTAMP),
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           CAST(NULL AS DOUBLE), t.flag, t.high_cnt, t.low_cnt,
           CAST(NULL AS DOUBLE)
    FROM ({_Q12_ORACLE}) t
    """,
    survey="§2.4/§2.5/§2.7: TPC-H lineitem battery (folded so every "
    "leg keeps a driver CORRECTNESS row) — [q18] large-volume "
    "customers: HAVING-subquery membership becomes a semi-join "
    "against a pre-aggregated key set, customer dim broadcasts, the "
    "fact table shuffles once on the join key, TakeOrderedAndProject "
    "for the top-100 (no global sort); [q17] small-quantity-order "
    "revenue: the correlated scalar subquery (per-part average) is "
    "decorrelated into one map-side-combinable aggregate joined back "
    "on the part key, the part filter broadcasts, single-row exact "
    "fixed-point answer; [q6] forecast revenue: all predicates pushed "
    "to the scan, zero wide exchanges; [q12] late-shipment priority "
    "counts: fact-fact equi-join with the lateness predicate in the "
    "join condition, dual conditional aggregate",
)
def q6_q12_q17_q18_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    null_s = F.lit(None).cast("string")
    null_l = F.lit(None).cast("long")
    null_d = F.lit(None).cast("double")
    null_ts = F.lit(None).cast("timestamp_ntz")
    q18 = q18_large_orders(spark, sf_dir).select(
        F.lit("q18").alias("variant"),
        "c_name",
        "c_custkey",
        "o_orderkey",
        "o_orderdate",
        "o_totalprice",
        "sum_qty",
        null_d.alias("avg_yearly"),
        null_s.alias("flag"),
        null_l.alias("high_cnt"),
        null_l.alias("low_cnt"),
        null_d.alias("revenue"),
    )
    q17 = q17_small_quantity_revenue(spark, sf_dir).select(
        F.lit("q17").alias("variant"),
        null_s.alias("c_name"),
        null_l.alias("c_custkey"),
        null_l.alias("o_orderkey"),
        null_ts.alias("o_orderdate"),
        null_d.alias("o_totalprice"),
        null_d.alias("sum_qty"),
        "avg_yearly",
        null_s.alias("flag"),
        null_l.alias("high_cnt"),
        null_l.alias("low_cnt"),
        null_d.alias("revenue"),
    )
    q6 = q6_forecast_revenue(spark, sf_dir).select(
        F.lit("q6").alias("variant"),
        null_s.alias("c_name"),
        null_l.alias("c_custkey"),
        null_l.alias("o_orderkey"),
        null_ts.alias("o_orderdate"),
        null_d.alias("o_totalprice"),
        null_d.alias("sum_qty"),
        null_d.alias("avg_yearly"),
        null_s.alias("flag"),
        null_l.alias("high_cnt"),
        null_l.alias("low_cnt"),
        "revenue",
    )
    q12 = q12_late_shipment_priority(spark, sf_dir).select(
        F.lit("q12").alias("variant"),
        null_s.alias("c_name"),
        null_l.alias("c_custkey"),
        null_l.alias("o_orderkey"),
        null_ts.alias("o_orderdate"),
        null_d.alias("o_totalprice"),
        null_d.alias("sum_qty"),
        null_d.alias("avg_yearly"),
        "flag",
        "high_cnt",
        "low_cnt",
        null_d.alias("revenue"),
    )
    return (
        q18.unionByName(q17).unionByName(q6).unionByName(q12)
    )


# ---------------------------------------------------------------------------
# TPC-H Q4-style: order priority checking (EXISTS -> semi-join)
# ---------------------------------------------------------------------------
_Q4_ORACLE = """
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
    """


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


# ---------------------------------------------------------------------------
# TPC-H Q21: suppliers who kept orders waiting (EXISTS + NOT EXISTS)
# ---------------------------------------------------------------------------
# The corpus lineitem has no commit/receipt dates, so "late" is adapted
# to l_shipdate > o_orderdate + 45 days; the double-correlated shape —
# the counted supplier was late on a finished multi-supplier order and
# was the ONLY late supplier on it — is the TPC-H original
# (EXISTS same-order-other-supplier, NOT EXISTS other-late-supplier).

_Q21_ORACLE = """
    WITH of AS (
        SELECT o_orderkey, o_orderdate FROM orders WHERE o_orderstatus = 'F'
    ),
    all_pairs AS (
        SELECT DISTINCT l.l_orderkey, l.l_suppkey
        FROM lineitem l JOIN of o ON l.l_orderkey = o.o_orderkey
    ),
    late_pairs AS (
        SELECT DISTINCT l.l_orderkey, l.l_suppkey
        FROM lineitem l JOIN of o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_shipdate > o.o_orderdate + INTERVAL 45 DAY
    ),
    asia AS (
        SELECT s.s_suppkey, s.s_name
        FROM supplier s
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
    ),
    w AS (
        SELECT lp.l_orderkey, a.s_name
        FROM late_pairs lp JOIN asia a ON a.s_suppkey = lp.l_suppkey
        WHERE EXISTS (
            SELECT 1 FROM all_pairs ap
            WHERE ap.l_orderkey = lp.l_orderkey
              AND ap.l_suppkey <> lp.l_suppkey
        )
        AND NOT EXISTS (
            SELECT 1 FROM late_pairs lp2
            WHERE lp2.l_orderkey = lp.l_orderkey
              AND lp2.l_suppkey <> lp.l_suppkey
        )
    )
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM w GROUP BY s_name
    ORDER BY numwait DESC, s_name LIMIT 20
    """


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21: suppliers who were the sole late supplier on a
    finished multi-supplier order.

    Decorrelation (r11 rewrite, guide §2.4): both correlated
    predicates are answered from ONE distinct (orderkey, suppkey) pair
    table with a per-pair late flag — ``groupBy(pair).agg(max(late))``
    — instead of two separate ``distinct()``s over the same
    lineitem⋈orders join (two full fact scans, two joins, two
    pair-keyed exchanges) fed into a semi + an anti join:

    * a pair is late iff ANY of its lines is late, so
      ``filter(max(late))`` IS the distinct of the filtered rows
      (set equality);
    * EXISTS(other supplier on the order)      ⇔ the order has ≥ 2
      distinct supplier pairs — the counted pair is itself one;
    * NOT EXISTS(other LATE supplier)          ⇔ the order has exactly
      1 late pair — the counted pair is late by construction.

    So per-order counts over the pair table replace the semi/anti
    joins outright, and the pair exchange is materialized once and
    served to both consumers (late pairs, per-order counts) by
    runtime exchange reuse — their pre-exchange subtrees are kept
    identical by the no-op isnotnull key filter (a NULL-key pair can
    match no equi-join). One fact scan, one orders join, one wide
    exchange carrying 17-byte pair rows; the supplier/nation/region
    dim chain broadcasts; the per-order stats join hashes on
    l_orderkey; the final rollup is tiny. Output bit-identical to the
    semi/anti form (oracle re-checked; the oracle still replays the
    literal EXISTS/NOT EXISTS SQL).
    """
    o_f = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    li = load_table(spark, sf_dir, "lineitem")
    lo = li.join(
        o_f.select("o_orderkey", "o_orderdate"),
        li.l_orderkey == F.col("o_orderkey"),
    )
    pair_late = (
        lo.select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 45 DAYS")
            ).alias("_late"),
        )
        .filter(
            F.col("l_orderkey").isNotNull() & F.col("l_suppkey").isNotNull()
        )
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("_late").alias("_late"))
    )
    late_pairs = pair_late.filter(F.col("_late")).select(
        "l_orderkey", "l_suppkey"
    )
    order_stats = pair_late.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("_n_supp"),
        F.sum(F.col("_late").cast("int")).alias("_n_late"),
    )
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name")
    )
    l1 = late_pairs.join(
        F.broadcast(asia), late_pairs.l_suppkey == F.col("s_suppkey")
    )
    l3 = l1.join(order_stats, "l_orderkey").filter(
        (F.col("_n_supp") >= 2) & (F.col("_n_late") == 1)
    )
    return (
        l3.groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(20)
    )


@register(
    "q4_q21_exists_battery",
    oracle=tag_union_sql(
        [
            (
                "q4",
                f"""
                SELECT t.o_orderpriority AS attr, t.order_count AS cnt
                FROM ({_Q4_ORACLE}) t
                """,
            ),
            (
                "q21",
                f"""
                SELECT t.s_name AS attr, t.numwait AS cnt
                FROM ({_Q21_ORACLE}) t
                """,
            ),
        ]
    ),
    survey="§2.4/§2.5 + §2.3 J2/J3: TPC-H correlated-EXISTS pair, one "
    "tagged union so both keep a driver CORRECTNESS row — [q4] order "
    "priority checking: the correlated EXISTS becomes a LEFT SEMI "
    "join on the order key with the date predicate in the join "
    "condition, orders date filter pushed to the scan; [q21] "
    "waiting suppliers: EXISTS→semi + NOT EXISTS→anti against "
    "distinct (order, supplier) pair sets, supplier inequality in "
    "the join condition, dim chain broadcast",
)
def q4_q21_exists_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    q4 = q4_order_priority(spark, sf_dir).select(
        F.col("o_orderpriority").alias("attr"),
        F.col("order_count").alias("cnt"),
    )
    q21 = q21_waiting_suppliers(spark, sf_dir).select(
        F.col("s_name").alias("attr"),
        F.col("numwait").alias("cnt"),
    )
    return tag_union([("q4", q4), ("q21", q21)])


# ---------------------------------------------------------------------------
# TPC-H trade analytics battery: Q7 / Q8 / Q9 / Q14 / Q19 shapes
# ---------------------------------------------------------------------------
# The driver corpus has no partsupp table and lineitem carries no
# commit/receipt dates, ship modes or containers, so the classic
# predicates are adapted to the available columns (p_type words,
# p_name "<adj> <noun>" vocabulary, NATION_0..24, shipdate windows);
# the join/aggregation SHAPES — the part the engine must execute well
# at 100 TB — are the TPC-H originals.

_DISC_PRICE = "l_extendedprice * (1 - l_discount)"


def _disc_price():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


_Q7_ORACLE = f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
           {exact_sum_sql(_DISC_PRICE)} AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1999-01-01'
    GROUP BY 1, 2, 3
    """


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral shipping volume between two nations by year.

    Both nation dims broadcast twice (supplier side / customer side);
    the only wide exchanges are lineitem⋈orders on the order key and
    the final (nation, nation, year) rollup, which is tiny.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    pair = ["NATION_1", "NATION_2"]
    n1 = n.filter(F.col("n_name").isin(pair)).select(
        F.col("n_nationkey").alias("_n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.filter(F.col("n_name").isin(pair)).select(
        F.col("n_nationkey").alias("_n2_key"), F.col("n_name").alias("cust_nation")
    )
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("_n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("_n2_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return (
        j.withColumn("l_year", F.year("l_shipdate").cast("long"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(exact_sum(_disc_price()).alias("revenue"))
    )


_Q8_ORACLE = f"""
    SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           {exact_sum_sql(_DISC_PRICE)} AS revenue,
           round({exact_sum_sql(
               "CASE WHEN n1.n_name = 'NATION_3' THEN " + _DISC_PRICE
               + " ELSE 0 END")} / {exact_sum_sql(_DISC_PRICE)}, 4)
               AS mkt_share
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    JOIN region r   ON n2.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'EUROPE'
      AND p.p_type = 'STANDARD'
      AND o.o_orderdate >= TIMESTAMP '1995-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY 1
    """


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's share of regional market volume by year.

    The share is a ratio of two order-independent fixed-point sums
    (numerator CASE-gated map-side), so the rounded result is
    engine-identical; every dim broadcasts, lineitem⋈orders is the
    single wide exchange.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    n1 = n.select(
        F.col("n_nationkey").alias("_n1_key"), F.col("n_name").alias("_supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("_n2_key"),
        F.col("n_regionkey").alias("_n2_region"),
    )
    vol = _disc_price()
    j = (
        li.join(F.broadcast(p.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("_n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("_n2_key"))
        .join(F.broadcast(r), F.col("_n2_region") == F.col("r_regionkey"))
    )
    gated = F.when(F.col("_supp_nation") == "NATION_3", vol).otherwise(F.lit(0.0))
    return (
        j.withColumn("o_year", F.year("o_orderdate").cast("long"))
        .groupBy("o_year")
        .agg(
            exact_sum(vol).alias("revenue"),
            F.round(exact_sum(gated) / exact_sum(vol), 4).alias("mkt_share"),
        )
    )


_Q9_ORACLE = f"""
    SELECT n.n_name AS supp_nation,
           CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           {exact_sum_sql(_DISC_PRICE)} AS revenue
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%bolt%'
    GROUP BY 1, 2
    """


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: product-line profit by supplier nation and year.

    Adapted: the corpus has no partsupp, so profit is discounted
    revenue (the ps_supplycost term is dropped); the join spine —
    part-name LIKE filter pushed into a broadcast part join, supplier
    nation rollup by order year — is Q9's.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%"))
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    j = (
        li.join(F.broadcast(p.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
    )
    return (
        j.withColumn("o_year", F.year("o_orderdate").cast("long"))
        .withColumn("supp_nation", F.col("n_name"))
        .groupBy("supp_nation", "o_year")
        .agg(exact_sum(_disc_price()).alias("revenue"))
    )


_Q14_ORACLE = f"""
    SELECT {exact_sum_sql(_DISC_PRICE)} AS revenue,
           round(100.0 * {exact_sum_sql(
               "CASE WHEN p.p_type = 'PROMO' THEN " + _DISC_PRICE
               + " ELSE 0 END")} / {exact_sum_sql(_DISC_PRICE)}, 4)
               AS promo_ratio
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
      AND l.l_shipdate <  TIMESTAMP '1996-04-01'
    """


def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promotion revenue share for one month.

    Single-row global aggregate: shipdate window pushed to the scan,
    part type broadcast-joined, CASE-gated fixed-point numerator.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    vol = _disc_price()
    gated = F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(p), li.l_partkey == F.col("p_partkey"))
        .agg(
            exact_sum(vol).alias("revenue"),
            F.round(F.lit(100.0) * exact_sum(gated) / exact_sum(vol), 4).alias(
                "promo_ratio"
            ),
        )
    )


_Q19_ORACLE = f"""
    SELECT {exact_sum_sql(_DISC_PRICE)} AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity >= 1 AND l.l_quantity <= 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity >= 10 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 20 AND l.l_quantity <= 30)
    """


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: discounted revenue under an OR-of-ANDs
    predicate spanning both join sides.

    Adapted to available columns (brand/size/quantity; no containers
    or ship modes in the corpus). The part side pre-filters to the
    union of brand clauses (broadcastable); the mixed l/p disjunction
    evaluates post-join in codegen.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
    )
    j = li.join(
        F.broadcast(p.select("p_partkey", "p_brand", "p_size")),
        li.l_partkey == F.col("p_partkey"),
    )
    q = F.col("l_quantity")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 5)
            & (q >= 1)
            & (q <= 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 10)
            & (q >= 10)
            & (q <= 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & (q >= 20)
            & (q <= 30)
        )
    )
    return j.filter(cond).agg(exact_sum(_disc_price()).alias("revenue"))


@register(
    "q7_q8_q9_trade_battery",
    oracle=tag_union_sql(
        [
            (
                "q7",
                f"""
                SELECT t.supp_nation, t.cust_nation, t.l_year AS y,
                       t.revenue, CAST(NULL AS DOUBLE) AS ratio
                FROM ({_Q7_ORACLE}) t
                """,
            ),
            (
                "q8",
                f"""
                SELECT CAST(NULL AS VARCHAR) AS supp_nation,
                       CAST(NULL AS VARCHAR) AS cust_nation,
                       t.o_year AS y, t.revenue, t.mkt_share AS ratio
                FROM ({_Q8_ORACLE}) t
                """,
            ),
            (
                "q9",
                f"""
                SELECT t.supp_nation, CAST(NULL AS VARCHAR) AS cust_nation,
                       t.o_year AS y, t.revenue, CAST(NULL AS DOUBLE) AS ratio
                FROM ({_Q9_ORACLE}) t
                """,
            ),
            (
                "q14",
                f"""
                SELECT CAST(NULL AS VARCHAR) AS supp_nation,
                       CAST(NULL AS VARCHAR) AS cust_nation,
                       CAST(NULL AS BIGINT) AS y,
                       t.revenue, t.promo_ratio AS ratio
                FROM ({_Q14_ORACLE}) t
                """,
            ),
            (
                "q19",
                f"""
                SELECT CAST(NULL AS VARCHAR) AS supp_nation,
                       CAST(NULL AS VARCHAR) AS cust_nation,
                       CAST(NULL AS BIGINT) AS y,
                       t.revenue, CAST(NULL AS DOUBLE) AS ratio
                FROM ({_Q19_ORACLE}) t
                """,
            ),
        ]
    ),
    survey="§2.3/§2.4 extension — TPC-H trade-analytics shapes, one "
    "tagged union so each keeps a driver row: [q7] bilateral "
    "nation-pair shipping volume by year (double nation broadcast); "
    "[q8] regional market share (CASE-gated fixed-point ratio); "
    "[q9] product-line profit by supplier nation/year (LIKE-filtered "
    "broadcast part join; partsupp-free adaptation); [q14] promo "
    "revenue share (single-row global agg); [q19] OR-of-ANDs "
    "disjunctive predicate spanning both join sides. All legs share "
    "one wide exchange (lineitem⋈orders) at most; every dim "
    "broadcasts; sums are order-independent fixed-point",
)
def q7_q8_q9_trade_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    null_s = F.lit(None).cast("string")
    null_l = F.lit(None).cast("long")
    null_d = F.lit(None).cast("double")
    q7 = q7_volume_shipping(spark, sf_dir).select(
        "supp_nation",
        "cust_nation",
        F.col("l_year").alias("y"),
        "revenue",
        null_d.alias("ratio"),
    )
    q8 = q8_market_share(spark, sf_dir).select(
        null_s.alias("supp_nation"),
        null_s.alias("cust_nation"),
        F.col("o_year").alias("y"),
        "revenue",
        F.col("mkt_share").alias("ratio"),
    )
    q9 = q9_product_profit(spark, sf_dir).select(
        "supp_nation",
        null_s.alias("cust_nation"),
        F.col("o_year").alias("y"),
        "revenue",
        null_d.alias("ratio"),
    )
    q14 = q14_promo_effect(spark, sf_dir).select(
        null_s.alias("supp_nation"),
        null_s.alias("cust_nation"),
        null_l.alias("y"),
        "revenue",
        F.col("promo_ratio").alias("ratio"),
    )
    q19 = q19_disjunctive_revenue(spark, sf_dir).select(
        null_s.alias("supp_nation"),
        null_s.alias("cust_nation"),
        null_l.alias("y"),
        "revenue",
        null_d.alias("ratio"),
    )
    return tag_union(
        [("q7", q7), ("q8", q8), ("q9", q9), ("q14", q14), ("q19", q19)]
    )


# ---------------------------------------------------------------------------
# TPC-H customer/supplier rollup battery: Q10 / Q13 / Q15 / Q22 shapes
# ---------------------------------------------------------------------------

_Q10_ORACLE = f"""
    SELECT c.c_custkey, c.c_name, n.n_name,
           {exact_sum_sql(_DISC_PRICE)} AS revenue,
           c.c_acctbal
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-04-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey ASC
    LIMIT 20
    """


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by returned-item revenue in a
    quarter.

    Returnflag + orderdate predicates push to the scans; customer and
    nation broadcast; the one wide exchange is lineitem⋈orders;
    TakeOrderedAndProject (no global sort) serves the top-20 with a
    custkey tiebreaker for cross-engine determinism.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    )
    return (
        j.groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(exact_sum(_disc_price()).alias("revenue"))
        .select("c_custkey", "c_name", "n_name", "revenue", "c_acctbal")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


_Q13_ORACLE = """
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
        SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
        FROM customer c
        LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey
    ) t
    GROUP BY c_count
    """


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of per-customer order counts,
    zero-order customers included via the left outer join.

    Adapted: the corpus orders table has no o_comment, so the
    NOT-LIKE filter is dropped; the outer-join + double-aggregate
    shape is Q13's. count(o_orderkey) skips NULLs from unmatched
    customers exactly as in SQL; the second rollup is tiny.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


_Q15_ORACLE = f"""
    WITH rev AS (
        SELECT l_suppkey, {exact_sum_sql(_DISC_PRICE)} AS total_rev
        FROM lineitem l
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_rev
    FROM supplier s
    JOIN rev r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_rev = (SELECT max(total_rev) FROM rev)
    """


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum quarterly revenue.

    The revenue view aggregates once on suppkey (map-side combinable);
    the MAX scalar rides back as a broadcast single-row cross join —
    never a driver collect. total_rev is an order-independent
    fixed-point sum, so the equality-to-max predicate is
    engine-deterministic (doubles would make ties engine-dependent).
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        exact_sum(_disc_price()).alias("total_rev")
    )
    mx = rev.agg(F.max("total_rev").alias("_max_rev"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("_max_rev"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_rev")
    )


_Q22_ORACLE = f"""
    WITH avg_bal AS (
        SELECT {exact_sum_sql("c_acctbal")} / count(*) AS v
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT n.n_name,
           CAST(count(*) AS BIGINT) AS numcust,
           {exact_sum_sql("c.c_acctbal")} AS totacctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE c.c_acctbal > (SELECT v FROM avg_bal)
      AND NOT EXISTS (
          SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
      )
    GROUP BY n.n_name
    """


def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: well-funded customers with no orders, rolled
    up by nation.

    Adapted: the corpus has no c_phone, so the country-code prefix
    filter becomes the nation rollup itself. The global average
    balance is a broadcast single-row aggregate (fixed-point sum /
    count — identical double in both engines); the NOT EXISTS is a
    left anti-join on the order key.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (exact_sum(F.col("c_acctbal")) / F.count(F.lit(1))).alias("_avg_bal")
        )
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            exact_sum(F.col("c_acctbal")).alias("totacctbal"),
        )
    )


@register(
    "q10_q13_q15_q22_customer_battery",
    oracle=tag_union_sql(
        [
            (
                "q10",
                f"""
                SELECT t.c_custkey AS key, t.c_name AS name, t.n_name,
                       t.revenue, t.c_acctbal AS acctbal,
                       CAST(NULL AS BIGINT) AS cnt
                FROM ({_Q10_ORACLE}) t
                """,
            ),
            (
                "q13",
                f"""
                SELECT t.c_count AS key, CAST(NULL AS VARCHAR) AS name,
                       CAST(NULL AS VARCHAR) AS n_name,
                       CAST(NULL AS DOUBLE) AS revenue,
                       CAST(NULL AS DOUBLE) AS acctbal,
                       t.custdist AS cnt
                FROM ({_Q13_ORACLE}) t
                """,
            ),
            (
                "q15",
                f"""
                SELECT t.s_suppkey AS key, t.s_name AS name,
                       CAST(NULL AS VARCHAR) AS n_name,
                       t.total_rev AS revenue,
                       CAST(NULL AS DOUBLE) AS acctbal,
                       CAST(NULL AS BIGINT) AS cnt
                FROM ({_Q15_ORACLE}) t
                """,
            ),
            (
                "q22",
                f"""
                SELECT CAST(NULL AS BIGINT) AS key,
                       CAST(NULL AS VARCHAR) AS name, t.n_name,
                       CAST(NULL AS DOUBLE) AS revenue,
                       t.totacctbal AS acctbal, t.numcust AS cnt
                FROM ({_Q22_ORACLE}) t
                """,
            ),
        ]
    ),
    survey="§2.3/§2.4/§2.5 extension — TPC-H customer/supplier rollup "
    "shapes, one tagged union so each keeps a driver row: [q10] "
    "top-20 returned-item customers (broadcast dims, top-k with "
    "tiebreaker); [q13] order-count distribution incl. zero-order "
    "customers (left outer join + double aggregate); [q15] "
    "max-revenue supplier via a broadcast single-row MAX (fixed-point "
    "equality, engine-deterministic ties); [q22] idle well-funded "
    "customers (broadcast global average + left anti-join)",
)
def q10_q13_q15_q22_customer_battery(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    null_s = F.lit(None).cast("string")
    null_l = F.lit(None).cast("long")
    null_d = F.lit(None).cast("double")
    q10 = q10_returned_items(spark, sf_dir).select(
        F.col("c_custkey").alias("key"),
        F.col("c_name").alias("name"),
        "n_name",
        "revenue",
        F.col("c_acctbal").alias("acctbal"),
        null_l.alias("cnt"),
    )
    q13 = q13_customer_distribution(spark, sf_dir).select(
        F.col("c_count").alias("key"),
        null_s.alias("name"),
        null_s.alias("n_name"),
        null_d.alias("revenue"),
        null_d.alias("acctbal"),
        F.col("custdist").alias("cnt"),
    )
    q15 = q15_top_supplier(spark, sf_dir).select(
        F.col("s_suppkey").alias("key"),
        F.col("s_name").alias("name"),
        null_s.alias("n_name"),
        F.col("total_rev").alias("revenue"),
        null_d.alias("acctbal"),
        null_l.alias("cnt"),
    )
    q22 = q22_idle_customers(spark, sf_dir).select(
        null_l.alias("key"),
        null_s.alias("name"),
        "n_name",
        null_d.alias("revenue"),
        F.col("totacctbal").alias("acctbal"),
        F.col("numcust").alias("cnt"),
    )
    return tag_union(
        [("q10", q10), ("q13", q13), ("q15", q15), ("q22", q22)]
    )


# ---------------------------------------------------------------------------
# TPC-H partsupp-CTE shapes: Q2 / Q11 / Q16 / Q20 + scalar-subquery leg
# ---------------------------------------------------------------------------
# The driver corpus has no partsupp table, so both engines derive the
# SAME part-supplier catalog from lineitem: per (partkey, suppkey),
# supply cost = min unit price in exact centi-units, availqty = total
# quantity shipped (integer units). The derivation is one map-side-
# combinable aggregate; downstream, the four classic partsupp query
# SHAPES (correlated MIN, scalar threshold, NOT IN, nested IN with a
# correlated aggregate) run unchanged. All money/quantity arithmetic
# is fixed-point BIGINT so every comparison is exact in both engines.

_PS_SQL = """
        SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
               min(CAST(round(l_extendedprice / l_quantity * 100) AS BIGINT))
                   AS ps_cost_c,
               CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
                   AS ps_availqty
        FROM lineitem GROUP BY 1, 2
"""

_EU_SQL = """
        SELECT s.s_suppkey, s.s_name, n.n_name
        FROM supplier s
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'EUROPE'
"""


def _derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lineitem-derived partsupp: one hash aggregate on the pair key
    (map-side combinable — at 100 TB the exchange carries one row per
    (part, supplier) pair per map partition, not per lineitem)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.min(
            F.round(F.col("l_extendedprice") / F.col("l_quantity") * 100)
            .cast("long")
        ).alias("ps_cost_c"),
        F.sum(F.round(F.col("l_quantity")).cast("long")).alias("ps_availqty"),
    )


def _region_suppliers(
    spark: SparkSession, sf_dir: str, region: str
) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == region)
    return (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "n_name")
    )


_Q2_ORACLE = f"""
    WITH ps AS ({_PS_SQL}), eu AS ({_EU_SQL})
    SELECT p.p_partkey, eu.s_name, eu.n_name,
           ps.ps_cost_c / 100.0 AS min_cost
    FROM part p
    JOIN ps ON ps.ps_partkey = p.p_partkey
    JOIN eu ON eu.s_suppkey = ps.ps_suppkey
    WHERE p.p_type = 'LARGE' AND p.p_size <= 10
      AND ps.ps_cost_c = (
          SELECT min(ps2.ps_cost_c)
          FROM ps ps2 JOIN eu eu2 ON eu2.s_suppkey = ps2.ps_suppkey
          WHERE ps2.ps_partkey = p.p_partkey
      )
    """


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2: cheapest regional supplier per selected part.

    The correlated MIN subquery decorrelates into a window MIN over
    the SAME region-filtered pair set: one pass, one shuffle on the
    part key, no join-back (an agg+self-join would scan lineitem
    twice). Ties at the minimum surface every qualifying supplier
    exactly like the subquery form; the dims broadcast.
    """
    from pyspark.sql.window import Window

    ps = _derived_partsupp(spark, sf_dir)
    eu = _region_suppliers(spark, sf_dir, "EUROPE")
    parts = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_type") == "LARGE") & (F.col("p_size") <= 10))
        .select("p_partkey")
    )
    eps = ps.join(F.broadcast(eu), ps.ps_suppkey == eu.s_suppkey).join(
        F.broadcast(parts), ps.ps_partkey == F.col("p_partkey")
    )
    w = Window.partitionBy("ps_partkey")
    return (
        eps.withColumn("_min_c", F.min("ps_cost_c").over(w))
        .filter(F.col("ps_cost_c") == F.col("_min_c"))
        .select(
            "p_partkey",
            "s_name",
            "n_name",
            (F.col("ps_cost_c") / 100.0).alias("min_cost"),
        )
    )


_Q11_ORACLE = f"""
    WITH ps AS ({_PS_SQL}), eu AS ({_EU_SQL}),
    grp AS (
        SELECT ps.ps_partkey,
               CAST(sum(ps.ps_cost_c * ps.ps_availqty) AS BIGINT) AS value_c
        FROM ps JOIN eu ON eu.s_suppkey = ps.ps_suppkey
        GROUP BY 1
    )
    SELECT ps_partkey, value_c / 100.0 AS stock_value
    FROM grp
    WHERE value_c * 1000 > (SELECT CAST(sum(value_c) AS BIGINT) FROM grp)
    """


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11: parts whose regional stock value exceeds 1/1000 of
    the total.

    The global-total scalar subquery becomes a broadcast single-row
    aggregate over the grouped values; the threshold comparison is
    pure BIGINT (value·1000 > total), so both engines agree exactly.
    """
    ps = _derived_partsupp(spark, sf_dir)
    eu = _region_suppliers(spark, sf_dir, "EUROPE").select("s_suppkey")
    grp = (
        ps.join(F.broadcast(eu), ps.ps_suppkey == F.col("s_suppkey"))
        .groupBy("ps_partkey")
        .agg(
            F.sum(F.col("ps_cost_c") * F.col("ps_availqty")).alias("value_c")
        )
    )
    total = grp.agg(F.sum("value_c").alias("total_c"))
    return (
        grp.crossJoin(F.broadcast(total))
        .filter(F.col("value_c") * 1000 > F.col("total_c"))
        .select(
            "ps_partkey", (F.col("value_c") / 100.0).alias("stock_value")
        )
    )


_Q16_ORACLE = f"""
    WITH ps AS ({_PS_SQL})
    SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
           CAST(count(DISTINCT ps.ps_suppkey) AS BIGINT) AS supplier_cnt
    FROM ps JOIN part p ON p.p_partkey = ps.ps_partkey
    WHERE p.p_brand <> 'Brand#4' AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 49)
      AND ps.ps_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY 1, 2, 3
    """


def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16: distinct supplier count per part attribute group,
    excluding flagged suppliers.

    NOT IN (no NULLs possible on a key column) becomes a broadcast
    LEFT ANTI join; the part attribute filter broadcasts; the single
    wide exchange is the count-distinct aggregate.
    """
    ps = _derived_partsupp(spark, sf_dir)
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    parts = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#4")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 49))
    )
    return (
        ps.join(
            F.broadcast(bad), ps.ps_suppkey == F.col("s_suppkey"), "left_anti"
        )
        .join(F.broadcast(parts), ps.ps_partkey == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", F.col("p_size").cast("long").alias("p_size"))
        .agg(F.count_distinct(F.col("ps_suppkey")).alias("supplier_cnt"))
    )


_Q20_ORACLE = f"""
    WITH ps AS ({_PS_SQL}), eu AS ({_EU_SQL}),
    q96 AS (
        SELECT l_partkey, l_suppkey,
               CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
                   AS qty96
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY 1, 2
    )
    SELECT eu.s_suppkey, eu.s_name, eu.n_name
    FROM eu
    WHERE eu.s_suppkey IN (
        SELECT ps.ps_suppkey
        FROM ps JOIN q96 ON ps.ps_partkey = q96.l_partkey
                        AND ps.ps_suppkey = q96.l_suppkey
        WHERE ps.ps_partkey IN (
            SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
        )
        AND ps.ps_availqty > 2 * q96.qty96
    )
    """


def q20_excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20: regional suppliers holding more than twice the 1996
    demand of a selected part.

    The nested IN chain becomes two LEFT SEMI joins: the part-name
    membership broadcasts, the correlated 1996-demand aggregate is a
    pre-grouped pair-keyed join, and the BIGINT comparison
    (avail > 2·qty96) is exact in both engines.
    """
    ps = _derived_partsupp(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem")
    q96 = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.round(F.col("l_quantity")).cast("long")).alias("qty96"))
    )
    small_parts = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith("small"))
        .select("p_partkey")
    )
    cand = (
        ps.join(
            q96,
            (ps.ps_partkey == q96.l_partkey)
            & (ps.ps_suppkey == q96.l_suppkey),
        )
        .filter(F.col("ps_availqty") > 2 * F.col("qty96"))
        .join(
            F.broadcast(small_parts),
            F.col("ps_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .select("ps_suppkey")
    )
    eu = _region_suppliers(spark, sf_dir, "EUROPE")
    return eu.join(
        cand, eu.s_suppkey == cand.ps_suppkey, "left_semi"
    ).select("s_suppkey", "s_name", "n_name")


@register(
    "subquery_battery",
    oracle=tag_union_sql(
        [
            (
                "scalar_avg_filter",
                f"""
                SELECT t.o_orderkey AS k1, t.o_custkey AS k2,
                       CAST(NULL AS VARCHAR) AS name1,
                       CAST(NULL AS VARCHAR) AS name2,
                       t.o_totalprice AS val, CAST(NULL AS BIGINT) AS cnt
                FROM ({_SCALAR_SUB_ORACLE}) t
                """,
            ),
            (
                "q2",
                f"""
                SELECT t.p_partkey AS k1, CAST(NULL AS BIGINT) AS k2,
                       t.s_name AS name1, t.n_name AS name2,
                       t.min_cost AS val, CAST(NULL AS BIGINT) AS cnt
                FROM ({_Q2_ORACLE}) t
                """,
            ),
            (
                "q11",
                f"""
                SELECT t.ps_partkey AS k1, CAST(NULL AS BIGINT) AS k2,
                       CAST(NULL AS VARCHAR) AS name1,
                       CAST(NULL AS VARCHAR) AS name2,
                       t.stock_value AS val, CAST(NULL AS BIGINT) AS cnt
                FROM ({_Q11_ORACLE}) t
                """,
            ),
            (
                "q16",
                f"""
                SELECT t.p_size AS k1, CAST(NULL AS BIGINT) AS k2,
                       t.p_brand AS name1, t.p_type AS name2,
                       CAST(NULL AS DOUBLE) AS val, t.supplier_cnt AS cnt
                FROM ({_Q16_ORACLE}) t
                """,
            ),
            (
                "q20",
                f"""
                SELECT t.s_suppkey AS k1, CAST(NULL AS BIGINT) AS k2,
                       t.s_name AS name1, t.n_name AS name2,
                       CAST(NULL AS DOUBLE) AS val, CAST(NULL AS BIGINT) AS cnt
                FROM ({_Q20_ORACLE}) t
                """,
            ),
        ]
    ),
    survey="§2.3/§2.4 extension — subquery-decorrelation battery, one "
    "tagged union so all five shapes keep a driver CORRECTNESS row: "
    "[scalar_avg_filter] correlated per-key average → window "
    "aggregate (one shuffle on the correlation key); TPC-H partsupp "
    "shapes over the lineitem-derived pair catalog — [q2] correlated "
    "MIN → per-part aggregate joined back on (key, cost); [q11] "
    "global-total scalar → broadcast single-row aggregate, BIGINT "
    "threshold; [q16] NOT IN → broadcast anti-join + count-distinct; "
    "[q20] nested IN + correlated aggregate → semi-join chain over "
    "pre-grouped pairs",
    note="partsupp is derived identically in both engines (min unit "
    "price in centi-units, total shipped quantity); all money math "
    "fixed-point BIGINT",
)
def subquery_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    null_s = F.lit(None).cast("string")
    null_l = F.lit(None).cast("long")
    null_d = F.lit(None).cast("double")
    scalar = scalar_subquery_filter(spark, sf_dir).select(
        F.col("o_orderkey").alias("k1"),
        F.col("o_custkey").alias("k2"),
        null_s.alias("name1"),
        null_s.alias("name2"),
        F.col("o_totalprice").alias("val"),
        null_l.alias("cnt"),
    )
    q2 = q2_min_cost_supplier(spark, sf_dir).select(
        F.col("p_partkey").alias("k1"),
        null_l.alias("k2"),
        F.col("s_name").alias("name1"),
        F.col("n_name").alias("name2"),
        F.col("min_cost").alias("val"),
        null_l.alias("cnt"),
    )
    q11 = q11_important_stock(spark, sf_dir).select(
        F.col("ps_partkey").alias("k1"),
        null_l.alias("k2"),
        null_s.alias("name1"),
        null_s.alias("name2"),
        F.col("stock_value").alias("val"),
        null_l.alias("cnt"),
    )
    q16 = q16_supplier_part_counts(spark, sf_dir).select(
        F.col("p_size").alias("k1"),
        null_l.alias("k2"),
        F.col("p_brand").alias("name1"),
        F.col("p_type").alias("name2"),
        null_d.alias("val"),
        F.col("supplier_cnt").alias("cnt"),
    )
    q20 = q20_excess_stock_suppliers(spark, sf_dir).select(
        F.col("s_suppkey").alias("k1"),
        null_l.alias("k2"),
        F.col("s_name").alias("name1"),
        F.col("n_name").alias("name2"),
        null_d.alias("val"),
        null_l.alias("cnt"),
    )
    return tag_union(
        [
            ("scalar_avg_filter", scalar),
            ("q2", q2),
            ("q11", q11),
            ("q16", q16),
            ("q20", q20),
        ]
    )
