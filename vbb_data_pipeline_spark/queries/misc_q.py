"""Scalar-function batteries, cube/grouping sets, exact percentiles,
limit/offset — the long tail of engine-surface parity (SURVEY.md
§2.4-§2.7 extensions), each oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vbb_data_pipeline_spark.functions.hashing import md5_long_sql
from vbb_data_pipeline_spark.queries import load_table, register


@register(
    "string_functions",
    oracle="""
    SELECT c_custkey,
           upper(c_name)                                   AS up,
           lower(c_mktsegment)                             AS lo,
           substr(c_name, 10, 5)                           AS sub,
           concat(c_mktsegment, '#', c_custkey)            AS cat,
           lpad(CAST(c_custkey AS VARCHAR), 12, '0')       AS padded,
           replace(c_name, 'Customer', 'Kunde')            AS repl,
           CAST(length(c_name) AS INT)                     AS len,
           CAST(strpos(c_name, '#') AS INT)                AS pos,
           reverse(c_mktsegment)                           AS rev,
           trim(concat(' ', c_mktsegment, ' '))            AS trimmed
    FROM customer
    """,
    survey="§2.7 scalar-function battery (string)",
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("up"),
        F.lower("c_mktsegment").alias("lo"),
        F.substring("c_name", 10, 5).alias("sub"),
        F.concat("c_mktsegment", F.lit("#"), F.col("c_custkey").cast("string")).alias("cat"),
        F.lpad(F.col("c_custkey").cast("string"), 12, "0").alias("padded"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Kunde")).alias("repl"),
        F.length("c_name").cast("int").alias("len"),
        F.instr("c_name", "#").cast("int").alias("pos"),
        F.reverse("c_mktsegment").alias("rev"),
        F.trim(F.concat(F.lit(" "), F.col("c_mktsegment"), F.lit(" "))).alias("trimmed"),
    )


@register(
    "conditional_functions",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 200000 THEN 'high'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'low' END                              AS bucket,
           coalesce(nullif(o_orderstatus, 'O'), 'open')     AS status2,
           greatest(o_totalprice, 150000.0)                 AS hi,
           least(CAST(o_orderkey % 7 AS BIGINT), CAST(o_custkey % 7 AS BIGINT)) AS lo7,
           (o_orderpriority IN ('1-URGENT', '2-HIGH'))      AS urgent
    FROM orders
    """,
    survey="§2.7 scalar-function battery (conditional/comparison)",
)
def conditional_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 200000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
        .alias("bucket"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("open")).alias("status2"),
        F.greatest("o_totalprice", F.lit(150000.0)).alias("hi"),
        F.least((F.col("o_orderkey") % 7), (F.col("o_custkey") % 7)).alias("lo7"),
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").alias("urgent"),
    )


@register(
    "array_functions",
    oracle="""
    WITH t AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                           x -> x <> '') AS toks
        FROM documents
    )
    SELECT doc_id,
           CAST(len(toks) AS INT)                        AS n,
           toks[1]                                       AS first_tok,
           toks[len(toks)]                               AS last_tok,
           CAST(list_contains(toks, 'data') AS BOOLEAN)  AS has_data,
           array_to_string(toks[1:3], '-')               AS first3,
           CAST(len(list_distinct(toks)) AS INT)         AS n_distinct
    FROM t
    """,
    survey="§2.7 extension: array/collection function battery "
    "(ArrayType is first-class; reference has no nested types §1.3)",
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vbb_data_pipeline_spark.functions.text import tokens

    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", tokens("text").alias("toks"))
    return t.select(
        "doc_id",
        F.size("toks").alias("n"),
        F.element_at("toks", 1).alias("first_tok"),
        F.element_at("toks", -1).alias("last_tok"),
        F.array_contains("toks", "data").alias("has_data"),
        F.concat_ws("-", F.slice("toks", 1, 3)).alias("first3"),
        F.size(F.array_distinct("toks")).alias("n_distinct"),
    )


@register(
    "cube_status_priority",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(grouping(o_orderstatus) AS INT)  AS g_status,
           CAST(grouping(o_orderpriority) AS INT) AS g_prio,
           count(*) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    survey="§2.4 extension (cube + grouping markers)",
)
def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
        F.grouping("o_orderpriority").cast("int").alias("g_prio"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "grouping_sets_revenue",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(grouping(o_orderstatus) AS INT)   AS g_status,
           CAST(grouping(o_orderpriority) AS INT) AS g_prio,
           count(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    survey="§2.4 extension (explicit GROUPING SETS — the general form "
    "of cube/rollup; one shuffle produces all groupings via Expand)",
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupingSets(
        [["o_orderstatus"], ["o_orderpriority"], []],
        "o_orderstatus",
        "o_orderpriority",
    ).agg(
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
        F.grouping("o_orderpriority").cast("int").alias("g_prio"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "higher_order_functions",
    oracle="""
    WITH t AS (
        SELECT vec_id, CAST(embedding[1:8] AS DOUBLE[]) AS v
        FROM embeddings
    )
    SELECT vec_id,
           array_to_string(list_transform(v, x -> CAST(round(x * 2000) AS BIGINT)), ',') AS doubled_milli,
           CAST(len(list_filter(v, x -> x > 0)) AS INT)                   AS n_pos,
           round(list_sum(v), 4)                                          AS total,
           array_to_string(list_sort(list_transform(v, x -> CAST(round(x * 1000) AS BIGINT))), ',') AS sorted_milli,
           (len(list_filter(v, x -> x < -0.5)) > 0)                       AS has_small,
           round(list_dot_product(v, list_reverse(v)), 4)                 AS rev_dot
    FROM t
    """,
    survey="§2.7 extension: higher-order functions over ArrayType "
    "(transform/filter/aggregate/zip_with/sort/exists) — the "
    "lambda-expression surface the reference's row loops never had",
    note="arrays stringified for the cross-engine hash; zip_with+"
    "aggregate mirrors DuckDB list_dot_product on the reversed vector",
)
def higher_order_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    t = e.select(
        "vec_id",
        F.transform(F.slice("embedding", 1, 8), lambda x: x.cast("double")).alias("v"),
    )
    total = F.aggregate(F.col("v"), F.lit(0.0), lambda acc, x: acc + x)
    rev_dot = F.aggregate(
        F.zip_with(F.col("v"), F.reverse(F.col("v")), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return t.select(
        "vec_id",
        F.concat_ws(
            ",",
            F.transform(
                F.col("v"), lambda x: F.round(x * 2000).cast("long").cast("string")
            ),
        ).alias("doubled_milli"),
        F.size(F.filter(F.col("v"), lambda x: x > 0)).alias("n_pos"),
        F.round(total, 4).alias("total"),
        F.concat_ws(
            ",",
            F.transform(
                F.sort_array(
                    F.transform(F.col("v"), lambda x: F.round(x * 1000).cast("long"))
                ),
                lambda x: x.cast("string"),
            ),
        ).alias("sorted_milli"),
        F.exists(F.col("v"), lambda x: x < -0.5).alias("has_small"),
        F.round(rev_dot, 4).alias("rev_dot"),
    )


@register(
    "percentiles_exact",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 4)  AS median_price,
           round(quantile_cont(l_extendedprice, 0.95), 4) AS p95_price,
           round(quantile_cont(l_quantity, 0.25), 4)      AS q1_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
    survey="§2.4 extension (exact interpolated percentiles; the "
    "approximate twin is percentile_approx — rows-only, "
    "approx_distinct_stats)",
)
def percentiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", F.lit(0.5)), 4).alias("median_price"),
        F.round(F.percentile("l_extendedprice", F.lit(0.95)), 4).alias("p95_price"),
        F.round(F.percentile("l_quantity", F.lit(0.25)), 4).alias("q1_qty"),
    )


@register(
    "limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 50 OFFSET 20
    """,
    survey="§2.5 extension (deterministic pagination: total order + "
    "limit/offset)",
)
def limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .offset(20)
        .limit(50)
        .select("o_orderkey", "o_totalprice")
    )


@register(
    "approx_distinct_stats",
    oracle=None,  # approximate sketches differ across engines by design
    survey="§2.4 (approx_count_distinct / percentile_approx — HLL and "
    "KLL-style sketches; the 100 TB substitutes for exact distinct)",
    note="rows-only: sketch internals are engine-specific; exact twins "
    "are lineitem_shipmode_stats and percentiles_exact",
)
def approx_distinct_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.percentile_approx("l_extendedprice", 0.5, 1000).alias("approx_median"),
    )


@register(
    "stats_functions",
    oracle="""
    SELECT l_returnflag,
           round(corr(l_extendedprice, l_quantity), 4)        AS price_qty_corr,
           round(covar_samp(l_extendedprice, l_quantity), 2)  AS price_qty_covar,
           round(skewness(l_extendedprice), 4)                AS price_skew,
           round(kurtosis(l_extendedprice), 4)                AS price_kurt,
           round(stddev_pop(l_discount), 6)                   AS disc_sd_pop,
           round(var_samp(l_tax), 6)                          AS tax_var
    FROM lineitem
    GROUP BY l_returnflag
    """,
    # DuckDB skewness/kurtosis carry the sample-bias correction
    # (G1/G2); Spark's are the population moments (g1/g2). The Spark
    # side converts g→G with the exact n-dependent factors so both
    # engines express the same statistic.
    survey="§2.4 extension: statistical aggregate battery "
    "(corr/covariance/skewness/kurtosis/variance) — second-moment "
    "profiling for data-quality monitoring at corpus scale",
)
def stats_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    n = F.count(F.lit(1)).cast("double")
    g1 = F.skewness("l_extendedprice")
    g2 = F.kurtosis("l_extendedprice")
    sample_skew = g1 * F.sqrt(n * (n - 1)) / (n - 2)
    sample_kurt = ((n - 1) / ((n - 2) * (n - 3))) * ((n + 1) * g2 + 6)
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_extendedprice", "l_quantity"), 4).alias("price_qty_corr"),
        F.round(F.covar_samp("l_extendedprice", "l_quantity"), 2).alias("price_qty_covar"),
        F.round(sample_skew, 4).alias("price_skew"),
        F.round(sample_kurt, 4).alias("price_kurt"),
        F.round(F.stddev_pop("l_discount"), 6).alias("disc_sd_pop"),
        F.round(F.var_samp("l_tax"), 6).alias("tax_var"),
    )


@register(
    "datetime_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)     AS month_start,
           CAST(extract(year FROM o_orderdate) AS INT)             AS yr,
           CAST(extract(quarter FROM o_orderdate) AS INT)          AS qtr,
           CAST(extract(doy FROM o_orderdate) AS INT)              AS doy,
           CAST(o_orderdate + INTERVAL 3 MONTH AS TIMESTAMP)       AS plus3m,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP)  AS month_end,
           CAST(date_diff('day', DATE '1995-01-01',
                          CAST(o_orderdate AS DATE)) AS INT)       AS days_since_95,
           CAST(extract(isoyear FROM o_orderdate) AS VARCHAR)
             || '-W' || lpad(CAST(weekofyear(o_orderdate) AS VARCHAR), 2, '0')
                                                                   AS year_week
    FROM orders
    """,
    survey="§2.7 extension: date/time function battery (trunc/extract/"
    "interval arithmetic/last_day/datediff/format) — generalizes F1-F3",
)
def datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.year("o_orderdate").cast("int").alias("yr"),
        F.quarter("o_orderdate").cast("int").alias("qtr"),
        F.dayofyear("o_orderdate").cast("int").alias("doy"),
        (F.col("o_orderdate") + F.expr("INTERVAL 3 MONTH")).alias("plus3m"),
        F.last_day(d).cast("timestamp").alias("month_end"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).cast("int").alias("days_since_95"),
        F.concat(
            F.expr("extract(YEAROFWEEK FROM o_orderdate)").cast("string"),
            F.lit("-W"),
            F.lpad(F.weekofyear("o_orderdate").cast("string"), 2, "0"),
        ).alias("year_week"),
    )


@register(
    "deterministic_sample",
    oracle=f"""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE {md5_long_sql("CAST(o_orderkey AS VARCHAR)", seed="sample")} % 20 = 0
    """,
    survey="§2.4 extension: deterministic hash sampling — the "
    "reproducible, engine-portable alternative to TABLESAMPLE "
    "(seeded RNG sampling differs per engine/partitioning); at 100 TB "
    "the same predicate prunes consistently across reruns and engines",
)
def deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vbb_data_pipeline_spark.functions.hashing import md5_long

    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        md5_long(F.col("o_orderkey").cast("string"), seed="sample") % 20 == 0
    ).select("o_orderkey", "o_custkey", "o_totalprice")


@register(
    "schema_evolution_union",
    oracle="""
    SELECT o_orderkey, o_totalprice, NULL AS o_clerk_note, 'v1' AS src
    FROM orders WHERE o_orderkey % 2 = 0
    UNION ALL BY NAME
    SELECT o_orderkey,
           o_totalprice,
           concat('note-', CAST(o_custkey AS VARCHAR)) AS o_clerk_note,
           'v2' AS src
    FROM orders WHERE o_orderkey % 2 = 1
    """,
    survey="§2.6 extension: union across evolving schemas "
    "(unionByName allowMissingColumns / UNION ALL BY NAME) — schema "
    "drift is the norm across months of landed data at 100 TB; "
    "missing columns fill with NULL instead of failing the read",
)
def schema_evolution_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    v1 = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_totalprice", F.lit("v1").alias("src")
    )
    v2 = o.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey",
        "o_totalprice",
        F.concat(F.lit("note-"), F.col("o_custkey").cast("string")).alias("o_clerk_note"),
        F.lit("v2").alias("src"),
    )
    return v1.unionByName(v2, allowMissingColumns=True)


@register(
    "dq_check_report",
    oracle="""
    WITH counts AS (
        SELECT
            count(*) FILTER (WHERE NOT (l_quantity BETWEEN 1 AND 50))   AS qty_range,
            count(*) FILTER (WHERE l_discount > 0.08)                   AS disc_cap,
            count(*) FILTER (WHERE l_shipdate IS NULL)                  AS ship_null,
            count(*) FILTER (WHERE l_extendedprice <= 0)                AS price_pos
        FROM lineitem
    )
    SELECT 'qty_range' AS rule, CAST(qty_range AS BIGINT) AS n_violations FROM counts
    UNION ALL
    SELECT 'disc_cap',  CAST(disc_cap  AS BIGINT) FROM counts
    UNION ALL
    SELECT 'ship_null', CAST(ship_null AS BIGINT) FROM counts
    UNION ALL
    SELECT 'price_pos', CAST(price_pos AS BIGINT) FROM counts
    """,
    survey="§1.3 constraint mapping: CHECK-style data-quality report "
    "(operators/quality.check_range row-filter twin) — one scan, "
    "conditional-count aggregates, stack to (rule, n_violations); "
    "the reference delegated these to Postgres CHECK constraints "
    "(05-create-schema.sh:154-155)",
)
def dq_check_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    counts = li.agg(
        F.count(F.when(~F.col("l_quantity").between(1, 50), 1)).alias("qty_range"),
        F.count(F.when(F.col("l_discount") > 0.08, 1)).alias("disc_cap"),
        F.count(F.when(F.col("l_shipdate").isNull(), 1)).alias("ship_null"),
        F.count(F.when(F.col("l_extendedprice") <= 0, 1)).alias("price_pos"),
    )
    return counts.selectExpr(
        "stack(4, 'qty_range', qty_range, 'disc_cap', disc_cap, "
        "'ship_null', ship_null, 'price_pos', price_pos) AS (rule, n_violations)"
    )
