"""CDC / SCD2 query for the correctness gate (operators/cdc.py).

The reference's load path only ever detects NEW runs
(``database_loader/operators.py:68-90`` anti-join;
``utils/__init__.py:55-56`` conflict-ignoring upserts) — incremental
reconciliation of CHANGED rows is the extension a lakehouse pipeline
needs. This query derives two deterministic snapshots of ``orders``
(old: drop every 7th key; new: drop every 5th key, bump price on
every 3rd), opens the old one as an SCD2 dimension at 2024-01-01 and
folds the new one in at 2024-02-01 — exercising snapshot_diff
(insert/update/delete classification over key+digest exchanges) and
scd2_apply (close/open/pass-through) in one oracle-checked result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vbb_data_pipeline_spark.operators.cdc import HIGH_TS, scd2_apply
from vbb_data_pipeline_spark.queries import load_table, register
from vbb_data_pipeline_spark.queries.misc_q import (
    SCHEMA_EVO_ORACLE,
    schema_evolution_union,
)

_T0 = "2024-01-01 00:00:00"
_T1 = "2024-02-01 00:00:00"

_OLD_SQL = """
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders WHERE o_orderkey % 7 <> 0
"""
_NEW_SQL = """
    SELECT o_orderkey, o_orderstatus,
           CASE WHEN o_orderkey % 3 = 0 THEN round(o_totalprice + 100.0, 2)
                ELSE o_totalprice END AS o_totalprice
    FROM orders WHERE o_orderkey % 5 <> 0
"""


def _old(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 7 != 0)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )


def _new(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 5 != 0)
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.when(
                F.col("o_orderkey") % 3 == 0,
                F.round(F.col("o_totalprice") + 100.0, 2),
            )
            .otherwise(F.col("o_totalprice"))
            .alias("o_totalprice"),
        )
    )


_CDC_ORACLE = f"""
    WITH o AS ({_OLD_SQL}), n AS ({_NEW_SQL}),
    diff AS (
        SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
               CASE WHEN o.o_orderkey IS NULL THEN 'insert'
                    WHEN n.o_orderkey IS NULL THEN 'delete'
                    WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                      OR o.o_totalprice IS DISTINCT FROM n.o_totalprice
                    THEN 'update' END AS op
        FROM o FULL OUTER JOIN n USING (o_orderkey)
        WHERE op IS NOT NULL
    )
    SELECT o.*, TIMESTAMP '{_T0}' AS valid_from,
           TIMESTAMP '{_T1}' AS valid_to
    FROM o SEMI JOIN (SELECT * FROM diff WHERE op IN ('update','delete'))
      USING (o_orderkey)
    UNION ALL
    SELECT o.*, TIMESTAMP '{_T0}', TIMESTAMP '{HIGH_TS}'
    FROM o ANTI JOIN (SELECT * FROM diff WHERE op IN ('update','delete'))
      USING (o_orderkey)
    UNION ALL
    SELECT n.*, TIMESTAMP '{_T1}', TIMESTAMP '{HIGH_TS}'
    FROM n SEMI JOIN (SELECT * FROM diff WHERE op IN ('update','insert'))
      USING (o_orderkey)
    """


def cdc_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    dim0 = (
        _old(spark, sf_dir)
        .withColumn("valid_from", F.to_timestamp(F.lit(_T0)))
        .withColumn("valid_to", F.to_timestamp(F.lit(HIGH_TS)))
    )
    return scd2_apply(
        dim0,
        _new(spark, sf_dir),
        ["o_orderkey"],
        ["o_orderstatus", "o_totalprice"],
        _T1,
    )


@register(
    "orders_evolution_battery",
    oracle=f"""
    SELECT 'scd2' AS variant, t.o_orderkey, t.o_totalprice,
           t.o_orderstatus AS attr, CAST(NULL AS VARCHAR) AS note,
           t.valid_from AS ts1, t.valid_to AS ts2
    FROM ({_CDC_ORACLE}) t
    UNION ALL
    SELECT 'schema_evolution', t.o_orderkey, t.o_totalprice,
           t.src, t.o_clerk_note,
           CAST(NULL AS TIMESTAMP), CAST(NULL AS TIMESTAMP)
    FROM ({SCHEMA_EVO_ORACLE}) t
    """,
    survey="§2.1 S8/J2-J3 extension + §2.6 extension (folded r5 so "
    "both legs keep a driver CORRECTNESS row) — [scd2] CDC snapshot "
    "diff + SCD type-2 fold (operators/cdc.snapshot_diff + "
    "scd2_apply): the incremental-reconciliation leg the reference's "
    "append-only load lacks; exchanges carry keys + 8-byte digests, "
    "never wide rows; [schema_evolution] union across evolving "
    "schemas (unionByName allowMissingColumns / UNION ALL BY NAME) — "
    "schema drift is the norm across months of landed data at "
    "100 TB; missing columns fill with NULL instead of failing the "
    "read",
    note="the scd2 oracle replays the fold as raw-column comparisons "
    "(no digest), cross-checking the md5 row-hash path end-to-end",
)
def orders_evolution_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    scd = cdc_scd2(spark, sf_dir).select(
        F.lit("scd2").alias("variant"),
        "o_orderkey",
        "o_totalprice",
        F.col("o_orderstatus").alias("attr"),
        F.lit(None).cast("string").alias("note"),
        F.col("valid_from").alias("ts1"),
        F.col("valid_to").alias("ts2"),
    )
    evo = schema_evolution_union(spark, sf_dir).select(
        F.lit("schema_evolution").alias("variant"),
        "o_orderkey",
        "o_totalprice",
        F.col("src").alias("attr"),
        F.col("o_clerk_note").alias("note"),
        F.lit(None).cast("timestamp").alias("ts1"),
        F.lit(None).cast("timestamp").alias("ts2"),
    )
    return scd.unionByName(evo)
