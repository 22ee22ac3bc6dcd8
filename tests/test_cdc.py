"""CDC / incremental-load operators vs DuckDB oracles.

Two snapshots of the orders table are derived deterministically:
``old`` drops every 7th key; ``new`` drops every 5th key and bumps
o_totalprice on every 3rd key — so the diff exercises all three ops
(insert / update / delete) plus the unchanged bulk.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from vbb_data_pipeline_spark.operators.cdc import (
    HIGH_TS,
    latest_per_key,
    merge_upsert,
    scd2_apply,
    snapshot_diff,
)

SF = "/root/testdata/sf0.001"

OLD_SQL = f"""
SELECT o_orderkey, o_orderstatus, o_totalprice
FROM read_parquet('{SF}/orders.parquet') WHERE o_orderkey % 7 <> 0
"""
NEW_SQL = f"""
SELECT o_orderkey, o_orderstatus,
       CASE WHEN o_orderkey % 3 = 0 THEN round(o_totalprice + 100.0, 2)
            ELSE o_totalprice END AS o_totalprice
FROM read_parquet('{SF}/orders.parquet') WHERE o_orderkey % 5 <> 0
"""


@pytest.fixture(scope="module")
def oracle():
    return duckdb.connect()


def _old(spark):
    return (
        spark.read.parquet(f"{SF}/orders.parquet")
        .filter(F.col("o_orderkey") % 7 != 0)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )


def _new(spark):
    return (
        spark.read.parquet(f"{SF}/orders.parquet")
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


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


def test_snapshot_diff_matches_raw_comparison(spark, oracle):
    got = snapshot_diff(
        _old(spark),
        _new(spark),
        ["o_orderkey"],
        ["o_orderstatus", "o_totalprice"],
    ).toPandas()
    # Oracle compares RAW columns (no hash) — cross-checks the digest.
    exp = oracle.sql(
        f"""
        WITH o AS ({OLD_SQL}), n AS ({NEW_SQL})
        SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
               CASE WHEN o.o_orderkey IS NULL THEN 'insert'
                    WHEN n.o_orderkey IS NULL THEN 'delete'
                    WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                      OR o.o_totalprice IS DISTINCT FROM n.o_totalprice
                    THEN 'update' END AS op
        FROM o FULL OUTER JOIN n USING (o_orderkey)
        WHERE op IS NOT NULL
        """
    ).df()
    assert len(got) > 0
    assert set(got["op"]) == {"insert", "update", "delete"}
    pd.testing.assert_frame_equal(_sorted(got), _sorted(exp), check_dtype=False)


def test_snapshot_diff_null_vs_empty_string(spark):
    old = spark.createDataFrame([(1, None), (2, "x")], "k int, v string")
    new = spark.createDataFrame([(1, ""), (2, "x")], "k int, v string")
    got = snapshot_diff(old, new, ["k"], ["v"]).toPandas()
    assert got.to_records(index=False).tolist() == [(1, "update")]


def test_merge_upsert_matches_oracle(spark, oracle):
    got = merge_upsert(_old(spark), _new(spark), ["o_orderkey"]).toPandas()
    exp = oracle.sql(
        f"""
        WITH o AS ({OLD_SQL}), n AS ({NEW_SQL})
        SELECT * FROM n
        UNION ALL
        SELECT o.* FROM o ANTI JOIN n USING (o_orderkey)
        """
    ).df()
    pd.testing.assert_frame_equal(_sorted(got), _sorted(exp), check_dtype=False)
    # Merging the same updates again changes nothing (idempotent).
    again = merge_upsert(
        merge_upsert(_old(spark), _new(spark), ["o_orderkey"]),
        _new(spark),
        ["o_orderkey"],
    ).toPandas()
    pd.testing.assert_frame_equal(_sorted(again), _sorted(got), check_dtype=False)


def test_latest_per_key_matches_oracle(spark, oracle):
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "user_id", "ts", "event_type", "value"
    )
    got = latest_per_key(ev, ["user_id"], "ts").toPandas()
    # The operator tie-breaks equal timestamps by payload digest; the
    # fixture has unique (user_id, ts) so argmax-by-ts is well-defined.
    dups = oracle.sql(
        f"""
        SELECT user_id, ts FROM read_parquet('{SF}/events.parquet')
        GROUP BY 1, 2 HAVING count(*) > 1
        """
    ).df()
    assert len(dups) == 0, "fixture assumption broken"
    exp = oracle.sql(
        f"""
        SELECT user_id, ts, event_type, value
        FROM (SELECT user_id, ts, event_type, value,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY ts DESC) AS rn
              FROM read_parquet('{SF}/events.parquet'))
        WHERE rn = 1
        """
    ).df()
    pd.testing.assert_frame_equal(_sorted(got), _sorted(exp), check_dtype=False)


SCD_ATTRS = ["o_orderstatus", "o_totalprice"]


def _scd_oracle_sql() -> str:
    """DuckDB twin of scd2_apply(dim0, new, as_of='2024-02-01')
    where dim0 = old snapshot opened at 2024-01-01."""
    return f"""
    WITH o AS ({OLD_SQL}), n AS ({NEW_SQL}),
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
    SELECT o.*, TIMESTAMP '2024-01-01' AS valid_from,
           TIMESTAMP '2024-02-01' AS valid_to
    FROM o SEMI JOIN (SELECT * FROM diff WHERE op IN ('update','delete'))
      USING (o_orderkey)
    UNION ALL
    SELECT o.*, TIMESTAMP '2024-01-01', TIMESTAMP '{HIGH_TS}'
    FROM o ANTI JOIN (SELECT * FROM diff WHERE op IN ('update','delete'))
      USING (o_orderkey)
    UNION ALL
    SELECT n.*, TIMESTAMP '2024-02-01', TIMESTAMP '{HIGH_TS}'
    FROM n SEMI JOIN (SELECT * FROM diff WHERE op IN ('update','insert'))
      USING (o_orderkey)
    """


def test_scd2_apply_matches_oracle(spark, oracle):
    dim0 = (
        _old(spark)
        .withColumn("valid_from", F.to_timestamp(F.lit("2024-01-01")))
        .withColumn("valid_to", F.to_timestamp(F.lit(HIGH_TS)))
    )
    dim1 = scd2_apply(
        dim0, _new(spark), ["o_orderkey"], SCD_ATTRS, "2024-02-01"
    )
    got = dim1.toPandas()
    exp = oracle.sql(_scd_oracle_sql()).df()
    pd.testing.assert_frame_equal(_sorted(got), _sorted(exp), check_dtype=False)

    # Idempotency: folding the SAME snapshot in again is a no-op.
    dim2 = scd2_apply(
        dim1, _new(spark), ["o_orderkey"], SCD_ATTRS, "2024-03-01"
    ).toPandas()
    pd.testing.assert_frame_equal(_sorted(dim2), _sorted(got), check_dtype=False)

    # Every key's intervals: at most one open row, no overlap.
    open_rows = got[got["valid_to"] == pd.Timestamp(HIGH_TS)]
    assert open_rows["o_orderkey"].is_unique


def test_scd2_key_reappears(spark):
    """delete then re-insert opens a fresh interval."""
    dim0 = spark.createDataFrame(
        [(1, "a", "2024-01-01", HIGH_TS)], "k int, v string, f string, t string"
    ).select(
        "k", "v",
        F.to_timestamp("f").alias("valid_from"),
        F.to_timestamp("t").alias("valid_to"),
    )
    gone = spark.createDataFrame([], "k int, v string")
    dim1 = scd2_apply(dim0, gone, ["k"], ["v"], "2024-02-01")
    back = spark.createDataFrame([(1, "b")], "k int, v string")
    dim2 = scd2_apply(dim1, back, ["k"], ["v"], "2024-03-01").toPandas()
    rows = _sorted(dim2).to_records(index=False).tolist()
    assert len(rows) == 2
    closed = dim2[dim2["valid_to"] != pd.Timestamp(HIGH_TS)]
    assert closed["v"].tolist() == ["a"]
    current = dim2[dim2["valid_to"] == pd.Timestamp(HIGH_TS)]
    assert current["v"].tolist() == ["b"]
    assert current["valid_from"].tolist() == [pd.Timestamp("2024-03-01")]


def test_scd2_null_key_rows(spark):
    """NULL-key rows flow through close/open like any other key
    (ADVICE r3 medium: the semi/anti joins must be eqNullSafe — with
    plain `==` a changed NULL-key row stays open with stale attributes
    and an inserted NULL-key row is silently dropped)."""
    dim0 = spark.createDataFrame(
        [(None, "stale"), (1, "keep")], "k int, v string"
    ).select(
        "k", "v",
        F.to_timestamp(F.lit("2024-01-01")).alias("valid_from"),
        F.to_timestamp(F.lit(HIGH_TS)).alias("valid_to"),
    )
    snap = spark.createDataFrame([(None, "fresh"), (1, "keep")], "k int, v string")
    dim1 = scd2_apply(dim0, snap, ["k"], ["v"], "2024-02-01").toPandas()
    nulls = dim1[dim1["k"].isna()]
    # changed NULL-key row: one closed (stale) + one opened (fresh)
    assert sorted(nulls["v"].tolist()) == ["fresh", "stale"]
    closed = nulls[nulls["valid_to"] != pd.Timestamp(HIGH_TS)]
    assert closed["v"].tolist() == ["stale"]
    # untouched non-null key: single open row, original valid_from
    keeps = dim1[dim1["k"] == 1]
    assert len(keeps) == 1
    assert keeps["valid_to"].tolist() == [pd.Timestamp(HIGH_TS)]
    assert keeps["valid_from"].tolist() == [pd.Timestamp("2024-01-01")]

    # brand-new NULL key opens a row
    dim0b = spark.createDataFrame([(1, "x")], "k int, v string").select(
        "k", "v",
        F.to_timestamp(F.lit("2024-01-01")).alias("valid_from"),
        F.to_timestamp(F.lit(HIGH_TS)).alias("valid_to"),
    )
    snapb = spark.createDataFrame([(1, "x"), (None, "new")], "k int, v string")
    dim1b = scd2_apply(dim0b, snapb, ["k"], ["v"], "2024-02-01").toPandas()
    assert len(dim1b) == 2
    assert sorted(dim1b["v"].tolist()) == ["new", "x"]
    # deleted NULL key closes
    dim2b = scd2_apply(
        spark.createDataFrame(
            [(1, "x", "2024-01-01", HIGH_TS), (None, "y", "2024-01-01", HIGH_TS)],
            "k int, v string, f string, t string",
        ).select(
            "k", "v",
            F.to_timestamp("f").alias("valid_from"),
            F.to_timestamp("t").alias("valid_to"),
        ),
        spark.createDataFrame([(1, "x")], "k int, v string"),
        ["k"], ["v"], "2024-02-01",
    ).toPandas()
    closed_null = dim2b[dim2b["k"].isna()]
    assert closed_null["valid_to"].tolist() == [pd.Timestamp("2024-02-01")]


def test_snapshot_diff_128bit_matches_duckdb_construction(spark, oracle):
    """digest_bits=128 (two-half md5 struct, for >10^8-row tables where
    a 64-bit digest's birthday bound bites) must agree with DuckDB
    replaying the identical construction AND with the 64-bit path's ops
    on the same fixture."""
    got = snapshot_diff(
        _old(spark), _new(spark),
        ["o_orderkey"], ["o_orderstatus", "o_totalprice"],
        digest_bits=128,
    ).toPandas()
    # same ops as the raw-column oracle (reuses the 64-bit test's SQL)
    exp = oracle.sql(
        f"""
        WITH o AS ({OLD_SQL}), n AS ({NEW_SQL})
        SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
               CASE WHEN o.o_orderkey IS NULL THEN 'insert'
                    WHEN n.o_orderkey IS NULL THEN 'delete'
                    WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                      OR o.o_totalprice IS DISTINCT FROM n.o_totalprice
                    THEN 'update' END AS op
        FROM o FULL OUTER JOIN n USING (o_orderkey)
        WHERE op IS NOT NULL
        """
    ).df()
    pd.testing.assert_frame_equal(_sorted(got), _sorted(exp), check_dtype=False)

    # the struct digest itself twins DuckDB's two-half construction
    from vbb_data_pipeline_spark.functions.hashing import md5_long_pair_sql
    from vbb_data_pipeline_spark.operators.cdc import _row_bytes, _row_hash

    enc_sql = (
        "concat("
        "CASE WHEN CAST(o_orderstatus AS VARCHAR) IS NULL THEN 'n:' "
        "ELSE concat(CAST(length(CAST(o_orderstatus AS VARCHAR)) AS VARCHAR)"
        ", ':', CAST(o_orderstatus AS VARCHAR)) END, "
        "CASE WHEN CAST(o_totalprice AS VARCHAR) IS NULL THEN 'n:' "
        "ELSE concat(CAST(length(CAST(o_totalprice AS VARCHAR)) AS VARCHAR)"
        ", ':', CAST(o_totalprice AS VARCHAR)) END)"
    )
    h1_sql, h2_sql = md5_long_pair_sql(enc_sql)
    exp_h = oracle.sql(
        f"WITH o AS ({OLD_SQL}) SELECT o_orderkey, {h1_sql} AS h1,"
        f" {h2_sql} AS h2 FROM o"
    ).df()
    got_h = (
        _old(spark)
        .select(
            "o_orderkey",
            _row_hash(["o_orderstatus", "o_totalprice"], 128).alias("_h"),
        )
        .select("o_orderkey", "_h.h1", "_h.h2")
        .toPandas()
    )
    pd.testing.assert_frame_equal(
        _sorted(got_h), _sorted(exp_h), check_dtype=False
    )


def test_scd2_digest_bits_parity(spark):
    """64- and 128-bit modes produce identical dimensions at test scale."""
    dim0 = (
        _old(spark)
        .withColumn("valid_from", F.to_timestamp(F.lit("2024-01-01")))
        .withColumn("valid_to", F.to_timestamp(F.lit(HIGH_TS)))
    )
    a = scd2_apply(
        dim0, _new(spark), ["o_orderkey"], SCD_ATTRS, "2024-02-01"
    ).toPandas()
    b = scd2_apply(
        dim0, _new(spark), ["o_orderkey"], SCD_ATTRS, "2024-02-01",
        digest_bits=128,
    ).toPandas()
    pd.testing.assert_frame_equal(_sorted(a), _sorted(b), check_dtype=False)
