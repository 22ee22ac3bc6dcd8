"""As-of join vs pandas merge_asof (independent implementation)."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F

from vbb_data_pipeline_spark.operators.temporal import asof_join


def _t(m):
    return dt.datetime(2024, 1, 1, 0, m)


def test_asof_matches_pandas(spark):
    left_rows = [(i, _t(m), k) for i, (m, k) in enumerate(
        [(0, "a"), (5, "a"), (10, "a"), (3, "b"), (9, "b"), (1, "c")]
    )]
    right_rows = [
        (_t(2), "a", 1.0),
        (_t(5), "a", 2.0),   # equal-ts: inclusive match for left @5
        (_t(8), "a", 3.0),
        (_t(4), "b", 4.0),
    ]
    left = spark.createDataFrame(left_rows, "id long, ts timestamp, k string")
    right = spark.createDataFrame(right_rows, "ts timestamp, k string, v double")

    out = asof_join(left, right, on=["k"], left_ts="ts", right_ts="ts", right_cols=["v"])
    got = {r.id: r.v for r in out.collect()}

    lp = pd.DataFrame(left_rows, columns=["id", "ts", "k"]).sort_values("ts")
    rp = pd.DataFrame(right_rows, columns=["ts", "k", "v"]).sort_values("ts")
    exp_df = pd.merge_asof(lp, rp, on="ts", by="k", direction="backward")
    exp = {
        int(r.id): (None if pd.isna(r.v) else float(r.v))
        for r in exp_df.itertuples()
    }
    assert got == exp
    # left row count preserved
    assert out.count() == len(left_rows)


def test_asof_null_payload_not_backfilled(spark):
    """A NULL payload on the matched right row must surface as NULL —
    not be backfilled from an older right row (column-mixing bug)."""
    left = spark.createDataFrame(
        [(1, _t(6), "a"), (2, _t(3), "a")], "id long, ts timestamp, k string"
    )
    right = spark.createDataFrame(
        [(_t(2), "a", 1.0, "x"), (_t(5), "a", None, "y")],
        "ts timestamp, k string, v double, tag string",
    )
    out = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts",
        right_cols=["v", "tag"],
    )
    got = {r.id: (r.v, r.tag) for r in out.collect()}
    # left@6 matches right@5 verbatim: v=NULL, tag='y' (same source row)
    assert got[1] == (None, "y")
    assert got[2] == (1.0, "x")


def test_asof_forward_null_payload(spark):
    left = spark.createDataFrame([(1, _t(1), "a")], "id long, ts timestamp, k string")
    right = spark.createDataFrame(
        [(_t(2), "a", None, "y"), (_t(4), "a", 9.0, "z")],
        "ts timestamp, k string, v double, tag string",
    )
    out = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts",
        right_cols=["v", "tag"], direction="forward",
    )
    row = out.collect()[0]
    assert (row.v, row.tag) == (None, "y")


def test_asof_single_shuffle_no_python(spark):
    left = spark.createDataFrame([(1, _t(1), "a")], "id long, ts timestamp, k string")
    right = spark.createDataFrame([(_t(0), "a", 1.0)], "ts timestamp, k string, v double")
    j = asof_join(left, right, ["k"], "ts", "ts", ["v"])
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan  # no Python in the hot path


# ---------------------------------------------------------------------------
# Property-based: random (key, ts, nullable payload) vs pandas merge_asof
# ---------------------------------------------------------------------------
import hypothesis.strategies as st
from hypothesis import HealthCheck, given, settings


@st.composite
def _asof_case(draw):
    keys = ["a", "b", "c"]
    n_left = draw(st.integers(1, 12))
    n_right = draw(st.integers(0, 10))
    left = [
        (i, _t(draw(st.integers(0, 30))), draw(st.sampled_from(keys)))
        for i in range(n_left)
    ]
    # unique (key, ts) on the right — asof_join's documented contract
    right_keys = draw(
        st.sets(
            st.tuples(st.integers(0, 30), st.sampled_from(keys)),
            max_size=n_right,
        )
    )
    right = [
        (_t(m), k, draw(st.one_of(st.none(), st.floats(-5, 5, allow_nan=False))))
        for m, k in sorted(right_keys)
    ]
    return left, right


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(_asof_case())
def test_asof_property_backward(shared_spark_holder, case):
    spark = shared_spark_holder
    left_rows, right_rows = case
    left = spark.createDataFrame(left_rows, "id long, ts timestamp, k string")
    right = spark.createDataFrame(
        right_rows, "ts timestamp, k string, v double"
    ) if right_rows else spark.createDataFrame([], "ts timestamp, k string, v double")

    out = asof_join(left, right, on=["k"], left_ts="ts", right_ts="ts", right_cols=["v"])
    got = {r.id: (None if r.v is None else round(r.v, 9)) for r in out.collect()}

    lp = pd.DataFrame(left_rows, columns=["id", "ts", "k"]).sort_values(["ts", "id"])
    rp = pd.DataFrame(right_rows, columns=["ts", "k", "v"]).sort_values("ts")
    if rp.empty:
        exp = {int(r.id): None for r in lp.itertuples()}
    else:
        m = pd.merge_asof(lp, rp, on="ts", by="k", direction="backward")
        exp = {
            int(r.id): (None if pd.isna(r.v) else round(float(r.v), 9))
            for r in m.itertuples()
        }
    assert got == exp
