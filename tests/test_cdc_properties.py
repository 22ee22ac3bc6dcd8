"""Property tests for the CDC operators (hypothesis): the digest path
must agree with a naive Python diff on ANY value content — including
control characters, former separator/sentinel strings, NULLs in keys
and values — and SCD2 folding must be idempotent.

One shared SparkSession job per example would be slow; examples are
kept small and deadlines disabled (Spark latency ≫ hypothesis
defaults).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from vbb_data_pipeline_spark.operators.cdc import scd2_apply, snapshot_diff

# Adversarial value alphabet: the old separator (\x1f), the old NULL
# sentinel, length-prefix lookalikes, empty strings.
VALUES = st.one_of(
    st.none(),
    st.sampled_from(
        ["", "\x1f", "\x00null", "a\x1fb", "1:a", "n:", "0:", "x"]
    ),
    st.text(alphabet="ab\x1f:0n", max_size=4),
)

# Keys include None: the SCD2/diff NULL-key path (eqNullSafe joins)
# must behave exactly like any other key value.
KEYS = st.one_of(st.none(), st.integers(min_value=0, max_value=7))
ROWS = st.dictionaries(KEYS, VALUES, max_size=6)


def _df(spark, d: dict[int, str | None]):
    data = [(k, v) for k, v in d.items()]
    return spark.createDataFrame(data, "k bigint, v string")


def _expected_diff(old: dict, new: dict) -> set[tuple[int, str]]:
    out = set()
    for k in old.keys() | new.keys():
        if k not in old:
            out.add((k, "insert"))
        elif k not in new:
            out.add((k, "delete"))
        elif old[k] != new[k]:
            out.add((k, "update"))
    return out


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(old=ROWS, new=ROWS)
def test_snapshot_diff_matches_python_semantics(spark, old, new):
    got = {
        (r.k, r.op)
        for r in snapshot_diff(
            _df(spark, old), _df(spark, new), ["k"], ["v"]
        ).collect()
    }
    assert got == _expected_diff(old, new)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(old=ROWS, new=ROWS)
def test_scd2_idempotent_and_single_open_row(spark, old, new):
    from pyspark.sql import functions as F

    from vbb_data_pipeline_spark.operators.cdc import HIGH_TS

    dim0 = (
        _df(spark, old)
        .withColumn("valid_from", F.to_timestamp(F.lit("2024-01-01")))
        .withColumn("valid_to", F.to_timestamp(F.lit(HIGH_TS)))
    )
    def key(r):
        # None keys sort first (mixed None/int is unorderable in py3)
        return (r.k is None, r.k or 0, str(r.valid_from), str(r.valid_to))

    dim1 = scd2_apply(dim0, _df(spark, new), ["k"], ["v"], "2024-02-01")
    rows1 = sorted(dim1.collect(), key=key)
    # folding the same snapshot again is a no-op
    dim2 = scd2_apply(dim1, _df(spark, new), ["k"], ["v"], "2024-03-01")
    rows2 = sorted(dim2.collect(), key=key)
    assert [r.asDict() for r in rows1] == [r.asDict() for r in rows2]
    # at most one open row per key, and open rows mirror the snapshot
    import datetime

    high = datetime.datetime(2200, 1, 1)
    open_rows = {r.k: r.v for r in rows1 if r.valid_to == high}
    assert len(open_rows) == len([r for r in rows1 if r.valid_to == high])
    assert open_rows == new
