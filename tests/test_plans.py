"""Physical-plan hygiene (the 100 TB posture, SURVEY.md §7): filters
pushed to the parquet scan, dims broadcast, geo/similarity expressions
codegen-native, bounded shuffle counts."""

from __future__ import annotations

import pytest

from vbb_data_pipeline_spark.plans import (
    assert_broadcast_join,
    assert_pushed_filter,
    count_exchanges,
    formatted,
)
from vbb_data_pipeline_spark.queries import all_queries

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def reg():
    return all_queries()


def test_p3_filter_pushdown(spark, reg):
    df = reg["p3_range_filter"].fn(spark, SF)
    assert_pushed_filter(df, "o_orderdate")


def test_j1_broadcasts_all_dims(spark, reg):
    df = reg["j1_dim_join_agg"].fn(spark, SF)
    assert_broadcast_join(df, min_count=3)
    # fact side aggregates after broadcast joins: exactly one shuffle
    # (the final groupBy) plus AQE reads — no join shuffles
    assert count_exchanges(df) <= 2


def test_q1_single_shuffle(spark, reg):
    df = reg["q1_pricing_summary"].fn(spark, SF)
    # partial agg → exchange → final agg: exactly one exchange
    assert count_exchanges(df) == 1


def test_column_pruning_reaches_scan(spark, reg):
    """A 3-column projection must not read the full lineitem schema."""
    df = reg["p3_range_filter"].fn(spark, SF)
    plan = formatted(df)
    scan_lines = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert scan_lines, plan
    assert "o_orderkey" in scan_lines[0]
    assert "o_orderpriority" not in scan_lines[0]  # pruned


def test_flagship_no_python_eval(spark, reg):
    df = reg["flagship_expand_events"].fn(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan


def test_dedup_minhash_bounded_exchanges(spark, reg):
    """MinHash+LSH pipeline: explode→agg→band-join→semi-join→re-rank —
    shuffle count must stay bounded (no accidental cartesian/resort
    cascades). The plan re-states the persisted candidate lineage, so
    the static count is generous; the runtime executes it once."""
    df = reg["dedup_minhash_lsh"].fn(spark, SF)
    assert count_exchanges(df) <= 16
