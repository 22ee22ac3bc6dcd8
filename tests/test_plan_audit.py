"""Repo-wide physical-plan invariants over EVERY registry entry
(tools/plan_audit.py is the reporting twin; this is the gate):

* zero CartesianProduct anywhere — a cartesian in any entry is a
  100 TB outage, not a slow query;
* zero row-at-a-time Python (BatchEvalPython) — Python only as
  Arrow-batched stages;
* Arrow-batched stages only in entries on the documented allowlist;
* BroadcastNestedLoopJoin only where a broadcast single-row /
  query-set cross join is the intended shape (documented allowlist).
"""

from __future__ import annotations

import pytest

from vbb_data_pipeline_spark.queries import all_queries

SF = "/root/testdata/sf0.001"

# Arrow-batched Python stages: entries where a pandas_udf/mapInPandas
# stage is the documented design (justifications in PLANS.md).
ARROW_OK = {
    "multimodal_decode",
    "sim_ann_battery",
    "sim_pq_battery",
    "sim_embedding_neardup",
    "dedup_pairs_battery",
    "text_doc_profile",
}

# BroadcastNestedLoopJoin: entries whose plan intentionally crosses a
# broadcast single-row aggregate (global total / stats) or a tiny
# broadcast query set against a big side — the classic scalar
# decorrelation shape, not an accidental cartesian.
BNLJ_OK = {
    "q10_q13_q15_q22_customer_battery",  # q22 broadcast global average
    "subquery_battery",  # q11 broadcast single-row total
    "sim_ann_battery",  # broadcast query-vector set
    "sim_pq_battery",  # broadcast codebook/query set
    "sim_embedding_neardup",
    "tokens_retrieval_battery",  # broadcast corpus stats row
    "stats_approx_battery",
}


@pytest.fixture(scope="module")
def reg():
    return all_queries()


@pytest.mark.parametrize("name", sorted(all_queries()))
def test_entry_plan_hygiene(spark, reg, name):
    df = reg[name].fn(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, name
    assert "BatchEvalPython" not in plan, name
    has_arrow = (
        "ArrowEvalPython" in plan
        or "MapInPandas" in plan
        or "FlatMapGroupsInPandas" in plan
    )
    if has_arrow:
        assert name in ARROW_OK, (
            f"{name} grew an Arrow Python stage outside the allowlist — "
            "either make it native or document the justification in "
            "PLANS.md + this allowlist"
        )
    if "BroadcastNestedLoopJoin" in plan:
        assert name in BNLJ_OK, (
            f"{name} grew a BroadcastNestedLoopJoin outside the "
            "allowlist — verify the broadcast side is O(1)/query-set "
            "sized, then document it"
        )
