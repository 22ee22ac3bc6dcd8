"""Repo-wide physical-plan invariants over EVERY registry entry
(tools/plan_audit.py is the reporting twin; this is the gate):

* zero CartesianProduct anywhere — a cartesian in any entry is a
  100 TB outage, not a slow query;
* zero row-at-a-time Python (BatchEvalPython) — Python only as
  Arrow-batched stages;
* Arrow-batched stages only in entries on the documented allowlist;
* BroadcastNestedLoopJoin only where a broadcast single-row /
  query-set cross join is the intended shape (documented allowlist).

Since r6 the gate audits the OUT-OF-BAND plans too (plans/capture.py):
streaming legs' last micro-batch execution and every frame an entry
eagerly localCheckpoints — the r5 blind spot where `stream_*` and
`graph_cc_pagerank` rows read all-zero because the audit only saw the
post-sink / post-checkpoint frame. test_capture_sees_streaming_join
proves the mechanism catches a join shape INSIDE a micro-batch.
"""

from __future__ import annotations

import pytest

from vbb_data_pipeline_spark.plans import capture
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
    "text_profile_battery",
    # custom stateful streaming operator: the micro-batch plan
    # (captured since r6) contains FlatMapGroupsInPandasWithState by
    # design — applyInPandasWithState IS the operator
    "stream_state_battery",
    # CC edges come from the LSH candidate pipeline whose n-gram
    # Jaccard verify is the same allowlisted Arrow stage as
    # dedup_pairs_battery; it surfaces here via pre-checkpoint capture
    "graph_cc_pagerank",
    # WARC framing / gzip member decompression / HTML extraction are
    # binary formats, not SQL: one archive-build applyInPandas + one
    # parse mapInPandas + the extract pandas_udf
    "crawl_warc_roundtrip",
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
    # pagerank's per-round dangling-mass term: a SINGLE-ROW aggregate
    # crossed into every node's rank update (visible since r6 via
    # pre-checkpoint capture of the iteration rounds)
    "graph_cc_pagerank",
    # ivf_assign's broadcast-centroid cross join (16 pinned cells) —
    # the same bounded-broadcast shape as sim_ann_battery's ivf leg
    # r7 fold: the semdedup probe (ivf_assign broadcast-centroid
    # cross join, 16 pinned cells) now rides the combined probe entry
    "dedup_incremental_probe",
}


@pytest.fixture(scope="module")
def reg():
    return all_queries()


@pytest.fixture(scope="module", autouse=True)
def _capture_on():
    capture.enable()
    yield
    capture.disable()


@pytest.mark.parametrize("name", sorted(all_queries()))
def test_entry_plan_hygiene(spark, reg, name):
    capture.drain()  # clear anything a previous entry left behind
    df = reg[name].fn(spark, SF)
    captured = capture.drain()
    plans = [
        ("final", df._jdf.queryExecution().executedPlan().toString())
    ] + captured
    for label, plan in plans:
        assert "CartesianProduct" not in plan, (name, label)
        assert "BatchEvalPython" not in plan, (name, label)
        has_arrow = (
            "ArrowEvalPython" in plan
            or "MapInPandas" in plan
            or "FlatMapGroupsInPandas" in plan
        )
        if has_arrow:
            assert name in ARROW_OK, (
                f"{name} grew an Arrow Python stage outside the allowlist "
                f"(in its {label} plan) — either make it native or document "
                "the justification in PLANS.md + this allowlist"
            )
        if "BroadcastNestedLoopJoin" in plan:
            assert name in BNLJ_OK, (
                f"{name} grew a BroadcastNestedLoopJoin outside the "
                f"allowlist (in its {label} plan) — verify the broadcast "
                "side is O(1)/query-set sized, then document it"
            )


def test_capture_sees_streaming_join(spark, tmp_path):
    """The r5 audit saw only the memory-sink scan of a streaming entry
    (0 exchanges / 0 scans) — a cartesian INSIDE a micro-batch was
    invisible. Inject a stream-static join with a non-equi condition
    (planned as BroadcastNestedLoopJoin, the cartesian family) and
    assert the captured micro-batch plan exposes it."""
    from pyspark.sql import functions as F

    from vbb_data_pipeline_spark.streaming.windows import run_to_memory

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(i, i * 10) for i in range(20)], "id long, v long"
    ).write.parquet(src)
    stream = spark.readStream.schema("id long, v long").parquet(src)
    static = spark.createDataFrame([(0, 5), (5, 15)], "lo long, hi long")
    bad = stream.join(
        F.broadcast(static),
        (F.col("id") >= F.col("lo")) & (F.col("id") < F.col("hi")),
    )
    capture.drain()
    run_to_memory(bad, "audit_probe_bnlj", output_mode="append")
    captured = capture.drain()
    assert captured, "streaming micro-batch plan was not captured"
    joined = "\n".join(p for _, p in captured)
    assert (
        "BroadcastNestedLoopJoin" in joined or "CartesianProduct" in joined
    ), "the injected non-equi join shape is invisible to the audit"


def test_capture_sees_pre_checkpoint_plan(spark):
    """An eager localCheckpoint truncates lineage; the gate must see
    the plan that EXECUTED, not the truncated scan."""
    from pyspark.sql import functions as F

    a = spark.range(100).withColumn("k", F.col("id") % 7)
    agg = a.groupBy("k").count()
    capture.drain()
    agg.localCheckpoint(eager=True)
    captured = capture.drain()
    assert captured
    assert any("count" in p.lower() for _, p in captured)
