"""PageRank vs a pure-Python power-iteration oracle (identical
construction, identical arithmetic order not required — compared at
rounded precision)."""

from __future__ import annotations

import pytest

from vbb_data_pipeline_spark.operators.graph import pagerank

EDGES = [
    ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
    ("d", "c"),  # d has in-degree 0
    ("e", "e"),  # self-loop
    # f: dangling (in-edges only)
    ("a", "f"),
]


def _python_pagerank(edges, iters=10, d=0.85):
    nodes = sorted({x for e in edges for x in e})
    n = len(nodes)
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        dangling = sum(r for v, r in rank.items() if v not in out)
        new = {v: (1 - d) / n + d * dangling / n for v in nodes}
        for s, t in edges:
            new[t] += d * rank[s] / out[s]
        rank = new
    return {v: round(r, 6) for v, r in rank.items()}


def test_pagerank_matches_python_oracle(spark):
    edges = spark.createDataFrame(EDGES, "src string, dst string")
    got = {r.node: r.rank for r in pagerank(edges, iters=10).collect()}
    exp = _python_pagerank(EDGES, iters=10)
    assert set(got) == set(exp)
    for v in exp:
        assert abs(got[v] - exp[v]) < 2e-6, (v, got[v], exp[v])
    # total rank mass conserved
    assert abs(sum(got.values()) - 1.0) < 1e-4


def test_pagerank_ordering_matches_oracle(spark):
    edges = spark.createDataFrame(EDGES, "src string, dst string")
    got = {r.node: r.rank for r in pagerank(edges, iters=15).collect()}
    exp = _python_pagerank(EDGES, iters=15)
    order = lambda d: sorted(d, key=lambda v: (-d[v], v))  # noqa: E731
    assert order(got) == order(exp)
    # a (sole recipient of hub c's mass) outranks the leaf b
    assert got["a"] > got["b"]


def test_pagerank_empty(spark):
    edges = spark.createDataFrame([], "src string, dst string")
    assert pagerank(edges).count() == 0


def test_pagerank_one_action_per_round(spark, monkeypatch):
    """Each power-iteration round must cost exactly ONE driver action
    (the eager localCheckpoint of the new ranks): dangling mass rides
    that same job as a broadcast one-row aggregate, not a second
    collect(). Counted at the API layer (job counts are AQE-dependent):
    zero collect()s inside pagerank, and localCheckpoints == 4 setup
    (edges — checkpointed once so rounds never re-scan the source,
    r11 — nodes, out_deg, rank init) + one per round."""
    import pyspark.sql.classic.dataframe as dfmod

    counts = {"collect": 0, "ckpt": 0}
    orig_collect = dfmod.DataFrame.collect
    orig_ckpt = dfmod.DataFrame.localCheckpoint

    def counting_collect(self):
        counts["collect"] += 1
        return orig_collect(self)

    def counting_ckpt(self, eager=True):
        counts["ckpt"] += 1
        return orig_ckpt(self, eager)

    monkeypatch.setattr(dfmod.DataFrame, "collect", counting_collect)
    monkeypatch.setattr(dfmod.DataFrame, "localCheckpoint", counting_ckpt)
    df = spark.createDataFrame([(1, 2), (2, 3), (3, 1), (4, 1)], "src long, dst long")
    iters = 4
    result = pagerank(df, iters=iters)
    assert counts["collect"] == 0, "pagerank ran a driver collect() mid-loop"
    assert counts["ckpt"] == 4 + iters, (
        f"expected 4 setup + {iters} per-round checkpoints, got {counts['ckpt']}"
    )
    assert result.count() == 4


def test_pagerank_rounds_never_rescan_the_source(spark):
    """r11 edge-partition reuse: the edge list is checkpointed once,
    so no per-round plan may contain a source scan — before the fix
    every round re-derived the edge frame (source re-scan plus the
    upstream distinct's exchange)."""
    from pyspark.sql import functions as F

    from vbb_data_pipeline_spark.plans import capture

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    edges = li.select(
        F.col("l_suppkey").cast("long").alias("src"),
        F.col("l_partkey").cast("long").alias("dst"),
    ).distinct()
    capture.enable()
    try:
        capture.drain()
        pagerank(edges, iters=3)
        caps = capture.drain()
    finally:
        capture.disable()
    assert caps, "expected captured checkpoint plans"
    # exactly one captured plan (the edge checkpoint itself) scans the
    # source; every round plan reads checkpointed RDDs only
    scans = ["Scan parquet" in p for _, p in caps]
    assert sum(scans) == 1, f"source re-scanned: {scans}"
