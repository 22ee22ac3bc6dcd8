"""Iterative graph operators beyond connected components
(north-star extension; see operators/dedup.connected_components for
the CC construction).

PageRank over a directed edge list — the corpus-curation signal
behind host-level quality weighting (a page linked by many
high-rank hosts is likelier to be quality text; Common-Crawl-derived
pipelines rank hosts exactly this way). Pure DataFrame joins +
aggregations, deterministic, fixed iteration count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iters: int = 10,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    round_digits: int = 6,
) -> DataFrame:
    """Fixed-iteration PageRank → ``(node, rank)``.

    Construction (the standard power iteration, Brin & Page 1998):
    every node starts at ``1/N``; each round a node's rank is
    ``(1 - d)/N + d · (Σ in-neighbor rank/out-degree + dangling/N)``
    — dangling mass (nodes with no out-edges) redistributes uniformly
    so total rank stays 1.

    100 TB shape: the edge list is the only big table. Per round: one
    join of the current rank table (N rows) to edges on ``src``
    (hash shuffle on node id), one groupBy(dst) sum with map-side
    combine. Dangling mass (nodes with no out-edges) is NOT a driver
    ``collect`` — it is a one-row aggregate broadcast back into the
    rank update (broadcast nested-loop join of a single row), so each
    round is exactly ONE driver job: the eager ``localCheckpoint`` of
    the new ranks. Ranks are ``localCheckpoint``-ed per round — the
    CC lesson: a self-referencing iterative plan grows exponentially
    without lineage truncation. Out-degrees compute once, before the
    loop.

    Deterministic: fixed ``iters`` (no convergence race), exact
    double arithmetic in a fixed operation order, ranks rounded at
    the end only.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n_total = nodes.count()
    if n_total == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    out_deg = (
        e.groupBy("src").agg(F.count(F.lit(1)).alias("_deg")).localCheckpoint()
    )
    ranks = nodes.withColumn("rank", F.lit(1.0 / n_total)).localCheckpoint()
    base = (1.0 - damping) / n_total
    for _ in range(iters):
        with_deg = ranks.join(
            out_deg, ranks.node == out_deg.src, "left"
        ).select("node", "rank", "_deg")
        # dangling nodes (no out-edges) spread their rank uniformly.
        # Kept IN the plan as a one-row aggregate instead of a driver
        # collect(): the crossJoin below broadcasts this single row
        # (BroadcastNestedLoopJoin of 1 row — constant cost), folding
        # what used to be a second full scan + driver round-trip into
        # the same job as the rank update.
        dangling = (
            with_deg.filter(F.col("_deg").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dangling"))
        )
        contrib = (
            with_deg.filter(F.col("_deg").isNotNull())
            .join(e, with_deg.node == e.src)
            .select(F.col("dst").alias("node"), (F.col("rank") / F.col("_deg")).alias("_c"))
            .groupBy("node")
            .agg(F.sum("_c").alias("_in"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("_in"), F.lit(0.0))
                        + F.col("_dangling") / F.lit(float(n_total))
                    )
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks.select("node", F.round("rank", round_digits).alias("rank"))
