"""PageRank registry query (operators/graph.py) with a DuckDB oracle
that replays the full power iteration as chained CTEs.

Cross-engine determinism: both shuffled sums (per-node in-flow,
global dangling mass) accumulate int64 fixed-point values
(``graph.PR_SCALE``), so each round's aggregation is an exact
order-independent integer sum; the scalar update is IEEE arithmetic
in an identical operation order on both engines. Float literals that
the Spark side computes in Python (``1 - damping``) are embedded via
their shortest round-trip repr and string-cast to DOUBLE so DuckDB's
DECIMAL literal parsing can never produce a different double.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vbb_data_pipeline_spark.operators.graph import PR_SCALE, pagerank
from vbb_data_pipeline_spark.queries import load_table, register
from vbb_data_pipeline_spark.queries.dedup_q import (
    CLUSTERS_ORACLE,
    dedup_clusters,
)

_PR_ITERS = 5
_PR_DAMPING = 0.85
#: part nodes offset into a disjoint id space from supplier nodes
_PART_OFFSET = 10_000_000


def _pagerank_oracle() -> str:
    d = f"CAST('{_PR_DAMPING!r}' AS DOUBLE)"
    one_minus_d = f"CAST('{1.0 - _PR_DAMPING!r}' AS DOUBLE)"
    sc = "CAST(1000000000000 AS BIGINT)"
    sc_d = "CAST(1000000000000 AS DOUBLE)"
    assert PR_SCALE == 10**12

    iter_ctes = []
    prev = "r0"
    for t in range(_PR_ITERS):
        cur = f"r{t + 1}"
        iter_ctes.append(f"""
    dang{t} AS (
        SELECT CAST(coalesce(sum(CAST(round(r.rank * {sc_d}) AS BIGINT)), 0)
                    AS BIGINT) AS dang
        FROM {prev} r LEFT JOIN deg ON r.node = deg.src
        WHERE deg.src IS NULL
    ),
    c{t} AS (
        SELECT e.dst AS node,
               sum(CAST(round((r.rank / deg.deg) * {sc_d}) AS BIGINT)) AS cin
        FROM {prev} r
        JOIN deg ON r.node = deg.src
        JOIN e ON e.src = r.node
        GROUP BY e.dst
    ),
    {cur} AS (
        SELECT n.node,
               ({one_minus_d} / nn.n)
               + {d} * ((CAST(coalesce(c.cin, 0) AS DOUBLE) / {sc_d})
                        + ((CAST(dang{t}.dang AS DOUBLE) / {sc_d}) / nn.n))
               AS rank
        FROM nodes n
        LEFT JOIN c{t} c ON n.node = c.node
        CROSS JOIN dang{t}
        CROSS JOIN nn
    )""")
        prev = cur

    return f"""
    WITH e AS (
        SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS src,
                        CAST(l_partkey + {_PART_OFFSET} AS BIGINT) AS dst
        FROM lineitem
    ),
    nodes AS (
        SELECT src AS node FROM e UNION SELECT dst FROM e
    ),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
    deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
    r0 AS (
        SELECT node, CAST(1 AS DOUBLE) / nn.n AS rank
        FROM nodes CROSS JOIN nn
    ),{",".join(iter_ctes)}
    SELECT node, round(rank, 6) AS rank FROM {prev}
    """


def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    edges = li.select(
        F.col("l_suppkey").cast("long").alias("src"),
        (F.col("l_partkey") + F.lit(_PART_OFFSET)).cast("long").alias("dst"),
    ).distinct()
    return pagerank(edges, iters=_PR_ITERS, damping=_PR_DAMPING)


@register(
    "graph_cc_pagerank",
    oracle=f"""
    SELECT 'components' AS variant, doc_id AS node,
           cluster_id AS group_id, CAST(NULL AS DOUBLE) AS score
    FROM ({CLUSTERS_ORACLE}) t
    UNION ALL
    SELECT 'pagerank', node, CAST(NULL AS BIGINT), rank
    FROM ({_pagerank_oracle()}) t
    """,
    survey="extension: iterative graph-algorithm battery (folded r5 "
    "so both legs keep a driver CORRECTNESS row) — [components] "
    "near-dup cluster assembly: connected components over MinHash-LSH "
    "candidate pairs (exact Jaccard > 0.5) by iterative min-label "
    "propagation (operators/dedup.connected_components), cluster_id "
    "= smallest member = canonical survivor, edges ride the linear "
    "banded bucket join (never blocked all-pairs — the r4 decade "
    "measured that quadratic); [pagerank] PageRank host-rank "
    "weighting (Brin & Page 1998) over the supplier→part edge list — "
    "per-round fixed-point contribution sums make the power "
    "iteration cross-engine deterministic, one driver action per "
    "round, per-round localCheckpoint lineage truncation",
    note="the pagerank oracle replays all {i} rounds as chained "
    "CTEs; the components oracle is DuckDB recursive-CTE "
    "reachability over the identical banding replay; Python float "
    "constants are embedded via shortest-repr string casts so DuckDB "
    "DECIMAL literal parsing cannot shift a double".format(
        i=_PR_ITERS
    ),
)
def graph_cc_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    cc = dedup_clusters(spark, sf_dir).select(
        F.lit("components").alias("variant"),
        F.col("doc_id").alias("node"),
        F.col("cluster_id").alias("group_id"),
        F.lit(None).cast("double").alias("score"),
    )
    pr = graph_pagerank(spark, sf_dir).select(
        F.lit("pagerank").alias("variant"),
        F.col("node"),
        F.lit(None).cast("long").alias("group_id"),
        F.col("rank").alias("score"),
    )
    return cc.unionByName(pr)
