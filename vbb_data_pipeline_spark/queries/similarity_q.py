"""Similarity-search queries over the embeddings table (north-star
extension; operators/similarity.py).

The cosine is computed with the same primitive structure in both
engines (sequential dot product over double-cast float arrays), and
rounded before ranking so ordering is stable; ties break on neighbor
id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vbb_data_pipeline_spark.operators import similarity as sim
from vbb_data_pipeline_spark.queries import load_table, register

DIM = 64
N_PLANES = 8

#: DuckDB cosine between two DOUBLE[] columns a/b — mirrors
#: operators/similarity.cosine (dot / max(norms, 1e-12)).
COS_SQL = (
    "list_dot_product({a}, {b}) / greatest("
    "sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})), 1e-12)"
)


@register(
    "sim_bruteforce_topk",
    oracle=f"""
    WITH q AS (
        SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        FROM embeddings WHERE vec_id < 10
    ),
    c AS (
        SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
        FROM embeddings
    ),
    scored AS (
        SELECT query_id, neighbor_id,
               round({COS_SQL.format(a="qv", b="cv")}, 5) AS cosine
        FROM q CROSS JOIN c
        WHERE query_id <> neighbor_id
    ),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC
        ) AS rank
        FROM scored
    )
    SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= 5
    """,
    survey="extension: exact top-k cosine ANN baseline (brute force; "
    "query side broadcast, corpus never replicated)",
)
def sim_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Routed through the Arrow/BLAS path (the scale formulation: no
    # pair materialization, per-batch matmul + local top-k) since its
    # HALF_UP rounding matches F.round — verified bit-identical to the
    # expression path at sf0.01 AND sf0.1 against this oracle. The
    # expression path remains the zero-Python baseline
    # (tests/test_similarity_arrow.py pins their equivalence).
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 10)
    out = sim.brute_force_topk_arrow(e, queries, k=5)
    return out.withColumn("rank", F.col("rank").cast("int"))


def _planes_sql_list(p: int) -> str:
    plane = sim.hyperplanes(N_PLANES, DIM)[p]
    return "[" + ", ".join(repr(x) for x in plane) + "]"


@register(
    "sim_lsh_topk",
    oracle=f"""
    WITH b AS (
        SELECT vec_id,
               {" || ".join(
                   "(CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), "
                   + _planes_sql_list(p)
                   + ") >= 0 THEN '1' ELSE '0' END)"
                   for p in range(N_PLANES)
               )} AS bucket,
               CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings
    ),
    scored AS (
        SELECT a.vec_id AS query_id, c.vec_id AS neighbor_id,
               round({COS_SQL.format(a="a.v", b="c.v")}, 5) AS cosine
        FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id <> c.vec_id
    ),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC
        ) AS rank
        FROM scored
    )
    SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= 3
    """,
    survey="extension: ANN top-k via LSH bucket join + exact cosine "
    "re-rank (bucket equi-join replaces the cross join at scale)",
)
def sim_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    out = sim.lsh_topk(e, k=3, num_planes=N_PLANES, dim=DIM)
    return out.withColumn("rank", F.col("rank").cast("int"))


_IVF_CELLS = 16
_IVF_PROBE = 4
_KMEANS_ITERS = 2


def _kmeans_oracle() -> str:
    """Generate the DuckDB twin of kmeans_centroids + ivf_topk: the
    same fixed seed, the same ``_KMEANS_ITERS`` Lloyd rounds with
    fixed-point per-dimension means, the same rounded-cosine argmax
    with cell-id tie-break."""
    from vbb_data_pipeline_spark.operators.similarity import KMEANS_SCALE

    def assign_cte(name: str, cent: str) -> str:
        return f"""
    {name}_scored AS (
        SELECT e.vec_id, c.cell_id, e.v,
               round({COS_SQL.format(a="e.v", b="c.mv")}, 5) AS cos
        FROM corpus e CROSS JOIN {cent} c
    ),
    {name} AS (
        SELECT vec_id, cell_id, v FROM (
            SELECT *, row_number() OVER (
                PARTITION BY vec_id ORDER BY cos DESC, cell_id ASC
            ) AS rn FROM {name}_scored
        ) WHERE rn = 1
    )"""

    def means_cte(name: str, assigned: str) -> str:
        comps = ", ".join(
            f"(CAST(sum(CAST(round(v[{i + 1}] * {KMEANS_SCALE}) AS BIGINT)) "
            f"AS DOUBLE) / {KMEANS_SCALE}.0) / count(*)"
            for i in range(DIM)
        )
        return f"""
    {name} AS (
        SELECT cell_id, [{comps}] AS mv FROM {assigned} GROUP BY cell_id
    )"""

    iter_ctes = []
    cent = "cent0"
    for it in range(_KMEANS_ITERS):
        iter_ctes.append(assign_cte(f"a{it}", cent))
        cent = f"cent{it + 1}"
        iter_ctes.append(means_cte(cent, f"a{it}"))

    return f"""
    WITH corpus AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    cent0 AS (
        SELECT CAST(vec_id AS BIGINT) AS cell_id, v AS mv
        FROM corpus WHERE vec_id < {_IVF_CELLS}
    ),{",".join(iter_ctes)},{assign_cte("assigned", cent)},
    q AS (
        SELECT vec_id AS query_id, v AS qv FROM corpus WHERE vec_id < 10
    ),
    pscore AS (
        SELECT q.query_id, q.qv, c.cell_id,
               round({COS_SQL.format(a="q.qv", b="c.mv")}, 5) AS cos
        FROM q CROSS JOIN {cent} c
    ),
    probes AS (
        SELECT query_id, qv, cell_id FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY cos DESC, cell_id ASC
            ) AS rn FROM pscore
        ) WHERE rn <= {_IVF_PROBE}
    ),
    final_scored AS (
        SELECT p.query_id, a.vec_id AS neighbor_id,
               round({COS_SQL.format(a="p.qv", b="a.v")}, 5) AS cosine
        FROM probes p JOIN assigned a ON p.cell_id = a.cell_id
        WHERE p.query_id <> a.vec_id
    ),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC
        ) AS rank FROM final_scored
    )
    SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= 5
    """


@register(
    "sim_ivf_topk",
    oracle=_kmeans_oracle(),
    survey="extension: IVF-style ANN with TRAINED centroids — "
    "deterministic Lloyd k-means ({} rounds, lowest-id seeding, "
    "fixed-point means: operators/similarity.kmeans_centroids), then "
    "broadcast-centroid cell assignment, nprobe cell pruning, exact "
    "re-rank inside probed cells; the inverted-list partitioning is "
    "the 100 TB layout (corpus bucketed by cell_id, probes touch "
    "nprobe/n_cells of it)".format(_KMEANS_ITERS),
    note="fixed-point integer means make every centroid component "
    "bit-identical across engines; the oracle replays the identical "
    "training loop as chained CTEs",
)
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 10)
    # FAISS-style split: coarse quantizer trained on a driver-side
    # sample (covers the whole corpus at test scale, so the DuckDB
    # oracle's full-corpus training replay is bit-identical);
    # assignment + probing stay distributed.
    centroids = sim.kmeans_centroids_local(
        e,
        n_cells=_IVF_CELLS,
        iters=_KMEANS_ITERS,
        cache_key=f"{sf_dir}|{_IVF_CELLS}|{_KMEANS_ITERS}|{DIM}",
    )
    out = sim.ivf_topk(
        e,
        queries,
        k=5,
        n_cells=_IVF_CELLS,
        nprobe=_IVF_PROBE,
        dim=DIM,
        centroids=centroids,
    )
    return out.withColumn("rank", F.col("rank").cast("int"))


@register(
    "sim_embedding_neardup",
    oracle=f"""
    WITH b AS (
        SELECT vec_id,
               {" || ".join(
                   "(CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), "
                   + _planes_sql_list(p)
                   + ") >= 0 THEN '1' ELSE '0' END)"
                   for p in range(N_PLANES)
               )} AS bucket,
               CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings
    )
    SELECT a.vec_id AS id_a, c.vec_id AS id_b,
           round({COS_SQL.format(a="a.v", b="c.v")}, 5) AS cosine
    FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
    WHERE {COS_SQL.format(a="a.v", b="c.v")} > 0.35
    """,
    survey="extension: embedding-cosine near-duplicate pairs (LSH "
    "blocked, threshold 0.35) — semantic dedup for training corpora",
)
def sim_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return sim.embedding_neardup_pairs(
        e, dim=DIM, num_planes=N_PLANES, threshold=0.35
    )
