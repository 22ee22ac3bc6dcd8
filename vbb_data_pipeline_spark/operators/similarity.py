"""Similarity search over embedding columns (north-star extension).

Brute-force cosine top-k as the correctness baseline, and a
random-hyperplane LSH bucketing (Charikar SimHash for vectors) as the
100 TB path: candidate generation becomes a bucket equi-join instead
of a cross join.

All vector math is native column expressions (``zip_with`` +
``aggregate``) over ``array<float>`` cast to double — JVM-side, no
Python in the hot path. Hyperplane components derive deterministically
from md5 so the DuckDB oracle can reproduce them bit-for-bit.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _as_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ via zip_with + aggregate (no UDF)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two double arrays; NULL-safe via greatest(ε)."""
    return dot(a, b) / F.greatest(l2_norm(a) * l2_norm(b), F.lit(1e-12))


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector.

    Cross join (queries × corpus) — correct at any scale where
    |queries| is small (the corpus side is never replicated; Spark
    broadcasts the query side). For corpus×corpus ANN use
    :func:`hyperplane_lsh_buckets`.

    Cosine is rounded before ranking so ordering is stable across
    engines/summation orders; ties break on neighbor id.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("_qv")
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("_cv")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("_qv"), F.col("_cv")), round_digits).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("_rn").alias("rank"))
    )


def hyperplanes(num_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes: component (p, d) =
    (md5int("p_d") mod 2001 - 1000) / 1000 ∈ [-1, 1].

    Pure function of (p, d) so Spark, the DuckDB oracle, and any
    future engine reproduce identical planes without sharing state.
    """
    planes = []
    for p in range(num_planes):
        row = []
        for d in range(dim):
            h = int(hashlib.md5(f"{p}_{d}".encode()).hexdigest()[:15], 16)
            row.append((h % 2001 - 1000) / 1000.0)
        planes.append(row)
    return planes


def hyperplane_lsh_buckets(
    embeddings: DataFrame,
    num_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector an LSH bucket = sign-bit string over
    ``num_planes`` hyperplanes. Vectors with high cosine similarity
    collide with high probability; ANN then joins within buckets
    (shuffle on bucket key — linear, the 100 TB path).
    """
    planes = hyperplanes(num_planes, dim)
    v = _as_double(F.col(vec_col))
    bits = [
        F.when(dot(v, F.array(*[F.lit(x) for x in plane])) >= 0, F.lit("1")).otherwise(
            F.lit("0")
        )
        for plane in planes
    ]
    return embeddings.select(
        F.col(id_col), F.concat(*bits).alias("bucket"), F.col(vec_col)
    )


def lsh_topk(
    embeddings: DataFrame,
    k: int,
    num_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 5,
) -> DataFrame:
    """Approximate corpus×corpus top-k: candidates = same LSH bucket,
    re-ranked by exact cosine. Bucket join replaces the cross join."""
    b = hyperplane_lsh_buckets(embeddings, num_planes, dim, id_col, vec_col)
    a = b.select(
        F.col("bucket"),
        F.col(id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("_qv"),
    )
    c = b.select(
        F.col("bucket"),
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("_cv"),
    )
    scored = (
        a.join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("_qv"), F.col("_cv")), round_digits).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("_rn").alias("rank"))
    )
