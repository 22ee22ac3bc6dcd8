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
from math import sqrt as math_sqrt

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from vbb_data_pipeline_spark.functions.literals import literal_rows_df


def _as_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column, dim: int | None = None) -> Column:
    """Σ aᵢ·bᵢ over float or double arrays (double math either way).

    One ``zip_with`` + ``aggregate`` expression: O(1) expression nodes
    regardless of dimensionality. An earlier revision unrolled the sum
    into ``dim`` ``element_at`` terms to stay inside whole-stage
    codegen; that made per-row evaluation faster once compiled but
    cost ~35 s of Catalyst analysis/codegen per fresh invocation at
    dim=64 (every cosine instantiates the tree several times) and
    would grow 10-100× at real embedding dims (768-4096) — the
    plan-construction cost, not the data, dominated a single-shot run.
    The higher-order-function form keeps the plan O(1); its
    interpreted lambda is the right trade until the pairwise stage is
    hot enough to justify an Arrow pandas_udf (the documented scale
    path for corpus×corpus scoring). Summation order (left-to-right)
    and double arithmetic match DuckDB's ``list_dot_product`` on
    ``CAST(x AS DOUBLE[])``, keeping results bit-identical.

    ``dim`` is accepted for signature stability; the expression no
    longer depends on it.
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column, dim: int | None = None) -> Column:
    return F.sqrt(dot(a, a, dim))


def cosine(a: Column, b: Column, dim: int | None = None) -> Column:
    """Cosine similarity of two double arrays; NULL-safe via greatest(ε).

    For pairwise scoring prefer precomputing per-vector norms BEFORE
    the join (see brute_force_topk) — computing norms inside the pair
    expression redoes O(dim) work per pair instead of per vector."""
    return dot(a, b, dim) / F.greatest(l2_norm(a, dim) * l2_norm(b, dim), F.lit(1e-12))


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 5,
    dim: int | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector.

    Cross join (queries × corpus) — correct at any scale where
    |queries| is small (the corpus side is never replicated; Spark
    broadcasts the query side). For corpus×corpus ANN use
    :func:`hyperplane_lsh_buckets`.

    Cosine is rounded before ranking so ordering is stable across
    engines/summation orders; ties break on neighbor id.

    ``dim`` is accepted for signature stability only — the dot/norm
    expressions are higher-order functions that no longer depend on
    it (see :func:`dot`), so no inference job runs when it is absent
    (the old fallback launched a one-row Spark job at
    plan-construction time whose result was dead).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
    ).withColumn("_qn", l2_norm(F.col("_qv"), dim))
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
    ).withColumn("_cn", l2_norm(F.col("_cv"), dim))
    # norms are computed once per vector (before the join); the pairwise
    # expression is a single codegen'd dot product + divide
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("_qv"), F.col("_cv"), dim)
                / F.greatest(F.col("_qn") * F.col("_cn"), F.lit(1e-12)),
                round_digits,
            ).alias("cosine"),
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


def brute_force_topk_arrow(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors on the Arrow/numpy path — the
    scale formulation of :func:`brute_force_topk`.

    The expression form materializes one row per (query, corpus) pair
    before ranking; correct, but the pair rows exist. This operator
    never materializes pairs: the query set (small by contract — it is
    broadcast either way) is collected to a ``|Q|×dim`` numpy matrix,
    broadcast to executors, and a single ``mapInPandas`` pass over the
    corpus computes each Arrow batch's ``B×|Q|`` score matrix with one
    BLAS matmul, emitting only the per-batch top-k rows per query
    (``partitions × k × |Q|`` rows total). A final window rank over
    that sliver picks the global top-k — the only shuffle, carrying
    k·|Q| rows per partition.

    At 100 TB: one corpus scan, no pair materialization, Python cost
    is a vectorized matmul per Arrow batch. Cosines are rounded before
    ranking (ties on neighbor id) like every similarity operator here;
    numpy's pairwise summation can differ from sequential summation
    below the rounding threshold, which the rounding absorbs.
    """
    q_rows = (
        queries.filter(F.col(vec_col).isNotNull())
        .select(F.col(id_col).cast("long"), vec_col)
        .collect()
    )
    if not q_rows:
        spark = embeddings.sparkSession
        return literal_rows_df(
            spark, [], "query_id long, neighbor_id long, cosine double, rank int"
        )
    import numpy as np

    q_ids = np.array([r[0] for r in q_rows], dtype="int64")
    q_mat = np.array([list(r[1]) for r in q_rows], dtype="float64")
    q_norm = np.maximum(np.sqrt((q_mat * q_mat).sum(axis=1)), 1e-12)
    sc = embeddings.sparkSession.sparkContext
    bc = sc.broadcast((q_ids, q_mat / q_norm[:, None]))

    out_schema = "query_id long, neighbor_id long, cosine double"

    def score(batches):
        import numpy as np
        import pandas as pd

        ids, qn = bc.value
        nq = len(ids)
        for pdf in batches:
            pdf = pdf[pdf[vec_col].notna()]
            if not len(pdf):
                continue
            c_ids = pdf[id_col].to_numpy(dtype="int64")
            c_mat = np.stack(
                [np.asarray(v, dtype="float64") for v in pdf[vec_col]]
            )
            c_norm = np.maximum(np.sqrt((c_mat * c_mat).sum(axis=1)), 1e-12)
            scores = (c_mat / c_norm[:, None]) @ qn.T  # B × |Q|
            # HALF_UP like F.round / the expression path / the DuckDB
            # oracle — np.round is half-to-even, which diverges on
            # exact half-ticks (dyadic cosines such as 1/64 at 5
            # digits). Sign-aware floor(|x|·10^d + 0.5): exact
            # half-ticks are dyadic, so |x|·10^d is computed exactly
            # and lands on .5 precisely, rounding up as HALF_UP does.
            p = 10.0 ** round_digits
            scores = np.sign(scores) * np.floor(np.abs(scores) * p + 0.5) / p
            # self-match suppression + per-batch top-k per query
            for qi in range(nq):
                col = scores[:, qi]
                keep = c_ids != ids[qi]
                cand_scores, cand_ids = col[keep], c_ids[keep]
                if not len(cand_ids):
                    continue
                # top-k by (score desc, id asc): lexsort on (-score, id)
                order = np.lexsort((cand_ids, -cand_scores))[:k]
                yield pd.DataFrame(
                    {
                        "query_id": np.full(len(order), ids[qi]),
                        "neighbor_id": cand_ids[order],
                        "cosine": cand_scores[order],
                    }
                )

    local_topk = embeddings.select(
        F.col(id_col).cast("long").alias(id_col), vec_col
    ).mapInPandas(score, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        local_topk.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "cosine",
            F.col("_rn").cast("int").alias("rank"),
        )
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
    v = F.col(vec_col)
    bits = [
        F.when(
            dot(v, F.array(*[F.lit(x) for x in plane]), dim) >= 0, F.lit("1")
        ).otherwise(F.lit("0"))
        for plane in planes
    ]
    return embeddings.select(
        F.col(id_col), F.concat(*bits).alias("bucket"), F.col(vec_col)
    )


def ivf_assign(
    embeddings: DataFrame,
    centroids: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 5,
    cell_col: str | None = None,
) -> DataFrame:
    """Assign each vector to its nearest centroid (IVF cell).

    Centroids broadcast, so scoring is a map-side pass over the
    corpus — O(N·C) dot products, no shuffle of the corpus data for
    the join. The argmax is a ``max(struct)`` aggregation, NOT a
    window rank: partial aggregation combines the C candidate rows
    per vector down to 1 on the map side, so the exchange carries N
    rows instead of sorting N×C (and no sort at all). Ties break on
    smallest cell id after rounding (negated id in the struct) so any
    engine reproduces the same partition.

    ``cell_col``: name of the centroid-id column in ``centroids``
    (default: ``id_col`` — centroids shaped like corpus rows).
    """
    cent = centroids.select(
        F.col(cell_col or id_col).alias("cell_id"),
        F.col(vec_col).alias("_mv"),
    ).withColumn("_mn", l2_norm(F.col("_mv"), dim))
    v = embeddings.select(
        F.col(id_col),
        F.col(vec_col),
        F.col(vec_col).alias("_v"),
    ).withColumn("_n", l2_norm(F.col("_v"), dim))
    scored = v.join(F.broadcast(cent)).select(
        id_col,
        vec_col,
        "cell_id",
        F.round(
            dot(F.col("_v"), F.col("_mv"), dim)
            / F.greatest(F.col("_n") * F.col("_mn"), F.lit(1e-12)),
            round_digits,
        ).alias("_cos"),
    )
    best = scored.groupBy(id_col).agg(
        F.max(
            F.struct(
                F.col("_cos").alias("c"),
                (-F.col("cell_id")).cast("long").alias("negid"),
                F.col(vec_col).alias("v"),
            )
        ).alias("_m")
    )
    return best.select(
        id_col,
        (-F.col("_m.negid")).alias("cell_id"),
        F.col("_m.v").alias(vec_col),
    )


def ivf_assign_arrow(
    embeddings: DataFrame,
    centroids: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 5,
    cell_col: str | None = None,
    keep_cos: bool = False,
) -> DataFrame:
    """Nearest-centroid assignment on the Arrow/numpy path — the
    index-BUILD formulation of :func:`ivf_assign` (same recipe as
    :func:`pq_encode_arrow`). ``keep_cos=True`` adds the winning
    (rounded) centroid cosine as ``_ccos`` — the keep-priority input
    :func:`semantic_dedup` ranks on.

    The expression form scores O(N·C) candidate rows through the
    codegen dot expression — fine per query at small C, but the
    one-time index build assigns the WHOLE corpus and C is the cell
    count (thousands): at 2M vectors × 4k cells the candidate pass is
    ~0.5T flops of interpreted-expression arithmetic and dominates
    :func:`ivf_pq_write_index`. Here the centroid matrix (C × dim,
    tiny) broadcasts once; one ``mapInPandas`` pass computes each
    Arrow batch's ``B × C`` cosine matrix with a single BLAS matmul
    and emits the argmax cell directly — no candidate
    materialization, no exchange (the expression path's exchange
    carried the argmax partials).

    Parity contract: identical cells to :func:`ivf_assign` — the same
    rounded-cosine argmax (HALF_UP sign-aware at ``round_digits``;
    the ``max(nx·nc, 1e-12)`` denominator floor), ties → smallest
    cell id (centroid rows are cell-ordered and ``argmax`` returns
    the first maximum). BLAS summation order differs from the
    sequential expression dot below the rounding threshold; the
    rounding absorbs it (pinned by ``tests/test_pq.py``'s
    assignment-parity test on the driver fixtures).
    """
    import numpy as np

    cent_rows = sorted(
        (int(r[0]), [float(x) for x in r[1]])
        for r in centroids.select(
            F.col(cell_col or id_col), F.col(vec_col)
        ).collect()
    )
    cells = np.array([c for c, _ in cent_rows], dtype="int64")
    cmat = np.array([v for _, v in cent_rows], dtype="float64")
    cnorm = np.sqrt((cmat * cmat).sum(axis=1))
    sc = embeddings.sparkSession.sparkContext
    bc = sc.broadcast((cells, cmat, cnorm))

    elem = "float"
    for f in embeddings.schema.fields:
        if f.name == vec_col:
            elem = f.dataType.elementType.simpleString()
    out_schema = (
        f"{id_col} long, cell_id long, {vec_col} array<{elem}>"
    )
    if keep_cos:
        out_schema += ", _ccos double"

    def assign(batches):
        import numpy as np
        import pandas as pd

        cells_, cmat_, cnorm_ = bc.value
        p = 10.0 ** round_digits
        for pdf in batches:
            pdf = pdf[pdf[vec_col].notna()]
            if not len(pdf):
                continue
            x = np.stack(
                [np.asarray(v, dtype="float64") for v in pdf[vec_col]]
            )
            xn = np.sqrt((x * x).sum(axis=1))
            denom = np.maximum(xn[:, None] * cnorm_[None, :], 1e-12)
            cos = (x @ cmat_.T) / denom
            cos = np.sign(cos) * np.floor(np.abs(cos) * p + 0.5) / p
            arg = np.argmax(cos, axis=1)
            best = cells_[arg]
            out = {
                id_col: pdf[id_col].to_numpy(dtype="int64"),
                "cell_id": best,
                vec_col: pdf[vec_col],
            }
            if keep_cos:
                out["_ccos"] = cos[np.arange(len(arg)), arg]
            yield pd.DataFrame(out)

    return embeddings.select(id_col, vec_col).mapInPandas(
        assign, schema=out_schema
    )


#: Fixed-point scale for k-means centroid means (exact int sums →
#: order-independent, cross-engine-identical components).
KMEANS_SCALE = 1_000_000

#: Trained-centroid tables keyed by (session UUID, caller-supplied
#: identity) — see kmeans_centroids. Checked BEFORE any lineage is
#: built, so a cache hit costs nothing. The session UUID in the key
#: makes a stop/recreate cycle (test reruns, long-lived processes) a
#: clean miss instead of returning a DataFrame bound to a dead
#: session; FIFO-bounded so a parameter sweep can't grow it without
#: limit (each entry pins a localCheckpoint's blocks on the executors
#: for the life of its session).
_CENTROID_CACHE: dict[tuple[str, str, str], DataFrame] = {}
_CENTROID_CACHE_MAX = 16


def _cache_get(spark, cache_key: str | None, ns: str) -> DataFrame | None:
    """``ns`` namespaces the cache per TRAINER: six trainers share
    this dict, and the docstrings all define ``cache_key`` as the
    identity of (input, n_cells, iters, dim) with no trainer
    component — without the namespace, training k-means then PQ under
    the same identity returns the other trainer's table (wrong
    schema, or a silently different model)."""
    if cache_key is None:
        return None
    return _CENTROID_CACHE.get(
        (spark._jsparkSession.sessionUUID(), ns, cache_key)
    )


def _cache_put(spark, cache_key: str | None, cent: DataFrame, ns: str) -> None:
    if cache_key is None:
        return
    while len(_CENTROID_CACHE) >= _CENTROID_CACHE_MAX:
        _CENTROID_CACHE.pop(next(iter(_CENTROID_CACHE)))
    _CENTROID_CACHE[
        (spark._jsparkSession.sessionUUID(), ns, cache_key)
    ] = cent


def kmeans_centroids(
    embeddings: DataFrame,
    n_cells: int,
    iters: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 5,
    cache_key: str | None = None,
) -> DataFrame:
    """Deterministic Lloyd k-means over cosine similarity →
    ``(cell_id, vec_col)`` centroid table.

    Seeding is the ``n_cells`` lowest-id vectors; each of the
    ``iters`` rounds broadcast-assigns every vector to its nearest
    centroid (``ivf_assign`` — max(struct) argmax, rounded cosine,
    tie on cell id) and recomputes centroids as per-dimension means.
    The means use fixed-point integer sums (``KMEANS_SCALE``) so the
    resulting components are bit-identical in any engine: integer sum
    is exact and order-independent, and the two IEEE divisions happen
    in a fixed order. Cells that lose all members drop out (both
    engines' GROUP BY agrees).

    Each round is one broadcast join + one groupBy with ``dim``
    integer sums (map-side combine); at 100 TB the corpus is scanned
    ``iters`` times and nothing else moves. The centroid table is
    ``localCheckpoint``-ed after every round: the model is tiny
    (``n_cells`` rows) but chaining rounds as one static plan would
    nest ``iters`` corpus scans into a single expression tree whose
    Catalyst analysis cost dwarfs the actual compute — truncating
    lineage per round keeps planning O(1 round) and trains eagerly.

    ``cache_key``: stable identity of (input, n_cells, iters, dim).
    When supplied, a previously trained table for the same key is
    returned immediately — before any lineage is rebuilt — giving the
    train-once / query-many behavior a real ANN deployment has (at
    scale you'd write the centroids to storage instead).
    """
    cached = _cache_get(embeddings.sparkSession, cache_key, ns="kmeans_centroids")
    if cached is not None:
        return cached
    corpus = embeddings.select(F.col(id_col), F.col(vec_col))
    cent = embeddings.filter(F.col(id_col) < n_cells).select(
        F.col(id_col).cast("long").alias("cell_id"),
        F.col(vec_col),
    )
    # same loud failure as kmeans_centroids_local: gapped ids below
    # n_cells would silently train fewer cells here while the
    # documented bit-identical twin raises — the trainers must agree
    # on the same input (the count is n_cells rows, one tiny job)
    n_seeds = cent.count()
    if n_seeds < n_cells:
        raise ValueError(
            f"kmeans seeding found {n_seeds} vectors with id < "
            f"{n_cells}; the id<n_cells seed convention requires "
            "contiguous ids from 0 — re-key the corpus or pass "
            "pre-trained centroids"
        )
    for rnd in range(iters):
        assigned = ivf_assign(
            corpus, cent, dim, id_col, vec_col, round_digits, cell_col="cell_id"
        )
        # Per-dimension fixed-point means via posexplode → two small
        # groupBys. An earlier revision built `dim` separate sum
        # columns (one expression chain per dimension); that cost
        # O(dim) driver-side Column construction (~1.5 s of py4j
        # round-trips per round at dim=64) and an O(dim)-wide plan.
        # The exploded form is a constant-size plan at any dim; the
        # extra exchange carries (cell_id, pos, long) triples —
        # n_members × dim tiny rows, map-side combined down to
        # n_cells × dim before the shuffle.
        per_dim = (
            assigned.select(
                "cell_id", F.posexplode(F.col(vec_col)).alias("_pos", "_x")
            )
            .groupBy("cell_id", "_pos")
            .agg(
                F.sum(
                    F.round(F.col("_x").cast("double") * KMEANS_SCALE).cast(
                        "long"
                    )
                ).alias("_s"),
                F.count(F.lit(1)).alias("_n"),
            )
        )
        # array_sort on (pos, mean) structs: pos is unique per cell,
        # so the component order is deterministic in any engine.
        cent = per_dim.groupBy("cell_id").agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("_pos").alias("p"),
                            (
                                (F.col("_s").cast("double") / KMEANS_SCALE)
                                / F.col("_n")
                            ).alias("m"),
                        )
                    )
                ),
                lambda s: s["m"],
            ).alias(vec_col)
        )
        # Truncate lineage periodically (and always for the final
        # model): the per-round trees are small, but unbounded nesting
        # across many Lloyd rounds would still grow analysis cost
        # linearly, and every downstream consumer would replay the
        # whole training chain.
        if rnd == iters - 1 or rnd % 8 == 7:
            cent = cent.localCheckpoint()
    _cache_put(embeddings.sparkSession, cache_key, cent, ns="kmeans_centroids")
    return cent


def _round_half_up(x: float, digits: int) -> float:
    """Replicate Spark's ``F.round`` (BigDecimal HALF_UP over the
    double's shortest decimal repr) in Python. ``decimal`` on
    ``repr(x)`` sees the same shortest round-trip decimal string Java's
    ``Double.toString`` produces, so boundary cases resolve
    identically."""
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-digits)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


def kmeans_centroids_local(
    embeddings: DataFrame,
    n_cells: int,
    iters: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 5,
    sample_n: int = 1 << 18,
    cache_key: str | None = None,
) -> DataFrame:
    """Sample-to-driver Lloyd k-means → tiny ``(cell_id, vec)`` table.

    ``sample_n`` bounds driver memory: 262k × 1024-dim float64 ≈ 2 GB
    worst case; FAISS guidance is ~(100-1000)×n_cells training points,
    so shrink it for small cell counts and large dims rather than
    raising it — quantizer quality saturates long before the corpus.

    The 100 TB IVF pattern (what FAISS and Spark ML both do): the
    coarse quantizer is trained on a bounded SAMPLE collected to one
    node — centroid quality needs ~(100-1000)×n_cells training points,
    not the corpus — and only the cell ASSIGNMENT runs distributed
    (``ivf_assign``: broadcast centroids, map-side argmax). Training
    driver-side removes ``iters`` corpus scans and all per-round
    shuffles from the cluster's critical path; the model (n_cells
    rows) ships back as a broadcastable DataFrame.

    Deterministic and engine-replayable: the sample is the
    ``sample_n`` lowest-``id_col`` vectors, seeds are ids
    ``< n_cells``, cosines round HALF_UP at ``round_digits`` before
    the argmax (tie → smallest cell), means are fixed-point integer
    sums at ``KMEANS_SCALE`` — the identical arithmetic, in the
    identical order, as the distributed :func:`kmeans_centroids` and
    the DuckDB oracle that replays training in SQL (dot products are
    sequential left-to-right sums in all three). When ``sample_n``
    covers the whole corpus (test scale), the result is bit-identical
    to full-corpus training.

    ``cache_key``: see :func:`kmeans_centroids` (train once, query
    many).
    """
    cached = _cache_get(embeddings.sparkSession, cache_key, ns="kmeans_centroids_local")
    if cached is not None:
        return cached
    spark = embeddings.sparkSession
    rows = (
        embeddings.filter(F.col(vec_col).isNotNull())
        .select(F.col(id_col).cast("long").alias("_id"), F.col(vec_col))
        .orderBy("_id")
        .limit(sample_n)  # TakeOrderedAndProject: one bounded job
        .collect()
    )
    vecs = [(r[0], [float(x) for x in r[1]]) for r in rows]

    dot_seq = _dot_seq  # the module's left-to-right sum — ONE copy of
    # the arithmetic-order-critical primitive (two drifting copies
    # would silently split the engines' parity contract)

    cents: list[tuple[int, list[float]]] = [
        (int(i), v) for i, v in vecs if i < n_cells
    ]
    # Seed convention (id < n_cells) is replayed verbatim by the
    # DuckDB oracles; ids with gaps below n_cells would silently
    # train fewer cells, so fail loudly instead.
    if len(cents) < n_cells:
        raise ValueError(
            f"kmeans seeding found {len(cents)} vectors with id < "
            f"{n_cells}; the id<n_cells seed convention requires "
            "contiguous ids from 0 — re-key the corpus or pass "
            "pre-trained centroids"
        )
    for _ in range(iters):
        norms = [
            (cid, cv, math_sqrt(dot_seq(cv, cv))) for cid, cv in cents
        ]
        # assignment: argmax of rounded cosine, tie → smallest cell id
        sums: dict[int, list[int]] = {}
        counts: dict[int, int] = {}
        for _vid, v in vecs:
            nv = math_sqrt(dot_seq(v, v))
            best_cell, best_cos = None, None
            for cid, cv, nc in norms:
                c = _round_half_up(
                    dot_seq(v, cv) / max(nv * nc, 1e-12), round_digits
                )
                if best_cos is None or c > best_cos:
                    best_cell, best_cos = cid, c
            acc = sums.get(best_cell)
            if acc is None:
                acc = [0] * len(v)
                sums[best_cell] = acc
            for i, x in enumerate(v):
                acc[i] += int(_round_half_up(x * KMEANS_SCALE, 0))
            counts[best_cell] = counts.get(best_cell, 0) + 1
        cents = [
            (
                cid,
                [(s / KMEANS_SCALE) / counts[cid] for s in sums[cid]],
            )
            for cid in sorted(sums)
        ]
    cent = literal_rows_df(
        spark,
        [(cid, cv) for cid, cv in cents],
        f"cell_id long, {vec_col} array<double>",
    )
    _cache_put(spark, cache_key, cent, ns="kmeans_centroids_local")
    return cent


def _sample_matrix(
    embeddings: DataFrame, id_col: str, vec_col: str, sample_n: int
):
    """Bounded lowest-id sample as a float64 numpy matrix (BLAS
    trainer input; one TakeOrderedAndProject job like
    :func:`_collect_sample`)."""
    import numpy as np

    vecs = _collect_sample(embeddings, id_col, vec_col, sample_n)
    return np.asarray([v for _, v in vecs], dtype="float64")


def kmeans_centroids_numpy(
    embeddings: DataFrame,
    n_cells: int,
    iters: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_n: int = 1 << 18,
    cache_key: str | None = None,
) -> DataFrame:
    """BLAS coarse-quantizer trainer → ``(cell_id, vec)`` table.

    The INDEX-BUILD path for real scale: each Lloyd round is one
    ``(sample × n_cells)`` matrix product (cosine assignment) plus a
    bincount mean update — minutes for n_cells in the tens of
    thousands where the interpreted deterministic trainer
    (:func:`kmeans_centroids_local`) would take days. Seeds are the
    first ``n_cells`` sample rows BY ORDINAL, so gapped or offset id
    spaces train fine (the ``id < n_cells`` seed convention of the
    deterministic trainers exists only for SQL-replayability).

    Trade-off, stated plainly: BLAS summation order is
    platform-defined, so this trainer is deterministic run-to-run on
    one platform but NOT bit-replayable in DuckDB — use it for index
    builds and perf paths; oracle-checked queries keep the
    deterministic trainers. Empty cells drop out (same convention as
    the deterministic trainers). Model quality is equivalent: both
    are Lloyd on the same objective.
    """
    import numpy as np

    cached = _cache_get(embeddings.sparkSession, cache_key, ns="kmeans_centroids_numpy")
    if cached is not None:
        return cached
    spark = embeddings.sparkSession
    X = _sample_matrix(embeddings, id_col, vec_col, sample_n)
    if X.shape[0] < n_cells:
        raise ValueError(
            f"kmeans_centroids_numpy: sample has {X.shape[0]} vectors "
            f"for {n_cells} cells — lower n_cells or raise sample_n"
        )
    Xn = X / np.maximum(
        np.linalg.norm(X, axis=1, keepdims=True), 1e-12
    )
    C = X[:n_cells].copy()
    assign = None
    for _ in range(max(iters, 1)):
        Cn = C / np.maximum(
            np.linalg.norm(C, axis=1, keepdims=True), 1e-12
        )
        assign = np.argmax(Xn @ Cn.T, axis=1)
        counts = np.bincount(assign, minlength=C.shape[0])
        sums = np.zeros_like(C)
        np.add.at(sums, assign, X)
        live = counts > 0
        C = C.copy()
        C[live] = sums[live] / counts[live, None]
    live_cells = sorted(set(int(a) for a in assign))
    cent = literal_rows_df(
        spark,
        [(cid, C[cid].tolist()) for cid in live_cells],
        f"cell_id long, {vec_col} array<double>",
    )
    _cache_put(spark, cache_key, cent, ns="kmeans_centroids_numpy")
    return cent


def pq_train_numpy(
    embeddings: DataFrame,
    n_subspaces: int,
    n_codes: int,
    iters: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_n: int = 1 << 18,
    cache_key: str | None = None,
) -> DataFrame:
    """BLAS PQ-codebook trainer → ``(subspace, code, subvec)`` table.

    Per-subspace squared-L2 Lloyd with the assignment as one
    ``(sample × n_codes)`` distance matrix per round (the vectorized
    twin of :func:`pq_train_local`'s interpreted loop, same seeding
    caveats as :func:`kmeans_centroids_numpy`: ordinal seeds, BLAS
    float order, index-build/perf path only). Codes produced by
    :func:`pq_encode_arrow` against these codebooks are exact for
    whatever codebook is passed, so the ANN pipeline downstream is
    unchanged.
    """
    import numpy as np

    cached = _cache_get(embeddings.sparkSession, cache_key, ns="pq_train_numpy")
    if cached is not None:
        return cached
    spark = embeddings.sparkSession
    sub = dim // n_subspaces
    X = _sample_matrix(embeddings, id_col, vec_col, sample_n)
    if X.shape[0] < n_codes:
        raise ValueError(
            f"pq_train_numpy: sample has {X.shape[0]} vectors for "
            f"{n_codes} codes — lower n_codes or raise sample_n"
        )
    out: list[tuple[int, int, list[float]]] = []
    for j in range(n_subspaces):
        Xs = X[:, j * sub : (j + 1) * sub]
        C = Xs[:n_codes].copy()
        xx = (Xs * Xs).sum(axis=1, keepdims=True)
        for _ in range(max(iters, 1)):
            d = xx - 2.0 * (Xs @ C.T) + (C * C).sum(axis=1)[None, :]
            assign = np.argmin(d, axis=1)
            counts = np.bincount(assign, minlength=n_codes)
            sums = np.zeros_like(C)
            np.add.at(sums, assign, Xs)
            live = counts > 0
            C = C.copy()
            C[live] = sums[live] / counts[live, None]
        out.extend(
            (j, c, C[c].tolist()) for c in range(n_codes)
        )
    cb = literal_rows_df(
        spark, out, "subspace int, code long, subvec array<double>"
    )
    _cache_put(spark, cache_key, cb, ns="pq_train_numpy")
    return cb


#: ivf_topk literal-assignment gate: max n_cells·dim before the
#: unrolled centroid-literal expression tree would dominate plan
#: analysis/codegen cost (the r6 35 s defect class). Above it the
#: join+agg formulation runs instead.
IVF_LITERAL_MAX_EXPRS = 8192


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int,
    n_cells: int,
    nprobe: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 5,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-style approximate nearest neighbors.

    The corpus is partitioned into ``n_cells`` inverted lists by
    nearest-centroid assignment; each query probes only its ``nprobe``
    closest cells and exact-ranks the candidates inside them. At scale
    the inverted lists are the storage partitioning (write the corpus
    bucketed by cell_id) so a probe touches nprobe/n_cells of the data.

    ``centroids``: a ``(cell_id, vec_col)`` table — typically
    :func:`kmeans_centroids`. Default: the ``n_cells`` lowest-id
    vectors (deterministic stand-in); the operator is agnostic to how
    centroids were produced.

    NULL embeddings are dropped at the boundary on BOTH sides (r10
    totality fix, same rationale as :func:`lsh_topk`): a NULL vector
    has no cell assignment and no cosine — it cannot probe or be
    probed.
    """
    embeddings = embeddings.filter(F.col(vec_col).isNotNull())
    queries = queries.filter(F.col(vec_col).isNotNull())
    if centroids is None:
        centroids = embeddings.filter(F.col(id_col) < n_cells).select(
            F.col(id_col).cast("long").alias("cell_id"), F.col(vec_col)
        )

    # r10 optimization (guide §2.4 — remove shuffles outright): with a
    # bounded trained centroid set, both centroid-facing steps fold
    # into literal expressions over the collected centroids —
    #  * cell assignment becomes greatest(struct(cos_i, −cell_i, ...))
    #    per corpus row: a pure map. The join+groupBy formulation
    #    shuffled the WHOLE corpus (argmax partials carry the full
    #    vector) — at 100 TB that exchange is the dominant cost of an
    #    ad-hoc probe, and locally it was 2 of this plan's 6 stages.
    #  * probe selection becomes explode(slice(array_sort(...))) per
    #    query row, removing the q×cent join plus the row_number
    #    window and ITS exchange.
    # Bit-parity: the cosines are the same `dot`/`greatest(·,1e-12)`/
    # `round` expression tree (centroid side as array literals);
    # centroid norms are computed in driver Python with the identical
    # left-to-right summation over the identical doubles and a
    # correctly-rounded sqrt, so every rounded cosine — and therefore
    # every argmax/ordering decision — is unchanged. Ordering ties:
    # struct comparison on (cos, −cell_id) ≡ the old max(struct)/
    # row_number(_cos desc, cell_id asc) rules. The expression form is
    # gated on n_cells·dim (literal-plan size — the unrolled tree at
    # thousands of cells would revive the r6 35 s analysis-cost
    # defect); larger centroid sets keep the join+agg path, and
    # at-rest corpora use ivf_topk_from_index which never re-assigns.
    cent_rows = None
    if n_cells * dim <= IVF_LITERAL_MAX_EXPRS:
        cent_rows = sorted(
            (int(r[0]), [float(x) for x in r[1]])
            for r in centroids.select("cell_id", vec_col).collect()
        )  # bounded model-scale collect (n_cells rows), repo convention
    if cent_rows:
        from math import sqrt as _sqrt

        # The literal trees are generated as SQL TEXT and parsed with
        # ONE F.expr call per consumer (r10 follow-up): composing them
        # through the py4j column API issued one driver round trip per
        # F.lit/F.struct/F.array node — n_cells·(dim+6)·2 ≈ 2-3k
        # blocking socket calls, measured as tens of seconds of query
        # CONSTRUCTION on a loaded host (cProfile: the time sat in
        # py4j recv_into, not in Spark). The parsed trees are
        # node-for-node the trees the column API built — doubles are
        # embedded as CAST('<repr>' AS DOUBLE), whose Double.parseDouble
        # round-trips Python repr's shortest form bit-exactly — so
        # every rounded cosine and tie-break is unchanged.
        def _d(x: float) -> str:
            return f"CAST('{x!r}' AS DOUBLE)"

        def _cos_lit_sql(vec: str, vnorm: str, cv: list[float]) -> str:
            carr = "array(" + ", ".join(_d(x) for x in cv) + ")"
            cn = _sqrt(sum(x * x for x in cv))  # bit-equal to l2_norm
            return (
                f"round(aggregate(zip_with({vec}, {carr}, (x, y) -> "
                "CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0.0D, "
                f"(acc, x) -> acc + x) / greatest({vnorm} * {_d(cn)}, "
                f"{_d(1e-12)}), {int(round_digits)})"
            )

        def _cell_structs_sql(vec: str, vnorm: str) -> list[str]:
            return [
                f"named_struct('c', {_cos_lit_sql(vec, vnorm, cv)}, "
                f"'negid', CAST({-cid} AS BIGINT))"
                for cid, cv in cent_rows
            ]

        q = queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("_qv"),
        ).withColumn("_qn", l2_norm(F.col("_qv"), dim))
        # ascending sort on (−cos, cell_id) ≡ (cos desc, cell_id asc);
        # negate as 0.0 − c, not −c: the window SortOrder this replaces
        # normalizes −0.0 = +0.0 before comparing, while array_sort's
        # struct comparator sees raw doubles — 0.0 − c maps both zero
        # signs to +0.0 and is an exact sign flip for every other value
        probe_structs = ", ".join(
            f"named_struct('nc', 0.0D - {_cos_lit_sql('_qv', '_qn', cv)}, "
            f"'cell_id', CAST({cid} AS BIGINT))"
            for cid, cv in cent_rows
        )
        probe_sorted = (
            f"array_sort(array({probe_structs}))"
        )
        probes = q.select(
            "query_id",
            "_qv",
            "_qn",
            F.explode(
                F.expr(
                    f"slice({probe_sorted}, 1, "
                    f"{min(nprobe, len(cent_rows))})"
                )
            ).alias("_p"),
        ).select(
            "query_id", "_qv", "_qn", F.col("_p.cell_id").alias("cell_id")
        )

        cand = embeddings.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("_cv"),
            l2_norm(F.col(vec_col), dim).alias("_cn"),
        ).withColumn(
            "cell_id",
            F.expr(
                "-(greatest("
                + ", ".join(_cell_structs_sql("_cv", "_cn"))
                + ").negid)"
            ),
        )
    else:
        assigned = ivf_assign(
            embeddings, centroids, dim, id_col, vec_col, round_digits,
            cell_col="cell_id",
        )

        cent = centroids.select(
            F.col("cell_id"),
            F.col(vec_col).alias("_mv"),
        ).withColumn("_mn", l2_norm(F.col("_mv"), dim))
        q = queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("_qv"),
        ).withColumn("_qn", l2_norm(F.col("_qv"), dim))
        probe_scored = q.join(F.broadcast(cent)).select(
            "query_id",
            "_qv",
            "_qn",
            "cell_id",
            F.round(
                dot(F.col("_qv"), F.col("_mv"), dim)
                / F.greatest(F.col("_qn") * F.col("_mn"), F.lit(1e-12)),
                round_digits,
            ).alias("_cos"),
        )
        wp = Window.partitionBy("query_id").orderBy(
            F.col("_cos").desc(), F.col("cell_id").asc()
        )
        probes = (
            probe_scored.withColumn("_rn", F.row_number().over(wp))
            .filter(F.col("_rn") <= nprobe)
            .select("query_id", "_qv", "_qn", "cell_id")
        )

        cand = assigned.select(
            "cell_id",
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("_cv"),
        ).withColumn("_cn", l2_norm(F.col("_cv"), dim))
    scored = (
        F.broadcast(probes)
        .join(cand, "cell_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("_qv"), F.col("_cv"), dim)
                / F.greatest(F.col("_qn") * F.col("_cn"), F.lit(1e-12)),
                round_digits,
            ).alias("cosine"),
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


def ivf_write_index(
    embeddings: DataFrame,
    centroids: DataFrame,
    path: str,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 5,
    mode: str = "overwrite",
    target_recall: float | None = 0.9,
    recall_kwargs: dict | None = None,
) -> None:
    """Materialize the IVF inverted lists as storage layout: the
    corpus, assigned to cells, written hive-partitioned by
    ``cell_id``.

    ``target_recall`` (DEFAULT 0.9 since r10 — certification is the
    default build posture, not an opt-in) runs
    :func:`ann_recall_estimate` after the write: sampled exact ground
    truth, an nprobe-ladder walk, and an ``_ann_recall.json`` marker
    recording the nprobe this index NEEDS for that recall — or
    ``fallback: true`` when no rung reaches it (uniform /
    unclusterable embeddings, where IVF recall degrades by
    construction of the data). ``nprobe="auto"`` probes consume the
    marker; ``recall_kwargs`` forwards estimator knobs
    (k, n_queries, nprobe_ladder, ...). Pass ``target_recall=None``
    to skip certification — the explicit escape hatch for builds
    where the estimate's extra corpus pass is unaffordable (e.g. the
    per-micro-batch append in ``streaming/ingest``, whose guard cost
    must stay ∝ batch); an uncertified index rejects ``nprobe="auto"``
    probes rather than guessing.

    This is the at-rest form of the "inverted lists = storage
    partitioning" claim: ``n_cells`` is bounded (a partition-count,
    not a key-cardinality), so directory partitioning is the right
    mechanism, and a probe query's ``cell_id IN (...)`` filter prunes
    to nprobe/n_cells of the corpus BEFORE file listing. Write once,
    probe many — the assignment scan never re-runs per query.

    The write is repartitioned ON the partition column first:
    ``partitionBy`` alone makes every input task open a writer per
    cell it happens to hold (up to tasks × n_cells tiny files, and a
    probe path throttled by per-file open overhead); aligning the
    exchange with the layout yields one file per cell (SCALE_ann.json
    records the measured difference).

    Assignment runs on the Arrow/BLAS path (:func:`ivf_assign_arrow`,
    cell-identical by the parity contract): the build assigns the
    whole corpus against ALL cells, the one place the expression
    form's O(N·C·dim) candidate pass dominates.
    """
    assigned = ivf_assign_arrow(
        embeddings, centroids, dim, id_col, vec_col, round_digits,
        cell_col="cell_id",
    )
    assigned.repartition(F.col("cell_id")).write.partitionBy(
        "cell_id"
    ).mode(mode).parquet(path)
    if target_recall is not None:
        spark = embeddings.sparkSession
        # the ladder probes walk the FULL on-disk index, so the query
        # sample and the exact ground truth must too: on mode='append'
        # estimating over just the appended batch would compare
        # batch-only truth against whole-index probe results —
        # got∩want collapses and a bogus low-recall curve (or
        # fallback:true) overwrites a valid whole-index marker. Both
        # layouts store the raw vectors, so the full corpus is the
        # index read back.
        src = (
            spark.read.parquet(path).select(id_col, vec_col)
            if mode == "append"
            else embeddings
        )
        ann_recall_estimate(
            spark, path, src, centroids, dim,
            kind="ivf", target_recall=target_recall, id_col=id_col,
            vec_col=vec_col, round_digits=round_digits,
            **(recall_kwargs or {}),
        )


def ivf_topk_from_index(
    spark,
    index_path: str,
    queries: DataFrame,
    centroids: DataFrame,
    k: int,
    nprobe: int | str = "auto",
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 5,
) -> DataFrame:
    """ANN top-k against a persisted IVF index
    (:func:`ivf_write_index`).

    ``nprobe`` DEFAULTS to ``"auto"`` (r10): the certified probe
    depth from the build-time recall marker, or the enforced exact
    scan when certification found the corpus unclusterable. An
    integer nprobe is the explicit uncertified override (required
    for indexes built with ``target_recall=None``, and what the
    oracle-replayed registry queries pin for determinism).

    Probe-cell selection runs on the broadcast centroid table exactly
    as in :func:`ivf_topk`; the union of probed cells (≤ nprobe·|Q|
    ids — driver-side metadata, not data) becomes a static
    ``cell_id IN (...)`` predicate so the scan partition-prunes to the
    probed inverted lists. Candidates then broadcast-join the probes
    and exact-rank — identical semantics to :func:`ivf_topk`, minus
    the per-query assignment scan.

    ``nprobe="auto"`` reads the build-time recall marker
    (:func:`ann_recall_estimate`): the recommended nprobe when the
    measured curve reaches the build's recall target, or the
    exact-scan fallback (:func:`exact_topk_from_index`) when it
    recorded that NO nprobe rung does — a user pointing the probe at
    unclusterable embeddings gets recall 1.0 at full-scan cost
    instead of silent coin-flip recall.
    """
    if nprobe == "auto":
        nprobe, _ = _resolve_auto_probe(spark, index_path, "ivf", k)
        if nprobe is None:
            return exact_topk_from_index(
                spark, index_path, queries, k, id_col=id_col,
                vec_col=vec_col, round_digits=round_digits,
            )
    cent = centroids.select(
        F.col("cell_id"),
        F.col(vec_col).alias("_mv"),
    ).withColumn("_mn", l2_norm(F.col("_mv"), dim))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
    ).withColumn("_qn", l2_norm(F.col("_qv"), dim))
    probe_scored = q.join(F.broadcast(cent)).select(
        "query_id",
        "_qv",
        "_qn",
        "cell_id",
        F.round(
            dot(F.col("_qv"), F.col("_mv"), dim)
            / F.greatest(F.col("_qn") * F.col("_mn"), F.lit(1e-12)),
            round_digits,
        ).alias("_cos"),
    )
    wp = Window.partitionBy("query_id").orderBy(
        F.col("_cos").desc(), F.col("cell_id").asc()
    )
    probes = (
        probe_scored.withColumn("_rn", F.row_number().over(wp))
        .filter(F.col("_rn") <= nprobe)
        .select("query_id", "_qv", "_qn", "cell_id")
        # two consumers (driver collect of cell ids + the candidate
        # join's broadcast side): materialize the |Q|*nprobe rows once
        # or the centroid-scoring pass executes twice
        .localCheckpoint(eager=True)
    )
    probed_cells = sorted(
        {r.cell_id for r in probes.select("cell_id").distinct().collect()}
    )
    index = spark.read.parquet(index_path).filter(
        F.col("cell_id").isin(probed_cells)
    )
    cand = index.select(
        "cell_id",
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
    ).withColumn("_cn", l2_norm(F.col("_cv"), dim))
    scored = (
        F.broadcast(probes)
        .join(cand, "cell_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("_qv"), F.col("_cv"), dim)
                / F.greatest(F.col("_qn") * F.col("_cn"), F.lit(1e-12)),
                round_digits,
            ).alias("cosine"),
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


def semdedup_incremental(
    new_df: DataFrame,
    index_path: str,
    centroids: DataFrame,
    dim: int,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 5,
) -> DataFrame:
    """Incremental SemDeDup: classify a NEW batch of embeddings
    against the corpus's at-rest IVF index (:func:`ivf_write_index`)
    — the embedding twin of ``operators/dedup.dedup_incremental``.

    Every batch row comes back with a verdict: ``status`` is
    ``'near_dup'`` (cosine ≥ ``threshold`` to some already-ingested
    vector in its cell) or ``'new'``; ``dup_of`` is the matched
    corpus id (highest cosine, then smallest id — deterministic),
    ``similarity`` the rounded cosine (NULL for ``'new'``).

    This is the streaming/growing-corpus form of
    :func:`semantic_dedup`: the batch assigns to cells against the
    SAME broadcast centroids the corpus was indexed with (the cell is
    the candidate block, per the paper), the index read prunes to the
    batch's cells via the hive partitioning, and the per-row argmax
    is a map-side-combinable ``max(struct)`` — the corpus is never
    re-scanned, and per-batch cost is batch × matched-cell rows.
    Callers append survivors with ``ivf_write_index(..., mode=
    'append')`` (partition-aligned file adds) so the next batch
    dedupes against them too. NULL vectors are passed through as
    ``'new'`` with NULL similarity (no evidence — same posture as
    the text-side probe's unmatched tier).
    """
    spark = new_df.sparkSession
    null_l = F.lit(None).cast("long")
    null_d = F.lit(None).cast("double")
    vecs = new_df.filter(F.col(vec_col).isNotNull()).select(
        id_col, vec_col
    )
    assigned = ivf_assign(
        vecs, centroids, dim, id_col, vec_col, round_digits,
        cell_col="cell_id",
    ).localCheckpoint(eager=True)
    # ^ two consumers (driver collect of probed cells + the probe
    # join): materialize the batch-sized assignment once or the
    # broadcast-centroid scoring pass executes twice per micro-batch
    batch_cells = sorted(
        r.cell_id
        for r in assigned.select("cell_id").distinct().collect()
    )
    index = spark.read.parquet(index_path).filter(
        F.col("cell_id").isin(batch_cells)
    )
    b = assigned.select(
        "cell_id", F.col(id_col), F.col(vec_col).alias("_v")
    ).withColumn("_n", l2_norm(F.col("_v"), dim))
    idx = index.select(
        "cell_id",
        F.col(id_col).alias("_old"),
        F.col(vec_col).alias("_ov"),
    ).withColumn("_on", l2_norm(F.col("_ov"), dim))
    cos = F.round(
        dot(F.col("_v"), F.col("_ov"), dim)
        / F.greatest(F.col("_n") * F.col("_on"), F.lit(1e-12)),
        round_digits,
    )
    best = (
        b.join(idx, "cell_id")
        .select(
            id_col,
            cos.alias("_cos"),
            F.col("_old"),
        )
        .groupBy(id_col)
        .agg(
            F.max(
                F.struct(
                    F.col("_cos").alias("c"),
                    (-F.col("_old")).alias("negid"),
                )
            ).alias("_m")
        )
        .select(
            id_col,
            F.col("_m.c").alias("_cos"),
            (-F.col("_m.negid")).alias("_old"),
        )
    )
    verdicts = (
        new_df.select(id_col)
        .join(best, id_col, "left")
        .select(
            F.col(id_col),
            F.when(
                F.coalesce(F.col("_cos"), F.lit(-2.0))
                >= F.lit(float(threshold)),
                F.lit("near_dup"),
            )
            .otherwise(F.lit("new"))
            .alias("status"),
            F.when(
                F.coalesce(F.col("_cos"), F.lit(-2.0))
                >= F.lit(float(threshold)),
                F.col("_old").cast("long"),
            )
            .otherwise(null_l)
            .alias("dup_of"),
            F.when(
                F.coalesce(F.col("_cos"), F.lit(-2.0))
                >= F.lit(float(threshold)),
                F.col("_cos"),
            )
            .otherwise(null_d)
            .alias("similarity"),
        )
    )
    return verdicts


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
    re-ranked by exact cosine. Bucket join replaces the cross join.

    NULL embeddings are dropped at the boundary (r10 totality fix): a
    NULL vector hashes to the all-zero bucket in both engines but its
    cosine is NULL, and NULL ordering under ``desc`` differs between
    Spark (last) and SQL engines (first) — undefined rank semantics.
    A crawl corpus WILL carry NULL embeddings; they cannot be
    neighbors or queries here by definition.
    """
    embeddings = embeddings.filter(F.col(vec_col).isNotNull())
    b = hyperplane_lsh_buckets(embeddings, num_planes, dim, id_col, vec_col)
    a = b.select(
        F.col("bucket"),
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
    ).withColumn("_qn", l2_norm(F.col("_qv"), dim))
    c = b.select(
        F.col("bucket"),
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
    ).withColumn("_cn", l2_norm(F.col("_cv"), dim))
    scored = (
        a.join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("_qv"), F.col("_cv"), dim)
                / F.greatest(F.col("_qn") * F.col("_cn"), F.lit(1e-12)),
                round_digits,
            ).alias("cosine"),
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


def embedding_neardup_pairs(
    embeddings: DataFrame,
    dim: int,
    num_planes: int = 8,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Semantic near-duplicate candidate pairs: LSH-blocked cosine.

    Returns ``(id_a, id_b, cosine)`` with ``id_a < id_b`` for every
    same-bucket pair above ``threshold``. The reusable operator behind
    the ``sim_embedding_neardup`` registry query, exposed so pipelines
    (``pipelines.e4_corpus_prep``) can union semantic pairs with text
    MinHash pairs before cluster assembly — paraphrases and
    translations duplicate meaning without sharing shingles, and only
    the embedding signal catches them. Bucket equi-join, never a cross
    join; norms precomputed per vector before the pair stage.

    The within-bucket join is quadratic PER BUCKET, so ``num_planes``
    is the scale lever: 2^planes buckets must keep the expected bucket
    occupancy small relative to the corpus (raise it as the corpus
    grows; at 100 TB you want enough planes that a bucket holds
    thousands, not millions). ``max_bucket_size`` is the backstop for
    degenerate buckets the planes cannot split (e.g. a spike of
    identical embeddings): over-occupied buckets are dropped after a
    map-side occupancy count, exactly like
    ``dedup.lsh_candidate_pairs`` — identical-vector spikes are
    exact-dedup territory, not a quadratic join's. NULL vectors are
    excluded up front — they would all collide into one bucket and
    contribute nothing but NULL cosines.
    """
    b = hyperplane_lsh_buckets(
        embeddings.filter(F.col(vec_col).isNotNull()),
        num_planes=num_planes,
        dim=dim,
        id_col=id_col,
        vec_col=vec_col,
    )
    if max_bucket_size is not None:
        ok = (
            b.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") <= max_bucket_size)
            .select("bucket")
        )
        b = b.join(ok, "bucket", "left_semi")
    bd = b.select(
        "bucket", F.col(id_col), F.col(vec_col).alias("_v")
    ).withColumn("_n", l2_norm(F.col("_v"), dim))
    a = bd.alias("a")
    c = bd.alias("c")
    cos = dot(F.col("a._v"), F.col("c._v"), dim) / F.greatest(
        F.col("a._n") * F.col("c._n"), F.lit(1e-12)
    )
    return (
        a.join(
            c,
            (F.col("a.bucket") == F.col("c.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"c.{id_col}")),
        )
        .filter(cos > F.lit(threshold))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"c.{id_col}").alias("id_b"),
            F.round(cos, 5).alias("cosine"),
        )
    )


def semantic_dedup(
    embeddings: DataFrame,
    centroids: DataFrame | None,
    dim: int,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 5,
    max_cell_size: int | None = None,
    checkpoint: bool = True,
    assign: str = "arrow",
    vecs_per_cell: int = 128,
    train_iters: int = 3,
    train_cache_key: str | None = None,
    train_sample_n: int = 1 << 18,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication") — cluster-scoped
    semantic dedup for training corpora.

    The construction from the paper: k-means-cluster the embedding
    space, then compare each document ONLY against its own cluster
    (the cluster is the candidate block, so there is never a corpus-
    wide pair stage); within a cluster a document is a semantic
    duplicate if its cosine to some better-keep-priority document
    exceeds ``threshold``. Keep priority follows the paper's published
    choice — LOW similarity to the cluster centroid first (they keep
    the *atypical* representative of each duplicate group) — with the
    document id as the deterministic tiebreak, and "duplicate of a
    better-ranked doc" is the paper's upper-triangular max over the
    within-cluster similarity matrix (a dropped doc still suppresses
    worse-ranked near-copies, so no sequential sweep is needed).

    Scale design (100 TB posture):

    * ``centroids`` come from the bounded sample-to-driver trainer
      (:func:`kmeans_centroids_local` / the BLAS tier) and broadcast;
      cell assignment is one map-side argmax aggregate — the corpus
      shuffles once, keyed by ``cell_id``.
    * The pair stage is an equi-join on ``cell_id``: quadratic per
      CELL, linear in cells. ``n_cells`` is the scale lever (the
      paper runs 110k clusters for LAION-440M); ``max_cell_size`` is
      the degenerate-cell backstop, mirroring
      :func:`embedding_neardup_pairs`'s bucket cap.
    * Only ``(cell_id, rank, id, vec)`` rows enter the pair join; the
      aggregate folds each doc's candidate rows to ONE row map-side
      (max of rounded cosine), so the post-join exchange carries N
      rows.

    Deterministic and engine-replayable: centroid cosines round
    HALF_UP at ``round_digits`` before ranking, pair cosines before
    the max; the DuckDB oracle replays training, ranking and the
    upper-triangular max bit-for-bit.

    Returns ``(id, cell_id, rnk, max_cos_better, dropped)`` — an
    auditable report (one row per input doc — INCLUDING docs the pair
    stage skips: NULL-vector docs and docs in cells over
    ``max_cell_size`` come back as kept pass-through rows with NULL
    rank/cosine, never silently absent) rather than the filtered
    corpus, so the keep/drop decision itself is the checked artifact;
    callers filter ``~dropped`` and join back by id (wide doc columns
    never enter the pair stage).

    ``assign``: ``"arrow"`` (default) runs :func:`ivf_assign_arrow`'s
    per-batch BLAS matmul — the index-build formulation, mandatory
    once cells number in the hundreds+ (the O(N·C·dim) expression pass
    dominates otherwise); ``"expr"`` scores cells through the codegen
    dot expression — kept for the oracle-replayable small-cell-count
    gate (the two are cell- and cosine-identical by the rounding
    parity contract, pinned by ``tests/test_semdedup.py``).

    ``centroids=None`` (the PRODUCTION default) trains them here with
    cells ∝ corpus — ``max(16, N/vecs_per_cell)`` cells via the BLAS
    trainer (:func:`kmeans_centroids_numpy`) — the paper's recipe
    (110k cells for LAION-440M ≈ 4k vec/cell; 128 is this engine's
    measured 2–3×/decade knob, SCALE_sf*.json). A FIXED cell count
    makes the per-cell pair stage quadratic in the corpus (the r5
    registry leg measured 26×/decade at its pinned n_cells=16) — pass
    explicit ``centroids`` only when replaying an oracle or reusing a
    trained quantizer.
    """
    if centroids is None:
        # probe the trainer cache FIRST: a warm train_cache_key must
        # not pay the full-corpus sizing count below (the cache's
        # "a hit costs nothing" contract)
        centroids = _cache_get(
            embeddings.sparkSession, train_cache_key,
            ns="kmeans_centroids_numpy",
        )
    if centroids is None:
        # size cells from NON-NULL vectors only (NULL-vector docs skip
        # assignment entirely and would otherwise inflate n_cells),
        # and cap n_cells so each cell trains on >= 4 sample vectors —
        # the uncapped N/vecs_per_cell would exceed the trainer sample
        # past ~sample_n*vecs_per_cell/4 corpus vectors and raise.
        # For genuinely huge corpora raise ``train_sample_n`` with the
        # corpus (FAISS guidance: ~100-1000 training points per cell).
        n = embeddings.filter(F.col(vec_col).isNotNull()).count()
        if n == 0:
            # nothing to train on: every doc is a NULL-vector
            # pass-through row. Empty centroid table + expression
            # assignment (the BLAS path can't argmax over zero
            # centroids) keeps the one-row-per-input-doc contract
            # instead of the trainer raising.
            from pyspark.sql import types as T

            centroids = literal_rows_df(
                embeddings.sparkSession,
                [],
                T.StructType(
                    [
                        T.StructField("cell_id", T.LongType()),
                        T.StructField(
                            vec_col, embeddings.schema[vec_col].dataType
                        ),
                    ]
                ),
            )
            assign = "expr"
        else:
            # never ask for more cells than there are vectors — the
            # floor of 16 previously made any corpus with < 16
            # non-null vectors raise inside the trainer instead of
            # deduping it
            n_cells = max(16, int(n // max(1, int(vecs_per_cell))))
            n_cells = min(n_cells, max(16, int(train_sample_n) // 4))
            n_cells = min(n_cells, n)
            centroids = kmeans_centroids_numpy(
                embeddings,
                n_cells=n_cells,
                iters=train_iters,
                id_col=id_col,
                vec_col=vec_col,
                sample_n=int(train_sample_n),
                cache_key=train_cache_key,
            )
    if assign == "arrow":
        assigned = ivf_assign_arrow(
            embeddings,
            centroids,
            dim,
            id_col,
            vec_col,
            round_digits,
            cell_col="cell_id",
            keep_cos=True,
        ).select(
            id_col, "cell_id", "_ccos", F.col(vec_col).alias("_v")
        )
    else:
        cent = centroids.select(
            F.col("cell_id").cast("long").alias("cell_id"),
            F.col(vec_col).alias("_mv"),
        ).withColumn("_mn", l2_norm(F.col("_mv"), dim))
        v = embeddings.filter(F.col(vec_col).isNotNull()).select(
            F.col(id_col), F.col(vec_col).alias("_v")
        ).withColumn("_n", l2_norm(F.col("_v"), dim))
        scored = v.join(F.broadcast(cent)).select(
            id_col,
            "_v",
            "cell_id",
            F.round(
                dot(F.col("_v"), F.col("_mv"), dim)
                / F.greatest(F.col("_n") * F.col("_mn"), F.lit(1e-12)),
                round_digits,
            ).alias("_ccos"),
        )
        assigned = scored.groupBy(id_col).agg(
            F.max(
                F.struct(
                    F.col("_ccos").alias("c"),
                    (-F.col("cell_id")).cast("long").alias("negid"),
                    F.col("_v").alias("v"),
                )
            ).alias("_m")
        ).select(
            id_col,
            (-F.col("_m.negid")).alias("cell_id"),
            F.col("_m.c").alias("_ccos"),
            F.col("_m.v").alias("_v"),
        )
    # pass-through rows keep the "one row per input doc" contract:
    # NULL-vector docs and docs in oversized (capped) cells are KEPT
    # (dropped=false) with NULL rank/cosine — a caller who filters
    # ~dropped never silently loses documents the pair stage skipped.
    skipped = embeddings.filter(F.col(vec_col).isNull()).select(
        F.col(id_col),
        F.lit(None).cast("long").alias("cell_id"),
        F.lit(None).cast("int").alias("rnk"),
        F.lit(None).cast("double").alias("max_cos_better"),
        F.lit(False).alias("dropped"),
    )
    if max_cell_size is not None:
        # the cap fans the assignment out to THREE consumers (the
        # occupancy agg, the pass-through anti-join, the semi-join) —
        # materialize it once or the Arrow/BLAS assignment stage
        # re-executes per consumer (measured 9x at 200k vectors)
        if checkpoint:
            assigned = assigned.localCheckpoint(eager=True)
        ok = (
            assigned.groupBy("cell_id")
            .agg(F.count(F.lit(1)).alias("_cn"))
            .filter(F.col("_cn") <= max_cell_size)
            .select("cell_id")
        )
        over = assigned.join(F.broadcast(ok), "cell_id", "left_anti").select(
            F.col(id_col),
            F.col("cell_id"),
            F.lit(None).cast("int").alias("rnk"),
            F.lit(None).cast("double").alias("max_cos_better"),
            F.lit(False).alias("dropped"),
        )
        skipped = skipped.unionByName(over)
        assigned = assigned.join(F.broadcast(ok), "cell_id", "left_semi")
    w = Window.partitionBy("cell_id").orderBy(
        F.col("_ccos").asc(), F.col(id_col).asc()
    )
    ranked = assigned.withColumn("rnk", F.row_number().over(w)).withColumn(
        "_vn", l2_norm(F.col("_v"), dim)
    )
    if checkpoint:
        # the ranked assignment feeds BOTH self-join sides and the
        # final report; materialize it once so the broadcast-centroid
        # scoring pass doesn't re-execute per consumer (at rest this
        # is the ivf_write_index pattern — assignment persisted, pair
        # stage reads it)
        ranked = ranked.localCheckpoint(eager=True)
    a = ranked.alias("a")  # candidate under test
    b = ranked.alias("b")  # better keep-priority docs in the same cell
    pair_cos = F.round(
        dot(F.col("a._v"), F.col("b._v"), dim)
        / F.greatest(F.col("a._vn") * F.col("b._vn"), F.lit(1e-12)),
        round_digits,
    )
    best = (
        a.join(
            b,
            (F.col("a.cell_id") == F.col("b.cell_id"))
            & (F.col("b.rnk") < F.col("a.rnk")),
        )
        .groupBy(F.col(f"a.{id_col}").alias(id_col))
        .agg(F.max(pair_cos).alias("max_cos_better"))
    )
    return (
        ranked.join(best, id_col, "left")
        .select(
            F.col(id_col),
            F.col("cell_id"),
            F.col("rnk").cast("int").alias("rnk"),
            F.col("max_cos_better"),
            (
                F.coalesce(F.col("max_cos_better"), F.lit(-2.0))
                >= F.lit(threshold)
            ).alias("dropped"),
        )
        .unionByName(skipped)
    )


# ---------------------------------------------------------------------------
# Product quantization (IVF-PQ's compression half) — Jégou, Douze,
# Schmid, "Product Quantization for Nearest Neighbor Search", TPAMI
# 2011. The reference repo has no ANN surface at all (its embeddings
# use cases stop at batch scoring); PQ is here because it is the
# standard way a 100 TB corpus makes billion-vector search tractable:
# each vector is stored as ``n_subspaces`` one-byte codes (M bytes vs
# dim×4), and query scoring reads ONLY the codes plus a per-query
# lookup table — the full vectors are touched just for the final
# re-rank of a few candidates.
# ---------------------------------------------------------------------------


def pq_train_local(
    embeddings: DataFrame,
    n_subspaces: int,
    n_codes: int,
    iters: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 5,
    sample_n: int = 1 << 18,
    cache_key: str | None = None,
) -> DataFrame:
    """Train PQ codebooks → ``(subspace, code, subvec)`` table.

    ``n_subspaces`` independent Lloyd k-means runs, one per
    ``dim/n_subspaces``-wide coordinate block, each under squared-L2
    distance (the PQ objective: minimize reconstruction error, not
    cosine). Training follows the same deterministic, cross-engine
    recipe as :func:`kmeans_centroids_local` — bounded lowest-id
    sample collected to the driver (FAISS-style: quantizer quality
    needs ~(100-1000)×n_codes points, never the corpus), seeds are the
    sample vectors with id < ``n_codes``, distances round HALF_UP at
    ``round_digits`` before the argmin (tie → smallest code), means
    are fixed-point integer sums at ``KMEANS_SCALE``. The squared
    distance is evaluated as ``(x·x − 2·x·c) + c·c`` — that exact IEEE
    operation order — in this trainer, in :func:`pq_encode`'s column
    expression, and in the DuckDB oracle, so all three engines pick
    identical codes. When ``sample_n`` covers the corpus (test scale)
    the result is bit-identical to full-corpus training.
    """
    cached = _cache_get(embeddings.sparkSession, cache_key, ns="pq_train_local")
    if cached is not None:
        return cached
    spark = embeddings.sparkSession
    sub = dim // n_subspaces
    vecs = _collect_sample(embeddings, id_col, vec_col, sample_n)
    cb = _pq_lloyd_from_vecs(
        spark, vecs, n_subspaces, n_codes, iters, sub, round_digits
    )
    _cache_put(spark, cache_key, cb, ns="pq_train_local")
    return cb


def _collect_sample(
    embeddings: DataFrame, id_col: str, vec_col: str, sample_n: int
) -> list[tuple[int, list[float]]]:
    """The ``sample_n`` lowest-id vectors as Python lists (one bounded
    TakeOrderedAndProject job — the shared trainer-sample primitive)."""
    rows = (
        embeddings.filter(F.col(vec_col).isNotNull())
        .select(F.col(id_col).cast("long").alias("_id"), F.col(vec_col))
        .orderBy("_id")
        .limit(sample_n)
        .collect()
    )
    return [(r[0], [float(x) for x in r[1]]) for r in rows]


def _dot_seq(a: list[float], b: list[float]) -> float:
    """Left-to-right sequential dot — the arithmetic order DuckDB's
    ``list_dot_product`` and the engine's ``zip_with``+``aggregate``
    expression both use."""
    s = 0.0
    for x, y in zip(a, b):
        s += x * y
    return s


def _pq_lloyd_from_vecs(
    spark,
    vecs: list[tuple[int, list[float]]],
    n_subspaces: int,
    n_codes: int,
    iters: int,
    sub: int,
    round_digits: int,
) -> DataFrame:
    """The shared per-subspace Lloyd loop over already-collected
    vectors (raw embeddings or residuals): squared-L2 assignment as
    ``(x·x − 2·x·c) + c·c`` rounded HALF_UP (tie → smallest code),
    fixed-point integer means. Seeds are the vectors whose sample id
    is < ``n_codes``."""
    out: list[tuple[int, int, list[float]]] = []
    for j in range(n_subspaces):
        svecs = [(i, v[j * sub : (j + 1) * sub]) for i, v in vecs]
        cents: list[tuple[int, list[float]]] = [
            (int(i), sv) for i, sv in svecs if i < n_codes
        ]
        # Same seed convention as the oracles (id < n_codes); with
        # gapped ids the seed set shrinks and, at zero seeds,
        # best_code would stay None and emit NULL-code rows — raise
        # instead of silently training a degenerate codebook.
        if len(cents) < n_codes:
            raise ValueError(
                f"pq seeding found {len(cents)} sample vectors with "
                f"id < {n_codes}; the id<n_codes seed convention "
                "requires contiguous ids from 0 — re-key the corpus "
                "or pass pre-trained codebooks"
            )
        for _ in range(iters):
            withn = [(c, cv, _dot_seq(cv, cv)) for c, cv in cents]
            sums: dict[int, list[int]] = {}
            counts: dict[int, int] = {}
            for _vid, sv in svecs:
                xx = _dot_seq(sv, sv)
                best_code, best_d = None, None
                for code, cv, cc in withn:
                    d = _round_half_up(
                        (xx - 2 * _dot_seq(sv, cv)) + cc, round_digits
                    )
                    if best_d is None or d < best_d:
                        best_code, best_d = code, d
                acc = sums.get(best_code)
                if acc is None:
                    acc = [0] * sub
                    sums[best_code] = acc
                for i, x in enumerate(sv):
                    acc[i] += int(_round_half_up(x * KMEANS_SCALE, 0))
                counts[best_code] = counts.get(best_code, 0) + 1
            cents = [
                (c, [(s / KMEANS_SCALE) / counts[c] for s in sums[c]])
                for c in sorted(sums)
            ]
        out.extend((j, c, cv) for c, cv in cents)
    return literal_rows_df(
        spark, out, "subspace int, code long, subvec array<double>"
    )


def pq_train_residual_local(
    embeddings: DataFrame,
    centroids: DataFrame,
    n_subspaces: int,
    n_codes: int,
    iters: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 5,
    sample_n: int = 1 << 18,
    cache_key: str | None = None,
) -> DataFrame:
    """Train PQ codebooks on IVF RESIDUALS (x − its cell centroid) —
    the FAISS IVFx,PQy refinement: residuals concentrate around the
    origin, so the same code budget quantizes them with far less
    error than raw vectors. One shared codebook across cells (the
    standard construction; per-cell books multiply model size by
    n_cells for marginal gain).

    Deterministic and engine-replayable like every trainer here: the
    sample's cell assignment replicates ``ivf_assign`` exactly
    (rounded-HALF_UP cosine argmax, tie → smallest cell), residuals
    are elementwise IEEE subtraction, and the per-subspace Lloyd loop
    is :func:`_pq_lloyd_from_vecs` verbatim.
    """
    cached = _cache_get(embeddings.sparkSession, cache_key, ns="pq_train_residual_local")
    if cached is not None:
        return cached
    spark = embeddings.sparkSession
    sub = dim // n_subspaces
    vecs = _collect_sample(embeddings, id_col, vec_col, sample_n)
    cents = [
        (int(r[0]), [float(x) for x in r[1]])
        for r in centroids.select("cell_id", vec_col).collect()
    ]
    cents.sort(key=lambda t: t[0])
    withn = [(cid, cv, math_sqrt(_dot_seq(cv, cv))) for cid, cv in cents]
    residuals: list[tuple[int, list[float]]] = []
    for vid, v in vecs:
        nv = math_sqrt(_dot_seq(v, v))
        best_cell, best_cos, best_cv = None, None, None
        for cid, cv, nc in withn:
            c = _round_half_up(
                _dot_seq(v, cv) / max(nv * nc, 1e-12), round_digits
            )
            if best_cos is None or c > best_cos:
                best_cell, best_cos, best_cv = cid, c, cv
        residuals.append((vid, [x - y for x, y in zip(v, best_cv)]))
    cb = _pq_lloyd_from_vecs(
        spark, residuals, n_subspaces, n_codes, iters, sub, round_digits
    )
    _cache_put(spark, cache_key, cb, ns="pq_train_residual_local")
    return cb


def _subspace_slices(
    vec: Column, n_subspaces: int, sub: int
) -> Column:
    """``array<struct<subspace:int, _sv:array<double>>>`` of the
    vector's coordinate blocks (1-based slice, matching DuckDB's
    ``list_slice``)."""
    return F.array(
        *[
            F.struct(
                F.lit(j).alias("subspace"),
                F.slice(_as_double(vec), j * sub + 1, sub).alias("_sv"),
            )
            for j in range(n_subspaces)
        ]
    )


def pq_encode(
    embeddings: DataFrame,
    codebooks: DataFrame,
    n_subspaces: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 5,
) -> DataFrame:
    """Quantize each vector → ``(id_col, subspace, code)``.

    Codebooks broadcast (``n_subspaces × n_codes`` rows), so scoring
    is a map-side pass; the argmin is a ``min(struct(d², code))``
    aggregation — partial aggregation combines the ``n_codes``
    candidate rows per (vector, subspace) on the map side, so the one
    exchange carries N×M skinny rows (id, subspace, code), never the
    vectors themselves. At 100 TB this runs once at ingest and the
    codes (M bytes/vector) are what the ADC scan reads ever after.
    """
    sub = dim // n_subspaces
    # x·x is codeword-independent and c·c is vector-independent, so
    # both are projected BEFORE the broadcast join — the per-pair
    # expression evaluates one dot instead of three, while the final
    # arithmetic keeps the exact cross-engine IEEE order
    # ``(x·x − 2·x·c) + c·c``.
    ex = (
        embeddings.filter(F.col(vec_col).isNotNull())
        .select(
            F.col(id_col),
            F.explode(
                _subspace_slices(F.col(vec_col), n_subspaces, sub)
            ).alias("_e"),
        )
        .select(
            id_col,
            F.col("_e.subspace").alias("subspace"),
            F.col("_e._sv").alias("_sv"),
        )
        .withColumn("_xx", dot(F.col("_sv"), F.col("_sv")))
    )
    cb = codebooks.select(
        "subspace", "code", F.col("subvec").alias("_cv")
    ).withColumn("_cc", dot(F.col("_cv"), F.col("_cv")))
    d2 = F.round(
        (F.col("_xx") - 2 * dot(F.col("_sv"), F.col("_cv"))) + F.col("_cc"),
        round_digits,
    )
    scored = ex.join(F.broadcast(cb), "subspace").select(
        id_col, "subspace", F.col("code"), d2.alias("_d2")
    )
    best = scored.groupBy(id_col, "subspace").agg(
        F.min(
            F.struct(F.col("_d2").alias("d"), F.col("code").alias("c"))
        ).alias("_m")
    )
    return best.select(id_col, "subspace", F.col("_m.c").alias("code"))


def pq_encode_arrow(
    embeddings: DataFrame,
    codebooks: DataFrame,
    n_subspaces: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 5,
) -> DataFrame:
    """Quantize each vector → ``(id_col, subspace, code)`` on the
    Arrow/numpy path — the scale formulation of :func:`pq_encode`
    (same recipe as :func:`brute_force_topk_arrow`).

    The expression form materializes one scored row per (vector,
    subspace, codeword) before the argmin aggregation — correct, and
    2× cheaper since the r4 x·x / c·c hoist, but the N×M×K candidate
    rows still exist and the interpreted lambda chain dominated the
    sf10 encode stage (57 s, PERF.md). Here the codebooks (tiny:
    ``n_subspaces × n_codes`` subvectors) are collected once and
    broadcast as numpy matrices; one ``mapInPandas`` pass computes
    each Arrow batch's ``B × n_codes`` distance matrix per subspace
    with a single BLAS matmul and emits the argmin codes directly —
    no candidate materialization, no exchange at all (the expression
    path's one exchange carried the argmin partials; this path's
    output is already one row per (vector, subspace)).

    Parity contract: identical codes to :func:`pq_encode` — the same
    ``(x·x − 2·x·c) + c·c`` arithmetic, the same HALF_UP rounding at
    ``round_digits`` (sign-aware ``floor(|x|·10^d + 0.5)``; numpy's
    default is half-to-even), ties → smallest code (argmin returns
    the first minimum and rows are code-ordered). numpy's pairwise
    summation can differ from the sequential expression dot below the
    rounding threshold; the rounding absorbs it (pinned by
    ``tests/test_pq.py``'s parity test on the driver fixtures).
    """
    import numpy as np

    sub = dim // n_subspaces
    cb_rows = codebooks.select("subspace", "code", "subvec").collect()
    by_sub: dict[int, list] = {}
    for r in cb_rows:
        by_sub.setdefault(int(r[0]), []).append(
            (int(r[1]), [float(x) for x in r[2]])
        )
    cmats = []
    ccods = []
    for m in range(n_subspaces):
        entries = sorted(by_sub.get(m, []))  # code-ordered → argmin tie
        ccods.append(np.array([c for c, _ in entries], dtype="int64"))
        cmats.append(np.array([v for _, v in entries], dtype="float64"))
    sc = embeddings.sparkSession.sparkContext
    bc = sc.broadcast((cmats, ccods))

    out_schema = f"{id_col} long, subspace int, code long"

    def encode(batches):
        import numpy as np
        import pandas as pd

        mats, cods = bc.value
        p = 10.0 ** round_digits
        for pdf in batches:
            pdf = pdf[pdf[vec_col].notna()]
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy(dtype="int64")
            x = np.stack(
                [np.asarray(v, dtype="float64") for v in pdf[vec_col]]
            )
            out_ids = []
            out_sub = []
            out_code = []
            for m in range(n_subspaces):
                xm = x[:, m * sub : (m + 1) * sub]
                cm, codes_m = mats[m], cods[m]
                xx = (xm * xm).sum(axis=1)
                cc = (cm * cm).sum(axis=1)
                d2 = (xx[:, None] - 2.0 * (xm @ cm.T)) + cc[None, :]
                d2 = np.sign(d2) * np.floor(np.abs(d2) * p + 0.5) / p
                best = codes_m[np.argmin(d2, axis=1)]
                out_ids.append(ids)
                out_sub.append(np.full(len(ids), m, dtype="int32"))
                out_code.append(best)
            yield pd.DataFrame(
                {
                    id_col: np.concatenate(out_ids),
                    "subspace": np.concatenate(out_sub),
                    "code": np.concatenate(out_code),
                }
            )

    return embeddings.select(
        F.col(id_col).cast("long").alias(id_col), vec_col
    ).mapInPandas(encode, schema=out_schema)


def pq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int,
    n_subspaces: int = 8,
    n_codes: int = 16,
    iters: int = 2,
    dim: int = 64,
    candidates: int = 20,
    codebooks: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 5,
    cache_key: str | None = None,
    codes: DataFrame | None = None,
) -> DataFrame:
    """ADC (asymmetric-distance) top-k over PQ codes + exact re-rank.

    Approximate cosine from codes alone: the dot product decomposes
    exactly over the disjoint coordinate blocks, so
    ``q·x̃ = Σ_m q_m·c_{m,code_m}`` and ``|x̃|² = Σ_m |c_{m,code_m}|²``
    — both read from a per-query lookup table of
    ``n_subspaces × n_codes`` entries. The LUT partials are stored as
    ``KMEANS_SCALE`` fixed-point integers so the Σ over subspaces is
    an exact, order-independent integer sum (cross-engine-identical);
    the rounded approximate cosine ranks candidates, and only the top
    ``candidates`` per query touch full vectors for the exact re-rank.

    Plan shape: codes ⋈ broadcast LUT (map-side) → one combine-heavy
    groupBy whose exchange carries ≤ N×|Q| partial rows → top-C window
    over (query, approx score) → candidate-only exact cosine. The
    corpus' full vectors are read once (encode) and again only for
    C×|Q| candidate rows; at billion-vector scale the ADC scan touches
    M bytes per vector instead of dim×4.

    ``codes``: optional precomputed ``(id_col, subspace, code)`` frame
    — the :func:`pq_encode_arrow` output for the SAME corpus and
    codebooks. sim_pq_battery encodes once and shares the frame with
    its ivfpq rung (guide §2.4: one materialized exchange replaces a
    second full-corpus encode pass); results are unchanged by
    construction (same codes feed the same ADC arithmetic).

    Returns ``(query_id, neighbor_id, cosine, approx_cosine, rank)``.
    """
    if codebooks is None:
        codebooks = pq_train_local(
            embeddings,
            n_subspaces=n_subspaces,
            n_codes=n_codes,
            iters=iters,
            dim=dim,
            id_col=id_col,
            vec_col=vec_col,
            round_digits=round_digits,
            cache_key=cache_key,
        )
    sub = dim // n_subspaces
    if codes is None:
        # Arrow/BLAS encode (18x the expression path at sf10: 50.6 s ->
        # 2.8 s, PERF.md) — code-identical by the parity contract pinned
        # in tests/test_pq.py; the expression encoder remains the
        # zero-Python baseline.
        codes = pq_encode_arrow(
            embeddings, codebooks, n_subspaces, dim, id_col, vec_col,
            round_digits,
        )
    cb = codebooks.select("subspace", "code", F.col("subvec").alias("_cv"))
    qex = (
        queries.filter(F.col(vec_col).isNotNull())
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("_qv"),
        )
        .withColumn("_qn", l2_norm(F.col("_qv"), dim))
        .select(
            "query_id",
            "_qn",
            F.explode(
                _subspace_slices(F.col("_qv"), n_subspaces, sub)
            ).alias("_e"),
        )
        .select(
            "query_id",
            "_qn",
            F.col("_e.subspace").alias("subspace"),
            F.col("_e._sv").alias("_qsv"),
        )
    )
    lut = qex.join(cb, "subspace").select(
        "query_id",
        "_qn",
        "subspace",
        "code",
        F.round(dot(F.col("_qsv"), F.col("_cv")) * KMEANS_SCALE)
        .cast("long")
        .alias("_pd"),
        F.round(dot(F.col("_cv"), F.col("_cv")) * KMEANS_SCALE)
        .cast("long")
        .alias("_cn2"),
    )
    adc = (
        codes.join(F.broadcast(lut), ["subspace", "code"])
        .groupBy("query_id", id_col)
        .agg(
            F.sum("_pd").alias("_sd"),
            F.sum("_cn2").alias("_sn2"),
            F.max("_qn").alias("_qn"),
        )
    )
    approx = F.round(
        (F.col("_sd").cast("double") / KMEANS_SCALE)
        / F.greatest(
            F.col("_qn")
            * F.sqrt(F.col("_sn2").cast("double") / KMEANS_SCALE),
            F.lit(1e-12),
        ),
        round_digits,
    )
    wc = Window.partitionBy("query_id").orderBy(
        F.col("approx_cosine").desc(), F.col(id_col).asc()
    )
    cand = (
        adc.filter(F.col("query_id") != F.col(id_col))
        .withColumn("approx_cosine", approx)
        .withColumn("_rn", F.row_number().over(wc))
        .filter(F.col("_rn") <= candidates)
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            "approx_cosine",
        )
    )
    corpus = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cvf")
    ).withColumn("_cn", l2_norm(F.col("_cvf"), dim))
    qvec = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qvf")
    ).withColumn("_qnf", l2_norm(F.col("_qvf"), dim))
    rer = (
        cand.join(corpus, "neighbor_id")
        .join(F.broadcast(qvec), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            "approx_cosine",
            F.round(
                dot(F.col("_qvf"), F.col("_cvf"), dim)
                / F.greatest(F.col("_qnf") * F.col("_cn"), F.lit(1e-12)),
                round_digits,
            ).alias("cosine"),
        )
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        rer.withColumn("_rn", F.row_number().over(wr))
        .filter(F.col("_rn") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "cosine",
            "approx_cosine",
            F.col("_rn").alias("rank"),
        )
    )


def ivf_pq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int,
    n_cells: int = 16,
    nprobe: int = 4,
    n_subspaces: int = 8,
    n_codes: int = 16,
    iters: int = 2,
    dim: int = 64,
    candidates: int = 20,
    centroids: DataFrame | None = None,
    codebooks: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 5,
    codes: DataFrame | None = None,
    assigned: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ: the canonical billion-vector ANN layout (FAISS
    ``IVFx,PQy``; Jégou et al. 2011) — IVF cell pruning bounds WHICH
    vectors are scored, PQ codes bound WHAT is read per vector, and an
    exact re-rank of ``candidates`` rows restores true cosines at the
    top.

    Pipeline: nearest-centroid cell assignment (broadcast centroids,
    ``max(struct)`` argmax), PQ encoding (global codebooks — the
    residual-encoding refinement would subtract the cell centroid
    before quantizing; omitted to keep the construction exactly
    replayable in SQL, and documented here as the upgrade path), per-
    query ``nprobe`` cell probes, then fixed-point ADC scoring of ONLY
    the probed cells' codes, top-``candidates`` cut, exact re-rank.

    Scale shape: at rest the corpus is stored bucketed by ``cell_id``
    with its M-byte codes; a query touches ``nprobe/n_cells`` of the
    rows and ``M`` bytes per touched row — the two multiplicative
    reductions compose. Every join here is broadcast (probes, LUT,
    query vectors); the only wide exchanges are the encode argmin and
    the per-(query, vector) ADC sum, both map-side combinable.

    ``codes`` / ``assigned``: optional precomputed frames (the
    :func:`pq_encode_arrow` / :func:`ivf_assign` outputs for the same
    corpus, codebooks and centroids). sim_pq_battery shares one codes
    frame with its flat-PQ rung and one assignment frame with its
    residual rung (guide §2.4); results are unchanged by construction.

    Returns ``(query_id, neighbor_id, cosine, approx_cosine, rank)``.
    """
    if centroids is None:
        centroids = embeddings.filter(F.col(id_col) < n_cells).select(
            F.col(id_col).cast("long").alias("cell_id"), F.col(vec_col)
        )
    if codebooks is None:
        codebooks = pq_train_local(
            embeddings,
            n_subspaces=n_subspaces,
            n_codes=n_codes,
            iters=iters,
            dim=dim,
            id_col=id_col,
            vec_col=vec_col,
            round_digits=round_digits,
        )
    if assigned is None:
        assigned = ivf_assign(
            embeddings, centroids, dim, id_col, vec_col, round_digits,
            cell_col="cell_id",
        )
    if codes is None:
        # Arrow/BLAS encode (18x the expression path at sf10: 50.6 s ->
        # 2.8 s, PERF.md) — code-identical by the parity contract pinned
        # in tests/test_pq.py; the expression encoder remains the
        # zero-Python baseline.
        codes = pq_encode_arrow(
            embeddings, codebooks, n_subspaces, dim, id_col, vec_col,
            round_digits,
        )

    # per-query nprobe cell probes (identical construction to ivf_topk)
    cent = centroids.select(
        F.col("cell_id"), F.col(vec_col).alias("_mv")
    ).withColumn("_mn", l2_norm(F.col("_mv"), dim))
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    ).withColumn("_qn", l2_norm(F.col("_qv"), dim))
    probe_scored = q.join(F.broadcast(cent)).select(
        "query_id",
        "cell_id",
        F.round(
            dot(F.col("_qv"), F.col("_mv"), dim)
            / F.greatest(F.col("_qn") * F.col("_mn"), F.lit(1e-12)),
            round_digits,
        ).alias("_cos"),
    )
    wp = Window.partitionBy("query_id").orderBy(
        F.col("_cos").desc(), F.col("cell_id").asc()
    )
    probes = (
        probe_scored.withColumn("_rn", F.row_number().over(wp))
        .filter(F.col("_rn") <= nprobe)
        .select("query_id", "cell_id")
    )

    # per-query ADC lookup table over the codebooks (fixed-point)
    sub = dim // n_subspaces
    cb = codebooks.select("subspace", "code", F.col("subvec").alias("_cv"))
    qex = (
        q.select(
            "query_id",
            "_qn",
            F.explode(
                _subspace_slices(F.col("_qv"), n_subspaces, sub)
            ).alias("_e"),
        )
        .select(
            "query_id",
            "_qn",
            F.col("_e.subspace").alias("subspace"),
            F.col("_e._sv").alias("_qsv"),
        )
    )
    lut = qex.join(cb, "subspace").select(
        "query_id",
        "_qn",
        "subspace",
        "code",
        F.round(dot(F.col("_qsv"), F.col("_cv")) * KMEANS_SCALE)
        .cast("long")
        .alias("_pd"),
        F.round(dot(F.col("_cv"), F.col("_cv")) * KMEANS_SCALE)
        .cast("long")
        .alias("_cn2"),
    )

    # ADC over probed cells only
    probed = (
        assigned.select("cell_id", F.col(id_col))
        .join(F.broadcast(probes), "cell_id")
        .filter(F.col("query_id") != F.col(id_col))
        .select("query_id", id_col)
    )
    adc = (
        probed.join(codes, id_col)
        .join(F.broadcast(lut), ["query_id", "subspace", "code"])
        .groupBy("query_id", id_col)
        .agg(
            F.sum("_pd").alias("_sd"),
            F.sum("_cn2").alias("_sn2"),
            F.max("_qn").alias("_qn"),
        )
    )
    approx = F.round(
        (F.col("_sd").cast("double") / KMEANS_SCALE)
        / F.greatest(
            F.col("_qn")
            * F.sqrt(F.col("_sn2").cast("double") / KMEANS_SCALE),
            F.lit(1e-12),
        ),
        round_digits,
    )
    wc = Window.partitionBy("query_id").orderBy(
        F.col("approx_cosine").desc(), F.col(id_col).asc()
    )
    cand = (
        adc.withColumn("approx_cosine", approx)
        .withColumn("_rn", F.row_number().over(wc))
        .filter(F.col("_rn") <= candidates)
        .select(
            "query_id", F.col(id_col).alias("neighbor_id"), "approx_cosine"
        )
    )
    corpus = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cvf")
    ).withColumn("_cn", l2_norm(F.col("_cvf"), dim))
    qvec = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qvf")
    ).withColumn("_qnf", l2_norm(F.col("_qvf"), dim))
    rer = (
        cand.join(corpus, "neighbor_id")
        .join(F.broadcast(qvec), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            "approx_cosine",
            F.round(
                dot(F.col("_qvf"), F.col("_cvf"), dim)
                / F.greatest(F.col("_qnf") * F.col("_cn"), F.lit(1e-12)),
                round_digits,
            ).alias("cosine"),
        )
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        rer.withColumn("_rn", F.row_number().over(wr))
        .filter(F.col("_rn") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "cosine",
            "approx_cosine",
            F.col("_rn").alias("rank"),
        )
    )


def ivf_pq_residual_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int,
    n_cells: int = 16,
    nprobe: int = 4,
    n_subspaces: int = 8,
    n_codes: int = 16,
    iters: int = 2,
    dim: int = 64,
    candidates: int = 20,
    centroids: DataFrame | None = None,
    codebooks: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 5,
    assigned: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ with RESIDUAL encoding — the full FAISS ``IVFx,PQy``
    construction: each vector is quantized as ``x ≈ c_cell + r̃`` where
    ``r̃`` is the PQ reconstruction of ``x − c_cell``. Residuals
    concentrate around the origin, so the same code budget carries far
    less quantization error than coding raw vectors
    (:func:`ivf_pq_topk`, the non-residual baseline).

    ADC decomposition (all terms from broadcast lookup tables, summed
    as exact int64 fixed-point):
    ``q·x̃ = q·c_cell + Σ_m q_m·r̃_m`` and
    ``|x̃|² = |c|² + 2·Σ_m c_m·r̃_m + Σ_m |r̃_m|²`` — the cross term
    does NOT vanish (residuals are not orthogonal to centroids), so a
    per-(cell, subspace, code) table carries it: n_cells×M×K entries,
    trivially broadcast. The quantized |x̃|² can round a few fixed-
    point units below zero when a residual is ~0; both engines clamp
    with ``greatest(·, 0)`` before the sqrt.

    Scale shape identical to :func:`ivf_pq_topk`: probes bound WHICH
    rows, codes bound WHAT is read, every lookup broadcasts, the two
    wide exchanges (encode argmin, per-(query, vector) ADC sum)
    combine map-side.

    ``assigned``: optional precomputed :func:`ivf_assign` output for
    the same corpus and centroids (sim_pq_battery shares one
    assignment frame with its ivfpq rung, guide §2.4 — the battery's
    Spark plan then materializes the assignment exchange once and
    ReusedExchange serves the other consumers); results are unchanged
    by construction. When built here, the corpus is pre-filtered to
    non-NULL ids — a semantic no-op (every output path inner-joins on
    the id) that keeps this function's own two ``assigned`` consumers
    (residual encode, probe scan) byte-identical below the exchange so
    the reuse also fires standalone.

    Returns ``(query_id, neighbor_id, cosine, approx_cosine, rank)``.
    """
    if centroids is None:
        centroids = embeddings.filter(F.col(id_col) < n_cells).select(
            F.col(id_col).cast("long").alias("cell_id"), F.col(vec_col)
        )
    if codebooks is None:
        codebooks = pq_train_residual_local(
            embeddings,
            centroids,
            n_subspaces=n_subspaces,
            n_codes=n_codes,
            iters=iters,
            dim=dim,
            id_col=id_col,
            vec_col=vec_col,
            round_digits=round_digits,
        )
    if assigned is None:
        assigned = ivf_assign(
            embeddings.filter(F.col(id_col).isNotNull()),
            centroids, dim, id_col, vec_col, round_digits,
            cell_col="cell_id",
        )
    cent = centroids.select(
        F.col("cell_id"), F.col(vec_col).alias("_mv")
    ).withColumn("_mn", l2_norm(F.col("_mv"), dim))

    # residual vectors (elementwise IEEE subtraction) -> PQ codes
    res = assigned.join(
        F.broadcast(cent.select("cell_id", "_mv")), "cell_id"
    ).select(
        id_col,
        "cell_id",
        F.zip_with(
            F.col(vec_col),
            F.col("_mv"),
            lambda x, y: x.cast("double") - y.cast("double"),
        ).alias("_res"),
    )
    codes = pq_encode_arrow(
        res, codebooks, n_subspaces, dim, id_col, "_res", round_digits
    )

    # per-query nprobe cell probes
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    ).withColumn("_qn", l2_norm(F.col("_qv"), dim))
    probe_scored = q.join(F.broadcast(cent)).select(
        "query_id",
        "cell_id",
        F.round(
            dot(F.col("_qv"), F.col("_mv"), dim)
            / F.greatest(F.col("_qn") * F.col("_mn"), F.lit(1e-12)),
            round_digits,
        ).alias("_cos"),
    )
    wp = Window.partitionBy("query_id").orderBy(
        F.col("_cos").desc(), F.col("cell_id").asc()
    )
    probes = (
        probe_scored.withColumn("_rn", F.row_number().over(wp))
        .filter(F.col("_rn") <= nprobe)
        .select("query_id", "cell_id")
    )

    # broadcast lookup tables (all fixed-point int64)
    sub = dim // n_subspaces
    cb = codebooks.select("subspace", "code", F.col("subvec").alias("_cv"))
    qc = q.join(F.broadcast(cent)).select(
        "query_id",
        "_qn",
        "cell_id",
        F.round(dot(F.col("_qv"), F.col("_mv"), dim) * KMEANS_SCALE)
        .cast("long")
        .alias("_qc"),
    )
    cc = cent.select(
        "cell_id",
        F.round(dot(F.col("_mv"), F.col("_mv"), dim) * KMEANS_SCALE)
        .cast("long")
        .alias("_cc"),
    )
    qex = (
        q.select(
            "query_id",
            F.explode(
                _subspace_slices(F.col("_qv"), n_subspaces, sub)
            ).alias("_e"),
        )
        .select(
            "query_id",
            F.col("_e.subspace").alias("subspace"),
            F.col("_e._sv").alias("_qsv"),
        )
    )
    qr = qex.join(cb, "subspace").select(
        "query_id",
        "subspace",
        "code",
        F.round(dot(F.col("_qsv"), F.col("_cv")) * KMEANS_SCALE)
        .cast("long")
        .alias("_qr"),
    )
    cslice = (
        cent.select(
            "cell_id",
            F.explode(
                _subspace_slices(F.col("_mv"), n_subspaces, sub)
            ).alias("_e"),
        )
        .select(
            "cell_id",
            F.col("_e.subspace").alias("subspace"),
            F.col("_e._sv").alias("_cmv"),
        )
    )
    cr = cslice.join(cb, "subspace").select(
        "cell_id",
        "subspace",
        "code",
        F.round(dot(F.col("_cmv"), F.col("_cv")) * KMEANS_SCALE)
        .cast("long")
        .alias("_cr"),
    )
    rr = cb.select(
        "subspace",
        "code",
        F.round(dot(F.col("_cv"), F.col("_cv")) * KMEANS_SCALE)
        .cast("long")
        .alias("_rr"),
    )

    # ADC over probed cells only
    probed = (
        assigned.select("cell_id", F.col(id_col))
        .join(F.broadcast(probes), "cell_id")
        .filter(F.col("query_id") != F.col(id_col))
        .select("query_id", id_col, "cell_id")
    )
    sums = (
        probed.join(codes.select(id_col, "subspace", "code"), id_col)
        .join(F.broadcast(qr), ["query_id", "subspace", "code"])
        .join(F.broadcast(cr), ["cell_id", "subspace", "code"])
        .join(F.broadcast(rr), ["subspace", "code"])
        .groupBy("query_id", id_col, "cell_id")
        .agg(
            F.sum("_qr").alias("_sqr"),
            F.sum("_cr").alias("_scr"),
            F.sum("_rr").alias("_srr"),
        )
    )
    adc = sums.join(F.broadcast(qc), ["query_id", "cell_id"]).join(
        F.broadcast(cc), "cell_id"
    )
    sd = (F.col("_qc") + F.col("_sqr")).cast("long")
    n2 = (
        F.col("_cc") + F.lit(2) * F.col("_scr") + F.col("_srr")
    ).cast("long")
    approx = F.round(
        (sd.cast("double") / KMEANS_SCALE)
        / F.greatest(
            F.col("_qn")
            * F.sqrt(
                F.greatest(n2, F.lit(0)).cast("double") / KMEANS_SCALE
            ),
            F.lit(1e-12),
        ),
        round_digits,
    )
    wc = Window.partitionBy("query_id").orderBy(
        F.col("approx_cosine").desc(), F.col(id_col).asc()
    )
    cand = (
        adc.withColumn("approx_cosine", approx)
        .withColumn("_rn", F.row_number().over(wc))
        .filter(F.col("_rn") <= candidates)
        .select(
            "query_id", F.col(id_col).alias("neighbor_id"), "approx_cosine"
        )
    )
    corpus = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cvf")
    ).withColumn("_cn", l2_norm(F.col("_cvf"), dim))
    qvec = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qvf")
    ).withColumn("_qnf", l2_norm(F.col("_qvf"), dim))
    rer = (
        cand.join(corpus, "neighbor_id")
        .join(F.broadcast(qvec), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            "approx_cosine",
            F.round(
                dot(F.col("_qvf"), F.col("_cvf"), dim)
                / F.greatest(F.col("_qnf") * F.col("_cn"), F.lit(1e-12)),
                round_digits,
            ).alias("cosine"),
        )
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        rer.withColumn("_rn", F.row_number().over(wr))
        .filter(F.col("_rn") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "cosine",
            "approx_cosine",
            F.col("_rn").alias("rank"),
        )
    )


def ivf_pq_write_index(
    embeddings: DataFrame,
    centroids: DataFrame,
    codebooks: DataFrame,
    path: str,
    dim: int,
    n_subspaces: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 5,
    mode: str = "overwrite",
    target_recall: float | None = 0.9,
    recall_kwargs: dict | None = None,
) -> None:
    """Materialize the IVF-PQ index as storage layout: the corpus
    written hive-partitioned by ``cell_id``, each row carrying its
    ``pq_codes`` array (subspace-ordered) next to the raw vector.

    ``target_recall`` (DEFAULT 0.9 since r10 — certify-on-build is
    the default posture; ``None`` is the explicit skip) runs
    :func:`ann_recall_estimate` after
    the write — see :func:`ivf_write_index`; the IVF-PQ ladder also
    scales the exact-re-rank pool with nprobe (a fixed pool drowns in
    ADC noise as probed cells grow), and ``nprobe="auto"`` probes
    consume the recorded (nprobe, candidates) pair or the exact-scan
    fallback.

    At rest this is the full billion-vector layout: a probe
    partition-prunes to nprobe/n_cells of the files, the ADC scan
    projects ONLY ``(id, pq_codes)`` — parquet column pruning skips
    the vector bytes entirely — and the exact re-rank re-reads the
    vector column for candidate rows alone. Encode runs once at write
    time, never per query.
    """
    # Arrow/BLAS assignment (cell-identical by the ivf_assign_arrow
    # parity contract): the build scores the corpus against ALL
    # cells, where the expression form's O(N·C·dim) pass dominates.
    assigned = ivf_assign_arrow(
        embeddings, centroids, dim, id_col, vec_col, round_digits,
        cell_col="cell_id",
    )
    # Arrow/BLAS encode (18x the expression path at sf10: 50.6 s ->
    # 2.8 s, PERF.md) — code-identical by the parity contract pinned
    # in tests/test_pq.py; the expression encoder remains the
    # zero-Python baseline.
    codes = pq_encode_arrow(
        embeddings, codebooks, n_subspaces, dim, id_col, vec_col, round_digits
    )
    packed = codes.groupBy(id_col).agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("subspace"), F.col("code")))
            ),
            lambda s: s["code"],
        ).alias("pq_codes")
    )
    # Align the exchange with the directory layout (see
    # ivf_write_index): one file per cell instead of tasks × cells
    # stragglers — at a billion vectors the difference between a
    # probe that opens nprobe files and one that opens thousands.
    assigned.join(packed, id_col).repartition(F.col("cell_id")).write.partitionBy(
        "cell_id"
    ).mode(mode).parquet(path)
    if target_recall is not None:
        spark = embeddings.sparkSession
        # see ivf_write_index: on append, estimate over the FULL index
        # (probes walk all of it), never the appended batch alone
        src = (
            spark.read.parquet(path).select(id_col, vec_col)
            if mode == "append"
            else embeddings
        )
        ann_recall_estimate(
            spark, path, src, centroids, dim,
            kind="ivf_pq", codebooks=codebooks, n_subspaces=n_subspaces,
            target_recall=target_recall, id_col=id_col, vec_col=vec_col,
            round_digits=round_digits, **(recall_kwargs or {}),
        )


def ivf_pq_topk_from_index(
    spark,
    index_path: str,
    queries: DataFrame,
    centroids: DataFrame,
    codebooks: DataFrame,
    k: int,
    nprobe: int | str = "auto",
    n_subspaces: int = 8,
    dim: int = 64,
    candidates: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 5,
) -> DataFrame:
    """ANN top-k against a persisted IVF-PQ index
    (:func:`ivf_pq_write_index`) — identical semantics to
    :func:`ivf_pq_topk`, minus the per-query assignment and encode
    scans.

    The probed cells become a static ``cell_id IN (...)`` predicate
    (partition-pruned file listing); the ADC pass reads only
    ``(id, pq_codes)`` columns of those partitions; candidate rows
    alone come back for the exact re-rank.

    ``nprobe="auto"`` (the DEFAULT since r10) consumes the build-time
    recall marker (see
    :func:`ivf_topk_from_index`): the recorded (nprobe, candidates)
    pair — ``candidates`` is then taken from the marker, not the
    argument — or the exact-scan fallback when the estimate showed no
    rung reaching the target (``approx_cosine`` equals the exact
    cosine on that path). An integer nprobe is the explicit
    uncertified override.
    """
    if nprobe == "auto":
        nprobe, auto_cand = _resolve_auto_probe(
            spark, index_path, "ivf_pq", k
        )
        if nprobe is None:
            exact = exact_topk_from_index(
                spark, index_path, queries, k, id_col=id_col,
                vec_col=vec_col, round_digits=round_digits,
            )
            return exact.select(
                "query_id",
                "neighbor_id",
                "cosine",
                F.col("cosine").alias("approx_cosine"),
                "rank",
            )
        if auto_cand is not None:
            candidates = auto_cand
    cent = centroids.select(
        F.col("cell_id"), F.col(vec_col).alias("_mv")
    ).withColumn("_mn", l2_norm(F.col("_mv"), dim))
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    ).withColumn("_qn", l2_norm(F.col("_qv"), dim))
    probe_scored = q.join(F.broadcast(cent)).select(
        "query_id",
        "cell_id",
        F.round(
            dot(F.col("_qv"), F.col("_mv"), dim)
            / F.greatest(F.col("_qn") * F.col("_mn"), F.lit(1e-12)),
            round_digits,
        ).alias("_cos"),
    )
    wp = Window.partitionBy("query_id").orderBy(
        F.col("_cos").desc(), F.col("cell_id").asc()
    )
    probes = (
        probe_scored.withColumn("_rn", F.row_number().over(wp))
        .filter(F.col("_rn") <= nprobe)
        .select("query_id", "cell_id")
        # same two-consumer materialization as ivf_topk_from_index
        .localCheckpoint(eager=True)
    )
    probed_cells = sorted(
        {r.cell_id for r in probes.select("cell_id").distinct().collect()}
    )
    index = spark.read.parquet(index_path).filter(
        F.col("cell_id").isin(probed_cells)
    )

    sub = dim // n_subspaces
    cb = codebooks.select("subspace", "code", F.col("subvec").alias("_cv"))
    qex = (
        q.select(
            "query_id",
            "_qn",
            F.explode(
                _subspace_slices(F.col("_qv"), n_subspaces, sub)
            ).alias("_e"),
        )
        .select(
            "query_id",
            "_qn",
            F.col("_e.subspace").alias("subspace"),
            F.col("_e._sv").alias("_qsv"),
        )
    )
    lut = qex.join(cb, "subspace").select(
        "query_id",
        "_qn",
        "subspace",
        "code",
        F.round(dot(F.col("_qsv"), F.col("_cv")) * KMEANS_SCALE)
        .cast("long")
        .alias("_pd"),
        F.round(dot(F.col("_cv"), F.col("_cv")) * KMEANS_SCALE)
        .cast("long")
        .alias("_cn2"),
    )
    code_rows = index.select(
        "cell_id",
        F.col(id_col),
        F.posexplode(F.col("pq_codes")).alias("subspace", "code"),
    )
    adc = (
        code_rows.join(F.broadcast(probes), "cell_id")
        .filter(F.col("query_id") != F.col(id_col))
        .join(F.broadcast(lut), ["query_id", "subspace", "code"])
        .groupBy("query_id", id_col)
        .agg(
            F.sum("_pd").alias("_sd"),
            F.sum("_cn2").alias("_sn2"),
            F.max("_qn").alias("_qn"),
        )
    )
    approx = F.round(
        (F.col("_sd").cast("double") / KMEANS_SCALE)
        / F.greatest(
            F.col("_qn")
            * F.sqrt(F.col("_sn2").cast("double") / KMEANS_SCALE),
            F.lit(1e-12),
        ),
        round_digits,
    )
    wc = Window.partitionBy("query_id").orderBy(
        F.col("approx_cosine").desc(), F.col(id_col).asc()
    )
    cand = (
        adc.withColumn("approx_cosine", approx)
        .withColumn("_rn", F.row_number().over(wc))
        .filter(F.col("_rn") <= candidates)
        .select(
            "query_id", F.col(id_col).alias("neighbor_id"), "approx_cosine"
        )
    )
    corpus = index.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cvf")
    ).withColumn("_cn", l2_norm(F.col("_cvf"), dim))
    qvec = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qvf")
    ).withColumn("_qnf", l2_norm(F.col("_qvf"), dim))
    rer = (
        cand.join(corpus, "neighbor_id")
        .join(F.broadcast(qvec), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            "approx_cosine",
            F.round(
                dot(F.col("_qvf"), F.col("_cvf"), dim)
                / F.greatest(F.col("_qnf") * F.col("_cn"), F.lit(1e-12)),
                round_digits,
            ).alias("cosine"),
        )
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        rer.withColumn("_rn", F.row_number().over(wr))
        .filter(F.col("_rn") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "cosine",
            "approx_cosine",
            F.col("_rn").alias("rank"),
        )
    )


# ---------------------------------------------------------------------------
# Build-time recall estimation + probe auto-escalation (round 9)
# ---------------------------------------------------------------------------

#: Marker written next to an IVF / IVF-PQ index by
#: :func:`ann_recall_estimate`; consumed by ``nprobe="auto"`` probes.
ANN_RECALL_MARKER = "_ann_recall.json"

#: Default nprobe escalation ladder (clipped to n_cells). Geometric:
#: each rung doubles the scanned fraction, so the walk to ANY
#: achievable target costs at most 2x the final rung's scan.
ANN_NPROBE_LADDER = (4, 8, 16, 32, 64, 128)


def ann_recall_estimate(
    spark,
    index_path: str,
    embeddings: DataFrame,
    centroids: DataFrame,
    dim: int,
    *,
    kind: str = "ivf",
    codebooks: DataFrame | None = None,
    n_subspaces: int | None = None,
    k: int = 10,
    n_queries: int = 32,
    target_recall: float = 0.9,
    nprobe_ladder: tuple[int, ...] = ANN_NPROBE_LADDER,
    candidates_base: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 5,
    write_marker: bool = True,
) -> dict:
    """Measure the just-built index's recall@k on a sampled exact
    ground truth and record the nprobe the index actually NEEDS for
    ``target_recall`` — or the fact that no ladder rung reaches it.

    Why this exists: IVF recall is a property of the DATA, not the
    index. On clustered corpora (real encoder embeddings — the
    workload ANN exists for here) a handful of probes recover >0.95
    recall; on high-dimensional UNIFORM vectors no partitioning
    scheme can concentrate a query's neighbors in few cells, and the
    measured recall@10 silently degrades to a coin flip
    (ANN_recall.json: 0.96 clustered vs 0.44 uniform at the same
    nprobe). A user cannot see which regime their corpus is in from
    the probe results — this estimator makes the index MEASURE it at
    build time and makes ``nprobe="auto"`` act on it.

    Method: ``n_queries`` corpus vectors are hash-sampled
    (order by ``xxhash64(id)`` — deterministic, id-locality-free),
    exact ground truth is one :func:`brute_force_topk_arrow` corpus
    pass (BLAS; at build time this is a small fraction of the
    assignment+encode scans the build already ran), then the ladder
    is walked with cheap partition-pruned probes until a rung's
    measured recall reaches the target. For IVF-PQ the re-rank pool
    scales with the rung (``candidates = max(base, k * nprobe)``):
    a fixed pool drowns in ADC quantization noise as more cells are
    probed — the measured cause of ANN_recall.json's recall DROPPING
    with nprobe on uniform data.

    Returns (and, with ``write_marker``, records next to the index as
    ``_ann_recall.json``) ``{kind, k, n_queries, target_recall,
    curve: [{nprobe, candidates, recall, scanned_fraction}],
    recommended_nprobe, recommended_candidates, fallback}`` —
    ``fallback: true`` means NO rung reached the target and
    ``nprobe="auto"`` probes must take the exact-scan path
    (:func:`exact_topk_from_index`). The marker is advisory for
    integer-nprobe callers and binding for ``"auto"``.
    """
    import json as _json

    if kind not in ("ivf", "ivf_pq"):
        raise ValueError(f"kind must be ivf|ivf_pq: {kind}")
    if kind == "ivf_pq" and (codebooks is None or n_subspaces is None):
        raise ValueError("kind='ivf_pq' requires codebooks + n_subspaces")
    n_cells = centroids.count()
    base = candidates_base if candidates_base is not None else 10 * k

    q = (
        embeddings.filter(F.col(vec_col).isNotNull())
        .orderBy(F.xxhash64(F.col(id_col).cast("long")).asc())
        .limit(n_queries)
        .select(id_col, vec_col)
        .localCheckpoint(eager=True)
    )
    truth = brute_force_topk_arrow(
        embeddings, q, k=k, id_col=id_col, vec_col=vec_col,
        round_digits=round_digits,
    ).collect()
    want = {(r.query_id, r.neighbor_id) for r in truth}

    curve = []
    recommended = None
    rec_cand = None
    for rung in nprobe_ladder:
        nprobe = min(int(rung), int(n_cells))
        cand = max(base, k * nprobe)
        if kind == "ivf":
            got_rows = ivf_topk_from_index(
                spark, index_path, q, centroids, k=k, nprobe=nprobe,
                dim=dim, id_col=id_col, vec_col=vec_col,
                round_digits=round_digits,
            ).collect()
        else:
            got_rows = ivf_pq_topk_from_index(
                spark, index_path, q, centroids, codebooks, k=k,
                nprobe=nprobe, n_subspaces=n_subspaces, dim=dim,
                candidates=cand, id_col=id_col, vec_col=vec_col,
                round_digits=round_digits,
            ).collect()
        got = {(r.query_id, r.neighbor_id) for r in got_rows}
        recall = len(got & want) / max(len(want), 1)
        curve.append(
            {
                "nprobe": nprobe,
                "candidates": cand if kind == "ivf_pq" else None,
                "recall": round(recall, 4),
                "scanned_fraction": round(nprobe / max(n_cells, 1), 5),
            }
        )
        if recall >= target_recall:
            recommended, rec_cand = nprobe, cand
            break
        if nprobe >= n_cells:
            break

    result = {
        "kind": kind,
        "k": k,
        "n_queries": n_queries,
        "target_recall": target_recall,
        "n_cells": int(n_cells),
        "curve": curve,
        "recommended_nprobe": recommended,
        "recommended_candidates": rec_cand if kind == "ivf_pq" else None,
        "fallback": recommended is None,
    }
    if write_marker:
        from vbb_data_pipeline_spark.sources.layout import hadoop_write_text

        hadoop_write_text(
            spark,
            index_path.rstrip("/") + "/" + ANN_RECALL_MARKER,
            _json.dumps(result, sort_keys=True),
        )
    return result


def _read_recall_marker(spark, index_path: str) -> dict:
    import json as _json

    from vbb_data_pipeline_spark.sources.layout import (
        hadoop_exists,
        hadoop_read_text,
    )

    marker = index_path.rstrip("/") + "/" + ANN_RECALL_MARKER
    if not hadoop_exists(spark, marker):
        raise ValueError(
            f"nprobe='auto' needs a recall marker at {marker} — build "
            "the index with target_recall=... (ivf_write_index / "
            "ivf_pq_write_index) or run ann_recall_estimate after the "
            "build, or pass an integer nprobe"
        )
    return _json.loads(hadoop_read_text(spark, marker))


def exact_topk_from_index(
    spark,
    index_path: str,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 5,
) -> DataFrame:
    """Exact top-k over a persisted IVF / IVF-PQ index — the enforced
    fallback when the build-time recall estimate shows NO nprobe rung
    reaches the target (uniform / unclusterable embeddings). Both
    index layouts store the raw vector column, so the exact path is
    one :func:`brute_force_topk_arrow` scan of the index files:
    recall 1.0 by construction, cost one corpus pass per query batch —
    the honest price of data no partitioning scheme can prune."""
    index = spark.read.parquet(index_path).select(id_col, vec_col)
    return brute_force_topk_arrow(
        index, queries, k=k, id_col=id_col, vec_col=vec_col,
        round_digits=round_digits,
    )


def _resolve_auto_probe(
    spark, index_path: str, kind: str, k: int
) -> tuple[int | None, int | None]:
    """(nprobe, candidates) from the recall marker, or (None, None)
    meaning: take the exact-scan fallback."""
    rec = _read_recall_marker(spark, index_path)
    if rec.get("kind") != kind:
        raise ValueError(
            f"recall marker at {index_path} was estimated for kind="
            f"{rec.get('kind')!r}, probe is {kind!r} — re-run "
            "ann_recall_estimate for this probe path"
        )
    # fallback first: an exact scan is exact for ANY k — it never
    # consumes the certified k or recommended_candidates, so the k
    # guard below must not block it (r9 advice: the guard ran first
    # and turned k>marker_k probes against fallback-marked indexes
    # into errors where exact results were correct).
    if rec.get("fallback"):
        return None, None
    # the certification is recall@MARKER_K: a probe with a SMALLER k
    # rides it conservatively (the certified candidate pool already
    # covers k' < k, and fewer wanted neighbors can only sit deeper
    # inside the same probed cells), but a LARGER k is a different
    # measurement — and for IVF-PQ the marker's recommended_candidates
    # (max(base, marker_k·nprobe)) would silently cap the result at
    # fewer than k rows per query.
    if int(k) > int(rec.get("k", 0)):
        raise ValueError(
            f"nprobe='auto' probe asks k={k} but the recall marker at "
            f"{index_path} certified k={rec.get('k')} — re-run "
            "ann_recall_estimate with recall_kwargs={'k': "
            f"{k}}} (or pass an integer nprobe) so the certification "
            "matches the probe"
        )
    return int(rec["recommended_nprobe"]), (
        int(rec["recommended_candidates"])
        if rec.get("recommended_candidates") is not None
        else None
    )
