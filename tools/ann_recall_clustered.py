#!/usr/bin/env python
"""IVF-PQ recall on a CLUSTERED corpus vs the uniform-noise corpus.

SCALE_ann.json's recall numbers (0.25–0.64 at nprobe 4–8) are an
artifact of its uniform synthetic vectors: in high-dimensional
uniform data all points are near-equidistant, so no partitioning
scheme can concentrate a query's true neighbors in few cells — IVF
recall degenerates BY CONSTRUCTION of the data, not the index. Real
embedding corpora are the opposite: encoder outputs cluster heavily
(that structure is what SemDeDup exploits), and IVF's contract is
exactly "neighbors share a cell".

This tool measures the same IVF-PQ build/probe pipeline, same scale,
same knobs, on two corpora generated executor-side:

* ``clustered``: mixture of ``N_CENTERS`` unit-norm Gaussians
  (center ~ rng(center_id), vector = center + sigma·noise). The
  default is MINI-clusters of 10 members with ‖noise‖ ≈ sigma·√dim
  ≈ 0.4, far inside the ~√2 separation of random unit centers — so
  each vector's true 10-NN is exactly its own mini-cluster and
  recall@10 is a WELL-CONDITIONED routing question. (A first cut
  used 500-member clusters: recall plateaued at ~0.43 for clustered
  AND uniform at every nprobe, because within a high-dimensional
  Gaussian cluster the 499 siblings are near-equidistant ties that
  32-bit PQ codes cannot rank — the metric measured tie-breaking,
  not routing. Near-dup groups, the workload ANN exists for here,
  look like the mini-cluster shape.)
* ``uniform``: i.i.d. gaussian vectors — SCALE_ann's worst case.

Expected and measured: recall on the clustered corpus is high at
small nprobe (the index scans the query's own cluster), while the
uniform corpus reproduces the known artifact. Usage:

    python tools/ann_recall_clustered.py [OUT_JSON]
    ANN_RC_ROWS / ANN_RC_CENTERS / ANN_RC_SIGMA / ANN_RC_NPROBES
    override the corpus shape (defaults 500k rows, 1000 centers,
    sigma 0.15, nprobe sweep 4,8,32).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

os.environ.setdefault("SPARK_GRAFT_FAST_HASH", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from vbb_data_pipeline_spark.operators import similarity as sim  # noqa: E402
from vbb_data_pipeline_spark.session import get_spark  # noqa: E402

N_ROWS = int(os.environ.get("ANN_RC_ROWS", "500000"))
N_CENTERS = int(os.environ.get("ANN_RC_CENTERS", str(int(os.environ.get("ANN_RC_ROWS", "500000")) // 10)))
SIGMA = float(os.environ.get("ANN_RC_SIGMA", "0.05"))
DIM = 64
N_SUBSPACES = 8
N_CODES = 16
K = 10
N_QUERIES = 32
CELL_SIZE = 500
NPROBES = [
    int(x) for x in os.environ.get("ANN_RC_NPROBES", "4,8,32").split(",")
]
CANDIDATES = int(os.environ.get("ANN_RC_CANDIDATES", str(10 * K)))


def make_corpus(spark, kind: str):
    """Deterministic executor-side corpus: one row per vec_id."""

    def gen(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            vecs = []
            for vid in pdf["id"]:
                vid = int(vid)
                rng = np.random.default_rng(vid)
                if kind == "clustered":
                    cid = vid % N_CENTERS
                    crng = np.random.default_rng(10_000_019 + cid)
                    c = crng.normal(size=DIM)
                    c /= np.linalg.norm(c)
                    v = c + SIGMA * rng.normal(size=DIM)
                else:
                    v = rng.normal(size=DIM)
                vecs.append(v.astype("float32").tolist())
            yield pd.DataFrame({"vec_id": pdf["id"], "embedding": vecs})

    return spark.range(N_ROWS).repartition(32).mapInPandas(
        gen, schema="vec_id long, embedding array<float>"
    )


def measure(spark, kind: str) -> dict:
    emb = make_corpus(spark, kind).localCheckpoint(eager=True)
    n_cells = max(64, N_ROWS // CELL_SIZE)
    idx_path = tempfile.mkdtemp(prefix=f"ann_rc_{kind}_")
    shutil.rmtree(idx_path, ignore_errors=True)

    t0 = time.perf_counter()
    centroids = sim.kmeans_centroids_numpy(
        emb, n_cells=n_cells, iters=4, sample_n=1 << 17
    ).localCheckpoint()
    codebooks = sim.pq_train_numpy(
        emb, n_subspaces=N_SUBSPACES, n_codes=N_CODES, iters=4, dim=DIM,
        sample_n=1 << 17,
    ).localCheckpoint()
    # DEFAULT API path (r10): the build certifies recall itself
    # (target_recall=0.9 default) and writes the marker — no separate
    # ann_recall_estimate call. The tool's knobs (K=10, N_QUERIES=32,
    # CANDIDATES=100) coincide with the estimator defaults, so this is
    # the same measurement the default-arg build performs.
    sim.ivf_pq_write_index(
        emb, centroids, codebooks, idx_path, dim=DIM,
        n_subspaces=N_SUBSPACES,
        recall_kwargs={
            "k": K, "n_queries": N_QUERIES, "candidates_base": CANDIDATES,
        },
    )
    build_sec = time.perf_counter() - t0

    q = emb.filter(F.col("vec_id") < N_QUERIES).localCheckpoint()
    t0 = time.perf_counter()
    truth = sim.brute_force_topk_arrow(emb, q, k=K).collect()
    brute_sec = time.perf_counter() - t0
    want = {(r.query_id, r.neighbor_id) for r in truth}

    sweep = {}
    for np_ in NPROBES:
        secs = []
        rows = []
        for _ in range(2):
            t0 = time.perf_counter()
            rows = sim.ivf_pq_topk_from_index(
                spark, idx_path, q, centroids, codebooks, k=K,
                nprobe=np_, n_subspaces=N_SUBSPACES, dim=DIM,
                candidates=CANDIDATES,
            ).collect()
            secs.append(time.perf_counter() - t0)
        got = {(r.query_id, r.neighbor_id) for r in rows}
        sweep[np_] = {
            "probe_steady_sec": round(min(secs), 3),
            "recall_at_k": round(len(got & want) / max(len(want), 1), 4),
            "scanned_fraction": round(np_ / n_cells, 5),
        }

    # round-9 guard, now the r10 DEFAULT: the marker the build wrote
    # is read back, and the probe's default nprobe ('auto') consumes
    # it. Clustered corpora certify a small nprobe; uniform corpora
    # record fallback and the auto probe takes the exact scan (recall
    # 1.0 at full-scan cost) instead of silently returning coin-flip
    # recall.
    est = json.loads(
        open(f"{idx_path}/{sim.ANN_RECALL_MARKER}").read()
    )
    estimate_sec = None  # folded into build_sec by the default API
    t0 = time.perf_counter()
    auto_rows = sim.ivf_pq_topk_from_index(
        spark, idx_path, q, centroids, codebooks, k=K,
        n_subspaces=N_SUBSPACES, dim=DIM,
    ).collect()
    auto_sec = time.perf_counter() - t0
    got = {(r.query_id, r.neighbor_id) for r in auto_rows}
    auto = {
        "recall_at_k": round(len(got & want) / max(len(want), 1), 4),
        "probe_sec": round(auto_sec, 3),
        "estimate_sec": estimate_sec,  # None: folded into build_sec (default API)
        "fallback": est["fallback"],
        "recommended_nprobe": est["recommended_nprobe"],
        "recommended_candidates": est["recommended_candidates"],
        "scanned_fraction": (
            1.0 if est["fallback"]
            else round(est["recommended_nprobe"] / n_cells, 5)
        ),
    }
    shutil.rmtree(idx_path, ignore_errors=True)
    return {
        "corpus": kind,
        "rows": N_ROWS,
        "n_cells": n_cells,
        "build_sec": round(build_sec, 2),
        "brute_force_sec": round(brute_sec, 2),
        "nprobe": sweep,
        "auto": auto,
    }


def main() -> None:
    out_json = sys.argv[1] if len(sys.argv) > 1 else "ANN_recall.json"
    spark = get_spark("ann-recall-clustered")
    spark.sparkContext.setLogLevel("ERROR")
    out = {
        "dim": DIM,
        "k": K,
        "centers": N_CENTERS,
        "sigma": SIGMA,
        "results": [measure(spark, "clustered"), measure(spark, "uniform")],
    }
    print(json.dumps(out))
    with open(out_json, "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
