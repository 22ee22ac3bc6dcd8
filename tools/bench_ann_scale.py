#!/usr/bin/env python
"""ANN third scaling decade: sf10 -> sf30 -> sf100 EMBEDDINGS ONLY,
probing the PERSISTED IVF-PQ codes index (codes at rest) rather than
re-encoding per query.

Round-4 verdict item 6: prove that probe latency scales with the
scanned fraction (nprobe / n_cells, i.e. nprobe x avg cell size) and
NOT with corpus size.  The harness therefore holds avg cell size
constant (n_cells grows proportionally with N, FAISS practice) and
nprobe fixed, so across a 10x corpus decade the probe reads the same
number of rows and its latency should stay ~flat, while index BUILD
(train + encode + partitioned write) is the linear-in-N stage that
runs once.

Embeddings are scaled exactly like tools/make_scale_data.py (same
per-(copy, vec_id) seeded gaussian noise, same +1M/copy key offset),
so factor=100 reproduces the sf10 corpus bit-for-bit.

Usage:
    python tools/bench_ann_scale.py [OUT_JSON] [factor ...]
    # default factors: 100 300 1000  (200k / 600k / 2M vectors)

Writes one JSON with, per factor: corpus rows, n_cells, build_sec,
probe stages (steady best-of-2), scanned-fraction, and recall@k vs
the brute-force truth on the probe query set.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

os.environ.setdefault("SPARK_GRAFT_FAST_HASH", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from vbb_data_pipeline_spark.operators import similarity as sim  # noqa: E402
from vbb_data_pipeline_spark.session import get_spark  # noqa: E402

SRC = Path("/root/testdata/sf0.1/embeddings.parquet")
DIM = 64
N_SUBSPACES = 8
N_CODES = 16
NPROBE = 8
K = 10
N_QUERIES = 32
CELL_SIZE = 500  # target avg rows per IVF cell (n_cells = N / CELL_SIZE)


def make_embeddings(dst: Path, factor: int) -> int:
    """Replicate sf0.1 embeddings ``factor`` times with
    make_scale_data.py's exact per-copy noise + key offset."""
    base = pq.read_table(SRC)
    idx = base.schema.get_field_index("embedding")
    field = base.schema.field(idx)
    ids = base.column("vec_id").to_pylist()
    vecs = base.column(idx).to_pylist()
    writer = pq.ParquetWriter(dst, base.schema)
    try:
        writer.write_table(base)
        for i in range(1, factor):
            out = []
            for vid, v in zip(ids, vecs):
                if v is None:
                    out.append(None)
                    continue
                rng = np.random.default_rng((i << 32) ^ (vid & 0xFFFFFFFF))
                out.append(
                    (
                        np.asarray(v, dtype="float32")
                        + rng.normal(0.0, 0.15, size=len(v)).astype("float32")
                    ).tolist()
                )
            t = base.set_column(idx, field, pa.array(out, type=field.type))
            kidx = t.schema.get_field_index("vec_id")
            import pyarrow.compute as pc

            t = t.set_column(
                kidx,
                t.schema.field(kidx),
                pc.add(t.column(kidx), pa.scalar(i * 1_000_000, pa.int64())),
            )
            writer.write_table(t)
    finally:
        writer.close()
    return base.num_rows * factor


def bench_factor(work: Path, factor: int) -> dict:
    emb_path = work / f"embeddings_f{factor}.parquet"
    idx_path = str(work / f"ivfpq_index_f{factor}")
    t0 = time.perf_counter()
    n_rows = make_embeddings(emb_path, factor)
    gen_sec = time.perf_counter() - t0

    spark = get_spark(app_name=f"ann-scale-f{factor}")
    emb = spark.read.parquet(str(emb_path))
    n_cells = max(64, n_rows // CELL_SIZE)

    # ---- build: train (bounded sample) + encode + partitioned write
    t0 = time.perf_counter()
    centroids = sim.kmeans_centroids_numpy(
        emb, n_cells=n_cells, iters=4, sample_n=1 << 17
    ).localCheckpoint()
    train_cent_sec = time.perf_counter() - t0

    t0 = time.perf_counter()
    codebooks = sim.pq_train_numpy(
        emb, n_subspaces=N_SUBSPACES, n_codes=N_CODES, iters=4, dim=DIM,
        sample_n=1 << 17,
    ).localCheckpoint()
    train_pq_sec = time.perf_counter() - t0

    t0 = time.perf_counter()
    sim.ivf_pq_write_index(
        emb, centroids, codebooks, idx_path, dim=DIM,
        n_subspaces=N_SUBSPACES,
    )
    write_sec = time.perf_counter() - t0

    # ---- probe: fixed query set, steady best-of-2; optional nprobe
    # sweep over the SAME index (ANN_NPROBES="8,32,128") to show the
    # recall/latency knob — probe cost scales with nprobe x cell
    # size, recall with the scanned fraction
    t0 = time.perf_counter()
    truth = sim.brute_force_topk_arrow(
        emb, emb.filter(F.col("vec_id") < N_QUERIES), k=K
    ).collect()
    brute_sec = time.perf_counter() - t0
    want = {(r.query_id, r.neighbor_id) for r in truth}

    q = emb.filter(F.col("vec_id") < N_QUERIES).localCheckpoint()
    nprobes = [
        int(x)
        for x in os.environ.get("ANN_NPROBES", str(NPROBE)).split(",")
    ]
    sweep = {}
    probe_secs = [None, None]
    recall = None
    for np_ in nprobes:
        secs = []
        rows = []
        for _ in range(2):
            t0 = time.perf_counter()
            rows = sim.ivf_pq_topk_from_index(
                spark, idx_path, q, centroids, codebooks, k=K,
                nprobe=np_, n_subspaces=N_SUBSPACES, dim=DIM,
                candidates=3 * K,
            ).collect()
            secs.append(time.perf_counter() - t0)
        got = {(r.query_id, r.neighbor_id) for r in rows}
        rc = len(got & want) / max(len(want), 1)
        sweep[np_] = {
            "probe_first_sec": round(secs[0], 3),
            "probe_steady_sec": round(min(secs), 3),
            "recall_at_k": round(rc, 4),
        }
        if np_ == nprobes[0]:
            probe_secs = secs
            recall = rc

    out = {
        "factor": factor,
        "rows": n_rows,
        "n_cells": n_cells,
        "avg_cell_rows": n_rows / n_cells,
        "scanned_fraction": NPROBE / n_cells,
        "gen_sec": round(gen_sec, 3),
        "train_centroids_sec": round(train_cent_sec, 3),
        "train_pq_sec": round(train_pq_sec, 3),
        "index_write_sec": round(write_sec, 3),
        "build_total_sec": round(
            train_cent_sec + train_pq_sec + write_sec, 3
        ),
        "probe_first_sec": round(probe_secs[0], 3),
        "probe_steady_sec": round(min(probe_secs), 3),
        "brute_force_sec": round(brute_sec, 3),
        "recall_at_k": round(recall, 4),
    }
    if len(nprobes) > 1:
        out["nprobe_sweep"] = sweep
    spark.stop()
    emb_path.unlink()
    shutil.rmtree(idx_path, ignore_errors=True)
    return out


def main() -> None:
    out_json = sys.argv[1] if len(sys.argv) > 1 else "SCALE_ann.json"
    factors = [int(a) for a in sys.argv[2:]] or [100, 300, 1000]
    work = Path("/root/repo/.ann_scale_work")
    work.mkdir(exist_ok=True)
    results = []
    for f in factors:
        r = bench_factor(work, f)
        print(json.dumps(r))
        results.append(r)
    shutil.rmtree(work, ignore_errors=True)
    with open(out_json, "w") as fh:
        json.dump({"dim": DIM, "nprobe": NPROBE, "k": K,
                   "cell_size_target": CELL_SIZE, "results": results}, fh,
                  indent=1)
    print(f"wrote {out_json}")


if __name__ == "__main__":
    main()
