#!/usr/bin/env python
"""Deterministically scale the driver's sf0.1 fixtures by an integer
factor (default 10 -> "sf1") for scale-validation benchmarking.

The driver only ships sf{0.001,0.01,0.1}; the 100 TB story needs at
least one measured decade of scaling, so this tool replicates each
table FACTOR times with TPC-H-style key-space offsets:

* dims that stay fixed at any SF (region, nation) are copied as-is;
* every scaling table's keys shift by ``copy_index * OFFSET`` with
  offsets far above the base key domain, so FK joins
  (orders.o_custkey -> customer, lineitem.l_orderkey -> orders, ...)
  land entirely within the same copy — join fan-outs match a real
  larger SF instead of multiplying across copies;
* documents get a deterministic per-(copy, doc) token PERMUTATION so
  the corpus does not become 10x near-clones: a seeded shuffle
  preserves the token multiset (langid / token-count / quality
  profiles scale cleanly) while destroying consecutive 3-gram
  shingles (measured Jaccard copy-vs-base = 0.0), keeping the
  near-dup rate comparable to the base corpus rather than
  quadratically inflating every LSH bucket.  (v1 of this tool used a
  ROTATION, which preserves ~93% of shingles — every doc gained 9
  genuine near-dups and the dedup family measured quadratic-in-factor,
  a data artifact, not an operator bug; PERF.md §scale records both
  runs);
* embeddings get deterministic per-(copy, vec_id) gaussian noise
  (sigma 0.15: at dim 64 the expected copy-vs-base cosine is ~0.6,
  below every near-dup threshold in the suite) for the same reason
  in cosine space.

Pure pyarrow/numpy — writes the exact arrow schema of the source, so
everything the engine's load_table handles at sf0.1 behaves
identically at the scaled SF. Usage:

    python tools/make_scale_data.py [dst_dir] [factor]
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = Path("/root/testdata/sf0.1")

#: per-table key columns to offset, with per-key offsets chosen well
#: above the sf0.1 key domain (max o_orderkey 600k, c_custkey 15k...)
KEY_OFFSETS: dict[str, dict[str, int]] = {
    "customer": {"c_custkey": 1_000_000},
    "supplier": {"s_suppkey": 100_000},
    "part": {"p_partkey": 1_000_000},
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
    "lineitem": {
        "l_orderkey": 10_000_000,
        "l_partkey": 1_000_000,
        "l_suppkey": 100_000,
    },
    "events": {"event_id": 100_000_000, "user_id": 10_000_000},
    "documents": {"doc_id": 1_000_000},
    "embeddings": {"vec_id": 1_000_000},
}

FIXED = ("region", "nation")


def _offset_copy(table: pa.Table, offsets: dict[str, int], i: int) -> pa.Table:
    for col, off in offsets.items():
        idx = table.schema.get_field_index(col)
        field = table.schema.field(idx)
        shifted = pc.add(table.column(idx), pa.scalar(i * off, field.type))
        table = table.set_column(idx, field, shifted.cast(field.type))
    return table


def _permute_text(
    text_col: pa.ChunkedArray, ids: list[int], i: int
) -> pa.Array:
    """Deterministically shuffle each document's whitespace token
    sequence (seeded by (copy, doc_id)) — token multiset preserved,
    consecutive shingles destroyed."""
    out = []
    for doc_id, text in zip(ids, text_col.to_pylist()):
        if text is None:
            out.append(None)
            continue
        toks = text.split(" ")
        rng = np.random.default_rng((i << 32) ^ (doc_id & 0xFFFFFFFF))
        rng.shuffle(toks)
        out.append(" ".join(toks))
    return pa.array(out, type=pa.string())


def _perturb_embeddings(table: pa.Table, i: int) -> pa.Table:
    idx = table.schema.get_field_index("embedding")
    field = table.schema.field(idx)
    vecs = table.column(idx).to_pylist()
    ids = table.column("vec_id").to_pylist()
    out = []
    for vid, v in zip(ids, vecs):
        if v is None:
            out.append(None)
            continue
        rng = np.random.default_rng((i << 32) ^ (vid & 0xFFFFFFFF))
        out.append(
            (np.asarray(v, dtype="float32")
             + rng.normal(0.0, 0.15, size=len(v)).astype("float32")).tolist()
        )
    return table.set_column(idx, field, pa.array(out, type=field.type))


def main() -> None:
    dst = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf1")
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    dst.mkdir(parents=True, exist_ok=True)
    for t in FIXED:
        src_t = pq.read_table(SRC / f"{t}.parquet")
        pq.write_table(src_t, dst / f"{t}.parquet")
        print(f"{t}: {src_t.num_rows} rows (fixed dim)")
    for t, offsets in KEY_OFFSETS.items():
        base = pq.read_table(SRC / f"{t}.parquet")
        copies = []
        for i in range(factor):
            c = _offset_copy(base, offsets, i)
            if t == "documents" and i > 0:
                tix = c.schema.get_field_index("text")
                # permute seeded by the BASE doc_id (pre-offset ids
                # are identical across copies; the copy index i makes
                # each copy's shuffle distinct anyway)
                base_ids = base.column("doc_id").to_pylist()
                c = c.set_column(
                    tix,
                    c.schema.field(tix),
                    _permute_text(c.column(tix), base_ids, i),
                )
            if t == "embeddings" and i > 0:
                c = _perturb_embeddings(c, i)
            copies.append(c)
        scaled = pa.concat_tables(copies)
        pq.write_table(scaled, dst / f"{t}.parquet")
        print(f"{t}: {base.num_rows} -> {scaled.num_rows} rows")


if __name__ == "__main__":
    main()
