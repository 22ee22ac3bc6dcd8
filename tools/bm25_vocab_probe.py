#!/usr/bin/env python
"""BM25 at-rest index probe measurement on a REALISTIC vocabulary.

The r5 flat-probe claim was measured on the sf documents table, whose
synthetic ~31-word vocabulary makes postings dense (every term matches
most docs), so bucket pruning could not show real selectivity. This
tool builds a zipfian corpus — ``N_TERMS`` (default 50k) distinct
terms, rank-frequency ∝ 1/rank^a like natural language — and
measures:

* index build time;
* probe latency from the at-rest index vs the no-index query path,
  for two query classes: HEAD queries (frequent terms — worst-case
  pruning) and TAIL queries (rare terms — the common case);
* measured pruning selectivity: postings rows scanned by the probe
  (bucket-pruned + term-filtered) as a fraction of total postings.

Usage:
    python tools/bm25_vocab_probe.py [OUT_JSON]
    BM25_VP_DOCS / BM25_VP_DOCLEN / BM25_VP_TERMS / BM25_VP_BUCKETS
    override the corpus shape (defaults 100k docs x 100 tokens, 50k
    terms, 256 buckets).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

os.environ.setdefault("SPARK_GRAFT_FAST_HASH", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from vbb_data_pipeline_spark.session import get_spark  # noqa: E402

N_DOCS = int(os.environ.get("BM25_VP_DOCS", "100000"))
DOC_LEN = int(os.environ.get("BM25_VP_DOCLEN", "100"))
N_TERMS = int(os.environ.get("BM25_VP_TERMS", "50000"))
N_BUCKETS = int(os.environ.get("BM25_VP_BUCKETS", "256"))
ZIPF_A = 1.1


def build_corpus(spark):
    """Zipfian corpus as a DataFrame — generated EXECUTOR-side with a
    mapInPandas over id ranges (the corpus never sits on the driver),
    deterministic per doc id."""

    def gen(batches):
        import numpy as np
        import pandas as pd

        # rank-frequency table shared per task
        ranks = np.arange(1, N_TERMS + 1, dtype="float64")
        probs = ranks ** (-ZIPF_A)
        probs /= probs.sum()
        cum = np.cumsum(probs)
        for pdf in batches:
            texts = []
            for did in pdf["id"]:
                rng = np.random.default_rng(int(did))
                draws = np.searchsorted(cum, rng.random(DOC_LEN))
                texts.append(" ".join(f"t{int(r)}" for r in draws))
            yield pd.DataFrame({"doc_id": pdf["id"], "text": texts})

    return spark.range(N_DOCS).repartition(32).mapInPandas(
        gen, schema="doc_id long, text string"
    )


def main() -> None:
    out_json = sys.argv[1] if len(sys.argv) > 1 else "BM25_vocab.json"
    from vbb_data_pipeline_spark.operators.retrieval import (
        _term_bucket,
        bm25_topk,
        bm25_topk_from_index,
        bm25_write_index,
    )

    spark = get_spark("bm25-vocab-probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = build_corpus(spark).localCheckpoint(eager=True)

    tmp = tempfile.mkdtemp(prefix="bm25_vp_")
    t0 = time.time()
    bm25_write_index(docs, tmp, n_buckets=N_BUCKETS)
    build_sec = time.time() - t0

    total_postings = spark.read.parquet(f"{tmp}/postings").count()

    # HEAD: ranks 1-5 (in most docs); TAIL: deep-tail ranks (in few)
    head_q = [(1, ["t0", "t1", "t2", "t3", "t4"])]
    tail_q = [(2, [f"t{N_TERMS - 7}", f"t{N_TERMS // 2}", "t9999"])]

    results = {}
    for name, queries in (("head", head_q), ("tail", tail_q)):
        terms = sorted({t for _, q in queries for t in q})
        # selectivity: rows the probe actually touches = postings in
        # the probed buckets (file-level prune) and, inside them, the
        # query terms' rows (row filter)
        tdf = spark.createDataFrame([(t,) for t in terms], "term string")
        buckets = [
            r["bucket"]
            for r in tdf.select(
                _term_bucket(F.col("term"), N_BUCKETS).alias("bucket")
            ).collect()
        ]
        post = spark.read.parquet(f"{tmp}/postings")
        bucket_rows = post.filter(F.col("bucket").isin(buckets)).count()
        term_rows = (
            post.filter(F.col("bucket").isin(buckets))
            .join(F.broadcast(tdf), "term", "left_semi")
            .count()
        )

        t0 = time.time()
        idx_rows = bm25_topk_from_index(spark, tmp, queries, k=10).collect()
        probe_sec = time.time() - t0

        t0 = time.time()
        raw_rows = bm25_topk(spark, docs, queries, k=10).collect()
        noindex_sec = time.time() - t0

        assert [tuple(r) for r in idx_rows] == [tuple(r) for r in raw_rows]
        results[name] = {
            "terms": len(terms),
            "probe_sec": round(probe_sec, 2),
            "noindex_sec": round(noindex_sec, 2),
            "bucket_rows": bucket_rows,
            "term_rows": term_rows,
            "bucket_fraction": round(bucket_rows / total_postings, 5),
            "term_fraction": round(term_rows / total_postings, 6),
        }

    out = {
        "corpus": {
            "docs": N_DOCS,
            "doc_len": DOC_LEN,
            "vocab": N_TERMS,
            "zipf_a": ZIPF_A,
            "n_buckets": N_BUCKETS,
            "total_postings": total_postings,
        },
        "build_sec": round(build_sec, 2),
        "queries": results,
    }
    print(json.dumps(out))
    with open(out_json, "w") as f:
        json.dump(out, f, indent=1)
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
