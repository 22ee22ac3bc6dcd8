#!/usr/bin/env python
"""Measure star-mode candidate recall against all-pairs ground truth
(VERDICT r6 next-round item #2).

``pair_mode="star"`` (operators/dedup.lsh_candidate_pairs) emits only
(bucket-min, member) edges — n−1 per bucket instead of n(n−1)/2 —
which is what lets the crawl plane survive 500-member near-dup
families (all-pairs OOMs a 1 GB crawl at 0.5 GB/task; CRAWL_E2E.json).
The documented tradeoff: a member whose verified similarity to the
bucket HUB falls below threshold detaches from the family even when
it is above-threshold near some OTHER member. This script measures
that loss on a MIXED corpus — not just the adversarial mega-family
the property test pins:

* base: the real documents table (sf0.1 = 5k docs, sf1 = 50k docs);
* hi families: 3 tight variants per 20th doc (J ≈ 0.9);
* near-threshold pairs: one 60 %-prefix variant per 10th doc
  (J straddles the 0.5 threshold — the adversarial zone for star);
* chains: A–B–C with ~30 % token shift per hop per 50th doc
  (B bridges A and C; pairwise A–C is weaker);
* one mega-family: 200 suffix variants of doc 0 (the crawl shape).

Ground truth = the FULL near-dup pipeline (LSH → exact-Jaccard verify
≥ t → connected components → keep-min) with pair_mode="all"; the
candidate stage is the ONLY thing that changes between runs. Reported
per decade:

* detached_rate — of the docs all-pairs drops as near-dups, the
  fraction star KEEPS (missed removals, the recall loss that matters
  to a dedup user);
* cluster_split_rate — of all-pairs clusters (≥ 2 docs), the
  fraction whose members land in > 1 star cluster (counting star
  singletons), i.e. families star fragments;
* verified-edge counts for both modes (the cost side).

Usage: python tools/star_recall.py [--out STAR_RECALL.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, functions as F  # noqa: E402

THRESHOLD = 0.5
NUM_HASHES = 16
BANDS = 4

DECADES = [
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf1", "/root/repo/testdata_sf1"),
]


def planted_corpus(spark, sf_dir: str) -> DataFrame:
    """documents + deterministic near-dup structures at disjoint id
    offsets (all token surgery is codegen array ops — no Python)."""
    d = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
    )
    toks = d.select(
        "doc_id",
        F.split(F.lower(F.col("text")), "[^a-z0-9]+").alias("tk"),
    ).withColumn("tk", F.filter("tk", lambda x: x != ""))
    n = F.size("tk")

    def rejoin(col):
        return F.concat_ws(" ", col)

    fresh = lambda tag, k: F.transform(  # noqa: E731
        F.sequence(F.lit(1), F.lit(k)),
        lambda i: F.concat(
            F.lit(tag), F.col("doc_id").cast("string"), F.lit("x"),
            i.cast("string"),
        ),
    )
    legs = [d]
    # hi families: 3 tight variants (append 2 fresh tokens each)
    for v in range(3):
        legs.append(
            toks.filter(F.col("doc_id") % 20 == 1).select(
                (F.col("doc_id") + 1_000_000 + v * 100_000).alias("doc_id"),
                rejoin(F.concat(F.col("tk"), fresh(f"h{v}q", 2))).alias(
                    "text"
                ),
            )
        )
    # near-threshold: keep the first 60% of tokens + 2 fresh
    legs.append(
        toks.filter(F.col("doc_id") % 10 == 3).select(
            (F.col("doc_id") + 2_000_000).alias("doc_id"),
            rejoin(
                F.concat(
                    F.slice("tk", 1, F.ceil(n * 0.6).cast("int")),
                    fresh("nrq", 2),
                )
            ).alias("text"),
        )
    )
    # chains: B drops the first 30%, C drops the first 55% (B bridges)
    for off, frac in ((3_000_000, 0.30), (3_500_000, 0.55)):
        start = (F.floor(n * frac) + 1).cast("int")
        legs.append(
            toks.filter(F.col("doc_id") % 50 == 7).select(
                (F.col("doc_id") + off).alias("doc_id"),
                rejoin(
                    F.concat(
                        F.slice("tk", start, F.lit(1_000_000)),
                        fresh(f"c{off % 97}q", 1),
                    )
                ).alias("text"),
            )
        )
    # mega-family: 200 one-fresh-token variants of doc 0 (crawl shape)
    base0 = toks.filter(F.col("doc_id") == 0)
    mega = base0.select(
        F.explode(F.sequence(F.lit(1), F.lit(200))).alias("i"), "tk"
    ).select(
        (F.lit(4_000_000) + F.col("i")).alias("doc_id"),
        rejoin(
            F.concat(
                F.col("tk"),
                F.array(F.concat(F.lit("mgq"), F.col("i").cast("string"))),
            )
        ).alias("text"),
    )
    legs.append(mega)
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out


def run_mode(docs: DataFrame, pair_mode: str) -> tuple[dict, DataFrame]:
    """LSH(pair_mode) → Jaccard verify → CC; returns (stats, clusters)."""
    from vbb_data_pipeline_spark.operators.dedup import (
        connected_components,
        jaccard_pairs,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    t0 = time.perf_counter()
    sigs = minhash_signatures(
        docs, "text", "doc_id", num_hashes=NUM_HASHES, hash_mode="fast"
    )
    cands = lsh_candidate_pairs(
        sigs, "doc_id", num_hashes=NUM_HASHES, bands=BANDS,
        hash_mode="fast", pair_mode=pair_mode,
    )
    verified = (
        jaccard_pairs(docs, cands, "text", "doc_id")
        .filter(F.col("jaccard") >= THRESHOLD)
        .localCheckpoint()
    )
    n_cand = cands.count()
    n_edges = verified.count()
    clusters = connected_components(verified).localCheckpoint()
    stats = {
        "candidates": n_cand,
        "verified_edges": n_edges,
        "wall_sec": round(time.perf_counter() - t0, 1),
    }
    return stats, clusters


def compare(gt: DataFrame, st: DataFrame) -> dict:
    # dropped = cluster member that is not the min-id survivor
    drop_gt = gt.filter(F.col("node") != F.col("cluster_id")).select("node")
    drop_st = st.filter(F.col("node") != F.col("cluster_id")).select("node")
    n_drop_gt = drop_gt.count()
    detached = drop_gt.join(drop_st, "node", "left_anti").count()
    # cluster splits: GT cluster (>=2 members) whose members map to >1
    # star cluster (a doc absent from star's components is its own
    # singleton cluster)
    members = gt.select("node", F.col("cluster_id").alias("gt_c"))
    st_lab = st.select("node", F.col("cluster_id").alias("st_c"))
    lab = members.join(st_lab, "node", "left").select(
        "node", "gt_c", F.coalesce("st_c", F.col("node")).alias("st_c")
    )
    per = lab.groupBy("gt_c").agg(
        F.countDistinct("st_c").alias("k"), F.count("*").alias("m")
    )
    n_clusters = per.count()
    n_split = per.filter(F.col("k") > 1).count()
    return {
        "gt_dropped": n_drop_gt,
        "star_missed_drops": detached,
        "detached_rate": round(detached / max(n_drop_gt, 1), 4),
        "gt_clusters": n_clusters,
        "split_clusters": n_split,
        "cluster_split_rate": round(n_split / max(n_clusters, 1), 4),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="STAR_RECALL.json")
    args = ap.parse_args()

    from vbb_data_pipeline_spark.session import get_spark

    spark = get_spark("star-recall")
    report = {"threshold": THRESHOLD, "num_hashes": NUM_HASHES,
              "bands": BANDS, "decades": {}}
    for name, sf_dir in DECADES:
        docs = planted_corpus(spark, sf_dir).localCheckpoint()
        n_docs = docs.count()
        all_stats, gt = run_mode(docs, "all")
        star_stats, st = run_mode(docs, "star")
        cmpd = compare(gt, st)
        row = {"n_docs": n_docs, "all": all_stats, "star": star_stats,
               **cmpd}
        report["decades"][name] = row
        print(json.dumps({name: row}), flush=True)
    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
