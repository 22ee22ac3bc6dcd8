#!/usr/bin/env python
"""Skew-robustness probe for the dedup winner elections.

Both corpus-wide elections (``line_dedup_corpus``'s line-winner
election and ``substring_span_stats``'s span owner election) claim a
skew-safe 100 TB shape: the election groups by content hash with a
map-side-combinable ``min(struct(...))`` / count aggregate, so a
boilerplate line or span occurring in a huge fraction of the corpus
combines to ONE row per map task instead of concentrating on a single
reducer. This probe PROVES it with a deliberately pathological key:

* builds two same-volume synthetic corpora (default 200k docs x ~60
  tokens — the sf1 documents decade is 50k docs):
  - ``uniform``: every line of every document is unique;
  - ``skewed``: ONE 3-line block (~36 tokens) is planted verbatim in
    10% of documents — its line hashes get ``0.1 * n_docs`` copies
    and, for span stats, a run of duplicated window-15 span hashes;
* runs each election on both corpora and, per run, pulls per-stage
  task-time quantiles from the Spark REST API;
* reports, for the heaviest stage of each run, ``max / median`` task
  time — a reducer hot-spot shows up as max >> median (the VERDICT
  bar: within ~2x);
* ``--contrast`` also measures the NAIVE election (row_number over a
  ``Window.partitionBy(hash)``) on the skewed corpus: every copy of
  the hot key lands in one window partition / one task, which is the
  hot-spot the min-struct design avoids.

Usage: python tools/skew_probe.py [--docs 200000] [--contrast]
Prints one JSON line per (operator, corpus) with wall seconds and the
heaviest stage's task-time quantiles.
"""

from __future__ import annotations

import argparse
import json
import time
import urllib.request

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import sys

sys.path.insert(0, "/root/repo")

from vbb_data_pipeline_spark.operators.dedup import (  # noqa: E402
    line_dedup_corpus,
    substring_span_stats,
)
from vbb_data_pipeline_spark.session import get_spark  # noqa: E402

HOT_BLOCK = "\n".join(
    " ".join(f"hot{j}w{k}" for k in range(12)) for j in range(3)
)


def build_corpus(spark: SparkSession, n_docs: int, skewed: bool) -> DataFrame:
    """n_docs documents, 5 lines x 12 tokens each, built distributed.

    Skewed mode replaces lines 1-3 of every 10th document with the
    same HOT_BLOCK, so one content key holds 10% of the corpus.
    """
    base = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    uniq_line = lambda j: F.concat_ws(  # noqa: E731
        " ",
        *[
            F.concat(F.lit(f"d{j}t{k}x"), F.col("doc_id").cast("string"))
            for k in range(12)
        ],
    )
    lines = [uniq_line(j) for j in range(5)]
    uniform_text = F.concat_ws("\n", *lines)
    if not skewed:
        return base.select("doc_id", uniform_text.alias("text"))
    skew_text = F.concat_ws("\n", lines[0], F.lit(HOT_BLOCK), lines[4])
    # every 3rd doc carries the hot block: ~33% of the corpus shares
    # one content key — far past any realistic boilerplate fraction
    return base.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, skew_text)
        .otherwise(uniform_text)
        .alias("text"),
    )


def rest_json(url: str):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.load(r)


def stage_report(spark: SparkSession, before_ids: set[int]) -> dict:
    """All new stages since ``before_ids``: per-stage task-time AND
    shuffle-read-record quantiles. The hot-spot signal is max/median
    of shuffle-read records on the reduce stages — a skewed key
    concentrates its copies on one task there; task runtime follows
    once per-copy work matters."""
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    stages = rest_json(f"{ui}/api/v1/applications/{app}/stages?status=COMPLETE")
    new = [
        s
        for s in stages
        if s["stageId"] not in before_ids and s.get("numCompleteTasks", 0) >= 4
    ]
    if not new:
        return {}
    out = {
        "worst_runtime_skew": 0.0,
        "worst_shuffle_skew": 0.0,
        "heaviest_task_ms_max": 0.0,
        "heaviest_task_ms_median": 0.0,
    }
    heavy = max(new, key=lambda s: s.get("executorRunTime", 0))
    for s in new:
        q = rest_json(
            f"{ui}/api/v1/applications/{app}/stages/{s['stageId']}/"
            f"{s['attemptId']}/taskSummary?quantiles=0.0,0.5,0.95,1.0"
        )
        run = q["executorRunTime"]  # ms at the 4 quantiles
        # runtime skew only meaningful when the stage does real work
        if run[3] >= 50:
            out["worst_runtime_skew"] = max(
                out["worst_runtime_skew"], round(run[3] / max(run[1], 1.0), 2)
            )
        srec = (q.get("shuffleReadMetrics") or {}).get("readRecords")
        if srec and srec[3] >= 1000:
            out["worst_shuffle_skew"] = max(
                out["worst_shuffle_skew"],
                round(srec[3] / max(srec[1], 1.0), 2),
            )
        if s["stageId"] == heavy["stageId"]:
            out["heaviest_task_ms_median"] = run[1]
            out["heaviest_task_ms_max"] = run[3]
    return out


def seen_stage_ids(spark: SparkSession) -> set[int]:
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    try:
        stages = rest_json(f"{ui}/api/v1/applications/{app}/stages")
        return {s["stageId"] for s in stages}
    except Exception:
        return set()


def naive_window_election(df: DataFrame) -> DataFrame:
    """The design REJECTED by line_dedup_corpus: rank every copy of a
    line hash inside one window partition. The hot key's copies all
    land on one task."""
    from pyspark.sql.window import Window

    from vbb_data_pipeline_spark.functions.hashing import md5_long

    lines = df.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), "\n")).alias("_line_no", "_line"),
    ).select("doc_id", "_line_no", md5_long(F.col("_line")).alias("_h"))
    w = Window.partitionBy("_h").orderBy("doc_id", "_line_no")
    return (
        lines.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("doc_id", "_line_no")
    )


def run_case(spark, name: str, make_df) -> dict:
    before = seen_stage_ids(spark)
    t0 = time.monotonic()
    df = make_df()
    # force every column: a bare count() lets Catalyst eliminate the
    # final outer join (unique right keys, no columns referenced) and
    # skip the election entirely
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(F.xxhash64(*df.columns)).alias("_h"),
    ).first()
    n = row["n"]
    wall = time.monotonic() - t0
    rep = {"case": name, "rows": n, "wall_s": round(wall, 2)}
    rep.update(stage_report(spark, before))
    print(json.dumps(rep))
    return rep


def build_url_corpus(spark: SparkSession, n_docs: int) -> DataFrame:
    """n_docs (doc_id, url, text) rows where ONE host holds 50% of the
    corpus (distinct paths) and the rest spread over ~n/100 small
    hosts of ~50 docs each — the mega-host crawl shape host_cap_approx
    exists for."""
    base = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    return base.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(F.lit("https://mega.example/p"), F.col("doc_id")),
        )
        .otherwise(
            F.concat(
                F.lit("https://h"),
                (F.col("doc_id") % 2000).cast("string"),
                F.lit(".example/p"),
                F.col("doc_id").cast("string"),
            )
        )
        .alias("url"),
        F.lit("body text").alias("text"),
    )


def hostcap_cases(spark: SparkSession, n_docs: int) -> None:
    """Contrast the exact window host_cap against host_cap_approx on
    the mega-host corpus. Spark >=3.5's WindowGroupLimit rescues the
    rn<=N pattern map-side (cap rows per key per map partition reach
    the exchange), so the window is measured BOTH rescued and
    unrescued — the unrescued run is the shape for any per-host logic
    the rewrite cannot cover, and the approx cap needs no rescue at
    all (no window anywhere in its plan)."""
    from vbb_data_pipeline_spark.functions.urls import (
        host_cap,
        host_cap_approx,
    )

    corpus = build_url_corpus(spark, n_docs).localCheckpoint()
    cap = 100
    run_case(
        spark,
        "host_cap_window_rescued/mega-host",
        lambda: host_cap(corpus, "url", cap, hash_mode="fast"),
    )
    key = "spark.sql.optimizer.windowGroupLimitThreshold"
    spark.conf.set(key, "-1")
    try:
        run_case(
            spark,
            "host_cap_window_unrescued/mega-host",
            lambda: host_cap(corpus, "url", cap, hash_mode="fast"),
        )
    finally:
        spark.conf.unset(key)
    run_case(
        spark,
        "host_cap_approx/mega-host",
        lambda: host_cap_approx(corpus, "url", cap, hash_mode="fast"),
    )
    corpus.unpersist()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=200_000)
    ap.add_argument("--contrast", action="store_true")
    ap.add_argument("--hostcap", action="store_true")
    args = ap.parse_args()

    spark = get_spark(
        app_name="skew-probe", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    if args.hostcap:
        hostcap_cases(spark, args.docs * 10)
        return

    for skewed in (False, True):
        tag = "skewed" if skewed else "uniform"
        # line election is cheap per row: drive it at 10x the doc
        # count so its stages register in the task-time quantiles
        big = build_corpus(spark, args.docs * 10, skewed).localCheckpoint()
        run_case(
            spark,
            f"line_dedup/{tag}",
            lambda: line_dedup_corpus(big, "text", "doc_id"),
        )
        if args.contrast and skewed:
            # Spark >=3.5 partially rescues the naive rn==1 pattern:
            # WindowGroupLimit keeps one row per key per map partition
            # BEFORE the exchange (confirmed in the plan), so its
            # shuffle skew stays low. Disable the rescue to measure
            # what the window SHAPE does for any election the rewrite
            # cannot cover (full ranks, collect_list of positions...)
            run_case(
                spark,
                "naive_window_rescued/skewed",
                lambda: naive_window_election(big),
            )
            key = "spark.sql.optimizer.windowGroupLimitThreshold"
            spark.conf.set(key, "-1")
            try:
                run_case(
                    spark,
                    "naive_window_unrescued/skewed",
                    lambda: naive_window_election(big),
                )
            finally:
                spark.conf.unset(key)
        big.unpersist()
        corpus = build_corpus(spark, args.docs, skewed).localCheckpoint()
        run_case(
            spark,
            f"span_stats/{tag}",
            lambda: substring_span_stats(
                corpus, "text", "doc_id", window=15
            ),
        )
        corpus.unpersist()


if __name__ == "__main__":
    main()
