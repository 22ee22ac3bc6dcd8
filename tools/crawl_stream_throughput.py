#!/usr/bin/env python
"""Measured throughput for the E6 STREAMING crawl tier
(streaming/ingest.stream_crawl_corpus_ingest): gzip-member WARC
archives land in a directory, the binaryFile stream drains them with
``maxFilesPerTrigger``, and each micro-batch runs parse → HTML
extract → URL normalize → the E5 quality-gate/incremental-dedup
loop. Throughput = archive docs / trigger-execution time from the
query's own progress metrics (warm-up batch excluded — note
numInputRows counts FILES for a binaryFile source, so docs/sec is
computed from the known docs-per-archive).

A second landing then drains against the index built by the first,
measuring the steady growing-corpus path: a byte-identical
re-generation under new file names, i.e. a full content re-crawl
that the index probe must reject wholesale. (Not necessarily to
zero: incremental dedup is ingestion-ORDER dependent by design — a
doc whose landing-1 fp-twin was batch_dup'd while the kept twin was
near-dup-rejected probes the index with a DIFFERENT shingle
signature than its twin did (fp is order-insensitive, shingles are
not), and a re-landing under different batch grouping can admit it.
Measured: 1 admission in 43,750 re-crawled docs.)

Usage:
    python tools/crawl_stream_throughput.py [SF_DIR] [OUT_JSON]
    CRAWL_STP_REPS (default 10 — ~19 MB / 50k docs per landing),
    CRAWL_STP_TRIGGER (files per trigger, default 4).
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

from vbb_data_pipeline_spark.session import get_spark  # noqa: E402

REPS = int(os.environ.get("CRAWL_STP_REPS", "10"))
TRIGGER = int(os.environ.get("CRAWL_STP_TRIGGER", "4"))


def drain(q) -> dict:
    q.awaitTermination()
    progresses = [json.loads(p.json) for p in q.recentProgress]
    files = secs = 0.0
    batches = 0
    first_skipped = False
    for p in progresses:
        n = p.get("numInputRows", 0)
        if n == 0:
            continue
        if not first_skipped:
            first_skipped = True
            continue
        files += n
        secs += p["durationMs"]["triggerExecution"] / 1000.0
        batches += 1
    return {"files": int(files), "exec_sec": round(secs, 3),
            "batches": batches}


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from crawl_throughput import build_crawl  # same generator
    from vbb_data_pipeline_spark.streaming.ingest import (
        stream_crawl_corpus_ingest,
    )

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    out_json = sys.argv[2] if len(sys.argv) > 2 else (
        "CRAWL_STREAM_throughput.json"
    )
    spark = get_spark("crawl-stream-tp")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="crawl_stp_")
    landing = os.path.join(work, "landing")
    os.makedirs(landing)
    kw = dict(
        corpus_path=os.path.join(work, "corpus"),
        index_path=os.path.join(work, "index"),
        audit_path=os.path.join(work, "audit"),
        checkpoint=os.path.join(work, "ckpt"),
        max_files_per_trigger=TRIGGER,
        min_quality=0.0,
    )
    out: dict = {"sf_dir": sf_dir, "files_per_trigger": TRIGGER}
    try:
        meta = build_crawl(spark, sf_dir, landing, reps=REPS)
        docs_per_file = meta["docs"] / meta["files"]
        t0 = time.time()
        d = drain(stream_crawl_corpus_ingest(spark, landing, **kw))
        wall = time.time() - t0
        docs = int(d["files"] * docs_per_file)
        out["bootstrap"] = {
            **meta,
            **d,
            "docs_measured": docs,
            "docs_per_sec": round(docs / d["exec_sec"]),
            "wall_sec": round(wall, 2),
        }
        n_corpus = spark.read.parquet(kw["corpus_path"]).count()
        out["bootstrap"]["corpus_rows"] = n_corpus

        # second landing: a byte-identical re-generation of landing 1
        # under NEW file names, i.e. a full content re-crawl with new
        # doc ids — every document must be rejected by the at-rest
        # index probe (exact_dup), measuring the steady reject path
        landing2 = os.path.join(work, "landing2")
        os.makedirs(landing2)
        meta2 = build_crawl(spark, sf_dir, landing2, reps=REPS)
        for f in os.listdir(landing2):
            shutil.move(
                os.path.join(landing2, f), os.path.join(landing, "re_" + f)
            )
        t0 = time.time()
        d2 = drain(stream_crawl_corpus_ingest(spark, landing, **kw))
        wall2 = time.time() - t0
        docs2 = int(d2["files"] * docs_per_file)
        out["steady_recrawl"] = {
            **d2,
            "docs_measured": docs2,
            "docs_per_sec": round(docs2 / d2["exec_sec"]),
            "wall_sec": round(wall2, 2),
            "corpus_rows_after": spark.read.parquet(
                kw["corpus_path"]
            ).count(),
            "corpus_rows_before": n_corpus,
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()
    print(json.dumps(out))
    with open(out_json, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
