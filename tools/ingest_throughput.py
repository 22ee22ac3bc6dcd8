#!/usr/bin/env python
"""Measured throughput for the E5 continuous corpus-ingestion stream
(streaming/ingest.py): documents land as parquet chunk files, the
stream drains them with ``maxFilesPerTrigger``, and throughput =
input rows / trigger-execution time from the query's own progress
metrics (foreachBatch work — quality gate, fingerprint dedup, index
probe, three appends — is inside triggerExecution; warm-up batch
excluded). A second landing is then drained against the index built
by the first, measuring the steady growing-corpus probe path.

Usage:
    python tools/ingest_throughput.py [SF_DIR] [OUT_JSON]
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

from vbb_data_pipeline_spark.queries import load_table  # noqa: E402
from vbb_data_pipeline_spark.session import get_spark  # noqa: E402
from vbb_data_pipeline_spark.streaming.ingest import (  # noqa: E402
    write_stream_corpus_ingest,
)

FILES = int(os.environ.get("INGEST_TP_FILES", "16"))
FILES_PER_TRIGGER = int(os.environ.get("INGEST_TP_TRIGGER", "2"))


def drain(q) -> dict:
    q.awaitTermination()
    progresses = [json.loads(p.json) for p in q.recentProgress]
    rows = secs = 0.0
    batches = 0
    first_skipped = False
    for p in progresses:
        n = p.get("numInputRows", 0)
        if n == 0:
            continue
        if not first_skipped:
            first_skipped = True
            continue
        rows += n
        secs += p["durationMs"]["triggerExecution"] / 1000.0
        batches += 1
    return {
        "rows": int(rows),
        "exec_sec": round(secs, 3),
        "batches": batches,
        "rows_per_sec": round(rows / secs) if secs > 0 else None,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_json = sys.argv[2] if len(sys.argv) > 2 else "INGEST_throughput.json"
    spark = get_spark("ingest-throughput")
    tmp = tempfile.mkdtemp(prefix="ingest_tp_")
    try:
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        n = docs.count()
        landing = os.path.join(tmp, "landing")
        # first landing: the corpus bootstrap (ids as-is)
        docs.repartition(FILES).write.mode("append").parquet(landing)
        kw = dict(
            corpus_path=os.path.join(tmp, "corpus"),
            index_path=os.path.join(tmp, "index"),
            audit_path=os.path.join(tmp, "audit"),
            checkpoint=os.path.join(tmp, "ckpt"),
        )

        def source():
            return (
                spark.readStream.schema("doc_id long, text string")
                .option("maxFilesPerTrigger", FILES_PER_TRIGGER)
                .parquet(landing)
            )

        results = {}
        t0 = time.perf_counter()
        q = write_stream_corpus_ingest(source(), **kw)
        results["bootstrap"] = drain(q)
        results["bootstrap"]["wall_sec"] = round(time.perf_counter() - t0, 3)

        # second landing: half dups of existing docs (shifted ids),
        # half new (suffixed text) — the steady probe path
        docs.select(
            (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
        ).repartition(FILES // 2).write.mode("append").parquet(landing)
        docs.select(
            (F.col("doc_id") + 20_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" zq"), F.col("doc_id")).alias(
                "text"
            ),
        ).repartition(FILES // 2).write.mode("append").parquet(landing)
        t0 = time.perf_counter()
        q = write_stream_corpus_ingest(source(), **kw)
        results["steady_probe"] = drain(q)
        results["steady_probe"]["wall_sec"] = round(time.perf_counter() - t0, 3)

        audit = spark.read.parquet(kw["audit_path"])
        statuses = {
            r["status"]: r["n"]
            for r in audit.groupBy("status")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        rows_per_batch = n * FILES_PER_TRIGGER // FILES
        point = {
            "sf_dir": sf_dir,
            "docs_rows": n,
            "files": FILES,
            "files_per_trigger": FILES_PER_TRIGGER,
            "pipelines": results,
            "audit_statuses": statuses,
        }
        # curve artifact: one entry per rows-per-batch point, merged
        # across invocations (like STREAM_throughput.json)
        curve = {}
        if os.path.exists(out_json):
            with open(out_json) as fh:
                curve = json.load(fh).get("curve", {})
        curve[f"{rows_per_batch}"] = point
        out = {
            "note": "key = docs per trigger; bootstrap = first landing "
            "(index empty), steady_probe = second landing probing the "
            "index built by the first (half exact dups, half new)",
            "curve": curve,
        }
        print(json.dumps(point))
        with open(out_json, "w") as fh:
            json.dump(out, fh, indent=1)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
