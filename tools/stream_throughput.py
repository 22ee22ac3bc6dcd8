#!/usr/bin/env python
"""Measured Structured Streaming throughput for the engine's streaming
operator shapes (the reference's streaming plane is a synchronous
per-record Kafka producer — ≤ 1 record per broker RTT by construction,
BASELINE.md; this probe records what the Spark formulation sustains).

Method: the sf events table is re-chunked into FILES micro-batch
files; each pipeline streams them with ``maxFilesPerTrigger`` into a
noop sink until the source is drained, and throughput = total input
rows / total trigger-execution time from the query's own progress
metrics (so listing/planning overhead is IN the number, warm-up batch
excluded). Pipelines probed:

* ``window_agg``   — watermarked 1 h tumbling count+sum (the
                     stream_tumbling_window registry shape)
* ``stateful_dedup`` — dropDuplicatesWithinWatermark on
                     (user_id, event_type)
* ``geo_filter``   — the reference's missing GeoFilterStream
                     (stateless predicate; upper bound for the plane)

Usage:
    python tools/stream_throughput.py [SF_DIR] [OUT_JSON]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import uuid

os.environ.setdefault("SPARK_GRAFT_FAST_HASH", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from vbb_data_pipeline_spark.queries import load_table  # noqa: E402
from vbb_data_pipeline_spark.session import get_spark  # noqa: E402

FILES = int(os.environ.get("STREAM_TP_FILES", "32"))
FILES_PER_TRIGGER = int(os.environ.get("STREAM_TP_TRIGGER", "2"))


def drain(stream_df, name: str, output_mode: str = "update") -> dict:
    q = (
        stream_df.writeStream.format("noop")
        .outputMode(output_mode)
        .queryName(f"{name}_{uuid.uuid4().hex[:6]}")
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        while True:
            q.processAllAvailable()
            # a second source listing can race the first; confirm
            # drained (no new data in the latest progress)
            lp = q.lastProgress
            if lp is not None and lp["numInputRows"] == 0:
                break
            time.sleep(0.2)
        progresses = [json.loads(p.json) for p in q.recentProgress]
    finally:
        q.stop()
    rows = 0
    secs = 0.0
    batches = 0
    first_skipped = False
    for p in progresses:
        n = p.get("numInputRows", 0)
        if n == 0:
            continue
        if not first_skipped:
            first_skipped = True  # warm-up batch: codegen + state init
            continue
        rows += n
        secs += p["durationMs"]["triggerExecution"] / 1000.0
        batches += 1
    return {
        "rows": rows,
        "exec_sec": round(secs, 3),
        "batches": batches,
        "rows_per_sec": round(rows / secs) if secs > 0 else None,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_json = sys.argv[2] if len(sys.argv) > 2 else "STREAM_throughput.json"
    spark = get_spark("stream-throughput")
    tmp = tempfile.mkdtemp(prefix="stream_tp_")
    try:
        ev = load_table(spark, sf_dir, "events")
        n_total = ev.count()
        src_dir = os.path.join(tmp, "events")
        ev.repartition(FILES).write.parquet(src_dir)
        schema = spark.read.parquet(src_dir).schema

        def source():
            return (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", FILES_PER_TRIGGER)
                .parquet(src_dir)
            )

        from vbb_data_pipeline_spark.streaming.windows import tumbling

        results = {}

        agg = tumbling(
            source(), "ts", "1 hour", ["event_type"],
            F.count(F.lit(1)).alias("n"),
            watermark="10 minutes",
        )
        results["window_agg"] = drain(agg, "window_agg")

        dd = (
            source()
            .select("ts", "user_id", "event_type")
            .withWatermark("ts", "1 hour")
            .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        )
        results["stateful_dedup"] = drain(dd, "stateful_dedup")

        # the T4 shape: JSON parse-or-drop -> haversine -> re-serialize
        from vbb_data_pipeline_spark.streaming.arrivals import (
            arrivals_as_wire,
            geo_filter_arrivals,
        )

        wire = arrivals_as_wire(
            source().select(
                F.col("ts"),
                F.col("event_type").alias("stop_name"),
                ((F.col("user_id") * 7) % 180 - 90)
                .cast("double")
                .alias("stop_lat"),
                ((F.col("event_id") * 13) % 360 - 180)
                .cast("double")
                .alias("stop_lon"),
            )
        )
        geo = geo_filter_arrivals(
            wire, center_lat=52.5208, center_lon=13.4095, radius_m=500_000.0
        )
        results["geo_filter"] = drain(geo, "geo_filter")

        # stream-stream interval join (the ss_join registry shape):
        # both sides watermarked, event-time range in the condition —
        # state bounded by the interval
        views = (
            source()
            .filter(F.col("event_type") == "view")
            .select(
                F.col("event_id").alias("view_id"),
                "user_id",
                F.col("ts").alias("view_ts"),
            )
            .withWatermark("view_ts", "1 hour")
        )
        purchases = (
            source()
            .filter(F.col("event_type") == "purchase")
            .select(
                F.col("event_id").alias("purchase_id"),
                F.col("user_id").alias("p_user_id"),
                F.col("ts").alias("purchase_ts"),
            )
            .withWatermark("purchase_ts", "1 hour")
        )
        ssj = views.join(
            purchases,
            (F.col("user_id") == F.col("p_user_id"))
            & (F.col("purchase_ts") >= F.col("view_ts"))
            & (
                F.col("purchase_ts")
                <= F.col("view_ts") + F.expr("INTERVAL 6 HOURS")
            ),
        )
        # joins only support append mode
        results["stream_stream_join"] = drain(ssj, "ss_join", "append")

        out = {
            "sf_dir": sf_dir,
            "events_rows": n_total,
            "files": FILES,
            "files_per_trigger": FILES_PER_TRIGGER,
            "pipelines": results,
        }
        print(json.dumps(out))
        with open(out_json, "w") as fh:
            json.dump(out, fh, indent=1)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
