#!/usr/bin/env python
"""Poll a local Spark UI's stage API into a JSONL file.

Post-mortem visibility for crawl-decade runs (the engine session
disables the UI by default; pass --conf spark.ui.enabled=true to
crawl_e2e and run this alongside). Each sample row records, per
stage: status, task progress, input/shuffle byte counters, and peak
execution memory — enough to identify WHICH stage was reading what
when a run dies, without event-log replay tooling.

Usage: python tools/stage_poller.py OUT.jsonl [interval_sec] [port]
Stops on its own when the UI stops answering for ~2 min.
"""
import json
import sys
import time
import urllib.request


def snap(port: int):
    base = f"http://localhost:{port}/api/v1"
    apps = json.load(urllib.request.urlopen(f"{base}/applications", timeout=5))
    out = []
    for a in apps:
        stages = json.load(
            urllib.request.urlopen(
                f"{base}/applications/{a['id']}/stages", timeout=10
            )
        )
        for s in stages:
            out.append(
                {
                    "app": a["id"],
                    "stage": s["stageId"],
                    "attempt": s["attemptId"],
                    "status": s["status"],
                    "tasks": f"{s['numCompleteTasks']}/{s['numTasks']}",
                    "failed": s["numFailedTasks"],
                    "input_mb": round(s.get("inputBytes", 0) / 1e6, 1),
                    "sread_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 1),
                    "swrite_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
                    "spill_mb": round(s.get("memoryBytesSpilled", 0) / 1e6, 1),
                    "peak_exec_mb": round(
                        s.get("peakExecutionMemory", 0) / 1e6, 1
                    ),
                    "name": s["name"][:60],
                }
            )
    return out


def main() -> None:
    out_path = sys.argv[1]
    interval = float(sys.argv[2]) if len(sys.argv) > 2 else 20.0
    port = int(sys.argv[3]) if len(sys.argv) > 3 else 4040
    misses = 0
    with open(out_path, "a") as fh:
        while misses * interval < 120:
            try:
                rows = snap(port)
                misses = 0
                fh.write(
                    json.dumps({"t": round(time.time(), 1), "stages": rows})
                    + "\n"
                )
                fh.flush()
            except Exception:
                misses += 1
            time.sleep(interval)


if __name__ == "__main__":
    main()
