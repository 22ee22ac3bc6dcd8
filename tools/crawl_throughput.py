#!/usr/bin/env python
"""Measured throughput for the WARC crawl-ingestion path
(sources/warc.py) and the E6 curation chain on top of it.

Builds a synthetic crawl from the sf documents table (one gzip-member
WARC file per task-sized chunk, HTML-wrapped bodies — real framing,
real gzip, real HTML so the parse stage does its actual work), then
measures:

* ``parse``   — read_warc → warc_to_documents count() (archive bytes →
  text rows; the Arrow parse stage end-to-end), reported as docs/sec
  and input MB/sec;
* ``curate``  — the E6 pre-E4 chain (URL normalize → URL dedup → host
  cap → boilerplate removal → lang ID) over the same archives.

One WARC file = one task, so local[N] parallelism mirrors the
cluster's file-count parallelism model. Scale posture: throughput
should scale ~linearly with cores/files; per-file cost is linear in
archive bytes (sequential parse is the format's requirement).

Usage:
    python tools/crawl_throughput.py [SF_DIR] [OUT_JSON]
"""

from __future__ import annotations

import gzip
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

N_FILES = int(os.environ.get("CRAWL_TP_FILES", "32"))


def _http(body: bytes) -> bytes:
    return (
        f"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode() + body


def _record(payload: bytes, uri: str) -> bytes:
    head = (
        f"WARC/1.0\r\nWARC-Type: response\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"WARC-Date: 2024-01-02T03:04:05Z\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode()
    return head + payload + b"\r\n\r\n"


def build_crawl(spark, sf_dir: str, out_dir: str) -> dict:
    """documents → N_FILES gzip-member WARC archives on disk."""
    rows = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text", "source")
        .collect()
    )
    n_hosts = max(len({r["source"] for r in rows}) * 4, 8)
    files = [[] for _ in range(N_FILES)]
    for r in rows:
        host = f"h{r['doc_id'] % n_hosts}.example"
        html = (
            "<html><head><title>doc</title><style>p{}</style></head>"
            "<body><p>NavBar Home About</p><p>"
            + (r["text"] or "").replace("&", "&amp;").replace("<", "&lt;")
            + "</p></body></html>"
        )
        rec = _record(
            _http(html.encode()),
            f"http://{host}/p/{r['doc_id']}?utm_source=x",
        )
        files[r["doc_id"] % N_FILES].append(gzip.compress(rec))
    total = 0
    for i, members in enumerate(files):
        data = b"".join(members)
        total += len(data)
        with open(os.path.join(out_dir, f"part-{i:04d}.warc.gz"), "wb") as f:
            f.write(data)
    return {"docs": len(rows), "bytes": total, "files": N_FILES}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    out_json = sys.argv[2] if len(sys.argv) > 2 else "CRAWL_throughput.json"
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="crawl_tp_")
    try:
        meta = build_crawl(spark, sf_dir, tmp)

        from vbb_data_pipeline_spark.pipelines import e6_crawl_corpus
        from vbb_data_pipeline_spark.sources.warc import (
            read_warc,
            warc_to_documents,
        )

        # parse: archives → document rows (count() drives the full
        # binaryFile → Arrow parse → HTML extract chain)
        t0 = time.time()
        n_docs = warc_to_documents(read_warc(spark, tmp)).count()
        parse_sec = time.time() - t0

        # curate: the E6 pre-E4 chain; E4 reduced to the cheapest
        # configuration so the measured cost is curation, not corpus
        # assembly (E4's own numbers live in PERF.md already)
        t1 = time.time()
        n_curated = e6_crawl_corpus(
            spark,
            tmp,
            max_per_host=1_000_000,
            boilerplate_min_docs=3,
            min_quality=0.0,
            split_weights={"train": 1.0},
        ).count()
        curate_sec = time.time() - t1

        out = {
            "sf_dir": sf_dir,
            "input": meta,
            "parse": {
                "docs": n_docs,
                "sec": round(parse_sec, 2),
                "docs_per_sec": round(n_docs / parse_sec),
                "mb_per_sec": round(meta["bytes"] / 1e6 / parse_sec, 1),
            },
            "curate_e6": {
                "docs_out": n_curated,
                "sec": round(curate_sec, 2),
                "docs_per_sec": round(n_docs / curate_sec),
            },
        }
        print(json.dumps(out))
        with open(out_json, "w") as f:
            json.dump(out, f, indent=1)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
