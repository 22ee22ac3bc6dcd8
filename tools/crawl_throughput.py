#!/usr/bin/env python
"""Measured throughput for the WARC crawl-ingestion path
(sources/warc.py) and the E6 curation chain on top of it — across
MEASURED DECADES up to ~1 GB of archive / millions of documents.

Builds a synthetic crawl from the sf documents table, replicated
``reps`` times with unique doc ids/URLs and per-replica perturbed
text (one gzip-member WARC record per document — real framing, real
gzip, real HTML, so the parse stage does its actual work), then per
decade measures:

* ``parse``         — read_warc → warc_to_documents (naive extractor)
  count(): archive bytes → text rows, docs/sec and input MB/sec;
* ``parse_density`` — same with the block-density extractor
  (boilerplate classification cost on top of parsing);
* ``curate``        — the E6 pre-E4 chain (URL normalize → URL dedup →
  host cap → boilerplate removal → lang ID; ``run_e4=False``) over
  the same archives — the host-cap/boilerplate exchanges at millions
  of documents.

One WARC file = one task, so local[N] parallelism mirrors the
cluster's file-count parallelism model. The claim under test: per-file
parse cost is LINEAR in archive bytes (sequential parse is the
format's requirement) and the curation exchanges carry (url/host/line
hash) rows, never text blowups — nothing super-linear across decades.

Usage:
    python tools/crawl_throughput.py [SF_DIR] [OUT_JSON]
    CRAWL_TP_DECADES="5,50,500" controls the replication decades
    (defaults to a single reps=1 run for the quick check).
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

from vbb_data_pipeline_spark.queries import load_table  # noqa: E402
from vbb_data_pipeline_spark.session import get_spark  # noqa: E402

N_FILES = int(os.environ.get("CRAWL_TP_FILES", "32"))
_REP_OFFSET = 10_000_019  # prime stride keeps replica ids collision-free


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


def build_crawl(spark, sf_dir: str, out_dir: str, reps: int = 1) -> dict:
    """documents × reps → N_FILES gzip-member WARC archives on disk.

    Replicas get unique doc ids and URLs and a one-token text
    perturbation (so URL dedup / exact dedup don't trivially collapse
    the corpus and the downstream stages do real per-doc work); hosts
    key on the ORIGINAL doc id, so per-host populations grow with
    ``reps`` — the host-cap exchange is exercised at scale, not just
    with more hosts of the same size.
    """
    rows = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text", "source")
        .collect()
    )
    n_hosts = max(len({r["source"] for r in rows}) * 4, 8)
    files = [[] for _ in range(N_FILES)]
    n_docs = 0
    for rep in range(reps):
        for r in rows:
            did = r["doc_id"] + rep * _REP_OFFSET
            host = f"h{r['doc_id'] % n_hosts}.example"
            body = (r["text"] or "").replace("&", "&amp;").replace("<", "&lt;")
            html = (
                "<html><head><title>doc</title><style>p{}</style></head>"
                "<body><p>NavBar Home About</p><p>"
                + (f"r{rep} " if rep else "")
                + body
                + "</p></body></html>"
            )
            rec = _record(
                _http(html.encode()),
                f"http://{host}/p/{did}?utm_source=x",
            )
            # level 1: generator speed — decompression cost (the
            # measured side) is level-independent
            files[did % N_FILES].append(gzip.compress(rec, compresslevel=1))
            n_docs += 1
    total = 0
    for i, members in enumerate(files):
        data = b"".join(members)
        total += len(data)
        with open(os.path.join(out_dir, f"part-{i:04d}.warc.gz"), "wb") as f:
            f.write(data)
    return {"docs": n_docs, "bytes": total, "files": N_FILES, "reps": reps}


def measure_decade(spark, tmp: str, meta: dict) -> dict:
    from vbb_data_pipeline_spark.pipelines import e6_crawl_corpus
    from vbb_data_pipeline_spark.sources.warc import (
        read_warc,
        warc_to_documents,
    )

    out: dict = {"input": meta}

    t0 = time.time()
    n_docs = warc_to_documents(read_warc(spark, tmp)).count()
    sec = time.time() - t0
    out["parse"] = {
        "docs": n_docs,
        "sec": round(sec, 2),
        "docs_per_sec": round(n_docs / sec),
        "mb_per_sec": round(meta["bytes"] / 1e6 / sec, 1),
    }

    t0 = time.time()
    warc_to_documents(read_warc(spark, tmp), extractor="density").count()
    sec = time.time() - t0
    out["parse_density"] = {
        "sec": round(sec, 2),
        "docs_per_sec": round(n_docs / sec),
        "mb_per_sec": round(meta["bytes"] / 1e6 / sec, 1),
    }

    # curate: E6 steps 2-6 only (run_e4=False) — URL normalize/dedup,
    # host cap, site boilerplate, langid; the exchanges under test
    t0 = time.time()
    n_curated = e6_crawl_corpus(
        spark,
        tmp,
        max_per_host=1_000_000,
        boilerplate_min_docs=3,
        run_e4=False,
    ).count()
    sec = time.time() - t0
    out["curate_pre_e4"] = {
        "docs_out": n_curated,
        "sec": round(sec, 2),
        "docs_per_sec": round(n_docs / sec),
    }
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    out_json = sys.argv[2] if len(sys.argv) > 2 else "CRAWL_throughput.json"
    decades = [
        int(x)
        for x in os.environ.get("CRAWL_TP_DECADES", "1").split(",")
        if x.strip()
    ]
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    results = []
    try:
        for reps in decades:
            tmp = tempfile.mkdtemp(prefix="crawl_tp_")
            try:
                t0 = time.time()
                meta = build_crawl(spark, sf_dir, tmp, reps=reps)
                meta["gen_sec"] = round(time.time() - t0, 1)
                row = measure_decade(spark, tmp, meta)
                results.append(row)
                print(json.dumps(row), file=sys.stderr)
            finally:
                shutil.rmtree(tmp, ignore_errors=True)
        out = {"sf_dir": sf_dir, "decades": results}
        print(json.dumps(out))
        with open(out_json, "w") as f:
            json.dump(out, f, indent=1)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
