"""Crawl-plane roundtrip query — drives the WARC ingestion path
(sources/warc.py) through the driver's hash gate.

The WARC plane (gzip-member framing, Content-Length record parse,
HTTP payload split, HTML extraction) was previously pytest-gated
only. This entry makes it driver-checkable: the documents table is
rendered into real gzip-member WARC archives IN-PLAN (one archive
per doc_id bucket, one gzip member per record, decoy records that
the response/200/text-html filters must drop), pushed through the
production ``parse_warc_records`` → ``warc_to_documents`` stages,
and the extracted text must hash-match the original table — the
oracle is simply ``SELECT doc_id, text FROM documents``, so any
framing, decompression, filtering or extraction defect breaks the
match.

The HTML wrapper is chosen so naive extraction is exactly the
identity on this corpus (single ``<p>`` body, script/style decoys
that the extractor must strip, entity-escaped text that
``convert_charrefs`` must unescape); the corpus generator emits
single-line whitespace-normalized ASCII text, verified by the
roundtrip property itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vbb_data_pipeline_spark.queries import load_table, register

N_ARCHIVES = 8

_BUILD_SCHEMA = "path string, content binary"


def _build_archive(key, pdf):
    """One doc_id bucket → one gzip-member WARC archive (bytes).

    Real framing: every record is its own gzip member (the Common
    Crawl layout — exercises the streaming member decompressor), a
    ``warcinfo`` lead record plus a non-HTML response and a 404
    response are planted as decoys for the downstream filters.
    """
    import gzip
    import html as _html

    import pandas as pd

    def record(payload: bytes, rtype: str, uri: str) -> bytes:
        head = (
            f"WARC/1.0\r\nWARC-Type: {rtype}\r\n"
            f"WARC-Target-URI: {uri}\r\n"
            f"WARC-Date: 2026-01-01T00:00:00Z\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n"
        ).encode()
        return head + payload + b"\r\n\r\n"

    def http(body: bytes, status: str, ctype: str) -> bytes:
        return (
            f"HTTP/1.1 {status}\r\nContent-Type: {ctype}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode() + body

    page = (
        "<html><head><style>p{{color:red}}</style>"
        "<script>var x=1;</script></head>"
        "<body><p>{0}</p></body></html>"
    )
    bucket = int(key[0])
    members = [
        gzip.compress(
            record(b"builder: crawl_q", "warcinfo", "meta"), mtime=0
        )
    ]
    for did, text in sorted(
        zip(pdf["doc_id"], pdf["text"]), key=lambda r: int(r[0])
    ):
        body = page.format(_html.escape(str(text))).encode()
        members.append(
            gzip.compress(
                record(
                    http(body, "200 OK", "text/html; charset=utf-8"),
                    "response",
                    f"http://corpus.example/doc/{int(did)}",
                ),
                mtime=0,
            )
        )
    # decoys: wrong content type, wrong status — must NOT survive
    members.append(
        gzip.compress(
            record(
                http(b'{"a":1}', "200 OK", "application/json"),
                "response",
                f"http://corpus.example/json/{bucket}",
            ),
            mtime=0,
        )
    )
    members.append(
        gzip.compress(
            record(
                http(b"<p>gone</p>", "404 Not Found", "text/html"),
                "response",
                f"http://corpus.example/gone/{bucket}",
            ),
            mtime=0,
        )
    )
    return pd.DataFrame(
        {
            "path": [f"mem://crawl/{bucket:02d}.warc.gz"],
            "content": [b"".join(members)],
        }
    )


@register(
    "crawl_warc_roundtrip",
    oracle="SELECT doc_id, text FROM documents",
    survey="E6/WARC (beyond-reference crawl plane)",
    note="documents → in-plan gzip-member WARC archives → production "
    "parse_warc_records + warc_to_documents → text must hash-match "
    "the source table; decoy warcinfo/json/404 records must be "
    "filtered out",
)
def crawl_warc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vbb_data_pipeline_spark.sources.warc import (
        parse_warc_records,
        warc_to_documents,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    archives = docs.groupBy(
        (F.col("doc_id") % N_ARCHIVES).alias("bucket")
    ).applyInPandas(_build_archive, schema=_BUILD_SCHEMA)
    # types=() keeps every record so warc_to_documents' own
    # response/200/text-html filters are what drop the decoys
    parsed = warc_to_documents(parse_warc_records(archives, types=()))
    return parsed.select(
        F.regexp_extract(F.col("url"), r"doc/(\d+)$", 1)
        .cast("long")
        .alias("doc_id"),
        F.col("text"),
    )
