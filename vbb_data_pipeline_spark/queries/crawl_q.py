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

from vbb_data_pipeline_spark.queries import (
    load_table,
    register,
    tag_union,
    tag_union_sql,
)

N_ARCHIVES = 8

_BUILD_SCHEMA = "path string, content binary"


def _archive_bytes(bucket: int, doc_text_pairs) -> bytes:
    """One doc_id bucket → one gzip-member WARC archive (bytes).

    Real framing: every record is its own gzip member (the Common
    Crawl layout — exercises the streaming member decompressor), a
    ``warcinfo`` lead record plus a non-HTML response and a 404
    response are planted as decoys for the downstream filters.
    Deterministic bytes (sorted docs, ``mtime=0``) so both battery
    legs and repeated runs frame identical archives.

    ``compresslevel=1``: the archive bytes are a transport detail —
    the query's output is the parsed-back text, identical at any
    level — and the whole-leg rebuilds every archive in-plan on every
    execution, so the default level-9 deflate was the dominant cost
    of the roundtrip (r10; guide §1.2 step 2: per-task work).
    """
    import functools
    import gzip
    import html as _html

    gz = functools.partial(gzip.compress, compresslevel=1, mtime=0)

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
    members = [
        gz(record(b"builder: crawl_q", "warcinfo", "meta"))
    ]
    for did, text in sorted(doc_text_pairs, key=lambda r: int(r[0])):
        body = page.format(_html.escape(str(text))).encode()
        members.append(
            gz(
                record(
                    http(body, "200 OK", "text/html; charset=utf-8"),
                    "response",
                    f"http://corpus.example/doc/{int(did)}",
                )
            )
        )
    # decoys: wrong content type, wrong status — must NOT survive
    members.append(
        gz(
            record(
                http(b'{"a":1}', "200 OK", "application/json"),
                "response",
                f"http://corpus.example/json/{bucket}",
            )
        )
    )
    members.append(
        gz(
            record(
                http(b"<p>gone</p>", "404 Not Found", "text/html"),
                "response",
                f"http://corpus.example/gone/{bucket}",
            )
        )
    )
    return b"".join(members)


def _build_archive(key, pdf):
    """applyInPandas wrapper over :func:`_archive_bytes` (whole leg)."""
    import pandas as pd

    bucket = int(key[0])
    return pd.DataFrame(
        {
            "path": [f"mem://crawl/{bucket:02d}.warc.gz"],
            "content": [_archive_bytes(bucket, zip(pdf["doc_id"], pdf["text"]))],
        }
    )


def _to_roundtrip(parsed_docs: DataFrame) -> DataFrame:
    return parsed_docs.select(
        F.regexp_extract(F.col("url"), r"doc/(\d+)$", 1)
        .cast("long")
        .alias("doc_id"),
        F.col("text"),
    )


def _whole_leg(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    return _to_roundtrip(warc_to_documents(parse_warc_records(archives, types=())))


def _ranged_fixture(spark: SparkSession, sf_dir: str) -> str:
    """Write the same archives as real files so the byte-range tier
    has something to seek: driver-side, content-keyed temp dir,
    write-once (rename-commit, so concurrent harness runs are safe).

    Driver-side build is fine here — the documents table is the
    correctness fixture (≤5k rows); production archives come off the
    crawl, never from a driver loop."""
    import hashlib
    import os
    import tempfile

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    rows = [(int(r["doc_id"]), str(r["text"])) for r in docs.collect()]
    blobs = [
        (
            f"{b:02d}.warc.gz",
            _archive_bytes(
                b, [(d, t) for d, t in rows if d % N_ARCHIVES == b]
            ),
        )
        for b in range(N_ARCHIVES)
    ]
    key = hashlib.sha256(b"".join(c for _, c in blobs)).hexdigest()[:16]
    final = os.path.join(tempfile.gettempdir(), f"sg_warc_fixture_{key}")
    # build-then-rename commit; no existence probe (the fs-portability
    # gate bans them package-wide, and on this driver-local temp path
    # the rename's OSError already tells us a prior run committed)
    tmp = f"{final}.tmp.{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    for name, blob in blobs:
        with open(os.path.join(tmp, name), "wb") as fh:
            fh.write(blob)
    try:
        os.rename(tmp, final)
    except OSError:  # an identical fixture already committed
        for name, _ in blobs:
            try:
                os.remove(os.path.join(tmp, name))
            except OSError:
                pass
        try:
            os.rmdir(tmp)
        except OSError:
            pass
    return final


def _ranged_leg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vbb_data_pipeline_spark.sources.warc import (
        read_warc_ranged,
        warc_to_documents,
    )

    # 4 KB chunks split each fixture archive into many byte-range
    # tasks, so member-offset indexing, per-member parsing and
    # record_idx rebasing all sit inside the hash gate
    parsed = read_warc_ranged(
        spark, _ranged_fixture(spark, sf_dir), types=(), chunk_bytes=4096
    )
    return _to_roundtrip(warc_to_documents(parsed))


_ROUNDTRIP_SQL = "SELECT doc_id, text FROM documents"


@register(
    "crawl_warc_roundtrip",
    oracle=tag_union_sql(
        [("whole", _ROUNDTRIP_SQL), ("ranged", _ROUNDTRIP_SQL)]
    ),
    survey="E6/WARC (beyond-reference crawl plane) — [whole] in-plan "
    "gzip-member archives through parse_warc_records; [ranged] the "
    "same archives as files through read_warc_ranged (member-offset "
    "index, 4 KB byte-range chunks, record_idx rebasing) — the "
    "oversized-archive tier, folded r8 so it has a driver row",
    note="documents → real gzip-member WARC framing → production "
    "parse → text must hash-match the source table on BOTH read "
    "tiers; decoy warcinfo/json/404 records must be filtered out",
)
def crawl_warc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tag_union(
        [
            ("whole", _whole_leg(spark, sf_dir)),
            ("ranged", _ranged_leg(spark, sf_dir)),
        ]
    )
