"""Ranged WARC tier, round 8: scheme-dispatched range readers (the
object-store posture — local seek / HTTP Range GET / pyarrow.fs),
plain-warc record-aligned chunking, per-member record validation, and
the single-decompression-pass index guarantee.

Driven through a NON-local code path end-to-end: a range-capable HTTP
server serves the archives and ``read_warc_ranged`` consumes them via
``files=[url]`` + ``HttpRangeReader`` — byte-identical to the local
whole-file read. A counting reader (injected via ``reader=``, riding
the serialized closure to the workers) proves the index walk opens
each file exactly once (the r7 ADVICE defect was a double walk:
``idx.count()`` plus the uncached recompute under ``repartition``).
"""

from __future__ import annotations

import gzip
import http.server
import re
import sys
import threading
from pathlib import Path

import pytest

from vbb_data_pipeline_spark.sources.warc import (
    ArrowFsRangeReader,
    HttpRangeReader,
    LocalRangeReader,
    _plain_warc_record_offsets,
    _Prepend,
    read_warc,
    read_warc_ranged,
    resolve_range_reader,
    warc_member_chunks,
)

# worker-side closures capture test-local classes: serialize this
# module by value so executors never need tests/ on their import path
from pyspark import cloudpickle

cloudpickle.register_pickle_by_value(sys.modules[__name__])


def _http(body: bytes, status: int = 200, ctype: str = "text/html") -> bytes:
    return (
        f"HTTP/1.1 {status} OK\r\nContent-Type: {ctype}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode() + body


def _record(payload: bytes, uri: str = "http://e.com/") -> bytes:
    head = (
        f"WARC/1.0\r\nWARC-Type: response\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"WARC-Date: 2024-01-02T03:04:05Z\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode()
    return head + payload + b"\r\n\r\n"


def _gz_archive(n: int, host: str = "t.example") -> bytes:
    return b"".join(
        gzip.compress(
            _record(_http(f"<p>doc {i} body</p>".encode()),
                    uri=f"http://{host}/{i}"),
            compresslevel=1,
        )
        for i in range(n)
    )


# ---------------------------------------------------------------------------
# reader dispatch
# ---------------------------------------------------------------------------
def test_resolve_reader_dispatch():
    assert isinstance(resolve_range_reader("/x/a.warc"), LocalRangeReader)
    assert isinstance(resolve_range_reader("file:/x/a.warc"), LocalRangeReader)
    assert isinstance(
        resolve_range_reader("https://cc.example/a.warc.gz"), HttpRangeReader
    )
    assert isinstance(
        resolve_range_reader("s3a://bucket/a.warc.gz"), ArrowFsRangeReader
    )
    assert isinstance(
        resolve_range_reader("hdfs://nn/a.warc.gz"), ArrowFsRangeReader
    )
    injected = LocalRangeReader()
    assert resolve_range_reader("s3a://bucket/x", injected) is injected


def test_arrowfs_scheme_alias():
    assert ArrowFsRangeReader._uri("s3a://b/k") == "s3://b/k"
    assert ArrowFsRangeReader._uri("s3n://b/k") == "s3://b/k"
    assert ArrowFsRangeReader._uri("gs://b/k") == "gs://b/k"


def test_local_reader_range(tmp_path):
    f = tmp_path / "x.bin"
    f.write_bytes(bytes(range(200)))
    rd = LocalRangeReader()
    assert rd.read_range(str(f), 10, 5) == bytes(range(10, 15))
    fh = rd.open(f"file:{f}", offset=100)
    assert fh.read(3) == bytes([100, 101, 102])
    fh.close()


# ---------------------------------------------------------------------------
# HTTP end-to-end: the non-local code path, forced through a real
# range-capable origin
# ---------------------------------------------------------------------------
class _RangeHandler(http.server.BaseHTTPRequestHandler):
    root: Path = Path("/")

    def do_GET(self):  # noqa: N802
        data = (self.root / self.path.lstrip("/")).read_bytes()
        rng = self.headers.get("Range")
        if rng:
            m = re.match(r"bytes=(\d+)-(\d*)", rng)
            a = int(m.group(1))
            b = int(m.group(2)) if m.group(2) else len(data) - 1
            body = data[a : b + 1]
            self.send_response(206)
            self.send_header(
                "Content-Range", f"bytes {a}-{b}/{len(data)}"
            )
        else:
            body = data
            self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):  # silence
        pass


@pytest.fixture()
def http_root(tmp_path):
    handler = type("H", (_RangeHandler,), {"root": tmp_path})
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield tmp_path, f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_http_ranged_parity(spark, tmp_path, http_root):
    root, base = http_root
    (root / "a.warc.gz").write_bytes(_gz_archive(30))
    whole = (
        read_warc(spark, str(root)).orderBy("target_uri").collect()
    )
    ranged = (
        read_warc_ranged(
            spark, "", chunk_bytes=256, files=[f"{base}/a.warc.gz"]
        )
        .orderBy("target_uri")
        .collect()
    )
    assert len(ranged) == len(whole) == 30
    for a, b in zip(ranged, whole):
        assert a.target_uri == b.target_uri
        assert a.record_idx == b.record_idx
        assert bytes(a.payload) == bytes(b.payload)


def test_http_reader_rejects_rangeless_origin(http_root):
    root, base = http_root
    (root / "x.bin").write_bytes(b"0123456789")

    class NoRange(_RangeHandler):
        def do_GET(self):  # noqa: N802
            body = (self.root / self.path.lstrip("/")).read_bytes()
            self.send_response(200)  # ignores Range
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    handler = type("H", (NoRange,), {"root": root})
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_address[1]}/x.bin"
    rd = HttpRangeReader()
    with pytest.raises(OSError, match="ignored Range"):
        rd.read_range(url, 2, 3)
    srv.shutdown()


# ---------------------------------------------------------------------------
# plain-warc record-aligned chunking (r7 ADVICE: the whole-file
# fallback reintroduced the per-task memory bound the tier exists to
# avoid)
# ---------------------------------------------------------------------------
def test_plain_warc_multichunk_parity(spark, tmp_path):
    recs = b"".join(
        _record(_http(f"<p>plain {i} {'x' * 50}</p>".encode()),
                uri=f"http://p.example/{i:03d}")
        for i in range(20)
    )
    (tmp_path / "p.warc").write_bytes(recs)
    chunks = warc_member_chunks(spark, str(tmp_path), chunk_bytes=256)
    rows = chunks.collect()
    assert len(rows) > 3  # genuinely split, not one whole-file chunk
    assert sum(r.n_members for r in rows) == 20
    assert all(r.nbytes <= 1024 for r in rows)  # bounded task memory
    whole = read_warc(spark, str(tmp_path)).orderBy("target_uri").collect()
    ranged = (
        read_warc_ranged(spark, str(tmp_path), chunk_bytes=256)
        .orderBy("target_uri")
        .collect()
    )
    assert len(ranged) == len(whole) == 20
    for a, b in zip(ranged, whole):
        assert a.record_idx == b.record_idx
        assert bytes(a.payload) == bytes(b.payload)


def test_plain_offsets_truncated_payload_dropped():
    import io

    good = _record(_http(b"<p>ok</p>"))
    bad = _record(_http(b"<p>cut off</p>"))[:-10]
    offs, end = _plain_warc_record_offsets(io.BytesIO(good + bad))
    assert offs == [0]
    assert end == len(good)


def test_prepend_reader():
    import io

    fh = _Prepend(b"abc", io.BytesIO(b"defgh"))
    assert fh.read(2) == b"ab"
    assert fh.read(4) == b"cdef"
    assert fh.read(10) == b"gh"


# ---------------------------------------------------------------------------
# per-member validation (r7 ADVICE: a 2-record member next to a
# 0-record member cancelled out in the chunk-level count, silently
# misaligning record_idx vs the whole-file read)
# ---------------------------------------------------------------------------
def test_two_record_member_raises(spark, tmp_path):
    two = _record(_http(b"<p>a</p>"), uri="http://x/1") + _record(
        _http(b"<p>b</p>"), uri="http://x/2"
    )
    blob = (
        gzip.compress(two, compresslevel=1)
        + gzip.compress(b"", compresslevel=1)  # 0-record member
        + gzip.compress(_record(_http(b"<p>c</p>"), uri="http://x/3"),
                        compresslevel=1)
    )
    (tmp_path / "evil.warc.gz").write_bytes(blob)
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception) as ei:
        read_warc_ranged(spark, str(tmp_path)).collect()
    msg = str(ei.value)
    assert "one-record-per-member" in msg or isinstance(
        ei.value, Py4JJavaError
    ) and "one-record-per-member" in str(ei.value.java_exception)


# ---------------------------------------------------------------------------
# single-pass index (r7 ADVICE medium: idx.count() ran the full
# decompression walk, then the uncached idx recomputed it under the
# repartition job — doubling the indexing cost)
# ---------------------------------------------------------------------------
class CountingReader:
    """LocalRangeReader that journals every open/read_range to a file
    (workers share the local FS in local mode)."""

    def __init__(self, log: str) -> None:
        self.log = log
        self.inner = LocalRangeReader()

    def _note(self, kind: str, path: str) -> None:
        with open(self.log, "a") as fh:
            fh.write(f"{kind}\t{path}\n")

    def open(self, path: str, offset: int = 0):
        self._note("open", path)
        return self.inner.open(path, offset)

    def read_range(self, path: str, offset: int, nbytes: int) -> bytes:
        self._note("range", path)
        return self.inner.read_range(path, offset, nbytes)


def test_index_walk_runs_once(spark, tmp_path):
    d = tmp_path / "warcs"
    d.mkdir()
    for i in range(3):
        (d / f"f{i}.warc.gz").write_bytes(_gz_archive(15, host=f"h{i}"))
    log = tmp_path / "reads.log"
    out = read_warc_ranged(
        spark, str(d), chunk_bytes=256, reader=CountingReader(str(log))
    )
    n_parts = out.rdd.getNumPartitions()
    assert out.count() == 45
    lines = log.read_text().splitlines()
    opens = [ln for ln in lines if ln.startswith("open\t")]
    ranges = [ln for ln in lines if ln.startswith("range\t")]
    # the decompression walk touched each archive exactly ONCE
    assert len(opens) == 3, opens
    # the parse stage still issues exactly one ranged read per chunk,
    # but chunks may now SHARE a task: the partition count is capped
    # at 2x parallelism so tiny-chunk indexes don't degenerate into
    # per-chunk micro-tasks (r10; peak memory stays one chunk via the
    # per-chunk yield in parse_ranges)
    assert len(ranges) >= 6
    cap = 2 * spark.sparkContext.defaultParallelism
    assert n_parts == min(len(ranges), max(cap, 1))


class _FakeArrowFile:
    def __init__(self, data: bytes):
        self._d = data
        self._pos = 0

    def seek(self, n):
        self._pos = n

    def read(self, n=-1):
        out = self._d[self._pos:] if n < 0 else self._d[self._pos:self._pos + n]
        self._pos += len(out)
        return out

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def test_arrowfs_rel_path_caching(monkeypatch, tmp_path):
    """from_uri can hit the network (S3 region lookup): the reader
    must call it once per (scheme, authority) and derive later
    rel-paths textually."""
    import pyarrow

    calls = []
    blob = bytes(range(256))

    class FakeFS:
        def open_input_file(self, rel):
            assert rel.startswith("bucket/"), rel
            return _FakeArrowFile(blob)

    class FakeFileSystem:
        @staticmethod
        def from_uri(uri):
            calls.append(uri)
            # pyarrow's s3 rel-path convention: bucket/key
            return FakeFS(), uri[len("s3://"):]

    fake_mod = type("m", (), {"FileSystem": FakeFileSystem})
    monkeypatch.setattr(pyarrow, "fs", fake_mod, raising=False)

    rd = ArrowFsRangeReader()
    assert rd.read_range("s3a://bucket/a/x.warc.gz", 10, 4) == blob[10:14]
    assert rd.read_range("s3a://bucket/b/y.warc.gz", 0, 2) == blob[0:2]
    fh = rd.open("s3a://bucket/c.warc.gz", offset=100)
    assert fh.read(1) == blob[100:101]
    assert calls == ["s3://bucket/a/x.warc.gz"]  # resolved exactly once


# ---------------------------------------------------------------------------
# _gzip_member_stream edge cases (the shared linear walk both the
# index build and the per-member parse ride on)
# ---------------------------------------------------------------------------
def test_member_stream_offsets_and_truncation():
    import io

    from vbb_data_pipeline_spark.sources.warc import _gzip_member_stream

    m1 = gzip.compress(b"alpha", compresslevel=1)
    m2 = gzip.compress(b"beta" * 1000, compresslevel=1)
    m3 = gzip.compress(b"gamma", compresslevel=1)
    blob = m1 + m2 + m3
    got = list(_gzip_member_stream(io.BytesIO(blob)))
    assert [g[1] for g in got] == [b"alpha", b"beta" * 1000, b"gamma"]
    assert [g[0] for g in got] == [
        len(m1), len(m1) + len(m2), len(blob)
    ]  # exact byte offsets, the index contract
    # truncated final member: dropped, earlier members intact
    got = list(_gzip_member_stream(io.BytesIO(blob[:-5])))
    assert [g[1] for g in got] == [b"alpha", b"beta" * 1000]
    # trailing garbage: stop at the last whole member
    got = list(_gzip_member_stream(io.BytesIO(m1 + b"NOTGZIP")))
    assert [g[1] for g in got] == [b"alpha"]
    # tiny feed slices exercise the pending-rest handoff
    got = list(_gzip_member_stream(io.BytesIO(blob), feed_bytes=7))
    assert [g[0] for g in got] == [len(m1), len(m1) + len(m2), len(blob)]


def test_member_stream_member_larger_than_feed():
    import io

    from vbb_data_pipeline_spark.sources.warc import _gzip_member_stream

    big = bytes(range(256)) * 4096  # 1 MB, incompressible-ish
    m = gzip.compress(big, compresslevel=1)
    got = list(_gzip_member_stream(io.BytesIO(m + m), feed_bytes=64 << 10))
    assert len(got) == 2
    assert got[0][1] == big and got[1][1] == big
    assert got[1][0] == 2 * len(m)


def test_plain_warc_duplicate_content_length_parity(spark, tmp_path):
    """A duplicated Content-Length header must frame IDENTICALLY in
    the chunk indexer and in parse_warc_bytes (both: last occurrence
    wins) — a first-wins walk desyncs the index from the parse and
    read_warc_ranged trips its stale-index cross-check on a freshly
    built index."""
    body = _http(b"<p>dup header</p>")
    dup = (
        (
            "WARC/1.0\r\nWARC-Type: response\r\n"
            "WARC-Target-URI: http://d.example/0\r\n"
            "Content-Length: 3\r\n"          # decoy: first occurrence
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode()
        + body
        + b"\r\n\r\n"
    )
    normal = _record(_http(b"<p>after</p>"), uri="http://d.example/1")
    (tmp_path / "d.warc").write_bytes(dup + normal)
    ranged = (
        read_warc_ranged(spark, str(tmp_path), chunk_bytes=64)
        .orderBy("target_uri")
        .collect()
    )
    whole = read_warc(spark, str(tmp_path)).orderBy("target_uri").collect()
    assert len(ranged) == len(whole) == 2
    for a, b in zip(ranged, whole):
        assert a.record_idx == b.record_idx
        assert bytes(a.payload) == bytes(b.payload)


def test_arrowfs_normalized_paths_resolve_exactly(monkeypatch):
    """from_uri NORMALIZES (percent-decoding here): the textual
    root-stripping shortcut must not cache a garbage root, and every
    percent-escaped path must resolve to the store's real key — for
    both orders (dirty-first and clean-first)."""
    import urllib.parse

    import pyarrow

    calls = []
    blob = bytes(range(256))
    store = {
        "bucket/a dir/x.bin": blob,
        "bucket/clean/y.bin": blob[::-1],
    }

    class FakeFS:
        def open_input_file(self, rel):
            assert rel in store, rel  # garbage rel would KeyError
            return _FakeArrowFile(store[rel])

    class FakeFileSystem:
        @staticmethod
        def from_uri(uri):
            calls.append(uri)
            return FakeFS(), urllib.parse.unquote(uri[len("s3://"):])

    fake_mod = type("m", (), {"FileSystem": FakeFileSystem})
    monkeypatch.setattr(pyarrow, "fs", fake_mod, raising=False)

    # dirty first: exact resolution, no poisoned cache for later paths
    rd = ArrowFsRangeReader()
    assert rd.read_range("s3a://bucket/a%20dir/x.bin", 10, 4) == blob[10:14]
    assert rd.read_range("s3a://bucket/clean/y.bin", 0, 2) == blob[::-1][0:2]

    # clean first: cached textual root must NOT be applied to the
    # escaped path
    rd2 = ArrowFsRangeReader()
    assert rd2.read_range("s3a://bucket/clean/y.bin", 0, 2) == blob[::-1][0:2]
    assert rd2.read_range("s3a://bucket/a%20dir/x.bin", 10, 4) == blob[10:14]
    # and the clean path after it still rides the cached root (one
    # from_uri for the clean resolution, no re-resolve)
    n = len(calls)
    assert rd2.read_range("s3a://bucket/clean/y.bin", 1, 2) == blob[::-1][1:3]
    assert len(calls) == n
