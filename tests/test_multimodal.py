"""Multimodal plumbing: Arrow-batched decode stage over binary
payloads (stubbed decoder), stub gating."""

from __future__ import annotations

import hashlib

import pytest

from vbb_data_pipeline_spark.operators.multimodal import (
    attach_payload,
    decode_images,
    frame_sample_stub,
    resize_stub,
)
from vbb_data_pipeline_spark.queries import load_table

SF = "/root/testdata/sf0.001"


def test_decode_images_plumbing(spark):
    docs = load_table(spark, SF, "documents").limit(50)
    decoded = decode_images(attach_payload(docs))
    rows = decoded.collect()
    assert len(rows) == 50
    by_id = {r.doc_id: r for r in rows}
    src = {r.doc_id: r.text for r in docs.collect()}
    for doc_id, r in by_id.items():
        raw = src[doc_id].encode()
        assert r.n_bytes == len(raw)
        assert r.content_digest == hashlib.sha256(raw).hexdigest()
        assert 16 <= r.width < 256 and 16 <= r.height < 256
        assert 1 <= r.channels <= 4


def test_decode_is_deterministic(spark):
    docs = load_table(spark, SF, "documents").limit(20)
    a = sorted(decode_images(attach_payload(docs)).collect())
    b = sorted(decode_images(attach_payload(docs)).collect())
    assert a == b


def test_stubs_raise(spark):
    docs = attach_payload(load_table(spark, SF, "documents").limit(1))
    with pytest.raises(NotImplementedError):
        resize_stub(docs, 64, 64)
    with pytest.raises(NotImplementedError):
        frame_sample_stub(docs, 10)


# ---------------------------------------------------------------------------
# Real header parsing (PNG / GIF / JPEG) — pure-stdlib fixtures
# ---------------------------------------------------------------------------
import struct

from vbb_data_pipeline_spark.operators.multimodal import parse_image_header


def _png(w, h, color_type=6):
    ihdr_data = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13) + b"IHDR" + ihdr_data + b"\x00\x00\x00\x00"
    )


def _gif(w, h):
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\xf7\x00\x00"


def _jpeg(w, h, ncomp=3, leading_segments=True):
    out = b"\xff\xd8"
    if leading_segments:  # APP0 (JFIF) segment before the SOF, as real
        app0 = b"JFIF\x00\x01\x01\x00\x00H\x00H\x00\x00"
        out += b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    return out


def test_parse_png_header():
    assert parse_image_header(_png(640, 480)) == (640, 480, 4)
    assert parse_image_header(_png(1, 1, color_type=0)) == (1, 1, 1)
    assert parse_image_header(_png(70000, 2, color_type=2)) == (70000, 2, 3)


def test_parse_gif_header():
    assert parse_image_header(_gif(320, 200)) == (320, 200, 3)
    assert parse_image_header(b"GIF87a" + struct.pack("<HH", 12, 34)) == (12, 34, 3)


def test_parse_jpeg_walks_segments():
    assert parse_image_header(_jpeg(1024, 768)) == (1024, 768, 3)
    assert parse_image_header(_jpeg(99, 7, ncomp=1, leading_segments=False)) == (99, 7, 1)


def test_parse_progressive_jpeg_sof2():
    payload = _jpeg(50, 60)
    # rewrite the SOF0 marker to SOF2 (progressive) — still a dims SOF
    assert parse_image_header(payload.replace(b"\xff\xc0", b"\xff\xc2")) == (50, 60, 3)


def test_parse_unknown_returns_none():
    assert parse_image_header(b"plain text payload") is None
    assert parse_image_header(b"") is None
    assert parse_image_header(b"\xff\xd8\x00garbage") is None


# ---------------------------------------------------------------------------
# §2.10 scalar pandas_udf surface — parity with the native dot product
# ---------------------------------------------------------------------------
def test_cosine_pandas_udf_matches_native(spark):
    from pyspark.sql import functions as F

    from vbb_data_pipeline_spark.functions.udfs import cosine_udf
    from vbb_data_pipeline_spark.operators.similarity import cosine

    e = load_table(spark, SF, "embeddings").limit(40)
    pairs = (
        e.select(F.col("vec_id").alias("ia"), F.col("embedding").alias("va"))
        .join(
            e.select(F.col("vec_id").alias("ib"), F.col("embedding").alias("vb")),
            F.col("ia") == (F.col("ib") + 1) % 40,
        )
    )
    got = pairs.select(
        "ia",
        F.round(cosine_udf("va", "vb"), 6).alias("u"),
        F.round(cosine(F.col("va"), F.col("vb"), dim=64), 6).alias("n"),
    ).collect()
    assert len(got) > 0
    for r in got:
        assert abs(r.u - r.n) < 1e-9, (r.ia, r.u, r.n)
