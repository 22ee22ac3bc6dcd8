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
