"""Streaming SCD2 sink: snapshot micro-batches folded into a
dimension via foreachBatch (streaming CDC)."""

from __future__ import annotations

import datetime

from vbb_data_pipeline_spark.operators.cdc import HIGH_TS
from vbb_data_pipeline_spark.streaming.sinks import write_stream_scd2

HIGH = datetime.datetime(2200, 1, 1)


def _run_once(spark, src: str, dim: str, ckpt: str) -> None:
    stream = spark.readStream.schema("k long, v string").parquet(src)
    q = write_stream_scd2(
        stream, dim, ["k"], ["v"], checkpoint=ckpt
    )
    q.awaitTermination()


def test_stream_scd2_fold_two_batches(spark, tmp_path):
    src = tmp_path / "src"
    dim = str(tmp_path / "dim")
    ckpt = str(tmp_path / "ckpt")

    spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string").coalesce(
        1
    ).write.parquet(str(src))
    _run_once(spark, str(src), dim, ckpt)

    d1 = {(r.k, r.v, r.valid_to) for r in spark.read.parquet(dim).collect()}
    assert d1 == {(1, "a", HIGH), (2, "b", HIGH)}

    # second snapshot: k=1 updated, k=2 deleted, k=3 inserted
    spark.createDataFrame([(1, "a2"), (3, "c")], "k long, v string").coalesce(
        1
    ).write.mode("append").parquet(str(src))
    _run_once(spark, str(src), dim, ckpt)

    rows = spark.read.parquet(dim).collect()
    open_rows = {(r.k, r.v) for r in rows if r.valid_to == HIGH}
    closed = {(r.k, r.v) for r in rows if r.valid_to != HIGH}
    assert open_rows == {(1, "a2"), (3, "c")}  # dimension mirrors snapshot 2
    assert closed == {(1, "a"), (2, "b")}  # history preserved
    # closed rows carry the batch-1 as_of timestamp
    ts1 = datetime.datetime(2024, 1, 1, 0, 0, 1)
    assert all(r.valid_to == ts1 for r in rows if r.valid_to != HIGH)

    # replaying with the same checkpoint is a no-op (no new files)
    _run_once(spark, str(src), dim, ckpt)
    again = spark.read.parquet(dim).collect()
    assert {
        (r.k, r.v, r.valid_from, r.valid_to) for r in again
    } == {(r.k, r.v, r.valid_from, r.valid_to) for r in rows}
