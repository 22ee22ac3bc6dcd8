"""§2.10 completion: grouped-agg pandas_udf (UDAF) and Python UDTF,
each pinned to its native/codegen twin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vbb_data_pipeline_spark.functions.udfs import (
    ChunkDocument,
    chunk_document_udtf,
    chunk_native,
    weighted_mean_native,
    weighted_mean_pandas,
)
from vbb_data_pipeline_spark.queries import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF, "documents")


def test_grouped_agg_udaf_matches_native(docs):
    weighted = docs.withColumn("w", (F.col("doc_id") % 7 + 1).cast("double"))
    got = {
        r.lang: r.m
        for r in weighted.groupBy("lang")
        .agg(weighted_mean_pandas("n_chars", "w").alias("m"))
        .collect()
    }
    exp = {
        r.lang: r.m
        for r in weighted.groupBy("lang")
        .agg(weighted_mean_native("n_chars", "w").alias("m"))
        .collect()
    }
    assert set(got) == set(exp)
    for lang in exp:
        assert got[lang] == pytest.approx(exp[lang], rel=1e-12), lang


def test_grouped_agg_udaf_null_totality(spark):
    df = spark.createDataFrame(
        [("a", None, 1.0), ("a", 2.0, None), ("b", 3.0, 0.0), ("c", 4.0, 2.0)],
        "g string, x double, w double",
    )
    rows = {
        r.g: r.m
        for r in df.groupBy("g")
        .agg(weighted_mean_pandas("x", "w").alias("m"))
        .collect()
    }
    assert rows["a"] is None  # no non-NULL pair
    assert rows["b"] is None  # zero total weight
    assert rows["c"] == 4.0


def test_udtf_chunks_match_python_and_native(spark, docs):
    spark.udtf.register("chunk_document", chunk_document_udtf())
    docs.limit(50).createOrReplaceTempView("chunk_docs")
    got = {
        (r.doc_id, r.chunk_idx): r.chunk
        for r in spark.sql(
            """
            SELECT d.doc_id, c.chunk_idx, c.chunk
            FROM chunk_docs d, LATERAL chunk_document(d.text, 16) c
            """
        ).collect()
    }
    # pure-python expectation via the same eval
    exp = {}
    for r in spark.table("chunk_docs").select("doc_id", "text").collect():
        for idx, chunk in ChunkDocument().eval(r.text, 16):
            exp[(r.doc_id, idx)] = chunk
    assert got == exp

    # native twin: posexplode(sequence+slice) produces identical chunks
    native = {
        (r.doc_id, r.chunk_idx): r.chunk
        for r in spark.table("chunk_docs")
        .select(
            "doc_id",
            F.posexplode(chunk_native("text", 16)).alias("chunk_idx", "chunk"),
        )
        .collect()
    }
    assert native == exp


def test_chunk_unicode_whitespace_parity(spark):
    """NBSP is a word character on BOTH sides (ASCII whitespace only),
    and max_words <= 0 raises in both forms."""
    df = spark.createDataFrame(
        [(0, "a b c\td")], "doc_id long, text string"
    )
    native = df.select(
        F.posexplode(chunk_native("text", 1)).alias("chunk_idx", "chunk")
    ).collect()
    python = list(ChunkDocument().eval("a b c\td", 1))
    assert [(r.chunk_idx, r.chunk) for r in native] == python
    assert python == [(0, "a b"), (1, "c"), (2, "d")]

    with pytest.raises(ValueError, match="max_words"):
        chunk_native("text", 0)
    with pytest.raises(ValueError, match="max_words"):
        list(ChunkDocument().eval("x", 0))


def test_udtf_edge_rows(spark):
    spark.udtf.register("chunk_document_edge", chunk_document_udtf())
    spark.createDataFrame(
        [(0, None), (1, ""), (2, "   "), (3, "one two three")],
        "doc_id long, text string",
    ).createOrReplaceTempView("edge_docs")
    rows = spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.chunk
        FROM edge_docs d, LATERAL chunk_document_edge(d.text, 2) c
        """
    ).collect()
    got = {(r.doc_id, r.chunk_idx): r.chunk for r in rows}
    # NULL/empty/whitespace docs emit nothing; the real doc chunks
    assert got == {(3, 0): "one two", (3, 1): "three"}
