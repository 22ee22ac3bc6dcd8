"""Corpus-wide line-level dedup (C4 construction) vs a DuckDB
differential oracle plus behavioral edges."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from vbb_data_pipeline_spark.operators.dedup import line_dedup_corpus

SF = "/root/testdata/sf0.001"


def _oracle(parquet: str, min_chars: int = 0) -> set[tuple[int, str]]:
    con = duckdb.connect()
    rows = con.sql(
        f"""
        WITH lines AS (
            SELECT doc_id,
                   CAST(generate_subscripts(parts, 1) - 1 AS BIGINT) AS line_no,
                   unnest(parts) AS line
            FROM (SELECT doc_id, string_split(text, chr(10)) AS parts
                  FROM read_parquet('{parquet}'))
        ),
        winners AS (
            SELECT doc_id, line_no FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY line ORDER BY doc_id, line_no
                ) AS rn
                FROM lines WHERE length(line) >= {min_chars}
            ) WHERE rn = 1
        ),
        keep AS (
            SELECT l.* FROM lines l SEMI JOIN winners w
              ON l.doc_id = w.doc_id AND l.line_no = w.line_no
            UNION ALL
            SELECT * FROM lines WHERE length(line) < {min_chars}
        ),
        rebuilt AS (
            SELECT doc_id,
                   string_agg(line, chr(10) ORDER BY line_no) AS text
            FROM keep GROUP BY doc_id
        )
        SELECT d.doc_id, coalesce(r.text, '')
        FROM (SELECT DISTINCT doc_id FROM read_parquet('{parquet}')) d
        LEFT JOIN rebuilt r USING (doc_id)
        """
    ).fetchall()
    return {(r[0], r[1]) for r in rows}


def test_line_dedup_matches_oracle(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    got = {
        (r.doc_id, r.text)
        for r in line_dedup_corpus(docs, "text", "doc_id").collect()
    }
    assert got == _oracle(f"{SF}/documents.parquet")


def test_line_dedup_min_chars_matches_oracle(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    got = {
        (r.doc_id, r.text)
        for r in line_dedup_corpus(docs, "text", "doc_id", min_chars=6).collect()
    }
    assert got == _oracle(f"{SF}/documents.parquet", min_chars=6)


def test_line_dedup_boilerplate_removed(spark):
    docs = spark.createDataFrame(
        [
            (1, "COPYRIGHT HEADER\nunique alpha\nCOPYRIGHT FOOTER"),
            (2, "COPYRIGHT HEADER\nunique beta\nCOPYRIGHT FOOTER"),
            (3, "COPYRIGHT HEADER\nunique gamma"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r.text
        for r in line_dedup_corpus(docs, "text", "doc_id").collect()
    }
    # first occurrence (doc 1) keeps the boilerplate; later docs lose it
    assert out[1] == "COPYRIGHT HEADER\nunique alpha\nCOPYRIGHT FOOTER"
    assert out[2] == "unique beta"
    assert out[3] == "unique gamma"


def test_line_dedup_short_lines_pass_through(spark):
    docs = spark.createDataFrame(
        [(1, "alpha\n\n---"), (2, "beta\n\n---")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r.text
        for r in line_dedup_corpus(docs, "text", "doc_id", min_chars=4).collect()
    }
    # blank + separator lines are structure: both docs keep them
    assert out[1] == "alpha\n\n---"
    assert out[2] == "beta\n\n---"


def test_line_dedup_fully_deduped_doc_survives_empty(spark):
    docs = spark.createDataFrame(
        [(1, "same line"), (2, "same line")], "doc_id long, text string"
    )
    out = {
        r.doc_id: r.text
        for r in line_dedup_corpus(docs, "text", "doc_id").collect()
    }
    assert out == {1: "same line", 2: ""}


def test_line_dedup_no_wide_window_on_line_hash(spark):
    """The winner election must be an aggregate (map-side combinable),
    never a window sort over the line-hash partition — the skew
    guard."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    df = line_dedup_corpus(docs, "text", "doc_id")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
