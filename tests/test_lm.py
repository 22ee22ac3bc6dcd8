"""Unigram LM quality scoring (CCNet-style) vs a DuckDB differential
oracle that replays the whole train+score construction."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from vbb_data_pipeline_spark.operators.lm import (
    lm_quality_scores,
    score_documents,
    unigram_model,
)

SF = "/root/testdata/sf0.001"
TOK = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"


def _oracle_scores(parquet: str, vocab: int) -> dict[int, float]:
    con = duckdb.connect()
    n_v = con.sql(
        f"""
        WITH tok AS (
            SELECT unnest({TOK}) AS token FROM read_parquet('{parquet}')
        ),
        counts AS (SELECT token, count(*) AS n FROM tok GROUP BY token)
        SELECT CAST(sum(n) AS BIGINT), CAST(count(*) AS BIGINT) FROM counts
        """
    ).fetchone()
    denom = float(n_v[0] + n_v[1] + 1)
    import math

    oov = -math.log(denom)
    rows = con.sql(
        f"""
        WITH tok AS (
            SELECT doc_id, unnest({TOK}) AS token
            FROM read_parquet('{parquet}')
        ),
        counts AS (SELECT token, count(*) AS n FROM tok GROUP BY token),
        model AS (
            SELECT token, ln((n + 1) / {denom!r}) AS logprob
            FROM counts ORDER BY n DESC, token ASC LIMIT {vocab}
        ),
        lp AS (
            SELECT t.doc_id,
                   CAST(round(coalesce(m.logprob, {oov!r}) * 1000000)
                        AS BIGINT) AS lp_u
            FROM tok t LEFT JOIN model m USING (token)
        ),
        per_doc AS (
            SELECT doc_id,
                   CAST(sum(lp_u) AS DOUBLE) / count(*) / 1000000.0 AS m
            FROM lp GROUP BY doc_id
        )
        SELECT d.doc_id, round(coalesce(p.m, {oov!r}), 4)
        FROM (SELECT DISTINCT doc_id FROM read_parquet('{parquet}')) d
        LEFT JOIN per_doc p USING (doc_id)
        """
    ).fetchall()
    return {r[0]: r[1] for r in rows}


@pytest.mark.parametrize("vocab", [100, 100_000])
def test_lm_scores_match_oracle(spark, vocab):
    """Small vocab exercises the OOV floor; large vocab covers the
    full observed vocabulary."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    got = {
        r.doc_id: r.lm_score
        for r in lm_quality_scores(
            docs, "text", "doc_id", vocab_size=vocab
        ).collect()
    }
    assert got == _oracle_scores(f"{SF}/documents.parquet", vocab)


def test_lm_garbage_scores_below_prose(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog near the river"),
            (2, "the slow red fox walks under the busy dog near the hill"),
            (3, "zqx vkj wpm qqq zzz xxx jjj kkk www mmm ppp nnn bbb vvv"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r.lm_score
        for r in lm_quality_scores(docs, "text", "doc_id").collect()
    }
    assert out[3] < out[1] and out[3] < out[2]


def test_lm_empty_doc_gets_oov_floor(spark):
    docs = spark.createDataFrame(
        [(1, "hello world hello"), (2, "")], "doc_id long, text string"
    )
    model, oov = unigram_model(docs, "text")
    out = {
        r.doc_id: r.lm_score
        for r in score_documents(docs, model, oov, "text", "doc_id").collect()
    }
    assert out[2] == round(oov, 4)
    assert out[1] > out[2]


def test_lm_model_is_broadcast_joined(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    df = lm_quality_scores(docs, "text", "doc_id", vocab_size=100)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
