"""Corpus-hygiene functions (PII redaction, repetition scores) vs
DuckDB twins and hand-built fixtures."""

from __future__ import annotations

import duckdb
import pytest

from vbb_data_pipeline_spark.functions.text import (
    PII_PATTERNS,
    dup_line_fraction,
    pii_counts,
    redact_pii,
    top_bigram_fraction,
)
from vbb_data_pipeline_spark.queries import load_table

SF = "/root/testdata/sf0.001"
DOCS = f"read_parquet('{SF}/documents.parquet')"

SAMPLES = [
    (0, "mail me at jane.doe+x@example.co.uk or call +49 (30) 1234-5678."),
    (1, "server 10.0.255.7 pinged 192.168.1.1; no pii here otherwise"),
    (2, "line one\nline one\nline two\n\n  \nline one"),
    (3, "just plain text with a year 2024 and nothing else"),
    (4, "spam spam spam spam spam ham"),
    (5, ""),
    (6, "revenue was 2020 2021 2022, range 2020-2021, call 030-1234-5678"),
]


@pytest.fixture(scope="module")
def sample_df(spark):
    return spark.createDataFrame(SAMPLES, "doc_id long, text string")


def test_redact_pii_matches_duckdb(sample_df):
    got = {
        r.doc_id: r.red
        for r in sample_df.select(
            "doc_id", redact_pii("text").alias("red")
        ).collect()
    }
    expr = "text"
    for kind, pat in PII_PATTERNS.items():
        expr = f"regexp_replace({expr}, '{pat}', '<{kind}>', 'g')"
    duckdb.register("samples", __import__("pandas").DataFrame(
        SAMPLES, columns=["doc_id", "text"]
    ))
    exp = {r[0]: r[1] for r in duckdb.sql(
        f"SELECT doc_id, {expr} FROM samples"
    ).fetchall()}
    assert got == exp
    assert "<EMAIL>" in got[0] and "<PHONE>" in got[0]
    assert got[1].count("<IP>") == 2
    assert got[3] == SAMPLES[3][1]  # bare years are not phones
    # space-separated numeric text and year ranges survive; the
    # three-group dashed number is redacted
    assert got[6] == "revenue was 2020 2021 2022, range 2020-2021, call <PHONE>"


def test_pii_counts(sample_df):
    rows = {
        r.doc_id: r.c
        for r in sample_df.select(
            "doc_id", pii_counts("text").alias("c")
        ).collect()
    }
    assert rows[0].emails == 1 and rows[0].phones >= 1
    assert rows[1].ips == 2 and rows[1].emails == 0
    assert rows[3] == (0, 0, 0)


def test_dup_line_fraction(sample_df):
    got = {
        r.doc_id: r.f
        for r in sample_df.select(
            "doc_id", dup_line_fraction("text").alias("f")
        ).collect()
    }
    # doc 2: 4 non-empty lines, 2 distinct → 2 duplicates → 0.5
    assert got[2] == 0.5
    assert got[3] == 0.0
    assert got[5] == 0.0  # empty text is total, not NULL


def test_top_bigram_fraction(spark, sample_df):
    got = {
        r.doc_id: r.top_bigram_frac
        for r in top_bigram_fraction(sample_df, "text", "doc_id").collect()
    }
    # doc 4: bigrams = 4×(spam,spam) + 1×(spam,ham) → 4/5
    assert got[4] == 0.8
    assert 5 not in got  # zero-bigram docs produce no row
    assert 0 < got[3] <= 1.0


def test_corpus_scale_matches_duckdb(spark):
    """dup_line_fraction + top_bigram_fraction over the real documents
    table vs full DuckDB re-computation."""
    docs = load_table(spark, SF, "documents")
    got_dup = {
        r.doc_id: r.f
        for r in docs.select(
            "doc_id", dup_line_fraction("text").alias("f")
        ).collect()
    }
    exp_dup = {
        r[0]: r[1]
        for r in duckdb.sql(
            f"""
            SELECT doc_id,
                   CASE WHEN len(lines) = 0 THEN 0.0
                        ELSE round((len(lines) - len(list_distinct(lines)))
                                   / CAST(len(lines) AS DOUBLE), 6) END
            FROM (
                SELECT doc_id,
                       list_filter(string_split(text, chr(10)),
                                   x -> trim(x) <> '') AS lines
                FROM {DOCS}
            )
            """
        ).fetchall()
    }
    assert got_dup == exp_dup

    got_big = {
        r.doc_id: r.top_bigram_frac
        for r in top_bigram_fraction(docs, "text", "doc_id").collect()
    }
    exp_big = {
        r[0]: r[1]
        for r in duckdb.sql(
            f"""
            WITH tk AS (
                SELECT doc_id,
                       list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                   x -> x <> '') AS tk
                FROM {DOCS}
            ),
            grams AS (
                SELECT doc_id, unnest(
                    list_transform(range(1, len(tk)), i -> tk[i] || '_' || tk[i+1])
                ) AS g
                FROM tk
            ),
            counts AS (
                SELECT doc_id, g, count(*) AS c FROM grams GROUP BY 1, 2
            )
            SELECT doc_id, round(max(c) / CAST(sum(c) AS DOUBLE), 6)
            FROM counts GROUP BY doc_id
            """
        ).fetchall()
    }
    assert got_big == exp_big


def test_compression_signals(spark):
    """zlib ratio and char entropy over hand-built texts vs direct
    python computation."""
    import math
    import zlib

    from vbb_data_pipeline_spark.functions.udfs import compression_signals

    texts = [
        (0, "spam " * 200),                      # highly compressible
        (1, "The quick brown fox jumps over the lazy dog near the bank."),
        (2, "aaaaaaaaaaaaaaaa"),                 # zero entropy
        (3, None),
        (4, ""),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        r.doc_id: (r.sig.ratio, r.sig.entropy)
        for r in df.select(
            "doc_id", compression_signals("text").alias("sig")
        ).collect()
    }

    def expected(t):
        raw = t.encode("utf-8")
        ratio = len(zlib.compress(raw, 6)) / len(raw)
        counts = {}
        for ch in t:
            counts[ch] = counts.get(ch, 0) + 1
        n = len(t)
        ent = -sum(c / n * math.log2(c / n) for c in counts.values())
        return ratio, ent

    for doc_id, t in texts:
        if t is None:
            assert got[doc_id] == (None, None)
        elif t == "":
            assert got[doc_id][0] is None and got[doc_id][1] == 0.0
        else:
            er, ee = expected(t)
            assert got[doc_id][0] == pytest.approx(er, rel=1e-12)
            assert got[doc_id][1] == pytest.approx(ee, rel=1e-12)

    # the signals order as the recipe expects
    assert got[0][0] < 0.2 < got[1][0]      # repetitive ≪ prose ratio
    assert got[2][1] == 0.0 < got[1][1]     # single-char entropy is 0
