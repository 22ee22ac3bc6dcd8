"""Text normalization: clean_text (native, DuckDB-differential) and
normalize_unicode (Arrow NFKC/NFC vs Python unicodedata)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from vbb_data_pipeline_spark.functions.text import CONTROL_FORMAT_RE, clean_text
from vbb_data_pipeline_spark.functions.udfs import normalize_unicode

SAMPLES = [
    "plain text stays",
    "zero​width﻿ joined",          # ZWSP + BOM stripped
    "tabs\tand   runs  of spaces",
    "spaces \n around \n newlines",
    "para\n\n\n\n\nbreaks",
    "crlf\r\nline\rending",
    "  trimmed  ",
    "bidi ‪embed‬ mark",           # 202C is Cf too? (PDF) — in 202a-202e
    "soft­hyphen",
]


def test_clean_text_matches_duckdb_chain(spark):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(SAMPLES)], "i long, t string")
    got = {r.i: r.c for r in df.select("i", clean_text("t").alias("c")).collect()}
    con = duckdb.connect()
    for i, s in enumerate(SAMPLES):
        exp = con.execute(
            """
            SELECT trim(regexp_replace(regexp_replace(regexp_replace(
                     regexp_replace(regexp_replace($1, '\r\n?', chr(10), 'g'),
                     $2, '', 'g'),
                     '[ \t]+', ' ', 'g'),
                     ' ?\n ?', chr(10), 'g'),
                     '\n{3,}', chr(10) || chr(10), 'g'))
            """,
            [s, CONTROL_FORMAT_RE],
        ).fetchone()[0]
        assert got[i] == exp, (i, s, got[i], exp)


def test_clean_text_semantics(spark):
    df = spark.createDataFrame([(1, "a​b\tc   d \n\n\n\n e\r\nf  ")], "i long, t string")
    out = df.select(clean_text("t").alias("c")).collect()[0].c
    assert out == "ab c d\n\ne\nf"


def test_normalize_unicode_nfkc(spark):
    import unicodedata

    samples = ["ﬁle", "Ａｂｃ１２３", "éclair", "½ + ¼", None]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(samples)], "i long, t string")
    got = {
        r.i: r.n
        for r in df.select("i", normalize_unicode("t").alias("n")).collect()
    }
    for i, s in enumerate(samples):
        exp = unicodedata.normalize("NFKC", s) if s is not None else None
        assert got[i] == exp
    assert got[0] == "file" and got[1] == "Abc123"

    nfc = df.select("i", normalize_unicode("t", "NFC").alias("n")).collect()
    by = {r.i: r.n for r in nfc}
    assert by[2] == "éclair"
    assert by[0] == "ﬁle"  # NFC keeps the ligature

    with pytest.raises(ValueError):
        normalize_unicode("t", "NFKD-ish")


def test_normalized_fingerprints_collide(spark):
    """The point of the pass: visually identical texts get identical
    dedup keys only after normalization."""
    from vbb_data_pipeline_spark.functions.text import fingerprint

    df = spark.createDataFrame(
        [(1, "the file café menu"), (2, "the ﬁle café menu")],
        "i long, t string",
    )
    raw = df.select(fingerprint("t").alias("f")).collect()
    assert raw[0].f != raw[1].f
    norm = df.select(
        fingerprint(normalize_unicode("t")).alias("f")
    ).collect()
    assert norm[0].f == norm[1].f
