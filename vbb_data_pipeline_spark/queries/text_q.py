"""Text-analysis queries over the documents corpus (north-star
extension; functions/text.py): token accounting, quality scoring,
language-ID, fingerprints, and multimodal (binary-column) metadata
plumbing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vbb_data_pipeline_spark.functions import text as tx
from vbb_data_pipeline_spark.queries import load_table, register

TOK_SQL = "list_filter(string_split_regex(lower({c}), '[^a-z0-9]+'), x -> x <> '')"

_LANGS = sorted(tx.STOPWORDS)  # alphabetical: tie-break = first in chain


def _sw_hits_sql(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in tx.STOPWORDS[lang])
    return (
        f"len(list_filter({TOK_SQL.format(c='text')}, "
        f"x -> list_contains([{words}], x)))"
    )


@register(
    "text_token_stats",
    oracle=f"""
    WITH toks AS (
        SELECT lang, len({TOK_SQL.format(c="text")}) AS n_tok, n_chars
        FROM documents
    )
    SELECT lang,
           count(*)                        AS n_docs,
           CAST(sum(n_tok) AS BIGINT)      AS total_tokens,
           round(avg(CAST(n_tok AS DOUBLE)), 4)  AS avg_tokens,
           round(avg(CAST(n_chars AS DOUBLE)), 4) AS avg_chars
    FROM toks
    GROUP BY lang
    """,
    survey="extension: token accounting per language (training-data "
    "token counting)",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    t = d.select("lang", tx.token_count("text").alias("n_tok"), "n_chars")
    return t.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("long").alias("total_tokens"),
        F.round(F.avg(F.col("n_tok").cast("double")), 4).alias("avg_tokens"),
        F.round(F.avg(F.col("n_chars").cast("double")), 4).alias("avg_chars"),
    )


@register(
    "text_quality_stats",
    oracle=f"""
    WITH m AS (
        SELECT doc_id,
               CAST(length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g')) AS DOUBLE)
                 / greatest(length(text), 1)                       AS noise,
               CAST(len({TOK_SQL.format(c="text")}) AS DOUBLE)     AS n_tok,
               CAST({_sw_hits_sql("en")} AS DOUBLE)                AS sw_hits
        FROM documents
    )
    SELECT doc_id,
           round(0.5 * least(n_tok / 64.0, 1.0)
                 + 0.3 * (1.0 - least(noise * 5, 1.0))
                 + 0.2 * least((sw_hits / greatest(n_tok, 1)) * 4, 1.0), 6)
             AS quality
    FROM m
    """,
    survey="extension: heuristic quality scoring (length / punctuation "
    "noise / stopword density, C4-Gopher-style)",
)
def text_quality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", tx.quality_score("text").alias("quality"))


@register(
    "text_langid",
    oracle=f"""
    WITH hits AS (
        SELECT doc_id, lang,
               {", ".join(f"{_sw_hits_sql(lg)} AS h_{lg}" for lg in _LANGS)}
        FROM documents
    )
    SELECT doc_id, lang,
           CASE
             {" ".join(
                 "WHEN " + " AND ".join(
                     f"h_{lg} >= h_{other}" for other in _LANGS if other != lg
                 ) + f" THEN '{lg}'"
                 for lg in _LANGS
             )}
           END AS pred_lang
    FROM hits
    """,
    survey="extension: n-gram/stopword-heuristic language ID "
    "(deterministic, tie-break = alphabetical chain order)",
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    hits = d.select(
        "doc_id",
        "lang",
        *[tx.stopword_hits("text", lg).alias(f"h_{lg}") for lg in _LANGS],
    )
    pred = None
    for lg in _LANGS:
        cond = None
        for other in _LANGS:
            if other == lg:
                continue
            c = F.col(f"h_{lg}") >= F.col(f"h_{other}")
            cond = c if cond is None else (cond & c)
        pred = (
            F.when(cond, F.lit(lg)) if pred is None else pred.when(cond, F.lit(lg))
        )
    return hits.select("doc_id", "lang", pred.alias("pred_lang"))


@register(
    "text_fingerprint",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {TOK_SQL.format(c="text")} AS tk FROM documents
    )
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(tk)), ' ')) AS fp
    FROM toks
    """,
    survey="extension: document fingerprinting (order-insensitive "
    "content hash)",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", tx.fingerprint("text").alias("fp"))


@register(
    "multimodal_binary_meta",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text)                               AS payload_sha
    FROM documents
    """,
    survey="extension: multimodal column plumbing — opaque binary "
    "payload + typed metadata (byte length, content digest); decode/"
    "feature-extract stages live in operators/multimodal.py "
    "(mapInPandas, stubbed decode)",
)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    payload = F.encode("text", "UTF-8")
    return d.select(
        "doc_id",
        F.length(payload).cast("long").alias("n_bytes"),
        F.sha2(payload, 256).alias("payload_sha"),
    )


@register(
    "multimodal_decode_dims",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT)                     AS n_bytes,
           CAST(16 + CAST(('0x' || substr(md5(text), 1, 2)) AS INT) % 240 AS INT) AS width,
           CAST(16 + CAST(('0x' || substr(md5(text), 3, 2)) AS INT) % 240 AS INT) AS height,
           CAST(1  + CAST(('0x' || substr(md5(text), 5, 2)) AS INT) % 4   AS INT) AS channels,
           sha256(text)                                                   AS content_digest
    FROM documents
    """,
    survey="extension: multimodal decode stage — Arrow-batched "
    "mapInPandas over opaque binary payloads producing typed image "
    "metadata (operators/multimodal.decode_images); the deterministic "
    "stand-in decoder makes the whole Python stage oracle-checkable, "
    "so the UDF plumbing (schema, batching, column mapping) is "
    "verified, not just smoke-tested",
)
def multimodal_decode_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vbb_data_pipeline_spark.operators.multimodal import (
        attach_payload,
        decode_images,
    )

    d = load_table(spark, sf_dir, "documents")
    return decode_images(attach_payload(d))
