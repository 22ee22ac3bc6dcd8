"""TF-IDF top-terms operator vs an independent DuckDB oracle."""

from __future__ import annotations

import duckdb

from vbb_data_pipeline_spark.functions.text import tf_idf_top_terms
from vbb_data_pipeline_spark.queries import load_table

SF = "/root/testdata/sf0.001"

TOK_SQL = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"

ORACLE = f"""
WITH toks AS (
    SELECT doc_id, unnest({TOK_SQL}) AS term
    FROM read_parquet('{SF}/documents.parquet')
),
tf AS (
    SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2
),
n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM toks),
docfreq AS (
    SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1
),
scored AS (
    SELECT tf.doc_id, tf.term, tf.tf,
           round(tf.tf * (ln(CAST(n.n_docs + 1 AS DOUBLE) / (docfreq.df + 1)) + 1), 6) AS tfidf
    FROM tf JOIN docfreq USING (term) CROSS JOIN n
),
ranked AS (
    SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY tfidf DESC, term ASC
    ) AS rank
    FROM scored
)
SELECT doc_id, term, tf, tfidf, rank FROM ranked WHERE rank <= 3
"""


def test_tfidf_matches_duckdb(spark):
    d = load_table(spark, SF, "documents")
    got = {
        (r.doc_id, r.rank): (r.term, r.tf, r.tfidf)
        for r in tf_idf_top_terms(d, "text", "doc_id", k=3).collect()
    }
    exp = {
        (r[0], r[4]): (r[1], r[2], r[3])
        for r in duckdb.sql(ORACLE).fetchall()
    }
    assert set(got) == set(exp)
    mismatches = [
        (k, got[k], exp[k])
        for k in got
        if got[k][0] != exp[k][0]
        or got[k][1] != exp[k][1]
        or abs(got[k][2] - exp[k][2]) > 1e-6
    ]
    assert not mismatches, mismatches[:5]


def test_tfidf_no_driver_action_at_construction(spark):
    """Building the plan must not launch a Spark job (N is computed
    distributed via a broadcast 1-row aggregate)."""
    d = load_table(spark, SF, "documents")
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    df = tf_idf_top_terms(d, "text", "doc_id", k=3)
    after = tracker.getJobIdsForGroup(None)
    assert len(after) == len(before), "plan construction launched a job"
    assert df.columns == ["doc_id", "term", "tf", "tfidf", "rank"]


def test_tfidf_precomputed_tf_parity(spark):
    """Passing the (id, term, tf) frame (tokens_retrieval_battery's
    shared frame, r11) returns EXACTLY the internal construction's
    answer."""
    from pyspark.sql import functions as F

    from vbb_data_pipeline_spark.functions.text import tokens

    d = load_table(spark, SF, "documents")
    toks = d.select(
        F.col("doc_id"), F.explode(tokens("text")).alias("term")
    ).filter(F.col("doc_id").isNotNull() & F.col("term").isNotNull())
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    want = sorted(
        map(tuple, tf_idf_top_terms(d, "text", "doc_id", k=3).collect())
    )
    got = sorted(
        map(
            tuple,
            tf_idf_top_terms(d, "text", "doc_id", k=3, tf=tf).collect(),
        )
    )
    assert got == want
