"""substring_span_stats (Lee et al. 2021 approximation; winnowing per
Schleimer et al. 2003).

The cross-engine value check lives in the registry
(`dedup_substring_spans` vs its DuckDB oracle); here: semantics on a
hand-built corpus, the alignment guarantees of both modes, hash-mode
independence, and plan guards.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vbb_data_pipeline_spark.operators.dedup import substring_span_stats

W = 6
K = 3


@pytest.fixture(scope="module")
def docs(spark):
    shared = "alpha bravo charlie delta echo foxtrot golf hotel"
    rows = [
        # doc 1 and 2 share an 8-token run (>= W) -> stride-1 hit
        (1, f"{shared} unique tail one two three"),
        (2, f"prefix words here {shared} and more"),
        # doc 3: long but unshared
        (3, "nine ten eleven twelve thirteen fourteen fifteen sixteen"),
        # doc 4: shorter than the window -> no spans at all
        (4, "too short for any span"),
        # doc 5: null text
        (5, None),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_shared_run_detected_and_owned(docs):
    out = substring_span_stats(docs, "text", "doc_id", window=W)
    rows = {r.doc_id: r for r in out.collect()}
    # doc 4 (too short) and doc 5 (null) produce no spans -> absent
    assert set(rows) == {1, 2, 3}
    assert rows[1].dup_spans > 0 and rows[2].dup_spans > 0
    assert rows[3].dup_spans == 0 and rows[3].dup_frac == 0.0
    # min-id owner: every duplicated span's owner is doc 1, never doc 2
    assert rows[1].owned_dup_spans == rows[1].dup_spans
    assert rows[2].owned_dup_spans == 0
    for r in rows.values():
        assert r.total_spans >= r.dup_spans >= r.owned_dup_spans >= 0


def test_stride1_alignment_guarantee(spark):
    # any shared run of >= W tokens is caught at EVERY shift
    run = " ".join(f"t{i}" for i in range(W))
    for shift in range(4):
        pad = " ".join(f"p{i}" for i in range(shift))
        d = spark.createDataFrame(
            [(1, run + " x y z"), (2, (pad + " " + run).strip())],
            "doc_id long, text string",
        )
        out = substring_span_stats(d, "text", "doc_id", window=W)
        dups = {r.doc_id: r.dup_spans for r in out.collect()}
        assert dups[1] > 0 and dups[2] > 0, f"missed at shift {shift}"


def test_winnowing_alignment_guarantee(spark):
    # winnowing guarantee: any shared run of >= W + K - 1 tokens
    # shares a SELECTED fingerprint in both docs, at any alignment
    run = " ".join(f"t{i}" for i in range(W + K - 1))
    for shift in range(2 * K + 1):
        pad = " ".join(f"p{i}" for i in range(shift))
        d = spark.createDataFrame(
            [
                (1, run + " xa xb xc xd xe"),
                (2, (pad + " " + run + " ya yb").strip()),
            ],
            "doc_id long, text string",
        )
        out = substring_span_stats(
            d, "text", "doc_id", window=W, winnow=K
        )
        dups = {r.doc_id: r.dup_spans for r in out.collect()}
        assert dups[1] > 0 and dups[2] > 0, f"missed at shift {shift}"


def test_winnowing_reduces_emitted_spans(docs):
    full = substring_span_stats(docs, "text", "doc_id", window=W)
    winnowed = substring_span_stats(docs, "text", "doc_id", window=W, winnow=K)
    tf = {r.doc_id: r.total_spans for r in full.collect()}
    tw = {r.doc_id: r.total_spans for r in winnowed.collect()}
    assert set(tf) == set(tw)
    assert all(tw[d] <= tf[d] for d in tf)
    assert sum(tw.values()) < sum(tf.values())


def test_hash_mode_independence(docs):
    for kw in ({}, {"winnow": K}):
        fast = substring_span_stats(
            docs, "text", "doc_id", window=W, hash_mode="fast", **kw
        )
        oracle = substring_span_stats(
            docs, "text", "doc_id", window=W, hash_mode="oracle", **kw
        )
        assert sorted(map(tuple, fast.collect())) == sorted(
            map(tuple, oracle.collect())
        )


def test_plan_guards(docs):
    for kw in ({}, {"winnow": K}):
        out = substring_span_stats(docs, "text", "doc_id", window=W, **kw)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "Window" not in plan  # elections are aggs, not windows
        for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
            assert marker not in plan


def test_degenerate_inputs(spark):
    # identical-token doc (every span identical -> one hash, huge
    # count, still combines map-side), empty text, whitespace-only
    rows = [
        (1, " ".join(["spam"] * 50)),
        (2, " ".join(["spam"] * 30)),
        (3, ""),
        (4, "   "),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    for kw in ({}, {"winnow": K}):
        out = substring_span_stats(d, "text", "doc_id", window=W, **kw)
        rows_out = {r.doc_id: r for r in out.collect()}
        assert set(rows_out) == {1, 2}
        # docs 1 and 2 share the all-spam span: both fully duplicated
        assert rows_out[1].dup_frac == 1.0
        assert rows_out[2].dup_frac == 1.0
        # doc 1 (min id) owns everything, doc 2 owns nothing
        assert rows_out[1].owned_dup_spans == rows_out[1].total_spans
        assert rows_out[2].owned_dup_spans == 0


@pytest.mark.parametrize("seed", [3, 17, 99])
def test_random_corpus_matches_duckdb_replay(spark, seed):
    """Seeded random corpora (tiny alphabet -> forced span collisions,
    lengths straddling the window) through the OPERATOR vs a pure
    DuckDB replay of the registry oracle's winnowing construction."""
    import duckdb
    import numpy as np
    import pandas as pd

    from vbb_data_pipeline_spark.functions.hashing import md5_long_sql

    rng = np.random.default_rng(seed)
    alphabet = ["aa", "bb", "cc", "dd"]
    rows = []
    for i in range(30):
        n = int(rng.integers(0, 40))
        rows.append((i, " ".join(rng.choice(alphabet, size=n))))
    w, k = 5, 2

    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        map(
            tuple,
            substring_span_stats(
                d, "text", "doc_id", window=w, winnow=k, hash_mode="oracle"
            ).collect(),
        )
    )

    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    tok = ("list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), "
           "x -> x <> '')")
    span_h = md5_long_sql(f"array_to_string(list_slice(tk, i, i+{w}-1), '_')")
    exp = con.execute(f"""
    WITH toks AS (SELECT doc_id, {tok} AS tk FROM documents),
    hs AS (
        SELECT doc_id,
               list_transform(range(1, greatest(len(tk) - {w}, -1) + 2),
                              i -> {span_h}) AS h
        FROM toks
    ),
    u AS (
        SELECT doc_id, unnest(list_transform(
            range(1, greatest(len(h) - {k} + 1, 1) + 1),
            i -> {{'p': i + len(list_slice(h, i, i+{k}-1))
                        - list_position(list_reverse(list_slice(h, i, i+{k}-1)),
                                        list_min(list_slice(h, i, i+{k}-1))),
                   'h': list_min(list_slice(h, i, i+{k}-1))}})) AS s
        FROM hs WHERE len(h) >= 1
    ),
    sel AS (SELECT DISTINCT doc_id, s.p AS p, s.h AS fh FROM u),
    occ AS (SELECT fh, doc_id, count(*) AS c FROM sel GROUP BY fh, doc_id),
    stats AS (
        SELECT fh, count(*) AS ndocs, min(doc_id) AS owner
        FROM occ GROUP BY fh
    )
    SELECT o.doc_id,
           CAST(sum(o.c) AS BIGINT),
           CAST(sum(CASE WHEN s.ndocs >= 2 THEN o.c ELSE 0 END) AS BIGINT),
           CAST(sum(CASE WHEN s.ndocs >= 2 AND s.owner = o.doc_id
                         THEN o.c ELSE 0 END) AS BIGINT),
           round(CAST(sum(CASE WHEN s.ndocs >= 2 THEN o.c ELSE 0 END)
                      AS DOUBLE) / CAST(sum(o.c) AS DOUBLE), 6)
    FROM occ o JOIN stats s USING (fh)
    GROUP BY o.doc_id
    """).fetchall()
    assert got == sorted(map(tuple, exp))


# ---------------------------------------------------------------------------
# span_removal (the Lee et al. keep-one REMOVAL pass, r5)
# ---------------------------------------------------------------------------
def test_span_removal_owner_keeps_others_lose(spark):
    shared = " ".join(f"s{i}" for i in range(W))
    rows = [
        (1, f"{shared} one two three"),
        (2, f"pre amble {shared} post"),
        (3, f"zz {shared} yy"),
        (4, "independent text with no duplication at all"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    from vbb_data_pipeline_spark.operators.dedup import span_removal

    out = {r.doc_id: r for r in span_removal(
        d, "text", "doc_id", window=W
    ).collect()}
    assert set(out) == {1, 2, 3, 4}
    # owner (min id) keeps the run verbatim
    assert shared in out[1].text and out[1].removed_tokens == 0
    # every other holder loses exactly the covered tokens, keeps rest
    for i in (2, 3):
        assert shared not in out[i].text
        assert out[i].removed_tokens == W
    assert out[2].text == "pre amble post"
    assert out[3].text == "zz yy"
    # untouched doc passes through (tokens re-joined by space)
    assert out[4].text == "independent text with no duplication at all"
    assert out[4].removed_tokens == 0


def test_span_removal_overlapping_spans_union(spark):
    # doc 2 shares a run of W+3 tokens with doc 1 -> 4 overlapping
    # duplicated spans; the covered UNION must remove W+3 tokens,
    # not 4*W
    run = " ".join(f"r{i}" for i in range(W + 3))
    d = spark.createDataFrame(
        [(1, f"{run} tail"), (2, f"head {run}")],
        "doc_id long, text string",
    )
    from vbb_data_pipeline_spark.operators.dedup import span_removal

    out = {r.doc_id: r for r in span_removal(
        d, "text", "doc_id", window=W
    ).collect()}
    assert out[1].removed_tokens == 0
    assert out[2].removed_tokens == W + 3
    assert out[2].text == "head"


def test_span_removal_degenerate_inputs(spark):
    from vbb_data_pipeline_spark.operators.dedup import span_removal

    d = spark.createDataFrame(
        [(1, None), (2, ""), (3, "below window size")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in span_removal(
        d, "text", "doc_id", window=W
    ).collect()}
    assert out[1].text == "" and out[1].removed_tokens == 0
    assert out[2].text == "" and out[2].removed_tokens == 0
    assert out[3].text == "below window size"


@pytest.mark.parametrize("seed", [5, 23])
def test_span_removal_matches_duckdb_replay(spark, seed):
    """Seeded random corpora (tiny alphabet -> forced collisions)
    through the OPERATOR vs an independent DuckDB replay of the
    removal semantics (stride-1 hashes, owner election, covered-index
    union, token-stream rebuild)."""
    import duckdb
    import numpy as np
    import pandas as pd

    from vbb_data_pipeline_spark.functions.hashing import md5_long_sql
    from vbb_data_pipeline_spark.operators.dedup import span_removal

    rng = np.random.default_rng(seed)
    alphabet = ["aa", "bb", "cc"]
    rows = []
    for i in range(25):
        n = int(rng.integers(0, 30))
        rows.append((i, " ".join(rng.choice(alphabet, size=n))))
    w = 5

    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        map(
            tuple,
            span_removal(
                d, "text", "doc_id", window=w, hash_mode="oracle"
            ).collect(),
        )
    )

    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    tok = ("list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), "
           "x -> x <> '')")
    span_h = md5_long_sql(f"array_to_string(list_slice(tk, p, p+{w}-1), '_')")
    exp = sorted(map(tuple, con.execute(f"""
    WITH toks AS (SELECT doc_id, {tok} AS tk FROM documents),
    hs AS (
        SELECT doc_id, tk,
               list_transform(range(1, greatest(len(tk) - {w}, -1) + 2),
                              p -> {span_h}) AS hl
        FROM toks
    ),
    spans AS (
        SELECT doc_id, generate_subscripts(hl, 1) AS p, unnest(hl) AS h
        FROM hs
    ),
    stats AS (
        SELECT h, count(DISTINCT doc_id) AS nd, min(doc_id) AS owner
        FROM spans GROUP BY h
    ),
    fdup AS (
        SELECT s.doc_id, s.p FROM spans s JOIN stats t USING (h)
        WHERE t.nd >= 2 AND t.owner <> s.doc_id
    ),
    covered AS (
        SELECT DISTINCT doc_id, unnest(range(p, p + {w})) AS ci FROM fdup
    ),
    tok_idx AS (
        SELECT doc_id, generate_subscripts(tk, 1) AS i, unnest(tk) AS t
        FROM toks
    ),
    keep AS (
        SELECT k.* FROM tok_idx k ANTI JOIN covered c
          ON k.doc_id = c.doc_id AND k.i = c.ci
    ),
    rebuilt AS (
        SELECT doc_id, string_agg(t, ' ' ORDER BY i) AS text
        FROM keep GROUP BY doc_id
    ),
    ncov AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS removed_tokens
        FROM covered GROUP BY doc_id
    )
    SELECT d.doc_id, coalesce(r.text, '') AS text,
           coalesce(n.removed_tokens, 0) AS removed_tokens
    FROM (SELECT DISTINCT doc_id FROM documents) d
    LEFT JOIN rebuilt r USING (doc_id)
    LEFT JOIN ncov n USING (doc_id)
    """).fetchall()))
    assert got == exp


@pytest.mark.parametrize("seed", [7, 41])
def test_span_removal_no_surviving_foreign_duplicate(spark, seed):
    """Guarantee: after removal, every ORIGINAL cross-doc duplicated
    span survives only in its owner document (non-owners lost at
    least one token of every covering window)."""
    import numpy as np

    from vbb_data_pipeline_spark.operators.dedup import (
        span_removal,
        substring_span_stats,
    )

    rng = np.random.default_rng(seed)
    alphabet = [f"w{j}" for j in range(6)]
    planted = " ".join(f"dup{j}" for j in range(8))
    rows = []
    for i in range(20):
        n = int(rng.integers(5, 25))
        body = " ".join(rng.choice(alphabet, size=n))
        # plant the duplicate run into a third of the docs
        if i % 3 == 0:
            body = f"{body} {planted} {body}" if n else planted
        rows.append((i, body))
    w = 5
    d = spark.createDataFrame(rows, "doc_id long, text string")
    cleaned = span_removal(d, "text", "doc_id", window=w)

    # re-run the stride-1 accounting on the CLEANED corpus: any span
    # still duplicated must now be an artifact of random collisions in
    # the tiny alphabet, never the planted run
    for r in cleaned.collect():
        if r.doc_id % 3 == 0 and r.doc_id != 0:
            assert planted not in r.text, r.doc_id
        if r.doc_id == 0:
            assert planted in r.text  # owner keeps its copy
    # quantitative: cleaned corpus has strictly less duplication mass
    before = substring_span_stats(d, "text", "doc_id", window=w)
    after = substring_span_stats(cleaned, "text", "doc_id", window=w)
    m_before = before.agg(F.sum("dup_spans")).collect()[0][0] or 0
    m_after = after.agg(F.sum("dup_spans")).collect()[0][0] or 0
    assert m_after < m_before


# ---------------------------------------------------------------------------
# span_removal_fixed_point (r6: the closure a single pass cannot give)
# ---------------------------------------------------------------------------
def _max_cross_doc_ndocs(spark, df, w):
    """Max number of distinct docs sharing any w-gram (1 = no
    cross-document duplication left)."""
    from vbb_data_pipeline_spark.operators.dedup import substring_span_stats

    stats = substring_span_stats(df, "text", "doc_id", window=w)
    dup = stats.agg(F.sum("dup_spans")).collect()[0][0] or 0
    return dup


def test_fixed_point_single_pass_insufficient_then_converges(spark):
    """A corpus engineered so removal CREATES a fresh cross-doc gram:
    the fixed point must clean it, and the result carries rounds >= 2."""
    from vbb_data_pipeline_spark.operators.dedup import (
        span_removal,
        span_removal_fixed_point,
    )

    w = 3
    # doc 0 owns "a b c"; doc 1 = "x a b c y z q" loses "a b c"'s
    # tokens in round 1 -> "x y z q", which then shares the gram
    # "x y z" with doc 2 ("x y z k") — a duplicate that EXISTS ONLY
    # AFTER round 1; round 2 elects doc 1 (lower id) owner and strips
    # it from doc 2.
    rows = [
        (0, "a b c"),
        (1, "x a b c y z q"),
        (2, "x y z k"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    single = span_removal(d, "text", "doc_id", window=w)
    assert _max_cross_doc_ndocs(spark, single.select("doc_id", "text"), w) > 0

    fixed = span_removal_fixed_point(d, "text", "doc_id", window=w)
    got = {r.doc_id: r for r in fixed.collect()}
    assert got[0].rounds >= 2
    cleaned = fixed.select("doc_id", "text")
    assert _max_cross_doc_ndocs(spark, cleaned, w) == 0
    # owners kept their copies: doc 0 owns "a b c", doc 1 owns the
    # round-2 gram "x y z"; doc 2 lost it
    assert got[0].text == "a b c"
    assert got[1].text == "x y z q"
    assert got[2].text == "k" and got[2].removed_tokens == 3


@pytest.mark.parametrize("seed", [11, 23])
def test_fixed_point_random_corpus_property(spark, seed):
    """Property (the r5 verdict's asked-for guarantee): after
    convergence NO window-gram survives in two distinct documents —
    every duplicated region exists exactly once in the corpus."""
    import numpy as np

    from vbb_data_pipeline_spark.operators.dedup import (
        span_removal_fixed_point,
    )

    rng = np.random.default_rng(seed)
    alphabet = [f"w{j}" for j in range(5)]  # tiny alphabet: collisions
    rows = []
    for i in range(18):
        n = int(rng.integers(4, 30))
        rows.append((i, " ".join(rng.choice(alphabet, size=n))))
    w = 4
    d = spark.createDataFrame(rows, "doc_id long, text string")
    fixed = span_removal_fixed_point(
        d, "text", "doc_id", window=w, max_rounds=10
    )
    cleaned = fixed.select("doc_id", "text")
    assert _max_cross_doc_ndocs(spark, cleaned, w) == 0
    # every input doc keeps a row (empty-text rows included)
    assert fixed.count() == 18


def test_fixed_point_already_clean_is_one_round(spark):
    from vbb_data_pipeline_spark.operators.dedup import (
        span_removal_fixed_point,
    )

    rows = [(0, "a b c d e"), (1, "f g h i j")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in span_removal_fixed_point(
        d, "text", "doc_id", window=3
    ).collect()}
    assert all(r.rounds == 1 and r.removed_tokens == 0 for r in out.values())
    assert out[0].text == "a b c d e"


def test_span_removal_respects_text_col_name(spark):
    """The rewritten-text output column keeps the CALLER's name — a
    hardcoded "text" alias broke pipelines with any other column
    (e4_corpus_prep(text_col="content") raised UNRESOLVED_COLUMN)."""
    from vbb_data_pipeline_spark.operators.dedup import span_removal

    a = "alpha beta gamma delta epsilon zeta eta theta " * 3
    df = spark.createDataFrame(
        [(1, a + "one tail here"), (2, a + "two other end")],
        "doc_id long, content string",
    )
    out = span_removal(df, "content", "doc_id", window=8)
    assert set(out.columns) == {"doc_id", "content", "removed_tokens"}
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["removed_tokens"] == 0  # owner keeps the span
    assert rows[2]["removed_tokens"] > 0
    assert rows[2]["content"] != df.collect()[1]["content"]  # rewritten
