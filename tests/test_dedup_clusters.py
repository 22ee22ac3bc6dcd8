"""Connected-components operator semantics: chains, cycles, disjoint
components, and convergence in O(log diameter) rounds (pointer
jumping) — the near-dup cluster-assembly stage
(operators/dedup.connected_components)."""

from __future__ import annotations

import pytest

from vbb_data_pipeline_spark.operators.dedup import connected_components


def _cc(spark, pairs, **kw):
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    out = connected_components(df, **kw)
    return {r["node"]: r["cluster_id"] for r in out.collect()}


def test_two_disjoint_components(spark):
    got = _cc(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_cycle_collapses(spark):
    got = _cc(spark, [(1, 2), (2, 3), (3, 1)])
    assert got == {1: 1, 2: 1, 3: 1}


def test_long_chain_converges_with_few_rounds(spark):
    """A 64-hop chain has diameter 64; pointer jumping must resolve it
    well inside 12 rounds (plain propagation would need ~64)."""
    chain = [(i, i + 1) for i in range(64)]
    got = _cc(spark, chain, max_iter=12)
    assert set(got.values()) == {0}
    assert len(got) == 65


def test_bridge_merges_components(spark):
    got = _cc(spark, [(1, 2), (10, 11), (2, 10)])
    assert set(got.values()) == {1}


def test_lsh_bucket_size_cap(spark):
    """max_bucket_size drops pathological buckets (the quadratic-skew
    guard) without touching small buckets."""
    from vbb_data_pipeline_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    rows = [(i, "identical boilerplate text block") for i in range(10)]
    rows += [(100, "a different shared document body"),
             (101, "a different shared document body")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = minhash_signatures(docs, "text", "doc_id", hash_mode="oracle")

    unc = {
        (r.id_a, r.id_b)
        for r in lsh_candidate_pairs(sigs, "doc_id", hash_mode="oracle").collect()
    }
    cap = {
        (r.id_a, r.id_b)
        for r in lsh_candidate_pairs(
            sigs, "doc_id", hash_mode="oracle", max_bucket_size=5
        ).collect()
    }
    # uncapped: the 10-clone group is fully paired (45 pairs) + (100,101)
    assert (100, 101) in unc and len(unc) == 46
    # capped at 5: the size-10 buckets vanish; the size-2 bucket stays
    assert cap == {(100, 101)}


def test_cc_leaves_no_cache_entry(spark):
    """connected_components must not persist() anything: a CacheManager
    entry taxes every later query's planning session-wide (round-2
    postmortem). Runs the operator and asserts the session cache is
    empty — and would stay empty even if the loop raised mid-round."""
    mgr = spark._jsparkSession.sharedState().cacheManager()
    assert mgr.isEmpty(), "cache dirty before test"
    _cc(spark, [(1, 2), (2, 3), (4, 5), (5, 6), (6, 4)])
    assert mgr.isEmpty(), "connected_components left a CacheManager entry"


def test_cc_converges_with_60bit_ids(spark):
    """Convergence check must not int64-overflow when node ids are
    60-bit md5 keys (ANSI mode makes the old raw-label sum throw with
    as few as ~8 such nodes)."""
    from vbb_data_pipeline_spark.operators.dedup import connected_components

    base = (1 << 59)
    pairs = spark.createDataFrame(
        [(base + 2 * i, base + 2 * i + 1) for i in range(20)],
        "id_a long, id_b long",
    )
    got = connected_components(pairs).collect()
    assert len(got) == 40
    for r in got:
        assert r.cluster_id == (r.node // 2) * 2  # pair root = even id


def test_star_pair_mode_collapses_mega_family(spark):
    """pair_mode='star': a family of near-identical variants (the
    mega-family shape of crawl corpora — measured 2.5e9 candidate
    rows in 'all' mode at 1 GB) produces n-1 edges per bucket, CC
    still unions the family, and the keep-min dedup leaves exactly
    one survivor."""
    from vbb_data_pipeline_spark.operators.dedup import (
        connected_components,
        jaccard_pairs,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    base = (
        "the quick brown fox jumps over the lazy dog near the river "
        "bank while birds sing in the tall green trees all day long"
    )
    rows = [(i, f"v{i} " + base) for i in range(60)]
    rows.append((1000, "a completely different document about trains"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = minhash_signatures(df, "text", "doc_id", hash_mode="oracle")
    star = lsh_candidate_pairs(
        sigs, "doc_id", hash_mode="oracle", pair_mode="star"
    )
    n_star = star.count()
    all_pairs = lsh_candidate_pairs(
        sigs, "doc_id", hash_mode="oracle", pair_mode="all"
    ).count()
    assert n_star < all_pairs  # 59-ish edges vs ~1770 pairs
    assert n_star <= 4 * 60  # <= (n-1) per band bucket

    near = jaccard_pairs(df, star, "text", "doc_id").filter(
        "jaccard >= 0.7"
    ).select("id_a", "id_b")
    cc = connected_components(near)
    fam = {r["node"]: r["cluster_id"] for r in cc.collect()}
    # the family forms ONE cluster rooted at the min id
    fam_ids = {i for i in range(60) if i in fam}
    assert len(fam_ids) >= 55  # nearly all variants entered the graph
    assert len({fam[i] for i in fam_ids}) == 1
    assert 1000 not in fam or fam[1000] != fam[0]


def test_exact_dedup_null_keys_survive(spark):
    """NULL keys form ONE group whose min-id row survives (SQL GROUP
    BY semantics) — the plain-= semi join used to drop every NULL-key
    row from the output entirely."""
    from vbb_data_pipeline_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        [(None, 1), (None, 2), ("k", 3), ("k", 4)],
        "key string, doc_id long",
    )
    out = sorted(
        (
            (r["key"], r["doc_id"])
            for r in exact_dedup(df, ["key"], "doc_id").collect()
        ),
        key=lambda t: t[1],
    )
    assert out == [(None, 1), ("k", 3)]


def test_fingerprint_dedup_zero_token_docs_pass_through(spark):
    """Zero-token docs (fully non-Latin / punctuation-only) used to
    fingerprint as md5('') and collapse into one survivor; they now
    pass through untouched — no token evidence, no dedup."""
    from vbb_data_pipeline_spark.operators.dedup import fingerprint_dedup

    df = spark.createDataFrame(
        [
            (1, "!!! ??? ..."),
            (2, "你好世界"),
            (3, "the same words here"),
            (4, "here words same the"),
        ],
        "doc_id long, text string",
    )
    kept = sorted(
        r["doc_id"] for r in fingerprint_dedup(df, "text", "doc_id").collect()
    )
    assert kept == [1, 2, 3]  # 4 is a reordered dup of 3; 1,2 both kept


def test_lsh_banding_validation(spark):
    """bands > num_hashes degenerates every band to a constant bucket
    (full O(n^2) cross join); non-divisible splits silently drop
    signature rows — both must raise."""
    import pytest as _pytest

    from vbb_data_pipeline_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    df = spark.createDataFrame(
        [(i, f"doc number {i} entirely unrelated {i*7}") for i in range(4)],
        "doc_id long, text string",
    )
    sigs = minhash_signatures(df, "text", "doc_id", num_hashes=4)
    with _pytest.raises(ValueError, match="bands"):
        lsh_candidate_pairs(sigs, "doc_id", num_hashes=4, bands=8)
    with _pytest.raises(ValueError, match="bands"):
        lsh_candidate_pairs(sigs, "doc_id", num_hashes=16, bands=5)


def test_line_dedup_default_preserves_blank_lines(spark):
    """Default min_chars=1: paragraph breaks are structure — the old
    0 default deduped the empty line corpus-wide, rewriting every
    doc's paragraph structure but the first's."""
    from vbb_data_pipeline_spark.operators.dedup import line_dedup_corpus

    df = spark.createDataFrame(
        [(1, "para1\n\npara2"), (2, "other1\n\nother2")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["text"]
        for r in line_dedup_corpus(df, "text", "doc_id").collect()
    }
    assert out[1] == "para1\n\npara2"
    assert out[2] == "other1\n\nother2"


def test_incremental_index_param_marker(spark, tmp_path):
    """Probing an at-rest index with different signature parameters
    than it was built with used to silently classify every near-dup
    'new'; the _dedup_params.json marker turns it into a ValueError."""
    import pytest as _pytest

    from vbb_data_pipeline_spark.operators.dedup import (
        dedup_incremental,
        dedup_index_write,
    )

    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta iota kappa")],
        "doc_id long, text string",
    )
    from pyspark.sql import functions as F

    p = str(tmp_path / "idx")
    dedup_index_write(df, p, num_hashes=32, bands=8)
    with _pytest.raises(ValueError, match="num_hashes"):
        dedup_incremental(
            df.withColumn("doc_id", F.col("doc_id") + 10), p
        ).collect()
    # matching params probe fine, and append under WRONG params raises
    dedup_incremental(
        df.withColumn("doc_id", F.col("doc_id") + 10), p,
        num_hashes=32, bands=8,
    ).collect()
    with _pytest.raises(ValueError, match="mismatched"):
        dedup_index_write(df, p, num_hashes=16, bands=4, mode="append")
