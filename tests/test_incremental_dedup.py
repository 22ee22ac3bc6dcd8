"""Incremental dedup against the at-rest index: new batches dedupe
against the whole corpus without re-milling it, and without the index
storing (or the probe reading) any corpus text.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vbb_data_pipeline_spark.operators.dedup import (
    dedup_incremental,
    dedup_index_write,
)
from vbb_data_pipeline_spark.queries import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def halves(spark):
    docs = load_table(spark, SF, "documents").select(
        "doc_id", "text"
    ).localCheckpoint()
    mid = docs.agg(F.expr("percentile(doc_id, 0.5)")).collect()[0][0]
    corpus = docs.filter(F.col("doc_id") <= mid)
    rest = docs.filter(F.col("doc_id") > mid)
    return corpus.localCheckpoint(), rest.localCheckpoint()


@pytest.fixture(scope="module")
def index(halves, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("dedup_idx") / "idx")
    corpus, _ = halves
    dedup_index_write(corpus, path)
    return path


def _batch(spark, corpus, rest):
    """rest + 3 exact copies of corpus docs (re-keyed) + 3 near copies
    (one appended token: fingerprint breaks, shingles mostly keep)."""
    donors = corpus.orderBy("doc_id").limit(3).collect()
    exact = [(9_000_000 + i, r.text) for i, r in enumerate(donors)]
    near = [(9_100_000 + i, r.text + " zzqy") for i, r in enumerate(donors)]
    planted = spark.createDataFrame(
        exact + near, schema="doc_id long, text string"
    )
    return rest.unionByName(planted), donors


def test_verdicts_and_planted_dups(spark, halves, index):
    corpus, rest = halves
    batch, donors = _batch(spark, corpus, rest)
    out = dedup_incremental(batch, index).localCheckpoint()
    assert out.count() == batch.count()  # nothing silently dropped
    rows = {r.doc_id: r for r in out.collect()}
    for i, d in enumerate(donors):
        ex = rows[9_000_000 + i]
        assert ex.status == "exact_dup" and ex.dup_of == d.doc_id
        assert ex.similarity == 1.0
        nr = rows[9_100_000 + i]
        assert nr.status == "near_dup" and nr.dup_of == d.doc_id
        assert nr.similarity >= 0.7
    statuses = {r.status for r in rows.values()}
    assert statuses <= {"exact_dup", "near_dup", "new"}
    assert any(r.status == "new" for r in rows.values())


def test_append_then_reprobe_is_idempotent(spark, halves, tmp_path):
    """After appending the surviving batch, re-probing the same batch
    finds EVERY row already in the corpus (exact tier catches the
    appended survivors; nothing re-enters)."""
    corpus, rest = halves
    path = str(tmp_path / "idx2")
    dedup_index_write(corpus, path)
    batch, _ = _batch(spark, corpus, rest)
    first = dedup_incremental(batch, path).localCheckpoint()
    survivors = first.filter(F.col("status") == "new").select(
        "doc_id", "text"
    )
    dedup_index_write(survivors, path, mode="append")
    second = dedup_incremental(batch, path)
    assert second.filter(F.col("status") == "new").count() == 0


def test_probe_plan_reads_no_text_and_stays_native(spark, halves, index):
    corpus, rest = halves
    out = dedup_incremental(rest, index)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # the index side carries fingerprints/signatures only — the
    # probe must not resurrect a text column from the index path
    import re

    for scan in re.findall(r"ReadSchema: [^\n]*", plan):
        if "fps" in scan or "bands" in scan:
            assert "text" not in scan


def test_bucket_cap_bounds_candidate_join(spark, tmp_path):
    """A boilerplate band bucket with more occupants than
    max_bucket_size is excluded from NEAR-dup candidate generation
    (the documented recall trade: such content is exact/fingerprint
    territory); with the cap off the same probe explodes into
    occupancy x batch candidates."""
    base = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"
    corpus = spark.createDataFrame(
        [(i, f"{base} tail{i}") for i in range(200)],
        schema="doc_id long, text string",
    )
    path = str(tmp_path / "hotidx")
    dedup_index_write(corpus, path)
    batch = spark.createDataFrame(
        [(10_000 + i, f"{base} probe{i}") for i in range(20)],
        schema="doc_id long, text string",
    )
    capped = dedup_incremental(batch, path, max_bucket_size=50)
    uncapped = dedup_incremental(batch, path, max_bucket_size=None)
    # every probe doc shares the dominant shingle mass -> without the
    # cap the hot buckets resolve near-dups; with the cap those
    # buckets are dropped and the docs come back 'new'
    assert uncapped.filter(F.col("status") == "near_dup").count() > 0
    assert capped.filter(F.col("status") == "new").count() == 20


def test_registry_probe_covers_all_statuses(spark):
    """The driver-gated entry plants fresh / exact-copy / near-dup
    batch rows — all three verdicts must actually occur (the gate is
    not vacuous) and every batch row must come back."""
    from vbb_data_pipeline_spark.queries.dedup_q import (
        dedup_incremental_probe,
    )

    out = dedup_incremental_probe(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    statuses = {r["status"] for r in rows}
    assert statuses == {"new", "exact_dup", "near_dup"}
    # exact copies must match: every +2M id maps back to its source
    for r in rows:
        if 2_000_000 <= r["doc_id"] < 3_000_000:
            assert r["status"] in ("exact_dup", "near_dup")
            assert r["dup_of"] is not None


def test_index_write_order_bands_fps_marker(spark, tmp_path, monkeypatch):
    """Crash-convergence ordering (round-9 ADVICE): bands/ must land
    BEFORE fps/ (the streaming replay guard reads fps — if fps commits
    first, a crash in between anti-joins the survivors out of the
    replayed batch and their bands rows are lost forever), and the
    params marker must land only AFTER both tables (a marker written
    first would assert parameters the tables were never built with if
    the build fails)."""
    from pyspark.sql.readwriter import DataFrameWriter

    from vbb_data_pipeline_spark.sources import layout

    events: list[str] = []
    real_parquet = DataFrameWriter.parquet
    real_marker = layout.hadoop_write_text

    def spy_parquet(self, path, *a, **k):
        events.append("bands" if path.endswith("/bands") else "fps")
        return real_parquet(self, path, *a, **k)

    def spy_marker(sp, path, body):
        events.append("marker")
        return real_marker(sp, path, body)

    monkeypatch.setattr(DataFrameWriter, "parquet", spy_parquet)
    monkeypatch.setattr(layout, "hadoop_write_text", spy_marker)
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    dedup_index_write(df, str(tmp_path / "idx"))
    assert events == ["bands", "fps", "marker"]
    # an overwrite REBUILD over the now-marked index flips the marker
    # to the 'rebuilding' sentinel BEFORE any table rewrite, then
    # restores a real marker after both — so every crash window mid-
    # rewrite is loud (see test_failed_build_never_flips_params_marker)
    events.clear()
    dedup_index_write(df, str(tmp_path / "idx"), mode="overwrite")
    assert events == ["marker", "bands", "fps", "marker"]


def test_failed_build_never_flips_params_marker(spark, tmp_path, monkeypatch):
    """mode='overwrite' under NEW params whose table writes fail must
    leave the old marker in place — otherwise later appends/probes
    would validate against parameters the on-disk tables were not
    built with (round-9 ADVICE item 4)."""
    import json

    from pyspark.sql.readwriter import DataFrameWriter

    from vbb_data_pipeline_spark.sources.layout import hadoop_read_text

    path = str(tmp_path / "idx")
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    dedup_index_write(df, path, num_hashes=16, bands=4)
    assert json.loads(
        hadoop_read_text(spark, path + "/_dedup_params.json")
    )["num_hashes"] == 16

    real_parquet = DataFrameWriter.parquet

    def crashing(self, p, *a, **k):
        raise RuntimeError("injected table-write failure")

    monkeypatch.setattr(DataFrameWriter, "parquet", crashing)
    with pytest.raises(RuntimeError, match="injected"):
        dedup_index_write(df, path, num_hashes=8, bands=2, mode="overwrite")
    monkeypatch.setattr(DataFrameWriter, "parquet", real_parquet)
    # an interrupted overwrite-rebuild leaves the 'rebuilding'
    # SENTINEL, never a marker asserting either parameter set: the
    # tables may mix state from both (bands rewritten, fps not), so
    # neither the old-params nor the new-params record would be true
    # of the disk. Every probe/append raises loudly until a re-run
    # overwrite completes.
    assert json.loads(
        hadoop_read_text(spark, path + "/_dedup_params.json")
    )["rebuilding"] is True
    with pytest.raises(ValueError, match="mid-rebuild"):
        dedup_incremental(df, path, num_hashes=16, bands=4).collect()
    with pytest.raises(ValueError, match="mid-rebuild"):
        dedup_index_write(df, path, num_hashes=8, bands=2, mode="append")
    # recovery: re-running the overwrite completes the rebuild and
    # restores a real marker; the new-params probe validates again
    dedup_index_write(df, path, num_hashes=8, bands=2, mode="overwrite")
    assert json.loads(
        hadoop_read_text(spark, path + "/_dedup_params.json")
    )["num_hashes"] == 8
    dedup_incremental(df, path, num_hashes=8, bands=2).collect()

    # the COMPLEMENTARY window — crash AFTER both table rewrites but
    # BEFORE the final marker write — must also leave the sentinel
    # (pre-sentinel, this window left the OLD marker validating
    # probes whose band keys could never match the NEW tables)
    import vbb_data_pipeline_spark.operators.dedup as dedup_mod

    def crashing_marker(spark_, p, params):
        raise RuntimeError("injected marker-write failure")

    monkeypatch.setattr(dedup_mod, "_write_index_params", crashing_marker)
    with pytest.raises(RuntimeError, match="injected marker"):
        dedup_index_write(df, path, num_hashes=16, bands=4, mode="overwrite")
    monkeypatch.undo()
    assert json.loads(
        hadoop_read_text(spark, path + "/_dedup_params.json")
    )["rebuilding"] is True
    with pytest.raises(ValueError, match="mid-rebuild"):
        dedup_incremental(df, path, num_hashes=8, bands=2).collect()
    dedup_index_write(df, path, num_hashes=16, bands=4, mode="overwrite")
    dedup_incremental(df, path, num_hashes=16, bands=4).collect()


def test_zero_token_docs_indexed_in_fps_not_bands(spark, tmp_path):
    """Zero-token docs (NULL fingerprint) get an fps/ row — their ids
    must be visible to streaming's replay/redelivery guard — but stay
    out of bands/ (their degenerate signature would bucket every such
    doc together), and a NULL fp never matches the exact tier: two
    different zero-token docs still probe as 'new'."""
    path = str(tmp_path / "idx")
    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"), (2, "你好世界")],
        "doc_id long, text string",
    )
    dedup_index_write(corpus, path)
    fps = spark.read.parquet(path + "/fps")
    assert {r["doc_id"] for r in fps.collect()} == {1, 2}
    assert fps.filter(F.col("fp").isNull()).count() == 1
    bands = spark.read.parquet(path + "/bands")
    assert {r["doc_id"] for r in bands.collect()} == {1}

    batch = spark.createDataFrame(
        [(10, "مرحبا بالعالم"), (11, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["status"]
        for r in dedup_incremental(batch, path).collect()
    }
    assert out == {10: "new", 11: "exact_dup"}
