"""Provider/run catalogs and incremental-load bookkeeping
(SURVEY.md §2.1 S5/S8/S9, §2.3 J2/J3, §2.4 A2).

The reference tracks every ingest in ``provider``/``run`` tables,
detects new work by set-subtracting loaded runs from landed archives
(``database_loader/operators.py:31-90``), assigns run ids with a
Postgres SERIAL (``05-create-schema.sh:22``), and dedups re-downloaded
archives by an order-independent XOR of member CRC32s
(``data_provider/operators.py:145-169``).

Spark restatement: catalogs are DataFrames; new-run detection is a
left-anti join; run ids derive deterministically from the natural key
``(provider_id, run_date)`` via dense_rank (SURVEY.md §7.3 — no
distributed auto-increment, stable under re-runs); the checksum is
computed from zip central-directory metadata without decompressing.
"""

from __future__ import annotations

import re
import zipfile
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def scan_landing(spark: SparkSession, base_dir: str) -> DataFrame:
    """S5: scan the landing tree ``<base>/<provider>/<run_date>.zip`` →
    DataFrame(provider_id, run_date, path). Driver-side listing (one
    row per archive — metadata, not data); at object-store scale this
    becomes a listing over ``input_file_name()`` of a binaryFile read.
    """
    rows = []
    for provider_dir in sorted(Path(base_dir).iterdir()):
        if not provider_dir.is_dir():
            continue  # P8: ignore non-directories
        for zf in sorted(provider_dir.glob("*.zip")):
            rows.append((provider_dir.name, zf.stem, str(zf)))  # F9: stem = run_date
    return spark.createDataFrame(
        rows, "provider_id string, run_date string, path string"
    )


def scan_landing_distributed(spark: SparkSession, base_dir: str) -> DataFrame:
    """S5 at object-store scale: the same listing as
    :func:`scan_landing` but produced by Spark's distributed
    ``binaryFile`` reader (content is NOT read — the projection keeps
    only ``path``, so tasks touch file metadata, and millions of
    archives list in parallel instead of through one driver loop).

    Layout contract: ``<base>/<provider_id>/<run_date>.zip`` —
    ENFORCED: zips nested deeper (``<base>/p/archive/x.zip``) or
    sitting at the base itself are skipped, exactly as the
    driver-side :func:`scan_landing` skips them. recursiveFileLookup
    sees them, and deriving provider_id from ``parts[-2]`` used to
    catalog such strays under a nonexistent provider, making the two
    scan variants disagree on which runs exist.
    """
    listed = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.zip")
        .option("recursiveFileLookup", "true")
        .load(base_dir)
        .select("path")
    )
    # depth check on PATH PORTIONS (scheme-agnostic: binaryFile emits
    # "file:/x" with one slash, object stores "scheme://auth/x")
    if "://" in base_dir:
        tail = base_dir.split("://", 1)[1]
        base_path = "/" + tail.split("/", 1)[1] if "/" in tail else ""
    else:
        base_path = str(Path(base_dir).resolve())
    p_path = F.regexp_replace(
        F.col("path"), r"^[A-Za-z][A-Za-z0-9+.-]*://[^/]*", ""
    )
    p_path = F.regexp_replace(p_path, r"^[A-Za-z][A-Za-z0-9+.-]*:", "")
    rel = F.regexp_replace(
        p_path, "^" + re.escape(base_path.rstrip("/")) + "/", ""
    )
    parts = F.split(F.col("path"), "/")
    provider = F.element_at(parts, -2)
    run_date = F.regexp_replace(F.element_at(parts, -1), r"\.zip$", "")
    return (
        listed
        # exactly <provider>/<name>.zip below base: one '/' in the
        # relative path
        .filter(F.size(F.split(rel, "/")) == 2)
        .select(
            provider.alias("provider_id"),
            run_date.alias("run_date"),
            F.regexp_replace(F.col("path"), "^file:", "").alias("path"),
        )
    )


def new_runs(available: DataFrame, run_catalog: DataFrame) -> DataFrame:
    """J2 (operators.py:68-90): landed runs not yet in the catalog."""
    return available.join(
        run_catalog.select("provider_id", "run_date"),
        ["provider_id", "run_date"],
        "left_anti",
    )


def assign_run_ids(new: DataFrame, run_catalog: DataFrame | None) -> DataFrame:
    """S9 (SERIAL run_id, utils/__init__.py:58-72): deterministic
    replacement — dense_rank over the natural key ordered
    (provider_id, run_date), offset by the catalog's current max.
    Re-running the same assignment yields identical ids (SURVEY.md
    §7.3), unlike ``monotonically_increasing_id``.
    """
    offset = 0
    if run_catalog is not None:
        # one job, not two: max over an empty frame is a single NULL
        # row, which `or 0` already normalizes — the old head(1)
        # emptiness probe was a redundant driver-blocking scan per
        # incremental load
        offset = run_catalog.agg(F.max("run_id")).collect()[0][0] or 0
    # Rank per provider (parallel windows), then add a per-provider base
    # computed from the provider ranks — equivalent to one global
    # dense_rank over (provider_id, run_date) but with no
    # single-partition global window. Provider count bounds the
    # broadcast side (catalog-scale, thousands at most).
    wp = Window.partitionBy("provider_id").orderBy("run_date")
    ranked = new.withColumn("_prank", F.dense_rank().over(wp))
    per_provider = ranked.groupBy("provider_id").agg(
        F.max("_prank").alias("_n")
    )
    wb = Window.orderBy("provider_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    bases = per_provider.withColumn(
        "_base", F.coalesce(F.sum("_n").over(wb), F.lit(0))
    ).select("provider_id", "_base")
    return (
        ranked.join(F.broadcast(bases), "provider_id")
        .withColumn(
            "run_id",
            (F.col("_prank") + F.col("_base") + F.lit(offset)).cast("int"),
        )
        .drop("_prank", "_base")
    )


def archive_checksum(zip_path: str) -> int:
    """A2 (data_provider/operators.py:145-152): order-independent
    archive fingerprint = XOR of every member's CRC32, read from the
    zip central directory (no decompression)."""
    checksum = 0
    with zipfile.ZipFile(zip_path) as zf:
        for info in zf.infolist():
            checksum ^= info.CRC
    return checksum


def dedup_archives(spark: SparkSession, listing: DataFrame) -> DataFrame:
    """Checksum-dedup of landed archives (operators.py:159-169): keep
    the first (provider_id, checksum) occurrence ordered by run_date.

    The checksum pass is DISTRIBUTED: archive paths fan out over
    executors (``mapInPandas``) and each task reads only the zip
    central directory of its archives — no ``collect()``, no serial
    driver loop, no full-content shuffle (the XOR fingerprint needs
    member CRCs, which the central directory already stores).
    At object-store scale, swap the in-task ``zipfile.ZipFile(path)``
    open for ``spark.read.format("binaryFile")`` + ``io.BytesIO`` if
    executors lack a filesystem view of the landing bucket.
    """
    out_schema = "provider_id string, run_date string, path string, checksum long"

    def _checksum_batches(batches):
        for pdf in batches:
            pdf = pdf[["provider_id", "run_date", "path"]].copy()
            pdf["checksum"] = [archive_checksum(p) for p in pdf["path"]]
            yield pdf

    # Listing arrives as a handful of driver-created partitions; spread
    # the IO-bound checksum tasks across the cluster first (tiny
    # metadata shuffle).
    fanned = listing.repartition(spark.sparkContext.defaultParallelism)
    df = fanned.mapInPandas(_checksum_batches, out_schema)
    w = Window.partitionBy("provider_id", "checksum").orderBy("run_date", "path")
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def url_changed(new_url: str, url_catalog: DataFrame, provider_id: str) -> bool:
    """P7/S1 change detection (data_provider/operators.py:63-88): has
    this provider's download URL changed since last seen? The catalog
    replaces the reference's ``url.txt`` sidecar files."""
    last = (
        url_catalog.filter(F.col("provider_id") == provider_id)
        .orderBy(F.col("seen_at").desc())
        .select("url")
        .head(1)
    )
    return not last or last[0].url != new_url
