"""Transactional-upsert backend: MERGE INTO when a table format is
available, anti-join-append otherwise.

SURVEY §7.4 standardizes on anti-join-then-append for the reference's
``ON CONFLICT DO NOTHING`` parity
(``airflow/plugins/utils/__init__.py:55-56`` in the reference) and
names a table-format MERGE as the optional backend for real
concurrency. This module supplies that leg:

* ``merge_upsert_table`` — latest-wins upsert of an updates DataFrame
  into a stored table. With ``delta-spark`` installed (and the target
  a Delta table) it compiles to a real ``MERGE INTO`` — ACID,
  conflict-detected, concurrent-writer-safe. Without it, the portable
  fallback: read, :func:`~vbb_data_pipeline_spark.operators.cdc.
  merge_upsert`, rewrite via temp-and-swap (atomic against readers of
  the path, but last-writer-wins under concurrent writers — the
  documented plain-parquet trade-off).

Capability-gated like the Spark-4 ``transformWithStateInPandas``
wrapper (``streaming/stateful.py``): import failure surfaces at call
time with a clear message, never mid-job, and ``delta_available()``
lets callers and tests branch up front.

The two backends agree row-for-row on any input where updates carry
at most one row per key (``tests/test_merge_backend.py`` proves it on
the CDC fixtures when delta-spark is present; the parquet leg is
tested unconditionally).
"""

from __future__ import annotations

import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from vbb_data_pipeline_spark.operators.cdc import merge_upsert
from vbb_data_pipeline_spark.sources.layout import (
    _fs_swap,
    hadoop_exists,
    sibling_path,
)


def delta_available() -> bool:
    """True when the delta-spark package is importable (the MERGE
    backend additionally needs the session built with Delta's SQL
    extension and catalog — see configure_delta_session)."""
    try:
        import delta  # noqa: F401
    except ImportError:
        return False
    return True


def configure_delta_session(builder):
    """Apply Delta's required session config to a SparkSession.Builder
    (extension + catalog). Raises ImportError with an actionable
    message when delta-spark is absent."""
    if not delta_available():
        raise ImportError(
            "merge backend 'delta' requires the delta-spark package "
            "(pip install delta-spark); use backend='parquet' or "
            "install it"
        )
    from delta import configure_spark_with_delta_pip

    builder = builder.config(
        "spark.sql.extensions", "io.delta.sql.DeltaSparkSessionExtension"
    ).config(
        "spark.sql.catalog.spark_catalog",
        "org.apache.spark.sql.delta.catalog.DeltaCatalog",
    )
    return configure_spark_with_delta_pip(builder)


def _is_delta_table(spark: SparkSession, path: str) -> bool:
    # Hadoop-FS probe, not os.path: a driver-local check is always
    # False on HDFS/S3 and would silently demote every remote Delta
    # table to the last-writer-wins parquet leg
    return hadoop_exists(spark, path.rstrip("/") + "/_delta_log")


def merge_upsert_table(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    keys: Sequence[str],
    backend: str = "auto",
) -> None:
    """Latest-wins MERGE of ``updates`` into the table stored at
    ``path``: matched keys update all columns, unmatched keys insert.
    Bootstraps the table when ``path`` does not exist.

    ``backend``:

    * ``"auto"`` — ``"delta"`` when delta-spark is importable AND the
      target is (or will be) a Delta table, else ``"parquet"``.
    * ``"delta"`` — real ``MERGE INTO`` via DeltaTable: ACID commit,
      optimistic concurrency, no full rewrite (only touched files
      rewrite — at 100 TB this is the difference between a merge and
      a table copy).
    * ``"parquet"`` — read + anti-join-union
      (:func:`operators.cdc.merge_upsert`) + temp-and-swap rewrite.
      Atomic for readers of the path; NOT safe under concurrent
      writers (two simultaneous loads race the swap) — the documented
      reason the delta leg exists.

    ``updates`` must carry at most one row per key (pre-dedup with
    :func:`operators.cdc.latest_per_key`); both backends would
    otherwise be nondeterministic (Delta MERGE throws on multiple
    matches, the fallback keeps all duplicate rows).
    """
    ks = list(keys)
    if backend == "auto":
        backend = (
            "delta"
            if delta_available()
            and (
                _is_delta_table(spark, path)
                or not hadoop_exists(spark, path)
            )
            else "parquet"
        )
    if backend == "delta":
        if not delta_available():
            raise ImportError(
                "merge backend 'delta' requires the delta-spark package"
            )
        from delta.tables import DeltaTable

        if not _is_delta_table(spark, path):
            updates.write.format("delta").mode("errorifexists").save(path)
            return
        cond = " AND ".join(f"t.`{k}` = u.`{k}`" for k in ks)
        (
            DeltaTable.forPath(spark, path)
            .alias("t")
            .merge(updates.alias("u"), cond)
            .whenMatchedUpdateAll()
            .whenNotMatchedInsertAll()
            .execute()
        )
        return
    if backend != "parquet":
        raise ValueError(f"unknown merge backend: {backend!r}")
    if not hadoop_exists(spark, path):
        updates.write.mode("errorifexists").parquet(path)
        return
    target = spark.read.parquet(path)
    merged = merge_upsert(target, updates.select(*target.columns), ks)
    tmp = sibling_path(path, f".merge_{uuid.uuid4().hex[:8]}")
    merged.write.mode("overwrite").parquet(tmp)
    # Hadoop-FS rename swap — portable to HDFS/object stores where
    # shutil is driver-local; crash window recoverable at path.old
    _fs_swap(spark, src=tmp, dst=path)
