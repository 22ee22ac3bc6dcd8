"""Storage layout for the 100 TB tier (SURVEY.md §2.3/§4).

The reference answers every FK join with a Postgres index; at Spark
scale the equivalent decision is made ONCE at write time:

* **bucketing** — both sides of a recurring fact⋈fact join written
  bucketed by the join key read pre-shuffled: the sort-merge join
  plans with ZERO Exchange (asserted in tests/test_bucketing.py).
* **partitioning** — low-cardinality pruning columns (run_date,
  provider_id) become directory partitions, so Catalyst prunes whole
  directories before listing files.

Both are plain Spark writers — these helpers just pin the repo's
conventions (path + saveAsTable pairing, sorted buckets, sane file
counts) so callers can't half-configure them.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (and bucket-sorted) table.

    Joins and aggregations keyed on ``bucket_cols`` between tables
    bucketed with the SAME ``n_buckets`` read co-located data — the
    shuffle happens once here, not per query. Sorting within buckets
    additionally removes the sort of a sort-merge join.
    """
    writer = df.write.bucketBy(n_buckets, *bucket_cols)
    writer = writer.sortBy(*(sort_cols or bucket_cols))
    writer.option("path", path).mode(mode).saveAsTable(table)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    """Write ``df`` hive-partitioned by ``partition_cols``.

    Use for the lineage/pruning columns (provider_id, run_date):
    filters on them prune directories before file listing. Keep
    partition cardinality bounded (≤ ~10k directories) — high-
    cardinality keys belong in bucketing, not partitioning.
    """
    writer = df.write.partitionBy(*partition_cols).mode(mode)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.parquet(path)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a table written by :func:`write_bucketed` (metastore name,
    so the bucketing spec survives into the plan)."""
    return spark.table(table)


def write_range_sorted(
    df: DataFrame,
    path: str,
    sort_cols: Sequence[str],
    num_files: int,
    mode: str = "overwrite",
) -> None:
    """Write parquet range-partitioned and sorted on ``sort_cols`` —
    the poor-man's clustering/Z-order for ONE sort dimension.

    Each output file covers a disjoint range of the sort key, so its
    parquet min/max statistics are tight and a filter on the key skips
    whole files/row groups at scan time. Use for the dominant filter
    column of append-heavy fact tables (event time, order date).
    """
    (
        df.repartitionByRange(num_files, *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .write.mode(mode)
        .parquet(path)
    )


def compact(
    spark: SparkSession,
    path: str,
    target_files: int,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Small-file compaction: rewrite a parquet directory into
    ``target_files`` files (optionally range-sorted).

    Streaming/idempotent appends (streaming/sinks.py) accumulate one
    file per micro-batch; at 100 TB the listing + open overhead of
    millions of small files dominates scans. Rewrites into a temp
    sibling then swaps, so a failed compaction never loses data.
    """
    import shutil
    import uuid
    from pathlib import Path

    df = spark.read.parquet(path)
    tmp = str(Path(path).parent / f".compact_{uuid.uuid4().hex[:8]}")
    if sort_cols:
        write_range_sorted(df, tmp, sort_cols, target_files)
    else:
        df.repartition(target_files).write.mode("overwrite").parquet(tmp)
    backup = path + ".old"
    shutil.move(path, backup)
    shutil.move(tmp, path)
    shutil.rmtree(backup)
