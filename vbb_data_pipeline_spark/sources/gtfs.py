"""GTFS feed ingestion (SURVEY.md §2.1 S3-S6, §2.7 F6/F8/F9).

The reference extracts table-named CSV members from provider zip
archives and loads them row-at-a-time into Postgres with sanitized
headers, empty-string→NULL, and ``(run_id, provider_id)`` lineage
columns (``airflow/plugins/database_loader/operators.py:134-167``).

Spark restatement: zip extraction is a driver-side pre-step (archives
are single sequential streams — parallelism comes from loading many
archives, one task each, not from splitting one zip), then
``spark.read.csv`` with the declared schema, header validation, and
lineage columns added as literals. At 100 TB the landing zone is
object storage laid out ``provider_id=<p>/run_date=<d>/*.csv`` and the
same reader fans out per partition.
"""

from __future__ import annotations

import re
import tempfile
import zipfile
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from vbb_data_pipeline_spark.schemas import GTFS_LOAD_ORDER, GTFS_TABLES, PRIMARY_KEYS


def sanitize_header(field: str) -> str:
    """Header sanitization (database_loader/operators.py:162): strip
    whitespace then drop anything outside ``[a-z_]`` — KVV feeds carry
    stray characters (BOM, quotes) in header names."""
    return re.sub(r"[^a-z,_]", "", field.strip())


def _csv_read_schema(table: str) -> T.StructType:
    """CSV member schema = declared table schema minus lineage columns."""
    full = GTFS_TABLES[table]
    return T.StructType([f for f in full.fields if f.name not in ("run_id", "provider_id")])


def read_gtfs_csv(
    spark: SparkSession,
    path: str,
    table: str,
    run_id: int,
    provider_id: str,
) -> DataFrame:
    """Typed load of one extracted CSV member (S6).

    The reference trusts DDL column order after sanitizing the header
    (operators.py:156-164); here the header is read, sanitized, and
    the declared schema is applied by *position* the same way. Empty
    strings become NULL (F8) via the CSV reader's default nullValue.
    """
    raw_header = (
        Path(path).open("r", encoding="utf-8-sig").readline().strip()
    )
    cols = [sanitize_header(c) for c in raw_header.split(",")]
    schema = _csv_read_schema(table)

    df = (
        spark.read.option("header", True)
        .option("nullValue", "")
        .option("mode", "PERMISSIVE")
        .csv(path)
    )
    # positional rename to sanitized names, then typed cast per schema
    renamed = df.toDF(*cols)
    typed = renamed.select(
        *[
            F.col(f.name).cast(f.dataType).alias(f.name)
            for f in schema.fields
            if f.name in cols
        ],
        *[
            F.lit(None).cast(f.dataType).alias(f.name)
            for f in schema.fields
            if f.name not in cols
        ],
    )
    return typed.select(
        F.lit(run_id).cast("int").alias("run_id"),
        F.lit(provider_id).alias("provider_id"),
        *[f.name for f in schema.fields],
    )


def extract_zip(zip_path: str, dest: str | None = None) -> dict[str, str]:
    """Extract a GTFS archive; returns {table_name: csv_path} for
    members whose stem matches a known table (P8 filename filter,
    operators.py:144-147). Members are ordered per GTFS_LOAD_ORDER
    (the reference's FK-safe order, kept for documentation)."""
    dest = dest or tempfile.mkdtemp(prefix="gtfs_zip_")
    out: dict[str, str] = {}
    with zipfile.ZipFile(zip_path) as zf:
        for member in zf.namelist():
            stem = Path(member).stem.lower()
            if stem in GTFS_TABLES:
                zf.extract(member, dest)
                out[stem] = str(Path(dest) / member)
    return {t: out[t] for t in GTFS_LOAD_ORDER if t in out}


def read_gtfs_zip(
    spark: SparkSession,
    zip_path: str,
    run_id: int,
    provider_id: str,
) -> dict[str, DataFrame]:
    """S6: one archive → typed, lineage-stamped DataFrames per table."""
    members = extract_zip(zip_path)
    return {
        table: read_gtfs_csv(spark, path, table, run_id, provider_id)
        for table, path in members.items()
    }


def idempotent_append(
    existing: DataFrame | None, incoming: DataFrame, table: str
) -> DataFrame:
    """ON CONFLICT DO NOTHING (S8/J3, utils/__init__.py:55-56) as a
    left-anti join on the declared PK: rows whose key already exists
    are dropped, everything else appends. Loading the same archive
    twice is a no-op — the reference's core idempotency invariant.
    """
    pk = PRIMARY_KEYS.get(table)
    if existing is None:
        if pk:
            return incoming.dropDuplicates(pk)
        return incoming
    deduped = incoming.dropDuplicates(pk) if pk else incoming
    if not pk:
        return existing.unionByName(deduped)
    fresh = deduped.join(existing.select(*pk).distinct(), pk, "left_anti")
    return existing.unionByName(fresh)
