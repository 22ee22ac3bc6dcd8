"""GTFS feed ingestion (SURVEY.md §2.1 S3-S6, §2.7 F6/F8/F9).

The reference extracts table-named CSV members from provider zip
archives and loads them row-at-a-time into Postgres with sanitized
headers, empty-string→NULL, and ``(run_id, provider_id)`` lineage
columns (``airflow/plugins/database_loader/operators.py:134-167``).

Spark restatement, two tiers:

* catalog-scale: driver-side extraction (:func:`extract_zip`) then
  ``spark.read.csv`` with the declared schema, header validation, and
  lineage columns added as literals;
* landing-zone scale: :func:`read_gtfs_zips_distributed` —
  ``binaryFile`` scan + executor-side unzip/parse in one Arrow-batched
  ``mapInPandas`` stage, one task per archive (a zip is a single
  sequential stream; parallelism comes from many archives, not from
  splitting one). No archive bytes touch the driver.
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


def read_gtfs_zips_distributed(
    spark: SparkSession,
    landing_glob: str,
    table: str,
    run_ids: dict[tuple[str, str], int],
    skip_corrupt: bool = False,
) -> DataFrame:
    """S6 at landing-zone scale: executor-side zip extraction.

    The driver-side path (:func:`read_gtfs_zip`) mirrors the
    reference's one-Python-process unzip
    (``database_loader/operators.py:134-167``) and is fine for
    catalog-scale runs; at a 100 TB landing zone the unzip itself must
    ride the cluster. This reader scans ``<base>/<provider>/
    <run_date>.zip`` archives with the ``binaryFile`` source (one task
    per archive — a zip is a single sequential stream, so parallelism
    comes from many archives, not from splitting one) and extracts +
    CSV-parses the ``table`` member inside an Arrow-batched
    ``mapInPandas``. No archive bytes ever touch the driver.

    Parsing semantics are identical to the driver path: sanitized
    headers applied positionally (F6), empty string → NULL (F8),
    missing schema columns NULL-filled, payload emitted as strings and
    cast JVM-side with the declared schema. ``run_ids`` maps
    ``(provider_id, run_date)`` — derived from the path per F9 — to
    the catalog-assigned run id; archives without an entry (not yet
    registered) or without the member are skipped.

    ``skip_corrupt``: a landing zone at scale always contains some
    truncated/garbled archives (interrupted uploads). Default False
    fails the task loudly (correct for catalog-scale loads where every
    archive matters); True skips undecodable archives so one bad
    upload cannot stall a corpus-wide backfill — pair with a
    reconciliation count against the catalog.
    """
    schema = _csv_read_schema(table)
    out_names = [f.name for f in schema.fields]
    udf_schema = T.StructType(
        [
            T.StructField("run_id", T.IntegerType()),
            T.StructField("provider_id", T.StringType()),
        ]
        + [T.StructField(n, T.StringType()) for n in out_names]
    )
    run_map = dict(run_ids)  # catalog-scale metadata, ships with the task

    def extract(batches):
        import csv
        import io
        import zlib
        import zipfile as zf_mod
        from pathlib import PurePosixPath

        import pandas as pd

        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                pure = PurePosixPath(str(path).split("://", 1)[-1])
                provider = pure.parent.name
                rid = run_map.get((provider, pure.stem))
                if rid is None:
                    continue
                try:
                    with zf_mod.ZipFile(io.BytesIO(content)) as z:
                        member = next(
                            (
                                m
                                for m in z.namelist()
                                if PurePosixPath(m).stem.lower() == table
                            ),
                            None,
                        )
                        if member is None:
                            continue
                        text = io.TextIOWrapper(
                            z.open(member), encoding="utf-8-sig"
                        )
                        reader = csv.reader(text)
                        header = [sanitize_header(c) for c in next(reader, [])]
                        rows = list(reader)
                except (
                    zf_mod.BadZipFile,
                    OSError,
                    UnicodeDecodeError,
                    zlib.error,  # corrupt deflate stream mid-member
                    csv.Error,   # NUL bytes / oversized CSV fields
                ):
                    if skip_corrupt:
                        continue
                    raise
                data = {}
                for name in out_names:
                    if name in header:
                        i = header.index(name)
                        vals = [(r[i] if i < len(r) else "") for r in rows]
                        data[name] = [v if v != "" else None for v in vals]
                    else:
                        data[name] = [None] * len(rows)
                yield pd.DataFrame(
                    {
                        "run_id": [rid] * len(rows),
                        "provider_id": [provider] * len(rows),
                        **data,
                    }
                )

    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.zip")
        .load(landing_glob)
        .select("path", "content")
    )
    parsed = raw.mapInPandas(extract, schema=udf_schema)
    return parsed.select(
        "run_id",
        "provider_id",
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields],
    )


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
