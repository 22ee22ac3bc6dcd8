"""End-to-end pipelines — the reference's three user-facing entry
points (SURVEY.md §3 E1/E2/E3) restated as engine calls.

The reference wires these through Airflow DAGs + XCom + Postgres +
a hand-built Kafka producer; here each is a pure function over
DataFrames so the "DAG" is the Catalyst plan. Orchestration concerns
(scheduling, retries) stay outside the engine (SURVEY.md §2.11).

* **E1 extract** (`gtfs_pipeline` DAG): landing scan → checksum dedup
  → new-run detection. Downloading itself is pre-engine (S3); the
  engine's job starts at the landed archive.
* **E2 load** (`database_load` DAG): per new run, zip → typed,
  lineage-stamped tables → conflict-ignoring append into the
  warehouse (the reference's ON CONFLICT DO NOTHING).
* **E3 arrivals** (`GtfsArrivalsProducer`): calendar→arrivals
  expansion → wire-format rows, ready for a Kafka sink
  (``sources/connectors.kafka_sink_spec``) or a paced replay
  (``streaming/arrivals.replay_paced``).
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from vbb_data_pipeline_spark.operators.temporal import expand_arrivals
from vbb_data_pipeline_spark.sources.catalog import (
    assign_run_ids,
    dedup_archives,
    new_runs,
    scan_landing,
)
from vbb_data_pipeline_spark.sources.gtfs import (
    idempotent_append,
    read_gtfs_zip,
)
from vbb_data_pipeline_spark.streaming.arrivals import arrivals_as_wire


@dataclass
class Warehouse:
    """In-session stand-in for the reference's Postgres schema: one
    DataFrame per GTFS table plus the run catalog. At deployment these
    are parquet/bucketed tables (sources/layout.py) — the pipeline
    functions only ever union/anti-join, so the storage swap is a
    read/write at the edges."""

    tables: dict[str, DataFrame] = field(default_factory=dict)
    run_catalog: DataFrame | None = None


def e1_extract(spark: SparkSession, landing_dir: str, warehouse: Warehouse) -> DataFrame:
    """E1: landed archives that are genuinely new work.

    Checksum-dedup (XOR of member CRCs, distributed) drops
    re-downloads with identical content; the anti-join against the
    run catalog drops already-loaded runs. Returns
    ``(provider_id, run_date, path, checksum)``.
    """
    listing = scan_landing(spark, landing_dir)
    deduped = dedup_archives(spark, listing)
    if warehouse.run_catalog is None:
        return deduped
    return new_runs(deduped, warehouse.run_catalog)


def e2_load(
    spark: SparkSession, landing_dir: str, warehouse: Warehouse
) -> Warehouse:
    """E2: load every new run into the warehouse, idempotently.

    Run ids are deterministic (dense_rank over the natural key,
    offset by the catalog max — re-running assigns identical ids).
    Per-archive table reads are driver-coordinated (one archive is one
    zip — catalog-scale); the row data itself moves only through
    Spark plans.
    """
    pending = assign_run_ids(
        e1_extract(spark, landing_dir, warehouse), warehouse.run_catalog
    )
    # Materialize the pending list ONCE (it is catalog-scale metadata):
    # the checksum/anti-join/window chain runs a single time, and the
    # new catalog rows are rebuilt from the collected values so the
    # catalog never keeps lineage into the landing tree.
    runs = pending.select("run_id", "run_date", "provider_id", "path").collect()
    for r in sorted(runs, key=lambda x: x.run_id):
        for table, df in read_gtfs_zip(spark, r.path, r.run_id, r.provider_id).items():
            warehouse.tables[table] = idempotent_append(
                warehouse.tables.get(table), df, table
            )
    # Cut table lineage from the landing zips: retention may delete or
    # replace archives after load, and the warehouse must not
    # re-execute csv/zip reads on later evaluations. At deployment this
    # is the parquet write (sources/layout.py); in-session it is a
    # checkpoint.
    for table in list(warehouse.tables):
        warehouse.tables[table] = warehouse.tables[table].localCheckpoint()
    new_catalog = spark.createDataFrame(
        [(r.run_id, r.run_date, r.provider_id) for r in runs],
        "run_id int, run_date string, provider_id string",
    )
    warehouse.run_catalog = (
        new_catalog
        if warehouse.run_catalog is None
        else warehouse.run_catalog.unionByName(new_catalog)
    )
    return warehouse


def e3_arrivals(
    warehouse: Warehouse,
    start: dt.date,
    end: dt.date,
    as_wire: bool = False,
) -> DataFrame:
    """E3: the scheduled-arrivals stream the reference's producer
    replays — calendar ⋈ trips ⋈ stop_times ⋈ stops, expanded to
    concrete events, time-ordered. ``as_wire=True`` serializes to the
    producer's JSON wire shape (GtfsArrival.java:20-36), ready for
    ``kafka_sink_spec(...).save(df)``.
    """
    t = warehouse.tables
    out = expand_arrivals(
        t["calendar"], t["trips"], t["stop_times"], t["stops"], start, end
    )
    return arrivals_as_wire(out) if as_wire else out
