"""vbb_data_pipeline_spark — a PySpark-native analytics engine.

A brand-new engine with the query/data-processing capabilities of the
reference GTFS data pipeline (XComp/vbb-data-pipeline), re-expressed
Spark-first: DataFrame/Spark SQL logical plans optimized by Catalyst,
Structured Streaming for the streaming plane, plus the large-scale
training-data-pipeline extensions (dedup, similarity search, text
analysis, multimodal plumbing).

Layout:
    session      — tuned SparkSession factory
    schemas      — StructTypes + key metadata (GTFS tables, test tables)
    functions/   — scalar column-expression helpers (temporal, geo, text, hashing)
    operators/   — relational + extension operators (core, temporal, dedup, ...)
    sources/     — ingest: GTFS csv-in-zip, catalogs, jdbc/kafka wrappers
    streaming/   — Structured Streaming: windows, arrival stream, geo filter
    queries/     — driver-facing registry: Spark query + DuckDB oracle pairs
    plans/       — plan-inspection helpers (pushdown/broadcast assertions)
"""

__version__ = "0.1.0"
