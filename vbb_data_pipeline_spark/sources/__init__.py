"""Sources & sinks: GTFS csv-in-zip ingest, run catalogs, and gated
external connectors (SURVEY.md §2.1)."""
