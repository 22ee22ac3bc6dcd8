"""Driver-facing query registry.

Each entry pairs a Spark query (``(spark, sf_dir) -> DataFrame``) with
its DuckDB oracle SQL (ANSI, over the pre-registered parquet views).
The driver hash-compares both at sf0.01 (``__spark_entry__.py``).

Cross-engine determinism rules (every query here follows them):

* alias every computed column identically on both sides;
* round any float that passed through an aggregate or a transcendental
  function (libm/summation-order ulps differ between engines);
* cast DuckDB integer sums to BIGINT (DuckDB widens to HUGEINT);
* include a unique tiebreaker in every ORDER BY that feeds a LIMIT or
  a window rank;
* hash with md5-derived int64 (functions/hashing.py) — identical in
  both engines — never with engine-native hash functions.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None → driver does rows-only check
    survey: str  # SURVEY.md §2 rows this query covers
    note: str = ""


REGISTRY: dict[str, QuerySpec] = {}

_QUERY_MODULES = [
    "relational",
    "temporal_q",
    "windows_q",
    "text_q",
    "dedup_q",
    "similarity_q",
    "events_q",
]


def register(name: str, oracle: str | None, survey: str, note: str = ""):
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = QuerySpec(name, fn, oracle, survey, note)
        return fn

    return deco


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver table.

    ``events.parquet`` is written with TIMESTAMP(NANOS), which Spark's
    parquet reader rejects unless nanos are surfaced as long; convert
    to a proper TimestampType (microseconds, truncating like DuckDB
    does) so downstream queries see a timestamp column.

    The session timezone is pinned to UTC here because the caller may
    be an external driver whose session uses a different zone — the
    DuckDB oracle's timestamps are UTC-naive, and window/date
    functions would otherwise shift wall-clock values.
    """
    if spark.conf.get("spark.sql.session.timeZone") not in ("UTC", "Etc/UTC"):
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def all_queries() -> dict[str, QuerySpec]:
    """Import every query module and return the populated registry."""
    for m in _QUERY_MODULES:
        importlib.import_module(f"vbb_data_pipeline_spark.queries.{m}")
    return REGISTRY
