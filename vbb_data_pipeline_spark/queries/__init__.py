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
    "streaming_q",
    "misc_q",
    "cdc_q",
    "graph_q",
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
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # TIMESTAMP(NANOS) surfaced as long (round-1 testdata).
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # timestamp[us] with isAdjustedToUTC=false (round-2
            # testdata). The session zone is pinned to UTC above, so
            # this cast preserves the wall-clock value while giving
            # downstream streaming watermarks the TimestampType they
            # require (NTZ event time is rejected by Spark).
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def all_queries() -> dict[str, QuerySpec]:
    """Import every query module and return the populated registry."""
    for m in _QUERY_MODULES:
        importlib.import_module(f"vbb_data_pipeline_spark.queries.{m}")
    return REGISTRY


# ---------------------------------------------------------------------------
# Cross-engine exact aggregation helpers
# ---------------------------------------------------------------------------
# Summing doubles is order-dependent; two engines summing the same rows
# can land on opposite sides of a rounding boundary (observed at
# sf0.01). Fixed-point summation is order-independent: round each row
# to `scale` units (bit-identical per-row in both engines), sum as
# BIGINT (exact), divide back. Use for every multi-row double SUM/AVG
# in oracle-checked queries.


def exact_sum(col, scale: int = 100):
    """Spark side: order-independent fixed-point sum of a double column."""
    from pyspark.sql import functions as F

    return F.sum(F.round(col * scale).cast("long")) / float(scale)


def exact_sum_sql(expr: str, scale: int = 100) -> str:
    """DuckDB twin of :func:`exact_sum`."""
    return f"(sum(CAST(round(({expr}) * {scale}) AS BIGINT)) / {scale}.0)"


def exact_avg(col, count_col=None, scale: int = 100):
    """Spark side: avg derived from the fixed-point sum (deterministic)."""
    from pyspark.sql import functions as F

    n = F.count(F.lit(1)) if count_col is None else count_col
    return exact_sum(col, scale) / n


def exact_avg_sql(expr: str, scale: int = 100) -> str:
    return f"({exact_sum_sql(expr, scale)} / count(*))"
