"""Scalar column-expression helpers.

All functions here return native Spark ``Column`` expressions (JVM-side,
whole-stage-codegen friendly). No Python UDFs — the reference's scalar
surface (SURVEY.md §2.7) maps entirely onto built-ins.
"""

from vbb_data_pipeline_spark.functions.temporal import (  # noqa: F401
    date_int,
    date_from_int,
    event_timestamp,
    iso_dow,
    weekday_flag,
)
from vbb_data_pipeline_spark.functions.geo import haversine_m  # noqa: F401
from vbb_data_pipeline_spark.functions.hashing import md5_long  # noqa: F401
