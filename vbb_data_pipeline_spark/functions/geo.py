"""Geospatial helpers (SURVEY.md §2.2 P6, §2.7 F4).

Re-expresses the reference's haversine great-circle distance
(``streaming/.../utils/GeoPredicate.java:29-38``) as a composition of
native Spark math expressions — fully inside whole-stage codegen, no
UDF, pushdown-friendly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_M = 6_371_000.0


def haversine_m(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in metres between two (lat, lon) pairs.

    a = sin²(Δφ/2) + cosφ1·cosφ2·sin²(Δλ/2);  d = 2R·atan2(√a, √(1−a))
    (GeoPredicate.java:29-38 formula).

    DuckDB oracle twin uses the identical formula with
    ``radians/sin/cos/atan2/sqrt``; round before hash-comparison —
    libm implementations may differ in the last ulp.
    """
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(F.radians(lat1))
        * F.cos(F.radians(lat2))
        * F.sin(dlon / 2)
        * F.sin(dlon / 2)
    )
    return F.lit(2.0 * EARTH_RADIUS_M) * F.atan2(F.sqrt(a), F.sqrt(1 - a))


def within_radius(
    lat: Column, lon: Column, center_lat: float, center_lon: float, radius_m: float
) -> Column:
    """Geo-radius predicate (GeoPredicate.java:40-51): distance ≤ radius."""
    return (
        haversine_m(lat, lon, F.lit(center_lat), F.lit(center_lon))
        <= F.lit(radius_m)
    )
