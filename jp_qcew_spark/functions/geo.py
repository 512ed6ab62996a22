"""Geospatial scalar functions — haversine distance + bounding-box predicates.

The reference aspires to a DuckDB ``geom`` Point column (reference
README.md:9,64) but its live code keeps only ``latitude``/``longitude``
doubles (decode.json:382-389, cast at data_process.py:67-68). Per SURVEY.md
§7.3 the engine provides the ST-style operations as plain native expressions
— whole-stage-codegen'd trigonometry, no UDT/UDF, no Sedona dependency —
which is also the right 100 TB shape: bbox pre-filters push down to parquet
row-group stats on the lat/long columns before any trig runs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km (haversine; double precision)."""
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) ** 2
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlon / 2) ** 2
    )
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def in_bbox(lat: Column, lon: Column,
            lat_min: float, lat_max: float,
            lon_min: float, lon_max: float) -> Column:
    """Bounding-box containment predicate (pushdown-friendly: plain range
    comparisons on the coordinate columns)."""
    return (
        (lat >= lat_min) & (lat <= lat_max) & (lon >= lon_min) & (lon <= lon_max)
    )
