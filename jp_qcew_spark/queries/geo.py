"""Geospatial queries (SURVEY.md §7.3: haversine + bbox as native
expressions, standing in for the reference's aspirational ``geom`` Point
column, reference README.md:9,64).

The oracle tables carry no coordinates, so customer locations are DERIVED
deterministically from c_custkey (pseudo-coords on a world grid) — the same
formula in Spark and DuckDB, making every trig result hash-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from jp_qcew_spark.functions.geo import haversine_km, in_bbox
from jp_qcew_spark.io import load_table

# San Juan, PR — the reference's home geography (UPR Mayagüez / PR Planning
# Board, reference README.md:3)
_SJ_LAT, _SJ_LON = 18.4655, -66.1057


def _coords(key: Column) -> tuple[Column, Column]:
    """Deterministic pseudo-coordinates from an integer key: lat in
    [-60, 60), lon in [-180, 180), both with 0.01-degree jitter."""
    lat = (key * 37 % 120).cast("double") - 60.0 + (key % 100).cast("double") / 100.0
    lon = (key * 73 % 360).cast("double") - 180.0 + (key % 97).cast("double") / 97.0
    return lat, lon


_COORDS_SQL = (
    "CAST(c_custkey * 37 % 120 AS DOUBLE) - 60.0"
    " + CAST(c_custkey % 100 AS DOUBLE) / 100.0",
    "CAST(c_custkey * 73 % 360 AS DOUBLE) - 180.0"
    " + CAST(c_custkey % 97 AS DOUBLE) / 97.0",
)


def q_geo_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Caribbean-bbox filter + haversine distance to San Juan, 20 nearest
    customers. The bbox predicate is a plain range filter (parquet row-group
    pushdown at scale); trig runs only on survivors; top-k is a bounded
    sort."""
    c = load_table(spark, sf_dir, "customer")
    lat, lon = _coords(F.col("c_custkey"))
    with_coords = c.select(
        "c_custkey", lat.alias("lat"), lon.alias("lon")
    ).filter(in_bbox(F.col("lat"), F.col("lon"), 0.0, 40.0, -100.0, -40.0))
    return (
        with_coords.select(
            "c_custkey",
            F.round("lat", 6).alias("lat"),
            F.round("lon", 6).alias("lon"),
            F.round(
                haversine_km(
                    F.col("lat"), F.col("lon"), F.lit(_SJ_LAT), F.lit(_SJ_LON)
                ),
                3,
            ).alias("dist_km"),
        )
        .orderBy("dist_km", "c_custkey")
        .limit(20)
    )


ORACLE_GEO_NEAREST = f"""
WITH pts AS (
  SELECT c_custkey,
         {_COORDS_SQL[0]} AS lat,
         {_COORDS_SQL[1]} AS lon
  FROM customer
), boxed AS (
  SELECT * FROM pts
  WHERE lat BETWEEN 0.0 AND 40.0 AND lon BETWEEN -100.0 AND -40.0
)
SELECT c_custkey, round(lat, 6) AS lat, round(lon, 6) AS lon,
       round(2.0 * 6371.0 * asin(sqrt(
         sin(radians({_SJ_LAT} - lat) / 2) ^ 2
         + cos(radians(lat)) * cos(radians({_SJ_LAT}))
           * sin(radians({_SJ_LON} - lon) / 2) ^ 2)), 3) AS dist_km
FROM boxed
ORDER BY dist_km, c_custkey LIMIT 20
"""


def q_geo_bbox_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation counts + mean distance to San Juan for in-bbox customers:
    bbox filter → broadcast dim join → hash agg (the canonical geo-enrich
    plan: fact never leaves executors, nation dim broadcast)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    lat, lon = _coords(F.col("c_custkey"))
    pts = c.select("c_custkey", "c_nationkey", lat.alias("lat"), lon.alias("lon"))
    boxed = pts.filter(in_bbox(F.col("lat"), F.col("lon"), 0.0, 40.0, -100.0, -40.0))
    return (
        boxed.join(F.broadcast(n), boxed.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(
                F.avg(
                    haversine_km(
                        F.col("lat"), F.col("lon"), F.lit(_SJ_LAT), F.lit(_SJ_LON)
                    )
                ),
                3,
            ).alias("avg_dist_km"),
        )
        .orderBy("n_name")
    )


ORACLE_GEO_BBOX_JOIN = f"""
WITH pts AS (
  SELECT c_custkey, c_nationkey,
         {_COORDS_SQL[0]} AS lat,
         {_COORDS_SQL[1]} AS lon
  FROM customer
), boxed AS (
  SELECT * FROM pts
  WHERE lat BETWEEN 0.0 AND 40.0 AND lon BETWEEN -100.0 AND -40.0
)
SELECT n_name, count(*) AS n_customers,
       round(avg(2.0 * 6371.0 * asin(sqrt(
         sin(radians({_SJ_LAT} - lat) / 2) ^ 2
         + cos(radians(lat)) * cos(radians({_SJ_LAT}))
           * sin(radians({_SJ_LON} - lon) / 2) ^ 2))), 3) AS avg_dist_km
FROM boxed JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name ORDER BY n_name
"""


QUERIES = {
    "geo_nearest": q_geo_nearest,
    "geo_bbox_join": q_geo_bbox_join,
}

ORACLE = {
    "geo_nearest": ORACLE_GEO_NEAREST,
    "geo_bbox_join": ORACLE_GEO_BBOX_JOIN,
}
