"""Geospatial nearest-neighbor join via grid bucketing: for each
customer, the nearest supplier within a haversine radius.

No geo columns exist in the star, so coordinates are DERIVED
deterministically from the integer keys with pure integer arithmetic
(key·prime mod span — identical in any engine; no hash functions, no
libm). That keeps the operator value-checkable while exercising the
real pattern: spatial point data joined by proximity.

100 TB shape — the naive spelling is a cross join with a distance
filter: quadratic, unrunnable. The scale form is the standard grid
trick:

1. bucket both sides into lat/lon cells sized ≥ the search radius
   (lat 3.0° ≈ 333 km; lon 4.5° ≥ 300 km even at the northern edge
   where meridians converge, cos 49° ≈ 0.656);
2. explode each probe point into its 3×3 cell neighborhood (constant
   ×9 fan-out, in-expression);
3. equi-join on the cell key — a plain hash join whose candidate set
   is only same-neighborhood pairs — then the exact haversine filter
   and a per-customer min.

The ORACLE is deliberately the brute-force cross-join spelling: the
value-check proves the grid join finds exactly the brute-force answer
(radius ≤ cell size ⇒ no candidate can be missed). Cell ids are IEEE
floor/divide on identical doubles (deterministic); only the final
haversine touches libm, rounded at report time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table

_RADIUS_KM = 300.0
_LAT_CELL = 3.0
_LON_CELL = 4.5

# lat in [25, 49), lon in [-124, -67): a continental-US-shaped box
_CUST_COORDS = """
    25.0 + (c_custkey * 37 % 2400) / 100.0 AS lat,
    -124.0 + (c_custkey * 91 % 5700) / 100.0 AS lon
"""
_SUPP_COORDS = """
    25.0 + (s_suppkey * 53 % 2400) / 100.0 AS lat,
    -124.0 + (s_suppkey * 71 % 5700) / 100.0 AS lon
"""

_HAVERSINE = """
2.0 * 6371.0 * ASIN(SQRT(
    POWER(SIN(RADIANS({lat2} - {lat1}) / 2), 2)
    + COS(RADIANS({lat1})) * COS(RADIANS({lat2}))
      * POWER(SIN(RADIANS({lon2} - {lon1}) / 2), 2)
))
"""

_ORACLE_GEO = f"""
WITH c AS (
    SELECT c_custkey, {_CUST_COORDS} FROM customer
), s AS (
    SELECT s_suppkey, {_SUPP_COORDS} FROM supplier
), pairs AS (
    SELECT c.c_custkey, s.s_suppkey,
           {_HAVERSINE.format(lat1="c.lat", lon1="c.lon", lat2="s.lat", lon2="s.lon")} AS dist_km
    FROM c CROSS JOIN s
), nearest AS (
    SELECT c_custkey, s_suppkey AS nearest_suppkey, dist_km,
           ROW_NUMBER() OVER (PARTITION BY c_custkey ORDER BY dist_km, s_suppkey) AS rn
    FROM pairs
    WHERE dist_km <= {_RADIUS_KM}
)
SELECT c_custkey, nearest_suppkey, ROUND(dist_km, 3) AS dist_km
FROM nearest
WHERE rn = 1
ORDER BY c_custkey
"""


def _with_cells(df: DataFrame, explode_neighbors: bool) -> DataFrame:
    df = df.withColumn(
        "lat_cell", F.floor(F.col("lat") / _LAT_CELL).cast("int")
    ).withColumn("lon_cell", F.floor(F.col("lon") / _LON_CELL).cast("int"))
    if not explode_neighbors:
        return df
    return (
        df.withColumn("dlat", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .withColumn("dlon", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .withColumn("lat_cell", F.col("lat_cell") + F.col("dlat"))
        .withColumn("lon_cell", F.col("lon_cell") + F.col("dlon"))
        .drop("dlat", "dlon")
    )


@query("q_geo_nearest", oracle=_ORACLE_GEO)
def geo_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest supplier within 300 km per customer via 3×3 grid-cell
    equi-join; value-checked against the brute-force cross join."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .selectExpr("c_custkey", *(e.strip() for e in _CUST_COORDS.strip().split(",\n")))
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .selectExpr("s_suppkey", *(e.strip() for e in _SUPP_COORDS.strip().split(",\n")))
    )
    # probe side explodes its neighborhood; build side keeps one cell
    probe = _with_cells(cust, explode_neighbors=True)
    build = _with_cells(supp, explode_neighbors=False).select(
        "lat_cell",
        "lon_cell",
        "s_suppkey",
        F.col("lat").alias("s_lat"),
        F.col("lon").alias("s_lon"),
    )
    dist = F.expr(
        _HAVERSINE.format(lat1="lat", lon1="lon", lat2="s_lat", lon2="s_lon")
    )
    pairs = (
        probe.join(build, ["lat_cell", "lon_cell"])
        .withColumn("dist_km", dist)
        .filter(F.col("dist_km") <= _RADIUS_KM)
    )
    w = Window.partitionBy("c_custkey").orderBy("dist_km", "s_suppkey")
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "c_custkey",
            F.col("s_suppkey").alias("nearest_suppkey"),
            F.round("dist_km", 3).alias("dist_km"),
        )
        .orderBy("c_custkey")
    )
