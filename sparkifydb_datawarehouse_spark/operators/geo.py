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


# ---------------------------------------------------------------------------
# Round-7 rework (VERDICT r6 #3): the 3×3 coarse-cell join was pair-mass
# bound — at customer+supplier ×10, every cell neighborhood was 10×
# deeper on BOTH sides (~133M candidate haversines, 17.5 s). The named
# lever lands here as classic branch-and-bound over a FINER grid:
#
# 1. Finer cells (1.0° lat × 1.5° lon ≈ 111×123 km) with the SUPPLIER
#    side exploding to the ±3/±3 neighborhood that covers the 300 km
#    radius — explode cost is supplier-linear, customers stay one cell.
# 2. Per (cell, supplier) distance BOUNDS from one exact haversine to
#    the cell center plus the center-to-box triangle constant _D_BOX
#    (meridian + parallel arc ≤ 131.5 km for these cells on the
#    R=6371 sphere): ub = d_center + _D_BOX, lb = max(d_center − _D_BOX,
#    axis-gap bounds) — the axis bounds use floor constants of the
#    exact sphere arcs (dist ≥ 111.18·Δlat°; ≥ 72.8·Δlon° given both
#    lats ∈ [25, 49), cos²49° ≥ 0.43).
# 3. Per-cell top-1 prune (sound branch-and-bound): τ_cell = min over
#    suppliers of ub; a supplier with lb > τ is strictly farther than
#    the τ-witness for EVERY customer in the cell — never the nearest —
#    and lb > radius can never be in range. keep ⟺ lb ≤ min(τ, 300).
#    In dense cells τ ≈ nearest-to-center + 2·_D_BOX, so the surviving
#    shell is ~constant-size per cell regardless of supplier density.
# 4. The customer⋈survivor join then runs a cheap axis bounding-box
#    filter before the exact haversine, and the per-customer argmin is
#    a min(struct(dist, key)) hash aggregation — map-side partial
#    combine, no row_number sort over the pair stream.
#
# Every prune is an inequality on a LOWER bound vs an UPPER bound —
# recall-1 by construction; the brute-force cross-join oracle re-proves
# it on every driver run. Measured: 17.5 s → ~2 s at dim10× (pair mass
# per customer now bounded by the τ shell, not the cell depth).
# ---------------------------------------------------------------------------

_LAT_CELL_F = 1.0
_LON_CELL_F = 1.5
_NEIGH = 3  # ±cells covering 300 km: lat 2.71°→3, lon 4.13°→3
_D_BOX = 131.5  # max center-to-box distance: 111.19·0.5 + 111.19·cos25°·0.75
_KM_PER_LAT = 111.18  # floor of R·π/180 on the R=6371 sphere
_KM_PER_LON = 72.8  # floor of 111.19·cos49° (both lats ∈ [25,49)), small-angle safe
_BBOX_LAT = _RADIUS_KM / _KM_PER_LAT
_BBOX_LON = _RADIUS_KM / _KM_PER_LON


@query("q_geo_nearest", oracle=_ORACLE_GEO)
def geo_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest supplier within 300 km per customer via fine-grid
    branch-and-bound (see banner); value-checked against the
    brute-force cross join."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .selectExpr("c_custkey", *(e.strip() for e in _CUST_COORDS.strip().split(",\n")))
        .withColumn("lat_cell", F.floor(F.col("lat") / _LAT_CELL_F).cast("int"))
        .withColumn("lon_cell", F.floor(F.col("lon") / _LON_CELL_F).cast("int"))
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .selectExpr("s_suppkey", *(e.strip() for e in _SUPP_COORDS.strip().split(",\n")))
        .select(
            "s_suppkey",
            F.col("lat").alias("s_lat"),
            F.col("lon").alias("s_lon"),
        )
    )
    offs = F.array(*[F.lit(i) for i in range(-_NEIGH, _NEIGH + 1)])
    cells = (
        supp.withColumn("dlat", F.explode(offs))
        .withColumn("dlon", F.explode(offs))
        .withColumn(
            "lat_cell",
            F.floor(F.col("s_lat") / _LAT_CELL_F).cast("int") + F.col("dlat"),
        )
        .withColumn(
            "lon_cell",
            F.floor(F.col("s_lon") / _LON_CELL_F).cast("int") + F.col("dlon"),
        )
        .drop("dlat", "dlon")
    )
    box_lat_lo = F.col("lat_cell") * _LAT_CELL_F
    box_lon_lo = F.col("lon_cell") * _LON_CELL_F
    lat_gap = F.greatest(
        F.lit(0.0),
        box_lat_lo - F.col("s_lat"),
        F.col("s_lat") - (box_lat_lo + _LAT_CELL_F),
    )
    lon_gap = F.greatest(
        F.lit(0.0),
        box_lon_lo - F.col("s_lon"),
        F.col("s_lon") - (box_lon_lo + _LON_CELL_F),
    )
    d_center = F.expr(
        _HAVERSINE.format(
            lat1="s_lat",
            lon1="s_lon",
            lat2=f"(lat_cell * {_LAT_CELL_F} + {_LAT_CELL_F / 2})",
            lon2=f"(lon_cell * {_LON_CELL_F} + {_LON_CELL_F / 2})",
        )
    )
    bounded = cells.select(
        "lat_cell",
        "lon_cell",
        "s_suppkey",
        "s_lat",
        "s_lon",
        (d_center + _D_BOX).alias("ub"),
        F.greatest(
            d_center - _D_BOX,
            lat_gap * _KM_PER_LAT,
            lon_gap * _KM_PER_LON,
        ).alias("lb"),
    ).filter(F.col("lb") <= _RADIUS_KM)
    tau = F.min("ub").over(Window.partitionBy("lat_cell", "lon_cell"))
    survivors = bounded.withColumn("tau", tau).filter(
        F.col("lb") <= F.least(F.col("tau"), F.lit(_RADIUS_KM))
    )
    dist = F.expr(
        _HAVERSINE.format(lat1="lat", lon1="lon", lat2="s_lat", lon2="s_lon")
    )
    pairs = (
        cust.join(survivors, ["lat_cell", "lon_cell"])
        # axis bounding-box: cheap compares prune most candidates
        # before the trig (each is a floor-constant lower bound)
        .filter(
            (F.abs(F.col("lat") - F.col("s_lat")) <= _BBOX_LAT)
            & (F.abs(F.col("lon") - F.col("s_lon")) <= _BBOX_LON)
        )
        .withColumn("dist_km", dist)
        .filter(F.col("dist_km") <= _RADIUS_KM)
    )
    best = pairs.groupBy("c_custkey").agg(
        F.min(F.struct("dist_km", "s_suppkey")).alias("best")
    )
    return best.select(
        "c_custkey",
        F.col("best.s_suppkey").alias("nearest_suppkey"),
        F.round("best.dist_km", 3).alias("dist_km"),
    ).orderBy("c_custkey")
