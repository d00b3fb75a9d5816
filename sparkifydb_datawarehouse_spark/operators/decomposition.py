"""Price-volume-mix decomposition: explain a revenue change between
two periods as price effect + volume effect per brand — the finance
"bridge" that turns two aggregate snapshots into a causal-looking
narrative. Exact identity: Δrev = (p₁−p₀)·q₁ + (q₁−q₀)·p₀.

100 TB shape: two filtered aggregations of the fact table (one per
period — a single scan with conditional aggregation, so ONE shuffle),
then pure arithmetic on the brand-sized frame.

Determinism (the q_cohort_ltv lesson): each effect is an exact
integer expression over cents and integral quantities —
price = rev_cents/qty is a rational, so effects are spelled as
integer numerators over q₀ and reported as FLOOR-based fixed-point
(integer ratios land exactly on ROUND's half-way boundary, where the
engines disagree). The two effects therefore reconstruct Δrev to
within the two floors (≤ $0.02), asserted in the invariant test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table

_Y0, _Y1 = 1998, 1999

_ORACLE_PVM = f"""
WITH base AS (
    SELECT p.p_brand AS brand,
           CAST(SUM(CASE WHEN YEAR(l.l_shipdate) = {_Y0} THEN l.l_quantity ELSE 0 END)
                AS BIGINT) AS q0,
           CAST(SUM(CASE WHEN YEAR(l.l_shipdate) = {_Y1} THEN l.l_quantity ELSE 0 END)
                AS BIGINT) AS q1,
           CAST(ROUND(SUM(CASE WHEN YEAR(l.l_shipdate) = {_Y0}
                               THEN l.l_extendedprice ELSE 0 END) * 100) AS BIGINT)
               AS r0,
           CAST(ROUND(SUM(CASE WHEN YEAR(l.l_shipdate) = {_Y1}
                               THEN l.l_extendedprice ELSE 0 END) * 100) AS BIGINT)
               AS r1
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY brand
    HAVING q0 > 0 AND q1 > 0
)
SELECT brand,
       ROUND(r0 / 100.0, 2) AS revenue_y0,
       ROUND(r1 / 100.0, 2) AS revenue_y1,
       ROUND((r1 - r0) / 100.0, 2) AS delta,
       CAST(FLOOR((r1 * q0 - r0 * q1) * 1.0 / q0) AS BIGINT) / 100.0 AS price_effect,
       CAST(FLOOR((q1 - q0) * r0 * 1.0 / q0) AS BIGINT) / 100.0 AS volume_effect
FROM base
ORDER BY brand
"""


@query("q_price_volume_mix", oracle=_ORACLE_PVM)
def price_volume_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand revenue bridge {_Y0}→{_Y1}: price effect
    (p₁−p₀)·q₁ and volume effect (q₁−q₀)·p₀, both as exact-integer
    numerators over q₀ in floor-based fixed point."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    yr = F.year("l_shipdate")
    base = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.sum(F.when(yr == _Y0, F.col("l_quantity")).otherwise(0.0))
            .cast("long")
            .alias("q0"),
            F.sum(F.when(yr == _Y1, F.col("l_quantity")).otherwise(0.0))
            .cast("long")
            .alias("q1"),
            F.round(
                F.sum(F.when(yr == _Y0, F.col("l_extendedprice")).otherwise(0.0))
                * 100,
                0,
            )
            .cast("long")
            .alias("r0"),
            F.round(
                F.sum(F.when(yr == _Y1, F.col("l_extendedprice")).otherwise(0.0))
                * 100,
                0,
            )
            .cast("long")
            .alias("r1"),
        )
        .filter((F.col("q0") > 0) & (F.col("q1") > 0))
    )
    return base.select(
        "brand",
        F.round(F.col("r0") / 100.0, 2).alias("revenue_y0"),
        F.round(F.col("r1") / 100.0, 2).alias("revenue_y1"),
        F.round((F.col("r1") - F.col("r0")) / 100.0, 2).alias("delta"),
        (
            F.floor(
                (F.col("r1") * F.col("q0") - F.col("r0") * F.col("q1"))
                * 1.0
                / F.col("q0")
            ).cast("long")
            / 100.0
        ).alias("price_effect"),
        (
            F.floor(
                (F.col("q1") - F.col("q0")) * F.col("r0") * 1.0 / F.col("q0")
            ).cast("long")
            / 100.0
        ).alias("volume_effect"),
    ).orderBy("brand")


_ORACLE_HHI = """
WITH vol AS (
    SELECT l_partkey, l_suppkey,
           CAST(ROUND(SUM(l_extendedprice) * 100) AS BIGINT) AS cents
    FROM lineitem
    GROUP BY l_partkey, l_suppkey
), per_part AS (
    SELECT l_partkey,
           SUM(cents * 1.0 * cents)
               / (CAST(SUM(cents) AS BIGINT) * 1.0 * CAST(SUM(cents) AS BIGINT)) AS hhi,
           COUNT(*) AS n_suppliers
    FROM vol
    GROUP BY l_partkey
)
SELECT l_partkey AS part_key,
       CAST(FLOOR(hhi * 1000000) AS BIGINT) / 1000000.0 AS hhi,
       CAST(n_suppliers AS BIGINT) AS n_suppliers
FROM per_part
ORDER BY hhi DESC, part_key
LIMIT 20
"""


@query("q_supplier_hhi", oracle=_ORACLE_HHI)
def supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supply-concentration audit: Herfindahl-Hirschman index of
    supplier revenue share within each part — the 20 most concentrated
    parts ("which parts depend on one supplier?").

    HHI = sum(share_i^2) computed WITHOUT materializing shares:
    sum(c^2)/(sum c)^2 over exact integer cents — one (part,supplier)
    fold and one part-level aggregation, both mergeable partials.
    Squared cents stay below 2^53 at fixture scale so every hhi is an
    exact rational, hence bit-identical ordering on both engines; the
    report value is floor fixed-point (exact rationals land on ROUND's
    half-way grid, ORACLES.md)."""
    li = load_table(spark, sf_dir, "lineitem")
    vol = li.groupBy("l_partkey", "l_suppkey").agg(
        F.round(F.sum("l_extendedprice") * 100, 0).cast("long").alias("cents")
    )
    per_part = vol.groupBy("l_partkey").agg(
        (
            F.sum(F.col("cents") * 1.0 * F.col("cents"))
            / (F.sum("cents") * 1.0 * F.sum("cents"))
        ).alias("hhi"),
        F.count(F.lit(1)).alias("n_suppliers"),
    )
    return (
        per_part.orderBy(F.col("hhi").desc(), "l_partkey")
        .limit(20)
        .select(
            F.col("l_partkey").alias("part_key"),
            (F.floor(F.col("hhi") * 1000000).cast("long") / 1000000.0).alias("hhi"),
            F.col("n_suppliers").cast("long").alias("n_suppliers"),
        )
    )


_ORACLE_DISPERSION = """
WITH unit AS (
    SELECT l_partkey,
           ROUND(l_extendedprice / l_quantity, 2) AS unit_price
    FROM lineitem
), stats AS (
    SELECT l_partkey,
           COUNT(*) AS n,
           AVG(unit_price) AS mean_p,
           STDDEV_SAMP(unit_price) AS sd_p
    FROM unit
    GROUP BY l_partkey
    HAVING COUNT(*) >= 5
)
SELECT l_partkey AS part_key,
       CAST(n AS BIGINT) AS n_sales,
       ROUND(mean_p, 2) AS mean_unit_price,
       ROUND(sd_p / mean_p, 4) AS cv
FROM stats
ORDER BY ROUND(sd_p / mean_p, 4) DESC, part_key
LIMIT 20
"""


@query("q_price_dispersion", oracle=_ORACLE_DISPERSION)
def price_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-consistency audit: the 20 parts whose effective unit price
    varies most across sales (coefficient of variation) — the pricing
    analog of a data-quality uniqueness check.

    Unit prices are rounded to cents FIRST (both engines then fold
    identical doubles); mean/stddev are single-pass moments; the sort
    key is the ROUNDED cv so the top-k boundary cannot flip on an
    engine's last-ulp moment difference (ties broken by part key).
    One fact shuffle, parts-sized everything after."""
    li = load_table(spark, sf_dir, "lineitem")
    unit = li.select(
        "l_partkey",
        F.round(F.col("l_extendedprice") / F.col("l_quantity"), 2).alias("unit_price"),
    )
    stats = (
        unit.groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("unit_price").alias("mean_p"),
            F.stddev_samp("unit_price").alias("sd_p"),
        )
        .filter(F.col("n") >= 5)
    )
    cv = F.round(F.col("sd_p") / F.col("mean_p"), 4)
    return (
        stats.select(
            F.col("l_partkey").alias("part_key"),
            F.col("n").cast("long").alias("n_sales"),
            F.round("mean_p", 2).alias("mean_unit_price"),
            cv.alias("cv"),
        )
        .orderBy(F.col("cv").desc(), "part_key")
        .limit(20)
    )
