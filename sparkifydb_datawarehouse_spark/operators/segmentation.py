"""Customer segmentation: RFM (recency / frequency / monetary)
quintile scoring — the classic warehouse marketing rollup over exactly
the customer/order star the reference carries.

100 TB shape: everything happens on the per-customer AGGREGATE (one
map-side-combined shuffle over orders), never on facts. The three
NTILE windows are global sorts over that aggregate — |customers| rows,
3-4 orders of magnitude below the fact volume; if customers themselves
outgrew a sort partition, each ntile is the same two-phase
range-enumeration as `stats_tests._ranged_enumerate` (rank → bucket =
ceil(5·rank/n)), which is exactly how NTILE decomposes. Averages are
reported as exact integer ratios (cents / counts) so no float-sum
ordering can drift across engines.

NTILE tie discipline: every ORDER BY carries o_custkey so the
assignment is a total order — both engines then place the same
customers in the same quintile (NTILE's uneven-bucket rule — first
buckets take the remainder — is identical in Spark and DuckDB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table

_ORACLE_RFM = """
WITH cust AS (
    SELECT o_custkey,
           DATE_DIFF('day', CAST(MAX(o_orderdate) AS DATE),
                     (SELECT CAST(MAX(o_orderdate) AS DATE) FROM orders)) AS recency_days,
           COUNT(*) AS frequency,
           CAST(ROUND(SUM(o_totalprice) * 100) AS BIGINT) AS monetary_cents
    FROM orders
    GROUP BY o_custkey
), scored AS (
    SELECT recency_days, frequency, monetary_cents,
           NTILE(5) OVER (ORDER BY recency_days, o_custkey) AS r_score,
           NTILE(5) OVER (ORDER BY frequency DESC, o_custkey) AS f_score,
           NTILE(5) OVER (ORDER BY monetary_cents DESC, o_custkey) AS m_score
    FROM cust
)
SELECT r_score, f_score, m_score,
       COUNT(*) AS n_customers,
       ROUND(CAST(SUM(monetary_cents) AS BIGINT) / (100.0 * COUNT(*)), 4) AS avg_monetary,
       ROUND(SUM(frequency) * 1.0 / COUNT(*), 4) AS avg_frequency,
       ROUND(SUM(recency_days) * 1.0 / COUNT(*), 4) AS avg_recency_days
FROM scored
GROUP BY r_score, f_score, m_score
ORDER BY r_score, f_score, m_score
"""


@query("q_rfm_segments", oracle=_ORACLE_RFM)
def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM quintile segmentation: score 1 = most recent / most
    frequent / highest spend; report each (R,F,M) cell's population and
    exact-ratio averages (≤125 output rows regardless of scale)."""
    orders = load_table(spark, sf_dir, "orders")
    anchor = orders.agg(F.max(F.col("o_orderdate").cast("date")).alias("anchor"))
    cust = (
        orders.groupBy("o_custkey")
        .agg(
            F.max(F.col("o_orderdate").cast("date")).alias("last_order"),
            F.count(F.lit(1)).alias("frequency"),
            F.round(F.sum("o_totalprice") * 100, 0).cast("long").alias("monetary_cents"),
        )
        .crossJoin(F.broadcast(anchor))
        .withColumn("recency_days", F.datediff("anchor", "last_order"))
    )
    scored = (
        cust.withColumn(
            "r_score",
            F.ntile(5).over(Window.orderBy("recency_days", "o_custkey")),
        )
        .withColumn(
            "f_score",
            F.ntile(5).over(Window.orderBy(F.col("frequency").desc(), "o_custkey")),
        )
        .withColumn(
            "m_score",
            F.ntile(5).over(Window.orderBy(F.col("monetary_cents").desc(), "o_custkey")),
        )
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("monetary_cents") / (100.0 * F.count(F.lit(1))), 4).alias(
                "avg_monetary"
            ),
            F.round(F.sum("frequency") / F.count(F.lit(1)), 4).alias("avg_frequency"),
            F.round(F.sum("recency_days") / F.count(F.lit(1)), 4).alias(
                "avg_recency_days"
            ),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


# ---------------------------------------------------------------------------
# ABC (Pareto) classification: parts tiered by cumulative revenue share.
# ---------------------------------------------------------------------------

_ORACLE_ABC = """
WITH part_rev AS (
    SELECT l_partkey,
           CAST(ROUND(SUM(l_extendedprice * (1 - l_discount)) * 100) AS BIGINT)
               AS cents
    FROM lineitem
    GROUP BY l_partkey
), ranked AS (
    SELECT cents,
           CAST(SUM(cents) OVER (ORDER BY cents DESC, l_partkey) AS BIGINT)
               AS cum_cents,
           CAST(SUM(cents) OVER () AS BIGINT) AS total_cents
    FROM part_rev
), classed AS (
    SELECT cents,
           CASE WHEN cum_cents * 1.0 / total_cents <= 0.80 THEN 'A'
                WHEN cum_cents * 1.0 / total_cents <= 0.95 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM ranked
)
SELECT abc_class,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       ROUND(SUM(cents) / 100.0, 2) AS revenue,
       ROUND(SUM(cents) * 1.0 / MAX((SELECT total_cents FROM ranked LIMIT 1)), 6)
           AS revenue_share
FROM classed
GROUP BY abc_class
ORDER BY abc_class
"""


@query("q_abc_classification", oracle=_ORACLE_ABC)
def abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto inventory tiers: class A = parts covering the first
    80% of cumulative revenue (descending), B to 95%, C the tail.

    Revenue folds to exact integer cents per part (one fact shuffle);
    the descending cumulative runs over the PART aggregate. The class
    boundary compares exact rationals (cum_cents/total_cents), so tier
    assignment is cross-engine deterministic even for the part that
    straddles a threshold. The per-class rollup is 3 rows.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part_rev = li.groupBy("l_partkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))) * 100, 0)
        .cast("long")
        .alias("cents")
    ).localCheckpoint(eager=True)  # consumed by the scan AND the grand total
    total = part_rev.agg(F.sum("cents").alias("total_cents"))
    w = Window.orderBy(F.col("cents").desc(), "l_partkey").rowsBetween(
        Window.unboundedPreceding, 0
    )
    share = F.col("cum_cents") / F.col("total_cents")
    return (
        part_rev.withColumn("cum_cents", F.sum("cents").over(w))
        .crossJoin(F.broadcast(total))
        .withColumn(
            "abc_class",
            F.when(share <= 0.80, "A").when(share <= 0.95, "B").otherwise("C"),
        )
        .groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.round(F.sum("cents") / 100.0, 2).alias("revenue"),
            F.round(F.sum("cents") / F.max("total_cents"), 6).alias("revenue_share"),
        )
        .orderBy("abc_class")
    )


# ---------------------------------------------------------------------------
# Segment migration: revenue-quintile flow between two years.
# ---------------------------------------------------------------------------

_MIG_Y0, _MIG_Y1 = 1998, 1999

_ORACLE_MIGRATION = f"""
WITH rev AS (
    SELECT o_custkey,
           CAST(ROUND(SUM(CASE WHEN YEAR(o_orderdate) = {_MIG_Y0}
                               THEN o_totalprice ELSE 0 END) * 100) AS BIGINT) AS c0,
           CAST(ROUND(SUM(CASE WHEN YEAR(o_orderdate) = {_MIG_Y1}
                               THEN o_totalprice ELSE 0 END) * 100) AS BIGINT) AS c1
    FROM orders
    GROUP BY o_custkey
    HAVING c0 > 0 AND c1 > 0
), tiered AS (
    SELECT NTILE(5) OVER (ORDER BY c0 DESC, o_custkey) AS tier_y0,
           NTILE(5) OVER (ORDER BY c1 DESC, o_custkey) AS tier_y1,
           c0, c1
    FROM rev
)
SELECT tier_y0, tier_y1,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       ROUND(CAST(SUM(c1 - c0) AS BIGINT) / 100.0, 2) AS net_revenue_change
FROM tiered
GROUP BY tier_y0, tier_y1
ORDER BY tier_y0, tier_y1
"""


@query("q_segment_migration", oracle=_ORACLE_MIGRATION)
def segment_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer migration matrix: revenue-quintile in {_MIG_Y0} vs
    {_MIG_Y1} for customers active in both years (the Sankey behind
    "are our top customers staying on top?"). One conditional-agg fold
    to per-customer cents, two NTILEs over the customer AGGREGATE
    (total order via custkey tiebreak — the RFM discipline), ≤25
    output cells with exact-integer revenue deltas."""
    orders = load_table(spark, sf_dir, "orders")
    yr = F.year("o_orderdate")
    cents = lambda y: F.round(
        F.sum(F.when(yr == y, F.col("o_totalprice")).otherwise(0.0)) * 100, 0
    ).cast("long")
    rev = (
        orders.groupBy("o_custkey")
        .agg(cents(_MIG_Y0).alias("c0"), cents(_MIG_Y1).alias("c1"))
        .filter((F.col("c0") > 0) & (F.col("c1") > 0))
    )
    tiered = rev.select(
        F.ntile(5).over(Window.orderBy(F.col("c0").desc(), "o_custkey")).alias(
            "tier_y0"
        ),
        F.ntile(5).over(Window.orderBy(F.col("c1").desc(), "o_custkey")).alias(
            "tier_y1"
        ),
        "c0",
        "c1",
    )
    return (
        tiered.groupBy("tier_y0", "tier_y1")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.round(F.sum(F.col("c1") - F.col("c0")) / 100.0, 2).alias(
                "net_revenue_change"
            ),
        )
        .orderBy("tier_y0", "tier_y1")
    )
