"""Survival analysis: Kaplan–Meier estimator over customer lifetimes
with right-censoring — "what fraction of customers are still active
after N days?", the churn curve every subscription/retention analysis
starts from (Kaplan & Meier 1958, public literature).

Lifetime = days between a customer's first and last order; a customer
whose last order falls within the censor horizon of the dataset's end
is CENSORED (still alive), not churned — the distinction KM exists
for.

100 TB shape: one shuffle folds orders to per-customer (first, last);
the estimator itself runs on the per-duration AGGREGATE (calendar-
bounded grid). At-risk counts are a suffix sum (total − exclusive
prefix), and the product Π(1 − dᵢ/nᵢ) is exp∘Σln — the only way
either engine expresses a cumulative product — with an explicit
zero-factor flag (ln(0) is an ERROR in DuckDB, NULL in Spark; the
flag spelling is identical and total). Factors are exact rationals;
ln/exp drift is bounded by ulps across the sequential (same-order)
sum, far inside the 6-decimal report rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table

_CENSOR_DAYS = 90

_ORACLE_KM = f"""
WITH horizon AS (
    SELECT CAST(MAX(o_orderdate) AS DATE) AS h FROM orders
), cust AS (
    SELECT o_custkey,
           DATE_DIFF('day', CAST(MIN(o_orderdate) AS DATE),
                     CAST(MAX(o_orderdate) AS DATE)) AS duration,
           (CAST(MAX(o_orderdate) AS DATE)
                < (SELECT h FROM horizon) - INTERVAL {_CENSOR_DAYS} DAY) AS churned
    FROM orders
    GROUP BY o_custkey
), grid AS (
    SELECT duration,
           COUNT(*) FILTER (WHERE churned) AS d,
           COUNT(*) AS leaving
    FROM cust
    GROUP BY duration
), risk AS (
    SELECT duration, d,
           CAST((SELECT COUNT(*) FROM cust)
                - COALESCE(SUM(leaving) OVER (
                      ORDER BY duration
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS n_risk
    FROM grid
), factors AS (
    SELECT duration, d, n_risk,
           1.0 - d * 1.0 / n_risk AS factor
    FROM risk
), curve AS (
    SELECT duration, d, n_risk,
           CASE WHEN MIN(factor) OVER w = 0 THEN 0.0
                ELSE EXP(SUM(CASE WHEN factor > 0 THEN LN(factor) ELSE 0 END) OVER w)
           END AS s
    FROM factors
    WINDOW w AS (ORDER BY duration ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT CAST(duration AS BIGINT) AS duration_days,
       CAST(n_risk AS BIGINT) AS n_risk,
       CAST(d AS BIGINT) AS n_events,
       ROUND(s, 6) AS survival
FROM curve
WHERE d > 0
ORDER BY duration_days
"""


@query("q_kaplan_meier", oracle=_ORACLE_KM)
def kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KM survival curve over customer lifetimes (rows = event times
    only, per convention); censored customers leave the risk set
    without an event."""
    orders = load_table(spark, sf_dir, "orders")
    horizon = orders.agg(F.max(F.col("o_orderdate").cast("date")).alias("h"))
    cust = (
        orders.groupBy("o_custkey")
        .agg(
            F.min(F.col("o_orderdate").cast("date")).alias("first"),
            F.max(F.col("o_orderdate").cast("date")).alias("last"),
        )
        .crossJoin(F.broadcast(horizon))
        .select(
            F.datediff("last", "first").alias("duration"),
            (F.col("last") < F.date_sub("h", _CENSOR_DAYS)).alias("churned"),
        )
        .localCheckpoint(eager=True)  # consumed by the grid AND the risk-set total
    )
    grid = cust.groupBy("duration").agg(
        F.count(F.when(F.col("churned"), 1)).alias("d"),
        F.count(F.lit(1)).alias("leaving"),
    )
    total = cust.agg(F.count(F.lit(1)).alias("n_total"))
    w_before = Window.orderBy("duration").rowsBetween(Window.unboundedPreceding, -1)
    w_cum = Window.orderBy("duration").rowsBetween(Window.unboundedPreceding, 0)
    factors = (
        grid.crossJoin(F.broadcast(total))
        .withColumn(
            "n_risk",
            F.col("n_total") - F.coalesce(F.sum("leaving").over(w_before), F.lit(0)),
        )
        .withColumn("factor", 1.0 - F.col("d") / F.col("n_risk"))
    )
    survival = F.when(F.min("factor").over(w_cum) == 0, F.lit(0.0)).otherwise(
        F.exp(
            F.sum(
                F.when(F.col("factor") > 0, F.log("factor")).otherwise(0.0)
            ).over(w_cum)
        )
    )
    return (
        factors.withColumn("s", survival)
        .filter(F.col("d") > 0)
        .select(
            F.col("duration").cast("long").alias("duration_days"),
            F.col("n_risk").cast("long").alias("n_risk"),
            F.col("d").cast("long").alias("n_events"),
            F.round("s", 6).alias("survival"),
        )
        .orderBy("duration_days")
    )
