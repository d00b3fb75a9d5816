"""Forecast backtesting: seasonal-naive baseline + MAE/MAPE/MASE per
series — the evaluation loop every warehouse forecasting pipeline
needs before any model ships ("is the fancy model beating
same-day-last-week?").

Scale shape: the backtest runs entirely on the per-(series, day)
AGGREGATE — calendar × series-count rows, orders of magnitude below
facts — with per-series LAG windows (partitioned, bounded sorts).
Metrics are exact-integer arithmetic: daily revenue is folded to cents
(BIGINT), the seasonal-naive forecast is a lag (integer), absolute
errors are integer differences, and MAE/MAPE/MASE are integer-ratio
doubles — zero cross-engine float drift (the q_cusum_changepoint
discipline).

MASE (Hyndman & Koehler 2006, public literature) scales MAE by the
in-sample naive-1 MAE, making scores comparable across series of
different magnitude.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table

_SEASON = 7  # seasonal-naive horizon: same weekday last week

_ORACLE_FORECAST = f"""
WITH daily AS (
    SELECT o_orderpriority AS series,
           CAST(o_orderdate AS DATE) AS day,
           CAST(ROUND(SUM(o_totalprice) * 100) AS BIGINT) AS cents
    FROM orders
    GROUP BY series, day
), lagged AS (
    SELECT series, cents,
           LAG(cents, {_SEASON}) OVER (PARTITION BY series ORDER BY day) AS fc,
           LAG(cents, 1) OVER (PARTITION BY series ORDER BY day) AS naive1
    FROM daily
)
SELECT series,
       COUNT(fc) AS n_scored,
       ROUND(SUM(ABS(cents - fc)) / (COUNT(fc) * 100.0), 2) AS mae,
       ROUND(SUM(ABS(cents - fc) * 1.0 / cents) / COUNT(fc), 6) AS mape,
       ROUND((SUM(ABS(cents - fc)) * 1.0 / COUNT(fc))
             / (SUM(CASE WHEN naive1 IS NOT NULL THEN ABS(cents - naive1) END)
                * 1.0 / COUNT(naive1)), 6) AS mase
FROM lagged
WHERE fc IS NOT NULL
GROUP BY series
ORDER BY series
"""


@query("q_forecast_eval", oracle=_ORACLE_FORECAST)
def forecast_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive (t−7) backtest per order-priority series:
    MAE (dollars), MAPE, and MASE vs the naive-1 walk."""
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("series"),
            F.col("o_orderdate").cast("date").alias("day"),
        )
        .agg(F.round(F.sum("o_totalprice") * 100, 0).cast("long").alias("cents"))
    )
    w = Window.partitionBy("series").orderBy("day")
    lagged = daily.select(
        "series",
        "cents",
        F.lag("cents", _SEASON).over(w).alias("fc"),
        F.lag("cents", 1).over(w).alias("naive1"),
    )
    scored = lagged.filter(F.col("fc").isNotNull())
    abs_err = F.abs(F.col("cents") - F.col("fc"))
    naive_err = F.when(
        F.col("naive1").isNotNull(), F.abs(F.col("cents") - F.col("naive1"))
    )
    return (
        scored.groupBy("series")
        .agg(
            F.count("fc").alias("n_scored"),
            F.round(F.sum(abs_err) / (F.count("fc") * 100.0), 2).alias("mae"),
            F.round(F.sum(abs_err * 1.0 / F.col("cents")) / F.count("fc"), 6).alias(
                "mape"
            ),
            F.round(
                (F.sum(abs_err) * 1.0 / F.count("fc"))
                / (F.sum(naive_err) * 1.0 / F.count("naive1")),
                6,
            ).alias("mase"),
        )
        .orderBy("series")
    )


_ORACLE_FUNNEL_LATENCY = """
WITH first_view AS (
    SELECT user_id, MIN(ts) AS v_ts
    FROM events WHERE event_type = 'view'
    GROUP BY user_id
), conv AS (
    SELECT f.user_id,
           (epoch_us(MIN(e.ts)) - epoch_us(f.v_ts)) / 1000000.0 AS latency_s
    FROM first_view f
    JOIN events e ON e.user_id = f.user_id
               AND e.event_type = 'purchase' AND e.ts >= f.v_ts
    GROUP BY f.user_id, f.v_ts
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM first_view) AS n_viewers,
       CAST(COUNT(*) AS BIGINT) AS n_converted,
       ROUND(COUNT(*) * 1.0 / (SELECT COUNT(*) FROM first_view), 6) AS conversion_rate,
       ROUND(quantile_cont(latency_s, 0.5), 3) AS median_latency_s,
       ROUND(quantile_cont(latency_s, 0.9), 3) AS p90_latency_s
FROM conv
"""


@query("q_funnel_latency", oracle=_ORACLE_FUNNEL_LATENCY)
def funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: first view → first subsequent
    purchase per user; conversion rate + median/p90 latency.

    Complements q_funnel_conversion (did they convert) and
    q_funnel_time_bound (did they convert within the window) with HOW
    LONG conversion takes. Two user-keyed aggregations (first view,
    then first qualifying purchase via one equi-join with a residual
    time predicate); the percentile runs over the per-user AGGREGATE.
    Latencies are exact integer-microsecond differences / 1e6 —
    deterministic doubles — and Spark `percentile` ≡ DuckDB
    `quantile_cont` (linear interpolation) on identical inputs.
    """
    ev = load_table(spark, sf_dir, "events")
    first_view = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
        .localCheckpoint(eager=True)  # consumed by the join AND the viewer count
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    conv = (
        first_view.join(
            purchases,
            (F.col("user_id") == F.col("p_user")) & (F.col("p_ts") >= F.col("v_ts")),
        )
        .groupBy("user_id", "v_ts")
        .agg(F.min("p_ts").alias("first_purchase"))
        .select(
            (
                (F.unix_micros("first_purchase") - F.unix_micros("v_ts")) / 1000000.0
            ).alias("latency_s")
        )
    )
    viewers = first_view.agg(F.count(F.lit(1)).alias("n_viewers"))
    return conv.crossJoin(F.broadcast(viewers)).agg(
        F.max("n_viewers").cast("long").alias("n_viewers"),
        F.count(F.lit(1)).cast("long").alias("n_converted"),
        F.round(F.count(F.lit(1)) / F.max("n_viewers"), 6).alias("conversion_rate"),
        F.round(F.percentile("latency_s", F.lit(0.5)), 3).alias("median_latency_s"),
        F.round(F.percentile("latency_s", F.lit(0.9)), 3).alias("p90_latency_s"),
    )


_ORACLE_SEASONAL = """
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS day,
           CAST(ROUND(SUM(o_totalprice) * 100) AS BIGINT) AS cents
    FROM orders
    GROUP BY day
), tot AS (
    SELECT CAST(SUM(cents) AS BIGINT) AS total, COUNT(*) AS n_days FROM daily
)
SELECT dayofweek(day) AS dow,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       ROUND(CAST(SUM(cents) AS BIGINT) / 100.0, 2) AS revenue,
       CAST(FLOOR(CAST(SUM(cents) AS BIGINT) * 1.0 * MAX(n_days)
                  / (MAX(total) * COUNT(*)) * 10000) AS BIGINT) / 10000.0
           AS seasonal_index
FROM daily, tot
GROUP BY dow
ORDER BY dow
"""


@query("q_seasonal_index", oracle=_ORACLE_SEASONAL)
def seasonal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality index: mean daily revenue on each
    weekday relative to the overall mean daily revenue (index 1.0 =
    neutral) — the multiplicative factor a seasonal-naive forecast or
    staffing model consumes. Exact-integer cents throughout; the
    index is an integer-ratio double reported in floor fixed-point
    (ORACLES.md). dayofweek shim: DuckDB 0=Sunday vs Spark 1=Sunday (A14).
    """
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.round(F.sum("o_totalprice") * 100, 0).cast("long").alias("cents"))
        .localCheckpoint(eager=True)  # consumed by totals AND the dow rollup
    )
    tot = daily.agg(
        F.sum("cents").alias("total"), F.count(F.lit(1)).alias("n_days")
    )
    return (
        daily.crossJoin(F.broadcast(tot))
        .groupBy((F.dayofweek("day") - 1).alias("dow"))  # A14 shim: DuckDB dow 0=Sun, Spark 1=Sun
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.round(F.sum("cents") / 100.0, 2).alias("revenue"),
            (
                F.floor(
                    F.sum("cents")
                    * 1.0
                    * F.max("n_days")
                    / (F.max("total") * F.count(F.lit(1)))
                    * 10000
                ).cast("long")
                / 10000.0
            ).alias("seasonal_index"),
        )
        .orderBy("dow")
    )
