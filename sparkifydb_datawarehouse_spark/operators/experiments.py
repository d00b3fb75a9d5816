"""Experiment analysis: deterministic A/B assignment + CUPED variance
reduction — the analytics a product warehouse runs over the events
stream ("did the treatment move the metric, after adjusting for each
user's pre-period behavior?").

CUPED (Deng et al., WSDM 2013 — public literature): with pre-period
covariate x and experiment metric y, θ = cov(x,y)/var(x) and the
adjusted metric yᵢ − θ(xᵢ − x̄) has the same mean but variance reduced
by corr². Everything reduces to the classic sufficient statistics
(n, Σx, Σy, Σxy, Σx²) — mergeable SUM partials over the per-user
AGGREGATE, so the whole analysis is two shuffles at 100 TB: one to
fold events per user, one groups-sized.

Determinism: variant assignment is the portable md5 bucket (identical
in both engines); per-user period sums are rounded to cents before any
moment (ORACLES.md intermediate-rounding rule); θ and means are
rounded at report time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table
from .sampling import hash_bucket, _duck_bucket

_SPLIT_TS = "2024-01-16 00:00:00"

_ORACLE_CUPED = f"""
WITH per_user AS (
    SELECT user_id,
           CASE WHEN {_duck_bucket("user_id::VARCHAR")} < 500 THEN 'A' ELSE 'B' END
               AS variant,
           ROUND(SUM(CASE WHEN ts < TIMESTAMP '{_SPLIT_TS}' THEN value ELSE 0 END), 2)
               AS x,
           ROUND(SUM(CASE WHEN ts >= TIMESTAMP '{_SPLIT_TS}' THEN value ELSE 0 END), 2)
               AS y
    FROM events
    GROUP BY user_id
), moments AS (
    SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
           SUM(x * y) AS sxy, SUM(x * x) AS sxx
    FROM per_user
), theta AS (
    SELECT (n * sxy - sx * sy) / (n * sxx - sx * sx) AS th, sx / n AS mean_x
    FROM moments
)
SELECT variant,
       COUNT(*) AS n_users,
       ROUND(AVG(y), 4) AS mean_metric,
       ROUND(AVG(y - th * (x - mean_x)), 4) AS mean_adjusted,
       ROUND(ANY_VALUE(th), 6) AS theta
FROM per_user, theta
GROUP BY variant
ORDER BY variant
"""


@query("q_ab_cuped", oracle=_ORACLE_CUPED)
def ab_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-variant metric means, raw and CUPED-adjusted (pre-period
    covariate = each user's first-half activity)."""
    ev = load_table(spark, sf_dir, "events")
    split = F.lit(_SPLIT_TS).cast("timestamp")
    per_user = ev.groupBy("user_id").agg(
        F.round(
            F.sum(F.when(F.col("ts") < split, F.col("value")).otherwise(0.0)), 2
        ).alias("x"),
        F.round(
            F.sum(F.when(F.col("ts") >= split, F.col("value")).otherwise(0.0)), 2
        ).alias("y"),
    ).withColumn(
        "variant",
        F.when(hash_bucket(F.col("user_id").cast("string")) < 500, "A").otherwise("B"),
    ).localCheckpoint(eager=True)  # consumed twice (moments + per-variant
    # report) — fold the events ONCE, not per consumer
    m = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    ).select(
        # try_divide: zero covariate variance (single-row slice) makes
        # theta undefined -> NULL adjustment, not a crash
        F.try_divide(
            F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"),
            F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"),
        ).alias("th"),
        (F.col("sx") / F.col("n")).alias("mean_x"),
    )
    return (
        per_user.crossJoin(F.broadcast(m))
        .groupBy("variant")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.round(F.avg("y"), 4).alias("mean_metric"),
            F.round(
                F.avg(F.col("y") - F.col("th") * (F.col("x") - F.col("mean_x"))), 4
            ).alias("mean_adjusted"),
            F.round(F.any_value("th"), 6).alias("theta"),
        )
        .orderBy("variant")
    )


_ORACLE_POWER = f"""
WITH per_user AS (
    SELECT user_id,
           CASE WHEN {_duck_bucket("user_id::VARCHAR")} < 500 THEN 'A' ELSE 'B' END
               AS variant,
           ROUND(SUM(value), 2) AS y
    FROM events
    GROUP BY user_id
), g AS (
    SELECT variant, COUNT(*) AS n, AVG(y) AS mean_y, VAR_SAMP(y) AS var_y
    FROM per_user GROUP BY variant
), pooled AS (
    SELECT SUM(n) AS n_total,
           SUM((n - 1) * var_y) / (SUM(n) - 2) AS pooled_var,
           SUM(n * mean_y) / SUM(n) AS grand_mean,
           MIN(n) AS n_min
    FROM g
)
SELECT CAST(n_total AS BIGINT) AS n_users,
       ROUND(SQRT(pooled_var), 4) AS pooled_sd,
       ROUND((1.959964 + 0.841621) * SQRT(2.0 * pooled_var / n_min), 4) AS mde_abs,
       ROUND((1.959964 + 0.841621) * SQRT(2.0 * pooled_var / n_min)
             / grand_mean, 6) AS mde_rel
FROM pooled
"""


@query("q_ab_power", oracle=_ORACLE_POWER)
def ab_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment design companion to q_ab_cuped: the minimum
    detectable effect at α=0.05 (two-sided), power=0.80 given the
    CURRENT traffic split — MDE = (z₀.₉₇₅+z₀.₈)·√(2σ²/n) with the
    z constants as literals (identical on both engines; no inverse-CDF
    dependency). Pooled variance from per-variant streaming moments —
    two rows leave the aggregation; everything else is driver-sized
    arithmetic. The metric folds per user first (cents-rounded), the
    same shuffle as the readout query."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.round(F.sum("value"), 2).alias("y")
    ).withColumn(
        "variant",
        F.when(hash_bucket(F.col("user_id").cast("string")) < 500, "A").otherwise("B"),
    )
    g = per_user.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("y").alias("mean_y"),
        F.var_samp("y").alias("var_y"),
    )
    pooled = g.agg(
        F.sum("n").alias("n_total"),
        (F.sum((F.col("n") - 1) * F.col("var_y")) / (F.sum("n") - 2)).alias(
            "pooled_var"
        ),
        (F.sum(F.col("n") * F.col("mean_y")) / F.sum("n")).alias("grand_mean"),
        F.min("n").alias("n_min"),
    )
    z = 1.959964 + 0.841621
    mde = z * F.sqrt(2.0 * F.col("pooled_var") / F.col("n_min"))
    return pooled.select(
        F.col("n_total").cast("long").alias("n_users"),
        F.round(F.sqrt("pooled_var"), 4).alias("pooled_sd"),
        F.round(mde, 4).alias("mde_abs"),
        F.round(mde / F.col("grand_mean"), 6).alias("mde_rel"),
    )
