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


# ---------------------------------------------------------------------------
# Difference-in-differences (round 4; Card & Krueger-style two-period
# two-group estimator, public literature): the quasi-experimental
# companion to the randomized A/B path — when assignment is NOT
# randomized (a feature shipped to one cohort), DiD removes both the
# group-level baseline difference and the common time trend:
# DiD = (T_post − T_pre) − (C_post − C_pre). The whole estimator plus
# its large-sample standard error reduces to per-cell (n, Σ, Σ²)
# sufficient statistics — ONE map-side-combined aggregation over
# events at any scale, the q_ab_cuped economics.
#
# Determinism: "treated" is the portable md5 user bucket (identical
# cross-engine), the period split is a literal timestamp, cell sums
# are integer cents, and the variance/SE algebra divides exact
# integers (IEEE-identical) with report-time rounding only.
# ---------------------------------------------------------------------------

_DID_SPLIT = "2024-01-16 00:00:00"

_ORACLE_DID = f"""
WITH cells AS (
    SELECT ({_duck_bucket("user_id::VARCHAR")} < 500) AS treated,
           (ts >= TIMESTAMP '{_DID_SPLIT}') AS post,
           CAST(COUNT(*) AS BIGINT) AS n,
           SUM(CAST(ROUND(value * 100) AS BIGINT)) AS s,
           SUM(CAST(ROUND(value * 100) AS BIGINT)
               * CAST(ROUND(value * 100) AS BIGINT)) AS ssq
    FROM events
    WHERE event_type = 'purchase'
    GROUP BY treated, post
), m AS (
    SELECT
      MAX(CASE WHEN treated AND post THEN s * 1.0 / n END) AS tp,
      MAX(CASE WHEN treated AND NOT post THEN s * 1.0 / n END) AS tb,
      MAX(CASE WHEN NOT treated AND post THEN s * 1.0 / n END) AS cp,
      MAX(CASE WHEN NOT treated AND NOT post THEN s * 1.0 / n END) AS cb,
      SUM(CASE WHEN treated AND post THEN (ssq * 1.0 / n - (s * 1.0 / n) * (s * 1.0 / n)) / n END) AS v1,
      SUM(CASE WHEN treated AND NOT post THEN (ssq * 1.0 / n - (s * 1.0 / n) * (s * 1.0 / n)) / n END) AS v2,
      SUM(CASE WHEN NOT treated AND post THEN (ssq * 1.0 / n - (s * 1.0 / n) * (s * 1.0 / n)) / n END) AS v3,
      SUM(CASE WHEN NOT treated AND NOT post THEN (ssq * 1.0 / n - (s * 1.0 / n) * (s * 1.0 / n)) / n END) AS v4,
      CAST(SUM(n) AS BIGINT) AS n_events
    FROM cells
)
SELECT ROUND(tb / 100.0, 2) AS treat_pre,
       ROUND(tp / 100.0, 2) AS treat_post,
       ROUND(cb / 100.0, 2) AS control_pre,
       ROUND(cp / 100.0, 2) AS control_post,
       ROUND(((tp - tb) - (cp - cb)) / 100.0, 2) AS did_estimate,
       ROUND(SQRT(v1 + v2 + v3 + v4) / 100.0, 4) AS did_se,
       n_events
FROM m
"""


@query("q_diff_in_diff", oracle=_ORACLE_DID)
def diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    cents = F.round(F.col("value") * 100).cast("long")
    cells = (
        ev.groupBy(
            (hash_bucket(F.col("user_id").cast("string")) < 500).alias("treated"),
            (F.col("ts") >= F.lit(_DID_SPLIT).cast("timestamp")).alias("post"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(cents).alias("s"),
            F.sum(cents * cents).alias("ssq"),
        )
    )
    mean = F.col("s") / F.col("n")
    var_of_mean = (F.col("ssq") / F.col("n") - mean * mean) / F.col("n")

    def cell(t: bool, p: bool, col):
        return F.max(
            F.when((F.col("treated") == t) & (F.col("post") == p), col)
        )

    agg = cells.agg(
        cell(True, False, mean).alias("tb"),
        cell(True, True, mean).alias("tp"),
        cell(False, False, mean).alias("cb"),
        cell(False, True, mean).alias("cp"),
        F.sum(var_of_mean).alias("vsum"),
        F.sum("n").cast("long").alias("n_events"),
    )
    return agg.select(
        F.round(F.col("tb") / 100.0, 2).alias("treat_pre"),
        F.round(F.col("tp") / 100.0, 2).alias("treat_post"),
        F.round(F.col("cb") / 100.0, 2).alias("control_pre"),
        F.round(F.col("cp") / 100.0, 2).alias("control_post"),
        F.round(
            ((F.col("tp") - F.col("tb")) - (F.col("cp") - F.col("cb"))) / 100.0, 2
        ).alias("did_estimate"),
        F.round(F.sqrt(F.col("vsum")) / 100.0, 4).alias("did_se"),
        F.col("n_events"),
    )
