"""Equal-frequency discretization (quantile binning) — turn a
continuous column into decile features, with per-bin diagnostics.

Feature preparation surface for the training-pipeline north star
(BASELINE.json): binning is the standard numeric→categorical step,
and the per-bin summary (bounds, count, mean) is what a feature
report shows. Equal-frequency (NTILE) rather than equal-width: skewed
monetary columns put 90% of rows in one equal-width bin.

Scale design (100 TB): NTILE needs a total order — a single-partition
sort at the limit. The scale path is approx_percentile to get the 9
cut points (one pass, mergeable sketch, broadcast the cuts back as a
literal CASE/bucket expression — same model-state-on-driver
discipline as k-means). That path is implemented here as
`bin_by_quantiles`; the NTILE form is kept as the exact-semantics
query because it is what the oracle can express exactly. The
diagnostics agg after either form is an ordinary hash agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table

_NBINS = 10

_ORACLE_BINNING = f"""
WITH binned AS (
    SELECT c_acctbal,
           NTILE({_NBINS}) OVER (ORDER BY c_acctbal, c_custkey) AS bin
    FROM customer
)
SELECT bin,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(MIN(c_acctbal), 2) AS lo,
       ROUND(MAX(c_acctbal), 2) AS hi,
       ROUND(AVG(c_acctbal), 4) AS mean_bal
FROM binned
GROUP BY bin
ORDER BY bin
"""


@query("q_feature_binning", oracle=_ORACLE_BINNING)
def feature_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile bins of customer balance + per-bin bounds/count/mean.
    Ties broken by c_custkey so bin assignment is total and
    deterministic cross-engine."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.orderBy("c_acctbal", "c_custkey")
    return (
        c.select("c_acctbal", F.ntile(_NBINS).over(w).alias("bin"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("c_acctbal"), 2).alias("lo"),
            F.round(F.max("c_acctbal"), 2).alias("hi"),
            F.round(F.avg("c_acctbal"), 4).alias("mean_bal"),
        )
        .orderBy("bin")
    )


def bin_by_quantiles(
    df: DataFrame, col: str, nbins: int = _NBINS, accuracy: int = 10_000
) -> DataFrame:
    """100 TB path: approximate cut points in one sketch pass, then a
    map-only bucket assignment (no global sort, no window shuffle).
    Bin ids are 1-based like NTILE but boundaries are approximate."""
    probs = [i / nbins for i in range(1, nbins)]
    cuts = df.agg(
        F.percentile_approx(col, probs, accuracy).alias("cuts")
    ).collect()[0]["cuts"]
    expr = F.lit(1)
    for c in cuts:  # monotone thresholds -> sum of indicators
        expr = expr + F.when(F.col(col) > F.lit(float(c)), 1).otherwise(0)
    return df.withColumn("bin", expr)


# ---------------------------------------------------------------------------
# Equi-WIDTH histogram (fixed-width bins over the data's own range)
# — the counterpart to q_feature_binning's equi-frequency deciles.
# ---------------------------------------------------------------------------

_ORACLE_HIST_EQUIWIDTH = """
WITH b AS (
    SELECT MIN(l_extendedprice) AS lo, MAX(l_extendedprice) AS hi
    FROM lineitem
)
SELECT CAST(CASE WHEN hi = lo THEN 0
            ELSE LEAST(FLOOR((l_extendedprice - lo) / ((hi - lo) / 20)), 19)
       END AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(MIN(l_extendedprice), 4) AS bin_lo,
       ROUND(MAX(l_extendedprice), 4) AS bin_hi
FROM lineitem, b
GROUP BY 1
ORDER BY bin
"""


@query("q_histogram_equiwidth", oracle=_ORACLE_HIST_EQUIWIDTH)
def histogram_equiwidth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """20-bin equi-width histogram of l_extendedprice; the top edge
    closes into the last bin (LEAST(..., 19)).

    Scale design (100 TB): two scans, both trivially parallel — a
    min/max agg (2 doubles broadcast back) and one hash agg keyed by
    bin (≤20 groups after map-side combine). The bin expression is
    identical IEEE algebra on both engines ((x-lo)/((hi-lo)/20),
    FLOOR), so the assignment is cross-engine deterministic even at
    bin boundaries. Equi-frequency (quantile) binning with its
    sampled cut-points is q_feature_binning; this is the fixed-grid
    profile a dashboard or drift monitor wants.
    """
    li = load_table(spark, sf_dir, "lineitem")
    bounds = li.agg(
        F.min("l_extendedprice").alias("lo"), F.max("l_extendedprice").alias("hi")
    )
    x = F.col("l_extendedprice")
    # degenerate-range guard: a constant column (hi == lo) would make the
    # bin expression 0/0 = NaN on both engines; pin it to bin 0 instead
    # (mirrored in the oracle SQL's CASE)
    bin_col = F.when(F.col("hi") == F.col("lo"), F.lit(0)).otherwise(
        F.least(
            F.floor((x - F.col("lo")) / ((F.col("hi") - F.col("lo")) / F.lit(20))),
            F.lit(19),
        )
    ).cast("long")
    return (
        li.crossJoin(F.broadcast(bounds))
        .groupBy(bin_col.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min(x), 4).alias("bin_lo"),
            F.round(F.max(x), 4).alias("bin_hi"),
        )
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# Feature scaling — z-score and min-max normalization per stratum
# (the last step before features leave the warehouse for training).
# Group stats are a groups-sized broadcast back under the fact (the
# model-vs-data split again); the scaling itself is map-side codegen.
# ---------------------------------------------------------------------------

_ORACLE_SCALING = """
WITH s AS (
    SELECT c_mktsegment,
           AVG(c_acctbal) AS mu, STDDEV_SAMP(c_acctbal) AS sigma,
           MIN(c_acctbal) AS lo, MAX(c_acctbal) AS hi
    FROM customer GROUP BY c_mktsegment
)
SELECT c.c_custkey AS cust_key,
       c.c_mktsegment AS segment,
       ROUND((c.c_acctbal - s.mu) / s.sigma, 6) AS acctbal_zscore,
       ROUND((c.c_acctbal - s.lo) / (s.hi - s.lo), 6) AS acctbal_minmax
FROM customer c JOIN s ON c.c_mktsegment = s.c_mktsegment
ORDER BY cust_key
"""


@query("q_feature_scaling", oracle=_ORACLE_SCALING)
def feature_scaling(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    stats = cust.groupBy("c_mktsegment").agg(
        F.avg("c_acctbal").alias("mu"),
        F.stddev_samp("c_acctbal").alias("sigma"),
        F.min("c_acctbal").alias("lo"),
        F.max("c_acctbal").alias("hi"),
    )
    return (
        cust.join(F.broadcast(stats), "c_mktsegment")
        .select(
            F.col("c_custkey").alias("cust_key"),
            F.col("c_mktsegment").alias("segment"),
            F.round(
                F.try_divide(F.col("c_acctbal") - F.col("mu"), F.col("sigma")), 6
            ).alias(
                "acctbal_zscore"
            ),
            F.round(
                # try_divide: constant column (single-row slice) has
                # zero range/sigma -> NULL scaled value
                F.try_divide(
                    F.col("c_acctbal") - F.col("lo"), F.col("hi") - F.col("lo")
                ),
                6,
            ).alias("acctbal_minmax"),
        )
        .orderBy("cust_key")
    )


_ORACLE_HIST2D = """
SELECT CAST(FLOOR((l_quantity - 1) / 10) AS BIGINT) AS qty_bin,
       CAST(FLOOR(ROUND(l_discount * 100) / 2) AS BIGINT) AS disc_bin,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(l_extendedprice), 2) AS revenue
FROM lineitem
GROUP BY qty_bin, disc_bin
ORDER BY qty_bin, disc_bin
"""


@query("q_histogram_2d", oracle=_ORACLE_HIST2D)
def histogram_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D histogram (quantity band × discount band) with revenue per
    cell — the heatmap behind pricing analysis. Pure map-side binning
    + one bounded-cell aggregation (≤ 5×8 cells whatever the volume).
    Discount bins go through ROUND before FLOOR: 0.29·100 is
    28.999…96 in IEEE, and while BOTH engines would floor it the same
    (same doubles), the rounded spelling also matches the bin's
    intended semantics."""
    li = load_table(spark, sf_dir, "lineitem")
    qty_bin = F.floor((F.col("l_quantity") - 1) / 10).cast("long")
    disc_bin = F.floor(F.round(F.col("l_discount") * 100, 0) / 2).cast("long")
    return (
        li.groupBy(qty_bin.alias("qty_bin"), disc_bin.alias("disc_bin"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
        )
        .orderBy("qty_bin", "disc_bin")
    )


_ORACLE_IMPUTE = """
WITH flagged AS (
    SELECT c_nationkey,
           CASE WHEN c_acctbal >= 0 THEN c_acctbal END AS bal
    FROM customer
), med AS (
    SELECT c_nationkey, quantile_disc(bal, 0.5) AS group_median
    FROM flagged WHERE bal IS NOT NULL GROUP BY c_nationkey
)
SELECT f.c_nationkey AS nation_key,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) FILTER (WHERE f.bal IS NULL) AS BIGINT) AS n_imputed,
       ROUND(m.group_median, 2) AS group_median,
       ROUND(AVG(COALESCE(f.bal, m.group_median)), 4) AS mean_after_impute
FROM flagged f JOIN med m ON f.c_nationkey = m.c_nationkey
GROUP BY f.c_nationkey, m.group_median
ORDER BY nation_key
"""


@query("q_impute_median", oracle=_ORACLE_IMPUTE)
def impute_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-median imputation — the ML-prep staple: treat negative
    account balances as missing, fill each with its nation's median of
    the observed values, report the imputation census per group.

    Two passes by construction (like winsorization: the cut statistic
    needs the group first): pass 1 computes per-group DISCRETE medians
    (an actual observed value — exact cross-engine, no interpolation
    rounding), broadcast back; pass 2 fills and re-aggregates. At
    100 TB both passes are plain aggregations; the median table is
    groups-sized."""
    cust = load_table(spark, sf_dir, "customer")
    flagged = cust.select(
        "c_nationkey",
        F.when(F.col("c_acctbal") >= 0, F.col("c_acctbal")).alias("bal"),
    )
    observed = flagged.filter(F.col("bal").isNotNull())
    w = Window.partitionBy("c_nationkey").orderBy("bal")
    ranked = observed.select(
        "c_nationkey",
        "bal",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("c_nationkey")).alias("n"),
    )
    med = ranked.groupBy("c_nationkey").agg(
        F.min(
            F.when(F.col("rn") >= F.ceil(0.5 * F.col("n")), F.col("bal"))
        ).alias("group_median")
    )
    return (
        flagged.join(F.broadcast(med), "c_nationkey")
        .groupBy(F.col("c_nationkey").alias("nation_key"), "group_median")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.count(F.when(F.col("bal").isNull(), 1)).cast("long").alias("n_imputed"),
            F.round(
                F.avg(F.coalesce(F.col("bal"), F.col("group_median"))), 4
            ).alias("mean_after_impute"),
        )
        .select(
            "nation_key",
            "n_rows",
            "n_imputed",
            F.round("group_median", 2).alias("group_median"),
            "mean_after_impute",
        )
        .orderBy("nation_key")
    )


_ORACLE_ACTIVITY = """
SELECT dayofweek(ts) AS dow,
       CAST(hour(ts) AS BIGINT) AS hour,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
GROUP BY dow, hour
ORDER BY dow, hour
"""


@query("q_activity_heatmap", oracle=_ORACLE_ACTIVITY)
def activity_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday × hour activity heatmap (events + distinct users per
    cell) — the product-analytics "when are users here" grid. Pure
    map-side time-part extraction into a 7×24-bounded cell rollup; the
    distinct-user count shuffles (cell, user) pairs only. A14 dow shim
    applies."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            (F.dayofweek("ts") - 1).alias("dow"),  # A14: DuckDB 0=Sun
            F.hour("ts").cast("long").alias("hour"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
        .orderBy("dow", "hour")
    )


# ---------------------------------------------------------------------------
# Fused pure-SQL ML inference (round 5) — scoring a trained linear /
# logistic model IS a map-only scan when the weights are literals
# (the operator-fusion observation of the ICDE'25 pure-SQL inference
# line, PAPERS.md): feature engineering, the dot product, the sigmoid
# link, and the decision bucket all fuse into one whole-stage-codegen
# projection — no UDF, no shuffle until the tiny decile report. At
# 100 TB this is THE shape batch inference should take: weights ride
# the plan as constants (or a broadcast row for wide models), and the
# scan's filter/pruning behavior is untouched.
#
# Weights below are fixture literals standing in for a trained model
# (training itself is covered by q_grouped_regression / q_kmeans_*).
# EXP parity across engines is the same contract q_text_bm25 pins for
# LN; ROUND(6) before bucketing keeps the decile edges identical.
# ---------------------------------------------------------------------------

_ML_W = (-2.5, 0.9, 1.4, -0.7)  # intercept, price_z, urgency, month_pos

_ORACLE_ML_INFER = f"""
WITH feat AS (
    SELECT o_orderkey,
           (o_totalprice - 150000.0) / 100000.0 AS price_z,
           CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1.0 ELSE 0.0 END AS urgency,
           CAST(EXTRACT(DAY FROM o_orderdate) AS DOUBLE) / 31.0 AS month_pos
    FROM orders
),
scored AS (
    SELECT o_orderkey,
           ROUND(1.0 / (1.0 + EXP(-({_ML_W[0]} + {_ML_W[1]} * price_z
                 + {_ML_W[2]} * urgency + {_ML_W[3]} * month_pos))), 6)
               AS score
    FROM feat
)
SELECT CAST(FLOOR(score * 10) AS INTEGER) AS decile,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(AVG(score), 6) AS mean_score,
       ROUND(MIN(score), 6) AS min_score,
       ROUND(MAX(score), 6) AS max_score
FROM scored
GROUP BY 1
ORDER BY decile
"""


@query("q_ml_inference_sql", oracle=_ORACLE_ML_INFER)
def ml_inference_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Literal-weight logistic scoring fused into the scan, reduced to
    a decile report (the full per-row frame is the same plan minus the
    final aggregation)."""
    orders = load_table(spark, sf_dir, "orders")
    w0, w1, w2, w3 = (F.lit(w) for w in _ML_W)
    price_z = (F.col("o_totalprice") - F.lit(150000.0)) / F.lit(100000.0)
    urgency = (
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1.0)
        .otherwise(0.0)
    )
    month_pos = F.dayofmonth("o_orderdate").cast("double") / F.lit(31.0)
    z = w0 + w1 * price_z + w2 * urgency + w3 * month_pos
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
    return (
        orders.select(score.alias("score"))
        .groupBy(F.floor(F.col("score") * 10).cast("int").alias("decile"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.avg("score"), 6).alias("mean_score"),
            F.round(F.min("score"), 6).alias("min_score"),
            F.round(F.max("score"), 6).alias("max_score"),
        )
        .orderBy("decile")
    )
