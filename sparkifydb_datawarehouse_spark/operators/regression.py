"""Grouped OLS regression and winsorized (outlier-clipped) aggregation
— the in-warehouse modeling layer: "what's the price elasticity per
brand?" and "what's the mean once the tails are clipped?".

Both are single-shuffle shapes at 100 TB:

- OLS per group needs only the 5 classic sufficient statistics
  (n, Σx, Σy, Σxy, Σx²) — all mergeable SUM partials; the slope /
  intercept / r² algebra runs on the per-group aggregate row. No
  matrix library, no iteration, no second pass.
- Winsorization is two passes by construction (you cannot know p05/p95
  until you've seen the group): pass 1 computes the exact per-group
  quantile cut-points (bounded groups here; approx_percentile is the
  documented unbounded-cardinality swap-in), pass 2 re-aggregates the
  clipped values. The cut-point table is groups-sized and broadcast.

Float discipline (ORACLES.md): the regression inputs are log-
transformed — a libm transcendental — so each x/y is rounded to 6
BEFORE any sum; both engines then aggregate identical doubles and the
final ratios are rounded. Winsorized means are rounded at 2 on ~1e9
magnitude sums (drift ~1e-5, far inside the rounding).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table

_ORACLE_OLS = """
WITH pts AS (
    SELECT p.p_brand AS brand,
           ROUND(LN(l.l_extendedprice / l.l_quantity), 6) AS x,
           ROUND(LN(l.l_quantity), 6) AS y
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
), s AS (
    SELECT brand, COUNT(*) AS n,
           SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
           SUM(x * x) AS sxx, SUM(y * y) AS syy
    FROM pts
    GROUP BY brand
)
SELECT brand,
       CAST(n AS BIGINT) AS n_points,
       ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) AS slope,
       ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 4) AS intercept,
       ROUND(POWER(n * sxy - sx * sy, 2)
             / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 4) AS r2
FROM s
ORDER BY brand
"""


@query("q_regression_slope", oracle=_ORACLE_OLS)
def regression_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-log OLS per brand: slope = price elasticity of quantity.
    One shuffle (the brand aggregation); everything after runs on one
    row per brand."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    pts = li.join(part, li.l_partkey == part.p_partkey).select(
        F.col("p_brand").alias("brand"),
        F.round(F.log(F.col("l_extendedprice") / F.col("l_quantity")), 6).alias("x"),
        F.round(F.log("l_quantity"), 6).alias("y"),
    )
    s = pts.groupBy("brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return s.select(
        "brand",
        F.col("n").cast("long").alias("n_points"),
        F.round(num / den, 4).alias("slope"),
        F.round((F.col("sy") - num / den * F.col("sx")) / F.col("n"), 4).alias(
            "intercept"
        ),
        F.round(
            F.pow(num, 2)
            / (den * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))),
            4,
        ).alias("r2"),
    ).orderBy("brand")


_ORACLE_WINSOR = """
WITH cuts AS (
    SELECT l_returnflag AS return_flag,
           quantile_cont(l_extendedprice, 0.05) AS lo,
           quantile_cont(l_extendedprice, 0.95) AS hi
    FROM lineitem
    GROUP BY l_returnflag
)
SELECT l.l_returnflag AS return_flag,
       COUNT(*) AS n_rows,
       COUNT(*) FILTER (WHERE l.l_extendedprice < c.lo OR l.l_extendedprice > c.hi)
           AS n_clipped,
       ROUND(AVG(LEAST(GREATEST(l.l_extendedprice, c.lo), c.hi)), 2) AS winsorized_mean,
       ROUND(AVG(l.l_extendedprice), 2) AS raw_mean
FROM lineitem l
JOIN cuts c ON l.l_returnflag = c.return_flag
GROUP BY l.l_returnflag
ORDER BY return_flag
"""


@query("q_winsorized_agg", oracle=_ORACLE_WINSOR)
def winsorized_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean per return flag: clip at the exact per-group
    [p05, p95] (pass 1, broadcast cut-point table) then re-aggregate
    (pass 2). The clipped-vs-raw delta is the outlier influence.

    SCALE NOTE: `F.percentile` is EXACT — it buffers every value of
    the group in the aggregation buffer, and group SIZE here is
    fact-scale (3 return flags over all of lineitem), so this exact
    form is the oracle-parity/fixture form only. At warehouse scale
    pass 1 must be `F.approx_percentile(col, [0.05, 0.95], 10000)` —
    a mergeable t-digest sketch with bounded memory per group — as
    q_agg_robust_stats_approx does for MAD; the cut-points move within
    sketch error and the winsorized mean is stable to it. Pass 2 is
    unchanged (broadcast cuts + one hash agg) in either form."""
    li = load_table(spark, sf_dir, "lineitem")
    cuts = li.groupBy(F.col("l_returnflag").alias("return_flag")).agg(
        F.percentile("l_extendedprice", F.lit(0.05)).alias("lo"),
        F.percentile("l_extendedprice", F.lit(0.95)).alias("hi"),
    )
    clipped = F.least(F.greatest(F.col("l_extendedprice"), F.col("lo")), F.col("hi"))
    return (
        li.join(
            F.broadcast(cuts), li.l_returnflag == cuts.return_flag
        )
        .groupBy("return_flag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count(
                F.when(
                    (F.col("l_extendedprice") < F.col("lo"))
                    | (F.col("l_extendedprice") > F.col("hi")),
                    1,
                )
            ).alias("n_clipped"),
            F.round(F.avg(clipped), 2).alias("winsorized_mean"),
            F.round(F.avg("l_extendedprice"), 2).alias("raw_mean"),
        )
        .orderBy("return_flag")
    )


_ORACLE_KFOLD = """
WITH pts AS (
    SELECT (('0x' || substr(md5(l_orderkey::VARCHAR || '#' || l_linenumber::VARCHAR), 1, 15))::BIGINT % 1000) % 5 AS fold,
           ROUND(LN(l_extendedprice / l_quantity), 6) AS x,
           ROUND(LN(l_quantity), 6) AS y
    FROM lineitem
), per_fold AS (
    SELECT fold, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
           SUM(x * y) AS sxy, SUM(x * x) AS sxx
    FROM pts
    GROUP BY fold
), tot AS (
    SELECT SUM(n) AS tn, SUM(sx) AS tsx, SUM(sy) AS tsy,
           SUM(sxy) AS tsxy, SUM(sxx) AS tsxx
    FROM per_fold
), params AS (
    SELECT fold,
           ((tn - n) * (tsxy - sxy) - (tsx - sx) * (tsy - sy))
               / ((tn - n) * (tsxx - sxx) - (tsx - sx) * (tsx - sx)) AS slope,
           ((tsy - sy) - ((tn - n) * (tsxy - sxy) - (tsx - sx) * (tsy - sy))
               / ((tn - n) * (tsxx - sxx) - (tsx - sx) * (tsx - sx)) * (tsx - sx))
               / (tn - n) AS icept
    FROM per_fold, tot
)
SELECT p.fold,
       COUNT(*) AS n_test,
       ROUND(ANY_VALUE(pa.slope), 4) AS slope_train,
       ROUND(SQRT(AVG(POWER(p.y - pa.icept - pa.slope * p.x, 2))), 6) AS rmse_test
FROM pts p JOIN params pa ON p.fold = pa.fold
GROUP BY p.fold
ORDER BY p.fold
"""


@query("q_kfold_metrics", oracle=_ORACLE_KFOLD)
def kfold_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-fold cross-validated OLS via leave-one-out ALGEBRA: the
    complement's sufficient statistics are totals − fold statistics, so
    "train on 4/5, test on 1/5" ×5 costs ONE aggregation pass plus one
    scoring pass — never 5 re-trainings. Folds are the portable md5
    bucket mod 5 (deterministic cross-engine). The scoring pass joins
    the 5-row broadcast parameter table back against the (pinned)
    point set. This is the warehouse-native model-selection loop at
    100 TB: both passes are plain mergeable aggregations.
    """
    from .sampling import hash_bucket

    li = load_table(spark, sf_dir, "lineitem")
    pts = li.select(
        (
            hash_bucket(
                F.concat_ws(
                    "#",
                    F.col("l_orderkey").cast("string"),
                    F.col("l_linenumber").cast("string"),
                )
            )
            % 5
        ).alias("fold"),
        F.round(F.log(F.col("l_extendedprice") / F.col("l_quantity")), 6).alias("x"),
        F.round(F.log("l_quantity"), 6).alias("y"),
    ).localCheckpoint(eager=True)  # consumed by the stats pass AND the scoring pass
    per_fold = pts.groupBy("fold").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    tot = per_fold.agg(
        F.sum("n").alias("tn"),
        F.sum("sx").alias("tsx"),
        F.sum("sy").alias("tsy"),
        F.sum("sxy").alias("tsxy"),
        F.sum("sxx").alias("tsxx"),
    )
    j = per_fold.crossJoin(F.broadcast(tot))
    num = (F.col("tn") - F.col("n")) * (F.col("tsxy") - F.col("sxy")) - (
        F.col("tsx") - F.col("sx")
    ) * (F.col("tsy") - F.col("sy"))
    den = (F.col("tn") - F.col("n")) * (F.col("tsxx") - F.col("sxx")) - (
        F.col("tsx") - F.col("sx")
    ) * (F.col("tsx") - F.col("sx"))
    params = j.select(
        "fold",
        # try_divide: a fold whose training complement is a single
        # point (degenerate slice) has no defined OLS fit -> NULL
        F.try_divide(num, den).alias("slope"),
        (
            F.try_divide(
                (F.col("tsy") - F.col("sy"))
                - F.try_divide(num, den) * (F.col("tsx") - F.col("sx")),
                F.col("tn") - F.col("n"),
            )
        ).alias("icept"),
    )
    return (
        pts.join(F.broadcast(params), "fold")
        .groupBy("fold")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.round(F.any_value("slope"), 4).alias("slope_train"),
            F.round(
                F.sqrt(
                    F.avg(
                        F.pow(
                            F.col("y") - F.col("icept") - F.col("slope") * F.col("x"),
                            2,
                        )
                    )
                ),
                6,
            ).alias("rmse_test"),
        )
        .orderBy("fold")
    )


# ---------------------------------------------------------------------------
# Grouped OLS: one regression PER GROUP in a single aggregation pass —
# here, discount elasticity of demand per part brand (does a deeper
# discount move quantity?). The q_regression_slope sufficient-
# statistic algebra, lifted from one global fit to thousands of
# concurrent per-key fits: the whole model fleet is ONE hash agg.
# ---------------------------------------------------------------------------

_ORACLE_GROUPED_OLS = """
WITH pts AS (
    SELECT p.p_brand AS brand,
           CAST(ROUND(l.l_discount * 100) AS BIGINT) AS x,
           CAST(l.l_quantity AS BIGINT) AS y
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
), suff AS (
    SELECT brand,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(x) AS BIGINT) AS sx,
           CAST(SUM(y) AS BIGINT) AS sy,
           CAST(SUM(x * y) AS BIGINT) AS sxy,
           CAST(SUM(x * x) AS BIGINT) AS sxx
    FROM pts GROUP BY brand
)
SELECT brand, n,
       ROUND((n * sxy - sx * sy) * 1.0 / (n * sxx - sx * sx), 6) AS slope,
       ROUND((sy * 1.0 * sxx - sx * 1.0 * sxy) * 1.0 / (n * sxx - sx * sx), 4)
           AS intercept
FROM suff
WHERE n * sxx - sx * sx <> 0
ORDER BY brand
"""


@query("q_grouped_regression", oracle=_ORACLE_GROUPED_OLS)
def grouped_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand OLS of quantity on discount points: slope is units
    of quantity per discount percentage point (the elasticity sign
    check), intercept the zero-discount baseline.

    Scale design: the five sufficient statistics (n, Σx, Σy, Σxy,
    Σx²) are all map-side-combinable BIGINTs — x is discount in whole
    points (0..10), y quantity, so every product stays far under
    2^63 at any n — and the fit itself is a per-group scalar
    expression. One fact-dim broadcast join, one hash agg, zero
    iterations: this is why warehouses fit millions of tiny models as
    ONE query. Degenerate groups (no x variance) are excluded on both
    engines by the same integer predicate.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.round(F.col("l_discount") * 100, 0).cast("long").alias("x"),
        F.col("l_quantity").cast("long").alias("y"),
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_brand").alias("brand")
    )
    pts = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    suff = pts.groupBy("brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    det = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return (
        suff.filter(det != 0)
        .select(
            "brand",
            "n",
            F.round(
                (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) * 1.0 / det,
                6,
            ).alias("slope"),
            F.round(
                (
                    F.col("sy") * 1.0 * F.col("sxx")
                    - F.col("sx") * 1.0 * F.col("sxy")
                )
                * 1.0
                / det,
                4,
            ).alias("intercept"),
        )
        .orderBy("brand")
    )
