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
