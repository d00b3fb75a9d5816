"""Statistical aggregates: stddev/variance/correlation/covariance,
exact interpolated percentiles, grouping sets.

Scale notes:
- stddev/var/corr/covar are single-pass streaming moments (partial +
  final merge) — same shuffle shape as SUM.
- Exact percentile requires collecting the group's values (Spark
  `percentile` buffers per group) — fine for bounded groups; use
  approx_percentile (t-digest, streaming) for unbounded groups at
  100 TB. Both are exposed.
- GROUPING SETS compiles to Expand like rollup/cube but with exactly
  the requested sets — cheaper than cube when only a few sets matter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table, load_all

_ORACLE_STATS = """
SELECT l_returnflag AS return_flag,
       ROUND(STDDEV_SAMP(l_extendedprice), 4) AS std_price,
       ROUND(VAR_SAMP(l_extendedprice), 2) AS var_price,
       ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr_qty_price,
       ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 4) AS covar_qty_price
FROM lineitem
GROUP BY l_returnflag
ORDER BY return_flag
"""


@query("q_agg_stats", oracle=_ORACLE_STATS)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.col("l_returnflag").alias("return_flag"))
        .agg(
            F.round(F.stddev_samp("l_extendedprice"), 4).alias("std_price"),
            F.round(F.var_samp("l_extendedprice"), 2).alias("var_price"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
                "covar_qty_price"
            ),
        )
        .orderBy("return_flag")
    )


_ORACLE_PERCENTILES = """
SELECT l_returnflag AS return_flag,
       ROUND(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
       ROUND(quantile_cont(l_quantity, 0.25), 4) AS p25_qty,
       ROUND(quantile_cont(l_quantity, 0.95), 4) AS p95_qty
FROM lineitem
GROUP BY l_returnflag
ORDER BY return_flag
"""


@query("q_agg_percentiles", oracle=_ORACLE_PERCENTILES)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation percentiles (Spark `percentile` ≡
    DuckDB `quantile_cont`)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.col("l_returnflag").alias("return_flag"))
        .agg(
            F.round(F.percentile("l_quantity", F.lit(0.5)), 4).alias("median_qty"),
            F.round(F.percentile("l_quantity", F.lit(0.25)), 4).alias("p25_qty"),
            F.round(F.percentile("l_quantity", F.lit(0.95)), 4).alias("p95_qty"),
        )
        .orderBy("return_flag")
    )


@query("q_agg_approx_percentiles")  # rows-only: t-digest estimates are engine-specific
def agg_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The unbounded-cardinality scale path: approx_percentile streams
    a t-digest instead of buffering group values."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.col("l_returnflag").alias("return_flag"))
        .agg(
            F.approx_percentile("l_extendedprice", F.lit(0.5), F.lit(10000)).alias(
                "approx_median_price"
            )
        )
        .orderBy("return_flag")
    )


_ORACLE_GROUPING_SETS = """
SELECT o_orderstatus AS order_status,
       o_orderpriority AS order_priority,
       ROUND(SUM(o_totalprice), 2) AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
ORDER BY order_status NULLS FIRST, order_priority NULLS FIRST
"""


@query("q_agg_grouping_sets", oracle=_ORACLE_GROUPING_SETS)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_gs_orders")
    return spark.sql(
        """
        SELECT o_orderstatus AS order_status,
               o_orderpriority AS order_priority,
               ROUND(SUM(o_totalprice), 2) AS total_price
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY order_status ASC NULLS FIRST, order_priority ASC NULLS FIRST
        """
    )


# ---------------------------------------------------------------------------
# Shannon entropy of a categorical column per group — the standard
# "how mixed is this partition" profiling statistic (feature selection,
# drift detection). Two-level aggregation: count per (group, category),
# then fold -p*log2(p) — both levels are hash aggs with map-side
# combine, so at 100 TB the shuffle carries one row per distinct
# (source, event-ish) pair, never raw rows.
# ---------------------------------------------------------------------------

_ORACLE_ENTROPY = """
SELECT source,
       ROUND(entropy(lang), 6) AS lang_entropy,
       COUNT(*) AS n_docs
FROM documents
GROUP BY source
ORDER BY source
"""


@query("q_agg_entropy", oracle=_ORACLE_ENTROPY)
def agg_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n"))
    totals = counts.groupBy("source").agg(F.sum("n").alias("total"))
    p = counts.join(totals, "source").withColumn("p", F.col("n") / F.col("total"))
    # DuckDB's entropy() is log2-based
    return (
        p.groupBy("source")
        .agg(
            F.round(-F.sum(F.col("p") * F.log2("p")), 6).alias("lang_entropy"),
            F.sum("n").alias("n_docs"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Correlation / covariance matrix entries over numeric measures —
# single-pass co-moment aggregation (corr, covar_samp are streaming
# aggregates; one scan, one tiny shuffle, one output row).
# ---------------------------------------------------------------------------

_ORACLE_CORR = """
SELECT ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
       ROUND(corr(l_discount, l_extendedprice), 6) AS corr_disc_price,
       ROUND(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qty_price,
       ROUND(regr_slope(l_extendedprice, l_quantity), 6) AS slope_price_on_qty,
       ROUND(regr_r2(l_extendedprice, l_quantity), 6) AS r2_price_on_qty
FROM lineitem
"""


@query("q_agg_corr", oracle=_ORACLE_CORR)
def agg_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.corr("l_discount", "l_extendedprice"), 6).alias("corr_disc_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
            "covar_qty_price"
        ),
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 6).alias(
            "slope_price_on_qty"
        ),
        F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias(
            "r2_price_on_qty"
        ),
    )


# ---------------------------------------------------------------------------
# Discrete percentile (percentile_disc): the smallest actual VALUE
# whose cumulative share reaches p — always a real data point, unlike
# the interpolated percentile (q_agg_percentiles). Spark has no
# percentile_disc; the exact emulation is the definition itself:
# row_number over the ordered group, pick rank = ceil(p·n). One
# shuffle per group (window), same as any exact percentile.
# ---------------------------------------------------------------------------

_ORACLE_PCT_DISC = """
SELECT l_returnflag AS return_flag,
       quantile_disc(l_extendedprice, 0.50) AS p50_disc,
       quantile_disc(l_extendedprice, 0.95) AS p95_disc
FROM lineitem
GROUP BY l_returnflag
ORDER BY return_flag
"""


@query("q_agg_percentile_disc", oracle=_ORACLE_PCT_DISC)
def agg_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    ranked = li.select(
        "l_returnflag",
        "l_extendedprice",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("l_returnflag")).alias("n"),
    )

    def disc(p: float):
        # smallest value at cumulative rank >= ceil(p*n): DuckDB's
        # quantile_disc picks exactly this element
        return F.min(
            F.when(F.col("rn") >= F.ceil(F.lit(p) * F.col("n")), F.col("l_extendedprice"))
        )

    return (
        ranked.groupBy(F.col("l_returnflag").alias("return_flag"))
        .agg(disc(0.50).alias("p50_disc"), disc(0.95).alias("p95_disc"))
        .orderBy("return_flag")
    )
