"""B17 — UDF surface: row-at-a-time Python UDF and vectorized
Pandas UDF.

Engine guidance (enforced everywhere else in this repo): UDFs are the
slow path. A Python UDF pays per-row serialization + GIL; a Pandas
UDF amortizes over Arrow batches (~10-100x better); a built-in
expression is JVM codegen and beats both. These two queries exist to
exercise the machinery — both compute something SQL-expressible so
the oracle can value-check the UDF results exactly.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType

from ..registry import query
from ..tables import load_table

# ---------------------------------------------------------------------------
# Row-at-a-time scalar UDF: account-balance tiering.
# ---------------------------------------------------------------------------


@F.udf(returnType=StringType())
def _balance_tier(bal: float) -> str | None:
    if bal is None:
        return None
    if bal < 0:
        return "debt"
    if bal < 3000:
        return "low"
    if bal < 7000:
        return "mid"
    return "high"


_ORACLE_UDF_SCALAR = """
SELECT c_custkey AS cust_key,
       CASE WHEN c_acctbal < 0 THEN 'debt'
            WHEN c_acctbal < 3000 THEN 'low'
            WHEN c_acctbal < 7000 THEN 'mid'
            ELSE 'high' END AS tier
FROM customer
ORDER BY cust_key
"""


@query("q_udf_scalar", oracle=_ORACLE_UDF_SCALAR)
def udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    # range-first (optimization r13, guide §2.4): the final orderBy's
    # bound sampling re-evaluated the Python UDF over every row a
    # second time; ranging the scan by the sort key first leaves the
    # UDF exactly one evaluation per row
    c = load_table(spark, sf_dir, "customer").repartitionByRange(
        spark.sparkContext.defaultParallelism, "c_custkey"
    )
    return c.select(
        F.col("c_custkey").alias("cust_key"),
        _balance_tier("c_acctbal").alias("tier"),
    ).sortWithinPartitions("cust_key")


# ---------------------------------------------------------------------------
# Vectorized Pandas UDF: z-score normalization against broadcast
# global moments (the feature-normalization shape of an ML pipeline).
# ---------------------------------------------------------------------------


@F.pandas_udf(DoubleType())
def _zscore(x: pd.Series, mean: pd.Series, std: pd.Series) -> pd.Series:
    return ((x - mean) / std).round(6)


_ORACLE_UDF_PANDAS = """
SELECT event_id,
       ROUND((value - stats.mean_v) / stats.std_v, 6) AS value_z
FROM events, (
    SELECT AVG(value) AS mean_v, STDDEV_SAMP(value) AS std_v FROM events
) stats
ORDER BY event_id
"""


@query("q_udf_pandas", oracle=_ORACLE_UDF_PANDAS)
def udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    stats = ev.agg(
        F.avg("value").alias("mean_v"), F.stddev_samp("value").alias("std_v")
    )
    # range-first + sortWithinPartitions: same single-UDF-evaluation
    # rationale as q_udf_scalar above (optimization r13)
    return (
        ev.repartitionByRange(spark.sparkContext.defaultParallelism, "event_id")
        .crossJoin(F.broadcast(stats))
        .select("event_id", _zscore("value", "mean_v", "std_v").alias("value_z"))
        .sortWithinPartitions("event_id")
    )


# ---------------------------------------------------------------------------
# GROUPED_AGG pandas UDAF — the remaining cell of the UDF matrix
# (scalar python UDF, scalar pandas UDF, grouped-map applyInPandas,
# UDTF are covered elsewhere). A custom aggregate the built-in
# surface lacks: 10%-trimmed mean (robust location estimate).
#
# Scale note: GROUPED_AGG ships each group's COLUMN (not the rows) to
# one python worker via Arrow — per-group memory is the bound, so
# it's for bounded groups (here: 3 return flags × ~200k values at
# sf0.1 is fine; an unbounded-cardinality column would use an
# algebraic reformulation instead). Unlike codegen aggregates there
# is no partial aggregation: the full column value set crosses the
# shuffle — the price of arbitrary Python math, worth paying only
# when the estimator genuinely can't be decomposed (trimmed mean
# can't: the trim bounds depend on the complete distribution).
# ---------------------------------------------------------------------------


def _trimmed_mean_udaf():
    """Built lazily: under `from __future__ import annotations` the
    Series→float hints are strings, eval-type inference fails, and
    pandas_udf then parses the return type EAGERLY — which needs an
    active SparkSession, so a module-level decorator would crash any
    import that precedes session creation (pytest collection did).
    The explicit functionType sidesteps inference entirely."""
    from pyspark.sql.functions import PandasUDFType

    @F.pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def trimmed_mean(x):
        lo, hi = x.quantile(0.10), x.quantile(0.90)  # linear
        # interpolation, same definition as DuckDB quantile_cont
        kept = x[(x >= lo) & (x <= hi)]
        return float(kept.mean())

    return trimmed_mean


_ORACLE_UDAF = """
WITH bounds AS (
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.10) AS lo,
           quantile_cont(l_quantity, 0.90) AS hi
    FROM lineitem GROUP BY l_returnflag
)
SELECT l.l_returnflag AS return_flag,
       ROUND(AVG(l.l_quantity), 4) AS trimmed_mean_qty
FROM lineitem l JOIN bounds b USING (l_returnflag)
WHERE l.l_quantity BETWEEN b.lo AND b.hi
GROUP BY l.l_returnflag
ORDER BY return_flag
"""


@query("q_udaf_trimmed_mean", oracle=_ORACLE_UDAF)
def udaf_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    trimmed_mean = _trimmed_mean_udaf()
    return (
        li.groupBy(F.col("l_returnflag").alias("return_flag"))
        .agg(F.round(trimmed_mean("l_quantity"), 4).alias("trimmed_mean_qty"))
        .orderBy("return_flag")
    )
