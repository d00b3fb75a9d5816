"""Pivot / unpivot (wide↔long reshaping).

Scale notes:
- pivot with EXPLICIT values compiles to one pass of conditional
  aggregation (no extra job); omitting the value list makes Spark run
  a distinct-scan first — always pass the list at scale.
- unpivot is an Expand (rows × n_metrics) — column pruning before
  unpivot matters because every surviving column is replicated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table

_STATUSES = ["F", "O", "P"]

_ORACLE_PIVOT = """
SELECT o_orderpriority AS priority,
       ROUND(SUM(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) AS total_F,
       ROUND(SUM(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2) AS total_O,
       ROUND(SUM(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2) AS total_P
FROM orders
GROUP BY o_orderpriority
ORDER BY priority
"""


@query("q_pivot", oracle=_ORACLE_PIVOT)
def pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    df = (
        o.groupBy(F.col("o_orderpriority").alias("priority"))
        .pivot("o_orderstatus", _STATUSES)
        .agg(F.round(F.sum("o_totalprice"), 2))
    )
    renamed = df.select(
        "priority", *[F.col(s).alias(f"total_{s}") for s in _STATUSES]
    )
    return renamed.orderBy("priority")


_ORACLE_UNPIVOT = """
SELECT p_partkey AS part_key, 'size' AS metric, CAST(p_size AS DOUBLE) AS metric_value
FROM part
UNION ALL
SELECT p_partkey AS part_key, 'retailprice' AS metric, p_retailprice AS metric_value
FROM part
ORDER BY part_key, metric
"""


@query("q_unpivot", oracle=_ORACLE_UNPIVOT)
def unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return (
        p.select(
            F.col("p_partkey").alias("part_key"),
            F.col("p_size").cast("double").alias("size"),
            F.col("p_retailprice").alias("retailprice"),
        )
        .unpivot("part_key", ["size", "retailprice"], "metric", "metric_value")
        .orderBy("part_key", "metric")
    )
