"""Greedy capacity allocation: ration a fixed per-part stock across
competing lineitems in ship-date priority order — the warehouse
"allocate inventory to demand" operator (and the window-expressible
core of backlog / fill-rate reporting).

allocated = clamp(capacity − demand_before, 0, qty) where demand_before
is the per-part running sum of earlier-priority quantities. No
iteration, no recursion: one cumulative window PARTITIONED BY part —
every partition is a single part's lineitems, so the sort is bounded
per key and the operator scales linearly at 100 TB (this is the same
per-key-window shape as the sessionizer).

Determinism: quantities are integral, so every running/marginal sum is
an exact integer in a double — immune to cross-engine summation order
(integers < 2^53 add exactly in any order). Priority order carries
(l_shipdate, l_orderkey, l_linenumber): a total order, so both engines
allocate identically. fill_rate is an exact-integer ratio.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table

_CAPACITY = 100  # units of stock per part

_ORACLE_ALLOC = f"""
WITH ranked AS (
    SELECT l_returnflag, l_quantity,
           SUM(l_quantity) OVER (
               PARTITION BY l_partkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS cum
    FROM lineitem
), alloc AS (
    SELECT l_returnflag, l_quantity,
           LEAST(l_quantity, GREATEST({_CAPACITY} - (cum - l_quantity), 0)) AS allocated
    FROM ranked
)
SELECT l_returnflag AS return_flag,
       SUM(l_quantity) AS requested_units,
       SUM(allocated) AS allocated_units,
       ROUND(SUM(allocated) / SUM(l_quantity), 6) AS fill_rate,
       COUNT(*) FILTER (WHERE allocated < l_quantity) AS n_shorted_lines
FROM alloc
GROUP BY l_returnflag
ORDER BY return_flag
"""


@query("q_greedy_allocation", oracle=_ORACLE_ALLOC)
def greedy_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill-rate report under greedy per-part allocation of
    {_CAPACITY} units, priority = ship date (see module docstring)."""
    li = load_table(spark, sf_dir, "lineitem")
    w = (
        Window.partitionBy("l_partkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    demand_before = F.sum("l_quantity").over(w) - F.col("l_quantity")
    allocated = F.least(
        F.col("l_quantity"), F.greatest(F.lit(_CAPACITY) - demand_before, F.lit(0.0))
    )
    return (
        li.withColumn("allocated", allocated)
        .groupBy(F.col("l_returnflag").alias("return_flag"))
        .agg(
            F.sum("l_quantity").alias("requested_units"),
            F.sum("allocated").alias("allocated_units"),
            F.round(F.sum("allocated") / F.sum("l_quantity"), 6).alias("fill_rate"),
            F.count(F.when(F.col("allocated") < F.col("l_quantity"), 1)).alias(
                "n_shorted_lines"
            ),
        )
        .orderBy("return_flag")
    )
