"""Flagship query: revenue by region (the t1 smoke target).

A 5-table star join (lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region)
with a predicate + hash aggregation — the Spark-native analog of the
reference's star-schema analytics goal ("execute queries as fast as
possible", /root/reference/README.md:13-15) exercising SURVEY §2
A6 (equi-join), A7 (filter), A8 (projection) and B3 (hash agg) in one
plan.

Scale notes (100 TB posture):
- region (5 rows) and nation (25 rows) are broadcast; customer is
  broadcast-range at test SFs and AQE will pick broadcast vs
  sort-merge at runtime for the customer⋈orders side.
- The l_shipdate filter is pushed into the parquet scan
  (PushedFilters in .explain), and only 4 of 11 lineitem columns are
  read (ReadSchema pruning).
- Aggregation is partial (map-side) then final — one shuffle on the
  group key, whose cardinality (5 regions) is tiny, so AQE coalesces
  the post-shuffle partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table

_ORACLE = """
SELECT
    r.r_name AS region_name,
    ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
    COUNT(*) AS n_items
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE o.o_orderstatus <> 'X'
GROUP BY r.r_name
ORDER BY revenue DESC
"""


@query("q_flagship_revenue_by_region", oracle=_ORACLE)
def revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .filter(F.col("o_orderstatus") != "X")
        .join(customer, F.col("o_custkey") == customer.c_custkey)
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), F.col("n_regionkey") == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.col("revenue").desc())
    )
