"""Composite analytics queries (TPC-H-shaped) — multi-operator plans
that exercise join + filter + agg + top-k together, the way real
workloads do. These are also bench headliners: their plans are where
broadcast choice, pushdown, and AQE interact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table

# ---------------------------------------------------------------------------
# Shipping-priority shape (TPC-H Q3): unshipped-revenue per order for
# one customer segment, top 10 by revenue.
# ---------------------------------------------------------------------------

_ORACLE_Q3 = """
SELECT l.l_orderkey AS order_key,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
       o.o_orderpriority AS order_priority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-06-01'
  AND l.l_shipdate > TIMESTAMP '1998-06-01'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, order_key
LIMIT 10
"""


@query("q_tpch_q3_shipping_priority", oracle=_ORACLE_Q3)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1998-06-01"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1998-06-01"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("l_orderkey").alias("order_key"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            F.col("o_orderpriority").alias("order_priority"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("order_key", "revenue", "order_date", "order_priority")
        .orderBy(F.col("revenue").desc(), F.col("order_key"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Returned-item reporting shape (TPC-H Q10): revenue lost to returns
# per customer, top 20.
# ---------------------------------------------------------------------------

_ORACLE_Q10 = """
SELECT c.c_custkey AS cust_key,
       c.c_name AS cust_name,
       n.n_name AS nation_name,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS lost_revenue,
       ROUND(MAX(c.c_acctbal), 2) AS acct_bal
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY lost_revenue DESC, cust_key
LIMIT 20
"""


@query("q_tpch_q10_returned_items", oracle=_ORACLE_Q10)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("c_custkey").alias("cust_key"),
            F.col("c_name").alias("cust_name"),
            F.col("n_name").alias("nation_name"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("lost_revenue"),
            F.round(F.max("c_acctbal"), 2).alias("acct_bal"),
        )
        .orderBy(F.col("lost_revenue").desc(), F.col("cust_key"))
        .limit(20)
    )
