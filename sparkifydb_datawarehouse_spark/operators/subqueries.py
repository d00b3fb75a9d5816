"""SQL-surface operators: cross join, correlated EXISTS, scalar
subquery, LATERAL, recursive CTE.

These run through spark.sql over the registered fixture views — the
surface a reference user (whose whole workload is SQL text,
/root/reference/sql_queries.py) would reach for first. Catalyst
rewrites each into the same physical operators the DataFrame API
produces: EXISTS → left-semi join, scalar subquery → single-row
broadcast, LATERAL with an aggregate → grouped join, recursive CTE →
iterative UnionLoop.

Scale notes: EXISTS/IN always compile to semi joins (never per-row
subquery execution); a correlated LATERAL with LIMIT is the SQL
spelling of top-k-per-group (same window/agg plan as q_topk_per_group
— use whichever reads better); recursive CTEs iterate driver-side
like connected components, so depth must be bounded (calendar fills,
org charts — not unbounded graph walks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import query
from ..tables import register_views

_CROSS = """
SELECT r.r_name AS region_name, n.n_name AS nation_name
FROM region r CROSS JOIN nation n
ORDER BY region_name, nation_name
"""


@query("q_join_cross", oracle=_CROSS)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_CROSS)


_EXISTS = """
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000
)
ORDER BY c_custkey
"""


@query("q_subquery_exists", oracle=_EXISTS)
def subquery_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_EXISTS)


_SCALAR = """
SELECT o_orderkey, ROUND(o_totalprice, 2) AS total_price
FROM orders
WHERE o_totalprice > (SELECT AVG(o_totalprice) * 1.5 FROM orders)
ORDER BY o_orderkey
"""


@query("q_subquery_scalar", oracle=_SCALAR)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_SCALAR)


_LATERAL = """
SELECT r.r_name AS region_name, t.nation_name, t.n_customers
FROM region r,
LATERAL (
    SELECT n.n_name AS nation_name,
           CAST(COUNT(c.c_custkey) AS BIGINT) AS n_customers
    FROM nation n LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
    WHERE n.n_regionkey = r.r_regionkey
    GROUP BY n.n_name
    ORDER BY n_customers DESC, n.n_name
    LIMIT 2
) t
ORDER BY region_name, n_customers DESC, nation_name
"""


@query("q_lateral_topk", oracle=_LATERAL)
def lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_LATERAL)


# Recursive CTE: calendar fill for January 1995 (zero-order days
# included). The recursion itself is dialect-identical; only the
# date arithmetic differs (Spark date_add vs DuckDB date + int).
_RECURSIVE_SPARK = """
WITH RECURSIVE cal(i) AS (
    SELECT 0
    UNION ALL
    SELECT i + 1 FROM cal WHERE i < 30
)
SELECT date_format(date_add(DATE '1995-01-01', i), 'yyyy-MM-dd') AS day,
       CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders
FROM cal LEFT JOIN orders o ON o.o_orderdate = date_add(DATE '1995-01-01', i)
GROUP BY 1
ORDER BY 1
"""

_RECURSIVE_DUCK = """
WITH RECURSIVE cal(i) AS (
    SELECT 0
    UNION ALL
    SELECT i + 1 FROM cal WHERE i < 30
)
SELECT strftime(DATE '1995-01-01' + i, '%Y-%m-%d') AS day,
       CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders
FROM cal LEFT JOIN orders o ON o.o_orderdate = DATE '1995-01-01' + i
GROUP BY 1
ORDER BY 1
"""


@query("q_recursive_cte", oracle=_RECURSIVE_DUCK)
def recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_RECURSIVE_SPARK)
