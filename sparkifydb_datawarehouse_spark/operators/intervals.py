"""Interval overlap join: pair up validity windows that intersect.

The reference has only point-in-time timestamps; interval semantics
(SCD2 validity ranges, maintenance windows, promotion periods) are
the natural extension — and `q_scd2_intervals` already BUILDS such
ranges. This operator answers the follow-up: which intervals of the
same entity overlap? (Here: orders of the same customer whose 14-day
fulfillment windows [o_orderdate, o_orderdate + 14d) intersect —
"customer had concurrent open orders".)

Scale design (100 TB): the equi-key (customer) does the heavy
partitioning — the overlap predicate only ever runs within a
customer's own orders, so the plan is a hash join + residual range
filter, NOT a nested-loop interval join. For interval joins with no
equi-key, band the time axis (explode each interval to the fixed-size
epochs it touches, equi-join on epoch, dedup) — the same banding
pattern as the as-of and cosine joins (llm/dedup.py). Fan-out per
interval = ceil(length/band), bounded because fulfillment windows
have bounded length; open-ended intervals get clamped first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table

_DAYS = 14

_ORACLE_OVERLAP = f"""
WITH iv AS (
    SELECT o_custkey AS custkey, o_orderkey AS okey,
           o_orderdate AS lo,
           o_orderdate + INTERVAL {_DAYS} DAY AS hi
    FROM orders
)
SELECT a.custkey,
       a.okey AS order_a,
       b.okey AS order_b,
       CAST(EXTRACT(EPOCH FROM LEAST(a.hi, b.hi) - GREATEST(a.lo, b.lo))
            / 86400 AS BIGINT) AS overlap_days
FROM iv a
JOIN iv b
  ON a.custkey = b.custkey AND a.okey < b.okey
 AND a.lo < b.hi AND b.lo < a.hi
ORDER BY a.custkey, order_a, order_b
"""


@query("q_join_interval_overlap", oracle=_ORACLE_OVERLAP)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    iv = o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("okey"),
        F.col("o_orderdate").alias("lo"),
        (F.col("o_orderdate") + F.expr(f"INTERVAL {_DAYS} DAY")).alias("hi"),
    )
    a = iv.alias("a")
    b = iv.alias("b")
    overlap_days = (
        (
            F.least(F.col("a.hi"), F.col("b.hi")).cast("timestamp").cast("double")
            - F.greatest(F.col("a.lo"), F.col("b.lo")).cast("timestamp").cast("double")
        )
        / 86400
    ).cast("long")
    return (
        a.join(
            b,
            (F.col("a.custkey") == F.col("b.custkey"))
            & (F.col("a.okey") < F.col("b.okey"))
            & (F.col("a.lo") < F.col("b.hi"))
            & (F.col("b.lo") < F.col("a.hi")),
        )
        .select(
            F.col("a.custkey").alias("custkey"),
            F.col("a.okey").alias("order_a"),
            F.col("b.okey").alias("order_b"),
            overlap_days.alias("overlap_days"),
        )
        .orderBy("custkey", "order_a", "order_b")
    )
