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

from pyspark.sql import DataFrame, SparkSession, Window
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
        # NOT checkpointed before the sort (optimization r13): the
        # sampling re-run is one broadcast hash join — measured ~0.1 s,
        # within host noise, and a checkpoint would hide the join from
        # the test_plan_quality no-nested-loop gate
        .orderBy("custkey", "order_a", "order_b")
    )


# ---------------------------------------------------------------------------
# Sweep-line interval integration: how many orders are OPEN each day.
# ---------------------------------------------------------------------------

_ORACLE_OPEN_ORDERS = """
WITH spans AS (
    SELECT o.o_orderkey,
           CAST(o.o_orderdate AS DATE) AS start_day,
           CAST(MAX(l.l_shipdate) AS DATE) AS end_day
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderkey, o.o_orderdate
), deltas AS (
    SELECT start_day AS day, 1 AS delta FROM spans
    UNION ALL
    SELECT end_day + INTERVAL 1 DAY, -1 FROM spans
), daily AS (
    SELECT CAST(day AS DATE) AS day, SUM(delta) AS net
    FROM deltas GROUP BY day
)
SELECT day,
       CAST(SUM(net) OVER (ORDER BY day) AS BIGINT) AS n_open
FROM daily
ORDER BY day
"""


@query("q_open_orders_daily", oracle=_ORACLE_OPEN_ORDERS)
def open_orders_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backlog curve: number of orders open on each (change) day, an
    order being open from its order date until its last line ships.

    The classic sweep-line integration: each interval becomes a +1 at
    its start and a −1 the day after its end; one groupBy collapses
    the deltas to the (calendar-bounded) day grid and a running sum
    integrates them. Counting overlaps NEVER joins intervals against
    days or each other — the fact-sized work is exactly two scans'
    worth of delta emission, and the cumulative runs over the day
    AGGREGATE. This is the scalable form of "how many X were active
    at time T" for any interval table (sessions, SCD2 versions,
    rentals); q_join_interval_overlap covers the pairwise-overlap
    JOIN shape, this covers the aggregate-integration shape.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    spans = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", F.col("o_orderdate").cast("date").alias("start_day"))
        .agg(F.max(F.col("l_shipdate").cast("date")).alias("end_day"))
    )
    deltas = spans.select(F.col("start_day").alias("day"), F.lit(1).alias("delta")).unionAll(
        spans.select(F.date_add("end_day", 1).alias("day"), F.lit(-1).alias("delta"))
    )
    daily = deltas.groupBy("day").agg(F.sum("delta").alias("net"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        "day", F.sum("net").over(w).cast("long").alias("n_open")
    ).orderBy("day")


_ORACLE_AGING = """
WITH snap AS (
    SELECT CAST(MAX(o_orderdate) AS DATE) AS s FROM orders
), open_orders AS (
    SELECT o.o_orderkey, o.o_totalprice,
           DATE_DIFF('day', CAST(o.o_orderdate AS DATE), (SELECT s FROM snap)) AS age
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderkey, o.o_totalprice, o.o_orderdate
    HAVING CAST(MAX(l.l_shipdate) AS DATE) > (SELECT s FROM snap)
)
SELECT CASE WHEN age <= 30 THEN '0-30'
            WHEN age <= 60 THEN '31-60'
            WHEN age <= 90 THEN '61-90'
            ELSE '90+' END AS age_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_open_orders,
       ROUND(CAST(ROUND(SUM(o_totalprice) * 100) AS BIGINT) / 100.0, 2) AS open_value
FROM open_orders
GROUP BY age_bucket
ORDER BY age_bucket
"""


@query("q_aging_report", oracle=_ORACLE_AGING)
def aging_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order aging at the latest snapshot date (order still has
    unshipped lines): the classic AR/backlog aging report with
    0-30/31-60/61-90/90+ buckets.

    The as-of predicate folds INSIDE the per-order aggregation
    (HAVING max(shipdate) > snapshot) — one fact join + one order-keyed
    aggregation, ages in exact integer days, values through the cents
    fold, and the bucket rollup is 4 rows. Complements
    q_open_orders_daily (the time series) with the point-in-time
    composition."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    snap = orders.agg(F.max(F.col("o_orderdate").cast("date")).alias("s"))
    open_orders = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .crossJoin(F.broadcast(snap))
        .groupBy(
            "o_orderkey",
            "o_totalprice",
            F.datediff("s", F.col("o_orderdate").cast("date")).alias("age"),
        )
        .agg(F.max(F.col("l_shipdate").cast("date")).alias("last_ship"), F.max("s").alias("s2"))
        .filter(F.col("last_ship") > F.col("s2"))
    )
    bucket = (
        F.when(F.col("age") <= 30, "0-30")
        .when(F.col("age") <= 60, "31-60")
        .when(F.col("age") <= 90, "61-90")
        .otherwise("90+")
    )
    return (
        open_orders.groupBy(bucket.alias("age_bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_open_orders"),
            F.round(
                F.round(F.sum("o_totalprice") * 100, 0).cast("long") / 100.0, 2
            ).alias("open_value"),
        )
        .orderBy("age_bucket")
    )
