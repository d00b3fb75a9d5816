"""B8-B9: window functions — ranking, lag/lead, running frames.

Not present in the reference (SURVEY §2 "operators NOT present");
part of the engine's general surface.

Scale notes:
- A window over PARTITION BY k ORDER BY s is one shuffle on k plus a
  per-partition sort. Skewed partition keys (one user with 10^9
  events) serialize into one task — salt or pre-aggregate first.
- Unbounded-preceding running frames stream in sort order (O(n));
  sliding ROW frames keep only the frame buffer. Avoid RANGE frames
  over high-duplicate orderings at scale (frame recompute per peer
  group).
- Ties: every ORDER BY below includes a unique tiebreaker column so
  row_number/lag results are deterministic and oracle-comparable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from ..tables import load_table

# ---------------------------------------------------------------------------
# B8 — ranking trio per partition.
# ---------------------------------------------------------------------------

_ORACLE_RANK = """
SELECT o_custkey AS cust_key,
       o_orderkey AS order_key,
       o_totalprice AS total_price,
       ROW_NUMBER() OVER w AS rn,
       RANK() OVER w AS rnk,
       DENSE_RANK() OVER w AS drnk
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
ORDER BY cust_key, rn
"""


@query("q_window_rank", oracle=_ORACLE_RANK)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.select(
            F.col("o_custkey").alias("cust_key"),
            F.col("o_orderkey").alias("order_key"),
            F.col("o_totalprice").alias("total_price"),
            F.row_number().over(w).cast("long").alias("rn"),
            F.rank().over(w).cast("long").alias("rnk"),
            F.dense_rank().over(w).cast("long").alias("drnk"),
        )
        .orderBy("cust_key", "rn")
    )


# ---------------------------------------------------------------------------
# B9 — lag/lead analytics over an event stream.
# ---------------------------------------------------------------------------

_ORACLE_LAG_LEAD = """
SELECT user_id,
       event_id,
       value,
       LAG(value) OVER w AS prev_value,
       LEAD(value) OVER w AS next_value,
       ROUND(value - COALESCE(LAG(value) OVER w, value), 6) AS delta
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, event_id
"""


@query("q_window_lag_lead", oracle=_ORACLE_LAG_LEAD)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("value").over(w)
    return (
        ev.select(
            "user_id",
            "event_id",
            "value",
            prev.alias("prev_value"),
            F.lead("value").over(w).alias("next_value"),
            F.round(F.col("value") - F.coalesce(prev, F.col("value")), 6).alias("delta"),
        )
        .orderBy("user_id", "event_id")
    )


# ---------------------------------------------------------------------------
# B9 — running sum with an explicit ROWS frame (identical accumulation
# order in both engines → bit-stable without rounding; rounded anyway
# for defense in depth).
# ---------------------------------------------------------------------------

_ORACLE_RUNNING = """
SELECT user_id,
       event_id,
       ROUND(SUM(value) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ), 4) AS running_value,
       CAST(COUNT(*) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS running_count
FROM events
ORDER BY user_id, event_id
"""


@query("q_window_running_sum", oracle=_ORACLE_RUNNING)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ev.select(
            "user_id",
            "event_id",
            F.round(F.sum("value").over(w), 4).alias("running_value"),
            F.count(F.lit(1)).over(w).alias("running_count"),
        )
        .orderBy("user_id", "event_id")
    )


# ---------------------------------------------------------------------------
# B8+ — distribution window functions (ntile / percent_rank / cume_dist).
# ---------------------------------------------------------------------------

_ORACLE_DISTRIBUTION = """
SELECT o_orderkey AS order_key,
       o_orderstatus AS order_status,
       CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
       ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
       ROUND(CUME_DIST() OVER w, 6) AS cume,
       ROUND(FIRST_VALUE(o_totalprice) OVER w, 2) AS min_price_in_status,
       ROUND(LAST_VALUE(o_totalprice) OVER (
           PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
       ), 2) AS max_price_in_status
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
ORDER BY order_key
"""


@query("q_window_distribution", oracle=_ORACLE_DISTRIBUTION)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        o.select(
            F.col("o_orderkey").alias("order_key"),
            F.col("o_orderstatus").alias("order_status"),
            F.ntile(4).over(w).cast("long").alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
            F.round(F.first("o_totalprice").over(w), 2).alias("min_price_in_status"),
            F.round(F.last("o_totalprice").over(w_full), 2).alias("max_price_in_status"),
        )
        .orderBy("order_key")
    )


# ---------------------------------------------------------------------------
# B9+ — RANGE frame (value-based window): sum of order totals within
# 1000.0 below the current price. Value-based frames are deterministic
# under ties (peer rows share a frame) — no tiebreaker needed, but at
# scale prefer ROWS frames: RANGE recomputes per peer group.
# ---------------------------------------------------------------------------

_ORACLE_RANGE_FRAME = """
SELECT o_orderkey AS order_key,
       o_custkey AS cust_key,
       ROUND(SUM(o_totalprice) OVER (
           PARTITION BY o_custkey ORDER BY o_totalprice
           RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW
       ), 2) AS near_sum
FROM orders
ORDER BY order_key
"""


@query("q_window_range_frame", oracle=_ORACLE_RANGE_FRAME)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    # SQL-dialect window via F.expr: pyspark's rangeBetween only takes
    # integer bounds, while the SQL dialect supports fractional RANGE
    # frames like the 1000.0 PRECEDING used here. expr() keeps the
    # query view-free (a shared temp-view name could be redirected by a
    # later caller before this lazy plan is collected).
    return (
        load_table(spark, sf_dir, "orders")
        .select(
            F.col("o_orderkey").alias("order_key"),
            F.col("o_custkey").alias("cust_key"),
            F.expr(
                """ROUND(SUM(o_totalprice) OVER (
                       PARTITION BY o_custkey ORDER BY o_totalprice
                       RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW
                   ), 2)"""
            ).alias("near_sum"),
        )
        .orderBy("order_key")
    )


# ---------------------------------------------------------------------------
# TIME-range frame: trailing 1-hour activity per user — RANGE over an
# event-time ORDER BY, the "rolling rate/exposure" shape (rate
# limiting, spend caps, sliding engagement). Distinct from the
# numeric RANGE frame above (value distance) and from the ROWS frames
# (count distance): the frame holds whatever fits in the INTERVAL,
# including event-time ties as peers. Scale: one shuffle on user_id;
# frame membership is two pointer advances per row over each user's
# time-sorted events, state O(frame).
# ---------------------------------------------------------------------------

_ORACLE_TIME_RANGE = """
SELECT event_id,
       user_id,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_last_hour,
       ROUND(SUM(value) OVER w, 4) AS value_last_hour
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
ORDER BY event_id
"""


@query("q_window_time_range", oracle=_ORACLE_TIME_RANGE)
def window_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    # SQL dialect again (via F.expr, view-free): pyspark's rangeBetween
    # takes integer bounds only; INTERVAL range frames need the SQL form.
    over = """OVER (PARTITION BY user_id ORDER BY ts
                    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)"""
    return (
        load_table(spark, sf_dir, "events")
        .select(
            "event_id",
            "user_id",
            F.expr(f"COUNT(*) {over}").alias("n_last_hour"),
            F.expr(f"ROUND(SUM(value) {over}, 4)").alias("value_last_hour"),
        )
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# Moving (trailing-frame) median — the robust rolling statistic the
# trailing z-score (q_anomaly_zscore) can't give when outliers pollute
# the mean. Neither engine shares a windowed-median implementation
# detail, so BOTH sides spell the definition: sort the 9-row frame,
# interpolate the middle (DuckDB's window median IS quantile_cont 0.5
# — same interpolation). The frame array is <=9 elements: sorting is
# exact, per-row cost O(W log W), state O(W) — linear overall, one
# user_id shuffle.
# ---------------------------------------------------------------------------

_MED_WINDOW = 9

_ORACLE_MOVING_MEDIAN = f"""
SELECT user_id, event_id,
       ROUND(median(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN {_MED_WINDOW - 1} PRECEDING AND CURRENT ROW),
             6) AS moving_median
FROM events
ORDER BY user_id, event_id
"""


@query("q_window_moving_median", oracle=_ORACLE_MOVING_MEDIAN)
def window_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(_MED_WINDOW - 1), 0)
    )
    vals = F.array_sort(F.collect_list("value").over(w))
    n = F.size(vals)
    odd = F.element_at(vals, ((n + 1) / 2).cast("int"))
    even = (
        F.element_at(vals, (n / 2).cast("int"))
        + F.element_at(vals, (n / 2).cast("int") + 1)
    ) / 2
    # n == 0 (an all-NULL frame — collect_list drops nulls) must yield
    # NULL like DuckDB's median, not an element_at(…, 0) error
    med = F.when(n == 0, F.lit(None)).when(n % 2 == 1, odd).otherwise(even)
    return ev.select(
        "user_id", "event_id", F.round(med, 6).alias("moving_median")
    ).orderBy("user_id", "event_id")


_ORACLE_NTH = """
WITH w AS (
    SELECT o_custkey,
           FIRST_VALUE(o_totalprice) OVER cw AS first_order_value,
           NTH_VALUE(o_totalprice, 2) OVER cw AS second_order_value,
           LAST_VALUE(o_totalprice) OVER cw AS last_order_value,
           ROW_NUMBER() OVER cw AS rn
    FROM orders
    WINDOW cw AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
)
SELECT o_custkey,
       ROUND(first_order_value, 2) AS first_order_value,
       ROUND(second_order_value, 2) AS second_order_value,
       ROUND(last_order_value, 2) AS last_order_value
FROM w
WHERE rn = 1
ORDER BY o_custkey
"""


@query("q_window_nth_value", oracle=_ORACLE_NTH)
def window_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional window navigation: each customer's first / second /
    last order value via FIRST_VALUE / NTH_VALUE / LAST_VALUE over the
    full-partition frame (completes the navigation-function matrix next
    to lag/lead). One row per customer (rn=1 projection), one shuffle;
    the frame must be explicitly UNBOUNDED FOLLOWING — the default
    RANGE..CURRENT ROW frame silently truncates LAST_VALUE on BOTH
    engines, the classic window-frame trap."""
    orders = load_table(spark, sf_dir, "orders")
    cw = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    rn = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.select(
            "o_custkey",
            F.round(F.first("o_totalprice").over(cw), 2).alias("first_order_value"),
            F.round(F.nth_value("o_totalprice", 2).over(cw), 2).alias(
                "second_order_value"
            ),
            F.round(F.last("o_totalprice").over(cw), 2).alias("last_order_value"),
            F.row_number().over(rn).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
        .orderBy("o_custkey")
    )
