"""As-of (time-travel) join — for each left row, the latest right row
at or before its timestamp. Spark has no native ASOF JOIN; the
scalable composition is:

    range-limited equi-join on the entity key  (hash join + residual)
    → window row_number over (left key, ORDER BY right.ts DESC)
    → keep rn = 1

Fixture flavor: each `purchase` event matched to the same user's most
recent prior-or-equal `click`. DuckDB has a native ASOF JOIN, so this
composition is value-checked against a true as-of implementation.

Scale notes: the join fans out each purchase to ALL prior clicks of
that user before the window prunes to 1 — at 100 TB, band the join by
time bucket (e.g. same-day + previous-day) to bound the fan-out, or
use sort-merge on (user_id, ts) with mapPartitions for a true
streaming as-of merge. The banded variant is q_asof_join_banded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from ..tables import load_table

# Clicks deduped to one per (user_id, ts) — ties at identical
# timestamps would otherwise be engine-dependent.
_DUCK_CLICKS = """
    SELECT user_id, ts, MIN(event_id) AS click_id
    FROM events WHERE event_type = 'click'
    GROUP BY user_id, ts
"""

_ORACLE_ASOF = f"""
SELECT p.event_id AS purchase_id,
       p.user_id AS user_id,
       p.ts AS purchase_ts,
       c.click_id AS click_id,
       c.ts AS click_ts
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN ({_DUCK_CLICKS}) c
  ON p.user_id = c.user_id AND p.ts >= c.ts
ORDER BY purchase_id
"""


def _clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.min("event_id").alias("click_id"))
    )


@query("q_asof_join", oracle=_ORACLE_ASOF)
def asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("purchase_ts"),
    )
    clicks = _clicks(spark, sf_dir).select(
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("click_ts"),
        "click_id",
    )
    w = Window.partitionBy("purchase_id").orderBy(F.col("click_ts").desc())
    return (
        purchases.join(
            clicks,
            (purchases.user_id == clicks.c_user_id)
            & (F.col("purchase_ts") >= F.col("click_ts")),
            "left",
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("purchase_id", "user_id", "purchase_ts", "click_id", "click_ts")
        .orderBy("purchase_id")
    )


_ORACLE_ASOF_BANDED = f"""
SELECT p.event_id AS purchase_id,
       p.user_id AS user_id,
       c.click_id AS click_id
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
ASOF JOIN ({_DUCK_CLICKS}) c
  ON p.user_id = c.user_id AND p.ts >= c.ts
WHERE p.ts - c.ts <= INTERVAL 2 HOUR
ORDER BY purchase_id
"""


@query("q_asof_join_banded", oracle=_ORACLE_ASOF_BANDED)
def asof_join_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB form: the lookback is bounded (2h), so the join
    fan-out is bounded regardless of per-user history length. Inner
    (drops purchases with no in-window click), like a WHERE on the
    oracle's match."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("purchase_ts"),
    )
    clicks = _clicks(spark, sf_dir).select(
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("click_ts"),
        "click_id",
    )
    w = Window.partitionBy("purchase_id").orderBy(F.col("click_ts").desc())
    return (
        purchases.join(
            clicks,
            (purchases.user_id == clicks.c_user_id)
            & (F.col("purchase_ts") >= F.col("click_ts"))
            & (
                F.col("click_ts")
                >= F.col("purchase_ts") - F.expr("INTERVAL 2 HOURS")
            ),
            "inner",
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("purchase_id", "user_id", "click_id")
        .orderBy("purchase_id")
    )


# ---------------------------------------------------------------------------
# FORWARD as-of: for each click, the same user's NEXT purchase at or
# after it — click→conversion attribution, the mirror image of the
# backward lookup above.
# ---------------------------------------------------------------------------

_DUCK_PURCHASES = """
    SELECT user_id, ts, MIN(event_id) AS purchase_id
    FROM events WHERE event_type = 'purchase'
    GROUP BY user_id, ts
"""

_ORACLE_ASOF_FORWARD = f"""
SELECT c.event_id AS click_id,
       c.user_id AS user_id,
       c.ts AS click_ts,
       p.purchase_id AS purchase_id,
       p.ts AS purchase_ts
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
ASOF LEFT JOIN ({_DUCK_PURCHASES}) p
  ON c.user_id = p.user_id AND c.ts <= p.ts
ORDER BY click_id
"""


@query("q_asof_join_forward", oracle=_ORACLE_ASOF_FORWARD)
def asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each click attributed to the user's first purchase at-or-after
    it (forward as-of; DuckDB native `ASOF ... ON c.ts <= p.ts` is the
    oracle). Purchases deduped to one per (user, ts) so timestamp ties
    are engine-independent, same discipline as the backward form.

    Same scale posture as q_asof_join: the equi-key hash join fans out
    before the window prunes to rn=1 — band the lookAHEAD window (the
    q_asof_join_banded pattern, reversed) when per-user futures are
    long. In streaming form this is exactly the watermarked
    stream-stream interval join (streaming/joins.py): click↔purchase
    within a bounded horizon.
    """
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.min("event_id").alias("purchase_id"))
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
            "purchase_id",
        )
    )
    w = Window.partitionBy("click_id").orderBy(F.col("purchase_ts").asc())
    return (
        clicks.join(
            purchases,
            (clicks.user_id == purchases.p_user_id)
            & (F.col("click_ts") <= F.col("purchase_ts")),
            "left",
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("click_id", "user_id", "click_ts", "purchase_id", "purchase_ts")
        .orderBy("click_id")
    )


# ---------------------------------------------------------------------------
# NEAREST-event join: each purchase matched to the closest click of
# the same user in EITHER direction (the sensor-alignment shape; the
# backward and forward as-of joins above are its two halves). The
# implementation beats join+prune entirely: interleave both event
# kinds in ONE per-user time-sorted window and read the previous /
# next click with frame-bounded IGNORE NULLS navigation — zero joins,
# zero fan-out, one user_id shuffle. Ties at equal timestamps order
# clicks before purchases (so an equal-ts click is "previous", gap 0),
# and equal prev/next gaps prefer the previous click. Gap comparisons
# run on integer epoch-micros — exact on both engines.
# ---------------------------------------------------------------------------

_ORACLE_NEAREST = """
WITH tagged AS (
    SELECT user_id, ts, event_id,
           CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS kind
    FROM events WHERE event_type IN ('click', 'purchase')
), nav AS (
    SELECT user_id, ts, event_id, kind,
           last_value(CASE WHEN kind = 0 THEN {'ts': ts, 'id': event_id} END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, kind, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_click,
           first_value(CASE WHEN kind = 0 THEN {'ts': ts, 'id': event_id} END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, kind, event_id
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_click
    FROM tagged
)
SELECT event_id AS purchase_id, user_id, ts AS purchase_ts,
       CASE WHEN use_prev THEN (prev_click).id ELSE (next_click).id END AS click_id,
       CASE WHEN use_prev THEN (prev_click).ts ELSE (next_click).ts END AS click_ts,
       CASE WHEN use_prev THEN 'prev' ELSE 'next' END AS direction,
       ROUND(CASE WHEN use_prev THEN epoch_us(ts) - epoch_us((prev_click).ts)
                  ELSE epoch_us((next_click).ts) - epoch_us(ts) END / 1000000.0, 6) AS gap_sec
FROM (
    SELECT *,
           next_click IS NULL OR (prev_click IS NOT NULL AND
               epoch_us(ts) - epoch_us((prev_click).ts)
               <= epoch_us((next_click).ts) - epoch_us(ts)) AS use_prev
    FROM nav WHERE kind = 1
)
WHERE prev_click IS NOT NULL OR next_click IS NOT NULL
ORDER BY purchase_id
"""


@query("q_join_nearest_event", oracle=_ORACLE_NEAREST)
def join_nearest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    tagged = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "click", 0).otherwise(1).alias("kind"),
    )
    click = F.when(
        F.col("kind") == 0, F.struct(F.col("ts"), F.col("event_id").alias("id"))
    )
    order = ["ts", "kind", "event_id"]
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_next = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(1, Window.unboundedFollowing)
    )
    nav = tagged.select(
        "user_id",
        "ts",
        "event_id",
        "kind",
        F.last(click, ignorenulls=True).over(w_prev).alias("prev_click"),
        F.first(click, ignorenulls=True).over(w_next).alias("next_click"),
    ).filter(F.col("kind") == 1)

    prev_gap = F.unix_micros("ts") - F.unix_micros("prev_click.ts")
    next_gap = F.unix_micros("next_click.ts") - F.unix_micros("ts")
    use_prev = F.col("next_click").isNull() | (
        F.col("prev_click").isNotNull() & (prev_gap <= next_gap)
    )
    return (
        nav.filter(F.col("prev_click").isNotNull() | F.col("next_click").isNotNull())
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
            F.when(use_prev, F.col("prev_click.id"))
            .otherwise(F.col("next_click.id"))
            .alias("click_id"),
            F.when(use_prev, F.col("prev_click.ts"))
            .otherwise(F.col("next_click.ts"))
            .alias("click_ts"),
            F.when(use_prev, F.lit("prev")).otherwise(F.lit("next")).alias("direction"),
            F.round(
                F.when(use_prev, prev_gap).otherwise(next_gap) / F.lit(1000000.0), 6
            ).alias("gap_sec"),
        )
        .orderBy("purchase_id")
    )
