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
