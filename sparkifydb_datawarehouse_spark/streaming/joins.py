"""B15 extension — stream-stream interval join (view → purchase
attribution within 15 minutes).

Defined once over two DataFrames and applied to either static frames
or two readStreams of the events schema (same unification discipline
as streaming/windows.py — the batch run is the oracle).

Scale notes: a watermarked stream-stream inner join keeps BOTH sides'
buffered state only within the watermark + join-interval horizon; the
time-bound predicate (`purchase.ts BETWEEN view.ts AND view.ts + 15m`)
is what lets Spark evict view-side state — an unbounded-time
stream-stream join would hold every view forever. On the batch path
the same plan is a plain equi-join on user_id with the range residual
evaluated post-match; AQE handles user-skew (a bot user with millions
of views) via skew-join splitting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table
from .windows import WATERMARK

JOIN_HORIZON = "15 minutes"


def view_purchase_join(views: DataFrame, purchases: DataFrame) -> DataFrame:
    """Attribute each purchase to every view by the same user in the
    preceding 15 minutes."""
    v = views.select(
        F.col("user_id"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    if views.isStreaming:
        v = v.withWatermark("view_ts", WATERMARK)
        p = p.withWatermark("purchase_ts", WATERMARK)
    return v.join(
        p,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (F.col("purchase_ts") <= F.col("view_ts") + F.expr(f"INTERVAL {JOIN_HORIZON}")),
        "inner",
    ).select("user_id", "view_id", "purchase_id", "purchase_ts", "purchase_value")


def split_events(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    views = events.filter(F.col("event_type") == "view")
    purchases = events.filter(F.col("event_type") == "purchase")
    return views, purchases


_ORACLE_SS_JOIN = """
SELECT v.user_id,
       v.event_id AS view_id,
       p.event_id AS purchase_id,
       p.ts AS purchase_ts,
       p.value AS purchase_value
FROM events v
JOIN events p
  ON p.user_id = v.user_id
 AND p.event_type = 'purchase'
 AND v.event_type = 'view'
 AND p.ts >= v.ts
 AND p.ts <= v.ts + INTERVAL 15 MINUTE
ORDER BY view_id, purchase_id
"""


@query("q_stream_stream_join", oracle=_ORACLE_SS_JOIN)
def stream_stream_join_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    views, purchases = split_events(ev)
    return view_purchase_join(views, purchases).orderBy("view_id", "purchase_id")


# ---------------------------------------------------------------------------
# Stream-STATIC enrichment — the most common production streaming
# shape: decorate an event stream with a dimension table. The static
# side is read once per micro-batch and broadcast (no state, no
# watermark needed on the dim side); this is the streaming face of
# the warehouse star join (flagship.py). Defined once over two
# DataFrames; batch run = the oracle, real readStream run tested in
# tests/test_streaming.py.
#
# Scale notes: the dim must fit broadcast (or be backed by a fast
# keyed store); a SLOWLY CHANGING dim re-reads per micro-batch, so
# dimension updates become visible at batch granularity — the
# documented freshness contract. For versioned history use the PIT
# join (operators/pit.py) on the batch path instead.
# ---------------------------------------------------------------------------


def enrich_events(events: DataFrame, users_dim: DataFrame) -> DataFrame:
    """Per-event enrichment with the user's segment + running value
    kept event-grain (no aggregation: pure map-side decorate)."""
    return (
        events.join(F.broadcast(users_dim), events.user_id == users_dim.dim_user, "left")
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.coalesce("segment", F.lit("UNKNOWN")).alias("segment"),
            F.round("value", 4).alias("value"),
        )
    )


def user_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic user dimension derived from customer (fixtures
    have no user table): user_id joins customer key space mod-wise."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("dim_user"),
        F.col("c_mktsegment").alias("segment"),
    )


_ORACLE_ENRICH = """
SELECT e.event_id,
       e.user_id,
       e.event_type,
       COALESCE(c.c_mktsegment, 'UNKNOWN') AS segment,
       ROUND(e.value, 4) AS value
FROM events e
LEFT JOIN customer c ON c.c_custkey = e.user_id
ORDER BY e.event_id
"""


@query("q_stream_enrich", oracle=_ORACLE_ENRICH)
def stream_enrich_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return enrich_events(ev, user_dim(spark, sf_dir)).orderBy("event_id")
