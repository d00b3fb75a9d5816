"""Sequence-pattern detection over per-user event journeys — the
MATCH_RECOGNIZE-shaped capability, expressed Spark-first.

The funnel operator (timeseries.funnel_conversion) answers "did the
user EVER do A then B then C"; this answers the stricter ordered-
pattern question with intervening-event structure — here: how many
view→(clicks)*→purchase conversions does each user's journey contain,
with no other event type breaking the run. The standard trick makes
it engine-portable: encode each user's time-ordered events as a
STRING of type initials, then count regex matches — journeys become
text, patterns become regexes, and both Spark and DuckDB agree on
leftmost non-overlapping matching.

Scale design (100 TB): one shuffle on user_id; the journey string per
user is bounded by human activity (the same boundedness argument as
sessionization, SURVEY §2 C27). The Spark side builds the ordered
journey WITHOUT a window sort: array_sort(collect_list(struct(ts,
event_id, chr))) sorts INSIDE the aggregation buffer per group —
map-side combined, no global sort, no second shuffle. A pathological
key (bot with millions of events) would be capped by slice() before
the regex — noted, not needed at fixture scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table

_PATTERN = "vc*p"  # view, any clicks, purchase — uninterrupted


_ORACLE_SEQ = f"""
WITH journeys AS (
    SELECT user_id,
           string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
               AS journey
    FROM events
    GROUP BY user_id
)
SELECT user_id,
       CAST(length(regexp_extract_all(journey, '{_PATTERN}')) AS BIGINT)
           AS n_conversions,
       CAST(length(journey) AS BIGINT) AS n_events
FROM journeys
WHERE length(regexp_extract_all(journey, '{_PATTERN}')) > 0
ORDER BY user_id
"""


@query("q_pattern_sequence", oracle=_ORACLE_SEQ)
def pattern_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ordered = F.array_sort(
        F.collect_list(F.struct("ts", "event_id", F.col("initial")))
    )
    journey = F.array_join(
        F.transform(ordered, lambda s: s["initial"]), ""
    ).alias("journey")
    journeys = (
        ev.select(
            "user_id", "ts", "event_id",
            F.substring("event_type", 1, 1).alias("initial"),
        )
        .groupBy("user_id")
        .agg(journey)
    )
    n_conv = F.regexp_count("journey", F.lit(_PATTERN))
    return (
        journeys.select(
            "user_id",
            n_conv.cast("long").alias("n_conversions"),
            F.length("journey").cast("long").alias("n_events"),
        )
        .filter(F.col("n_conversions") > 0)
        .orderBy("user_id")
    )


_ORACLE_TRIGRAMS = """
WITH journeys AS (
    SELECT list(event_type ORDER BY ts, event_id) AS l
    FROM events
    GROUP BY user_id
), grams AS (
    SELECT unnest(list_transform(range(1, len(l) - 1),
                  i -> l[i] || '>' || l[i + 1] || '>' || l[i + 2])) AS seq
    FROM journeys
)
SELECT seq, COUNT(*) AS n_occurrences
FROM grams
GROUP BY seq
ORDER BY n_occurrences DESC, seq
LIMIT 20
"""


@query("q_event_trigrams", oracle=_ORACLE_TRIGRAMS)
def event_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top event-type trigrams across user journeys — "what are users'
    most common 3-step paths?".

    Same shape as the pattern matcher above: ONE shuffle on user_id,
    journey ordered inside the aggregation buffer (array_sort on
    (ts, event_id, type) structs — no window sort), then trigram
    generation is a pure array expression (sliding index transform)
    followed by explode + count. The gram stream is ≤ |events| rows
    (every event starts at most one trigram), so the final count is the
    same linear shuffle as any word-count.
    """
    ev = load_table(spark, sf_dir, "events")
    journeys = ev.groupBy("user_id").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(ts, event_id, event_type))), "
            "s -> s.event_type)"
        ).alias("l")
    )
    grams = journeys.select(
        F.explode(
            F.expr(
                "CASE WHEN size(l) >= 3 THEN transform(sequence(1, size(l) - 2), "
                "i -> concat(element_at(l, i), '>', element_at(l, i + 1), '>', "
                "element_at(l, i + 2))) ELSE array() END"
            )
        ).alias("seq")
    )
    return (
        grams.groupBy("seq")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), "seq")
        .limit(20)
    )


_ORACLE_ATTRIBUTION = """
WITH tagged AS (
    SELECT event_type, value,
           LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN event_type END
                      IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ) AS channel
    FROM events
)
SELECT COALESCE(channel, 'direct') AS channel,
       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       ROUND(SUM(value), 2) AS attributed_value
FROM tagged
WHERE event_type = 'purchase'
GROUP BY COALESCE(channel, 'direct')
ORDER BY channel
"""


@query("q_last_touch_attribution", oracle=_ORACLE_ATTRIBUTION)
def last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch revenue attribution: each purchase's value credits
    the most recent PRIOR non-purchase event of the same user
    ('direct' when the purchase is the journey's first event).

    One per-user window (frame-bounded IGNORE-NULLS navigation — the
    same zero-join shape as the nearest-event join): no self-join, no
    fan-out, one shuffle on user_id, then a channels-sized rollup.
    The window ORDER BY carries (ts, event_id) — a total order — so
    attribution is deterministic on both engines.
    """
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    channel = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    return (
        ev.withColumn("channel", channel)
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce(F.col("channel"), F.lit("direct")).alias("channel"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_purchases"),
            F.round(F.sum("value"), 2).alias("attributed_value"),
        )
        .orderBy("channel")
    )


# ---------------------------------------------------------------------------
# Conversion paths: the top event-type paths that LEAD INTO a
# purchase — q_event_trigrams counts all trigrams; this anchors the
# window at conversions (the "what journeys convert" report that
# sits beside last-touch/multi-touch attribution).
# ---------------------------------------------------------------------------

_ORACLE_CONV_PATHS = """
WITH ordered AS (
    SELECT user_id, event_type, ts, event_id,
           LAG(event_type, 3) OVER w AS p3,
           LAG(event_type, 2) OVER w AS p2,
           LAG(event_type, 1) OVER w AS p1
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT COALESCE(p3, '-') || '>' || COALESCE(p2, '-') || '>'
       || COALESCE(p1, '-') AS path,
       CAST(COUNT(*) AS BIGINT) AS n_conversions
FROM ordered
WHERE event_type = 'purchase'
GROUP BY path
ORDER BY n_conversions DESC, path
LIMIT 20
"""


@query("q_conversion_paths", oracle=_ORACLE_CONV_PATHS)
def conversion_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 three-step event paths immediately preceding a
    purchase, start-padded with '-' for users converting within their
    first three events.

    One user-partitioned window (total order by ts, event_id — the
    repo's deterministic tie-break) yields all three predecessors;
    the purchase filter drops non-conversions BEFORE the path agg, so
    the path-count shuffle carries conversions only. TakeOrdered
    caps the result.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        "event_type",
        *[F.lag("event_type", k).over(w).alias(f"p{k}") for k in (3, 2, 1)],
    )
    path = F.concat_ws(
        ">",
        F.coalesce(F.col("p3"), F.lit("-")),
        F.coalesce(F.col("p2"), F.lit("-")),
        F.coalesce(F.col("p1"), F.lit("-")),
    )
    return (
        ordered.filter(F.col("event_type") == "purchase")
        .groupBy(path.alias("path"))
        .agg(F.count(F.lit(1)).alias("n_conversions"))
        .orderBy(F.col("n_conversions").desc(), "path")
        .limit(20)
    )
