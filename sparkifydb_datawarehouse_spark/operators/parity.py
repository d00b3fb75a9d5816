"""Part A parity operators — every operator the reference executes.

Each query re-expresses one row of SURVEY.md §2 Part A on the harness
fixture tables. Reference citations point into /root/reference/.

Scale notes apply throughout:
- equi-joins here are shuffle hash / sort-merge on the join key with
  AQE free to demote to broadcast when one side is small; at 100 TB
  the build sides below (distinct key-sets) stay small relative to
  the probe side, so AQE broadcasts them.
- filters/projections are pushed into the parquet scan (verify with
  .explain: PushedFilters / ReadSchema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table

# ---------------------------------------------------------------------------
# A6 — inner equi-join on a composite 3-column key (one key is a double).
# Reference: songplay_table_insert joins staging_events to staging_songs ON
# (song=title AND artist=artist_name AND length=duration) — a 3-key match
# where `length`/`duration` are NUMERIC (/root/reference/sql_queries.py:128-131).
# Fixture flavor: match lineitem rows against the distinct set of
# (partkey, suppkey, quantity) triples seen in high-quantity lineitems —
# same shape: two discrete keys + one floating-point key.
# ---------------------------------------------------------------------------

_ORACLE_A6 = """
SELECT l.l_orderkey AS order_key,
       l.l_linenumber AS line_number,
       l.l_partkey AS part_key,
       l.l_suppkey AS supp_key,
       l.l_quantity AS quantity
FROM lineitem l
JOIN (
    SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk, l_quantity AS qty
    FROM lineitem
    WHERE l_quantity > 45
) d ON l.l_partkey = d.pk AND l.l_suppkey = d.sk AND l.l_quantity = d.qty
ORDER BY order_key, line_number
"""


@query("q_join_inner_multikey", oracle=_ORACLE_A6)
def join_inner_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    triples = (
        li.filter(F.col("l_quantity") > 45)
        .select(
            F.col("l_partkey").alias("pk"),
            F.col("l_suppkey").alias("sk"),
            F.col("l_quantity").alias("qty"),
        )
        .distinct()
    )
    return (
        li.join(
            triples,
            (li.l_partkey == triples.pk)
            & (li.l_suppkey == triples.sk)
            & (li.l_quantity == triples.qty),
            "inner",
        )
        .select(
            F.col("l_orderkey").alias("order_key"),
            F.col("l_linenumber").alias("line_number"),
            F.col("l_partkey").alias("part_key"),
            F.col("l_suppkey").alias("supp_key"),
            F.col("l_quantity").alias("quantity"),
        )
        .orderBy("order_key", "line_number")
    )


# ---------------------------------------------------------------------------
# A6 strict-NUMERIC variant — Redshift bare `NUMERIC` is DECIMAL(18,0)
# (/root/reference/sql_queries.py:26,49,76 declare length/duration NUMERIC),
# so the reference's 3-key match at sql_queries.py:130 compares ROUNDED
# WHOLE-NUMBER seconds, not doubles. SURVEY §1 consciously chose DoubleType
# end-to-end; this registered variant reproduces the rounded-match semantic
# exactly so the one documented fidelity delta is itself value-checked.
# Both engines round double→DECIMAL(18,0) ties half-AWAY-FROM-ZERO
# (verified: 950.5→951, -950.5→-951 on Spark and DuckDB alike).
#
# Fidelity delta pinned at sf0.01 (events, build filter value > 20):
# DECIMAL(18,0) semantics match 6746 rows; raw-double semantics match
# 6739 — the 7 extra rows match ONLY because rounding collapses values
# that differ in the cents digits (e.g. probe 41.8 vs build 42.2 both
# → 42). That is precisely the behavior a Redshift user gets from the
# reference schema and would lose under naive double porting.
# ---------------------------------------------------------------------------

_ORACLE_A6_DEC18 = """
SELECT e.event_id AS event_id,
       e.user_id AS user_id,
       e.event_type AS event_type,
       CAST(CAST(e.value AS DECIMAL(18,0)) AS BIGINT) AS value_dec18
FROM events e
JOIN (
    SELECT DISTINCT user_id AS uid, event_type AS etype,
                    CAST(value AS DECIMAL(18,0)) AS vdec
    FROM events
    WHERE value > 20
) d ON e.user_id = d.uid AND e.event_type = d.etype
   AND CAST(e.value AS DECIMAL(18,0)) = d.vdec
"""


@query("q_join_inner_multikey_decimal18", oracle=_ORACLE_A6_DEC18)
def join_inner_multikey_decimal18(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    vdec = F.col("value").cast("decimal(18,0)")
    triples = (
        ev.filter(F.col("value") > 20)
        .select(
            F.col("user_id").alias("uid"),
            F.col("event_type").alias("etype"),
            vdec.alias("vdec"),
        )
        .distinct()
    )
    return ev.join(
        triples,
        (ev.user_id == triples.uid)
        & (ev.event_type == triples.etype)
        & (vdec == triples.vdec),
        "inner",
    ).select(
        "event_id",
        "user_id",
        "event_type",
        vdec.cast("long").alias("value_dec18"),
    )


# ---------------------------------------------------------------------------
# A9 — inner equi-join on a 2-column key (the artist-dimension build:
# /root/reference/sql_queries.py:147-149 joins on title+artist_name only,
# and deliberately does NOT dedup the result — duplicates are faithful).
# Fixture flavor: events matched to the distinct (user_id, event_type)
# pairs of high-value events; join output keeps duplicates.
# ---------------------------------------------------------------------------

_ORACLE_A9 = """
SELECT e.event_id AS event_id,
       e.user_id AS user_id,
       e.event_type AS event_type,
       e.value AS value
FROM events e
JOIN (
    SELECT DISTINCT user_id AS uid, event_type AS etype
    FROM events
    WHERE value > 95
) d ON e.user_id = d.uid AND e.event_type = d.etype
ORDER BY event_id
"""


@query("q_join_inner_2key", oracle=_ORACLE_A9)
def join_inner_2key(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    pairs = (
        ev.filter(F.col("value") > 95)
        .select(F.col("user_id").alias("uid"), F.col("event_type").alias("etype"))
        .distinct()
    )
    return (
        ev.join(pairs, (ev.user_id == pairs.uid) & (ev.event_type == pairs.etype), "inner")
        .select("event_id", "user_id", "event_type", "value")
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# A7 — equality filter on a string column (WHERE page='NextSong',
# /root/reference/sql_queries.py:131). Predicate reaches the parquet scan
# as a pushed filter; at 100 TB this is the difference between reading one
# row-group slice and the whole table.
# ---------------------------------------------------------------------------

_ORACLE_A7 = """
SELECT event_id, user_id, value
FROM events
WHERE event_type = 'purchase'
ORDER BY event_id
"""


@query("q_filter_eq", oracle=_ORACLE_A7)
def filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "value")
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# A8 — projection + column aliasing (ts AS start_time etc.,
# /root/reference/sql_queries.py:128,134,140,148,161). Column pruning means
# the scan reads exactly 3 of 6 orders columns.
# ---------------------------------------------------------------------------

_ORACLE_A8 = """
SELECT o_orderkey AS order_id,
       o_totalprice AS amount,
       o_orderpriority AS priority
FROM orders
ORDER BY order_id
"""


@query("q_project_alias", oracle=_ORACLE_A8)
def project_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .select(
            F.col("o_orderkey").alias("order_id"),
            F.col("o_totalprice").alias("amount"),
            F.col("o_orderpriority").alias("priority"),
        )
        .orderBy("order_id")
    )


# ---------------------------------------------------------------------------
# A11 — CASE WHEN sentinel-zero → NULL (song year,
# /root/reference/sql_queries.py:141-143). Fixture flavor: bucket events
# by floor(value) % 7 with 0 as the null sentinel. NOTE: DuckDB CAST of a
# double rounds while Spark truncates — FLOOR first on both sides.
# ---------------------------------------------------------------------------

_ORACLE_A11 = """
SELECT event_id,
       NULLIF(CAST(FLOOR(value) AS INTEGER) % 7, 0) AS bucket
FROM events
ORDER BY event_id
"""


@query("q_case_when_nullif", oracle=_ORACLE_A11)
def case_when_nullif(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bucket = (F.floor(F.col("value")).cast("int") % 7)
    return ev.select(
        "event_id",
        F.nullif(bucket, F.lit(0)).alias("bucket"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# A12 — DISTINCT (SELECT DISTINCT se.ts,
# /root/reference/sql_queries.py:168-172). Hash-aggregate dedup; at scale
# this is a shuffle on the distinct columns with partial dedup map-side.
# ---------------------------------------------------------------------------

_ORACLE_A12 = """
SELECT DISTINCT l_returnflag AS return_flag, l_linestatus AS line_status
FROM lineitem
ORDER BY return_flag, line_status
"""


@query("q_distinct", oracle=_ORACLE_A12)
def distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_returnflag").alias("return_flag"),
            F.col("l_linestatus").alias("line_status"),
        )
        .distinct()
        .orderBy("return_flag", "line_status")
    )


# ---------------------------------------------------------------------------
# A13+A14 — derived-table subquery feeding 6-way datepart extraction
# (time_table_insert, /root/reference/sql_queries.py:161-172). The dow shim:
# Redshift/DuckDB dow is 0=Sun..6=Sat, Spark dayofweek is 1=Sun..7=Sat →
# dayofweek(ts)-1 (SURVEY §2 A14).
# ---------------------------------------------------------------------------

_ORACLE_A14 = """
SELECT ts AS start_time,
       EXTRACT(hour FROM ts) AS hour,
       EXTRACT(day FROM ts) AS day,
       weekofyear(ts) AS week,
       EXTRACT(month FROM ts) AS month,
       EXTRACT(year FROM ts) AS year,
       dayofweek(ts) AS weekday
FROM (SELECT DISTINCT ts FROM events)
ORDER BY start_time
"""


@query("q_extract_dateparts", oracle=_ORACLE_A14)
def extract_dateparts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ts = ev.select("ts").distinct()
    return ts.select(
        F.col("ts").alias("start_time"),
        F.hour("ts").cast("long").alias("hour"),
        F.dayofmonth("ts").cast("long").alias("day"),
        F.weekofyear("ts").cast("long").alias("week"),
        F.month("ts").cast("long").alias("month"),
        F.year("ts").cast("long").alias("year"),
        (F.dayofweek("ts") - 1).cast("long").alias("weekday"),
    ).orderBy("start_time")


# ---------------------------------------------------------------------------
# A15 — epoch-millis → timestamp coercion (TIMEFORMAT 'epochmillisecs',
# /root/reference/sql_queries.py:104). Fixture flavor: round-trip events.ts
# through epoch milliseconds (sub-ms precision is truncated identically by
# Spark unix_millis and DuckDB epoch_ms).
# ---------------------------------------------------------------------------

_ORACLE_A15 = """
SELECT event_id,
       epoch_ms(ts) AS ts_millis,
       epoch_ms(epoch_ms(ts)) AS ts_from_millis
FROM events
ORDER BY event_id
"""


@query("q_epoch_millis_ts", oracle=_ORACLE_A15)
def epoch_millis_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    millis = F.unix_millis(F.col("ts"))
    return ev.select(
        "event_id",
        millis.alias("ts_millis"),
        F.timestamp_millis(millis).alias("ts_from_millis"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# A16 — surrogate-key generation (IDENTITY(0,1),
# /root/reference/sql_queries.py:88). monotonically_increasing_id is the
# faithful analog (Redshift identity is also non-contiguous under parallel
# load — SURVEY §1). Values are partition-dependent → rows-only check.
# ---------------------------------------------------------------------------


def surrogate_key_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production projection: one nondeterministic 64-bit id per
    row (partition-id high bits + per-partition counter — no shuffle,
    no driver round-trip; the 100 TB surrogate-key shape)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.monotonically_increasing_id().alias("surrogate_id"),
        "event_id",
        "event_type",
    )


# Contract-oracle form (round 9, the r7/r8 rows-only-conversion
# pattern): the ids themselves are nondeterministic by design
# (partition layout decides them), but three claims are exact and
# SQL-checkable — the row count, distinctness (a THEOREM of
# monotonically_increasing_id: partition-unique counters under
# partition-unique prefixes), and non-negativity (ids are built from
# non-negative partition ids and counters). The raw projection stays
# available as surrogate_key_frame.
_ORACLE_SURROGATE = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(1 AS INTEGER) AS ids_distinct,
       CAST(1 AS INTEGER) AS ids_nonnegative
FROM events
"""


@query("q_surrogate_key", oracle=_ORACLE_SURROGATE)
def surrogate_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    frame = surrogate_key_frame(spark, sf_dir)
    return frame.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        (F.count_distinct("surrogate_id") == F.count(F.lit(1)))
        .cast("int")
        .alias("ids_distinct"),
        F.coalesce(F.min("surrogate_id") >= 0, F.lit(True))
        .cast("int")
        .alias("ids_nonnegative"),
    )
