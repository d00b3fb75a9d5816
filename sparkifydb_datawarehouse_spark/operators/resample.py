"""Time-series regularization over `events`: downsample to a fixed
grid with gap fill, linearly interpolate the holes, and flag
anomalies with a trailing z-score.

The reference's `time` dimension explodes timestamps into dateparts
(/root/reference/sql_queries.py:161-173) — the warehouse-side
prerequisite for exactly this family: turning an irregular event
stream into an analyzable regular series.

Scale design (100 TB):
- Resample is one hash agg on (series, bucket). The dense grid comes
  from sequence()+explode of each series' [min, max] hour range —
  grid size is (time span × series count), independent of event
  volume, so the gap-fill join is a broadcast-scale right side even
  when the event side is petabytes.
- Interpolation and z-score are single window passes partitioned by
  series — state per partition is O(1) (last seen value / rolling
  moments), the streaming-friendly shape. A series so long one
  partition can't sort it gets range-bucketed first (window-over-
  bucket + boundary exchange), the standard long-series split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table

# ---------------------------------------------------------------------------
# Hourly resample with gap fill: avg(value) per (event_type, hour),
# every hour of each series' span present, missing hours NULL.
# ---------------------------------------------------------------------------

_ORACLE_RESAMPLE = """
WITH agg AS (
    SELECT event_type,
           date_trunc('hour', ts) AS bucket,
           ROUND(AVG(value), 4) AS avg_value,
           COUNT(*) AS n_events
    FROM events
    GROUP BY event_type, date_trunc('hour', ts)
), spans AS (
    SELECT event_type, MIN(bucket) AS lo, MAX(bucket) AS hi FROM agg GROUP BY event_type
), grid AS (
    SELECT s.event_type, g.bucket
    FROM spans s, LATERAL (
        SELECT UNNEST(generate_series(s.lo, s.hi, INTERVAL 1 HOUR)) AS bucket
    ) g
)
SELECT g.event_type, g.bucket, a.avg_value,
       COALESCE(a.n_events, 0) AS n_events
FROM grid g LEFT JOIN agg a
  ON a.event_type = g.event_type AND a.bucket = g.bucket
ORDER BY g.event_type, g.bucket
"""


def _resampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    agg = (
        ev.groupBy(
            "event_type", F.date_trunc("hour", "ts").alias("bucket")
        )
        .agg(
            F.round(F.avg("value"), 4).alias("avg_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    grid = (
        agg.groupBy("event_type")
        .agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi"))
        .select(
            "event_type",
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
            ).alias("bucket"),
        )
    )
    return (
        grid.join(agg, ["event_type", "bucket"], "left")
        .select(
            "event_type",
            "bucket",
            "avg_value",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
        )
    )


@query("q_ts_resample", oracle=_ORACLE_RESAMPLE)
def ts_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _resampled(spark, sf_dir).orderBy("event_type", "bucket")


# ---------------------------------------------------------------------------
# Linear interpolation of the gap-filled series: a missing bucket gets
# prev + (next - prev) * hours_since_prev / hours_between. Edges
# (before first / after last observation) stay NULL.
# ---------------------------------------------------------------------------

_ORACLE_INTERP = f"""
WITH series AS ({_ORACLE_RESAMPLE.replace("ORDER BY g.event_type, g.bucket", "")}),
marked AS (
    SELECT event_type, bucket, avg_value,
           last_value(avg_value IGNORE NULLS) OVER wb AS prev_v,
           last_value(CASE WHEN avg_value IS NOT NULL THEN bucket END IGNORE NULLS)
               OVER wb AS prev_t,
           first_value(avg_value IGNORE NULLS) OVER wf AS next_v,
           first_value(CASE WHEN avg_value IS NOT NULL THEN bucket END IGNORE NULLS)
               OVER wf AS next_t
    FROM series
    WINDOW wb AS (PARTITION BY event_type ORDER BY bucket
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           wf AS (PARTITION BY event_type ORDER BY bucket
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_type, bucket,
       -- 6 decimals, not 4: inputs are 4-decimal, so midpoint
       -- interpolation lands EXACTLY on 5th-decimal halves, where
       -- Spark (BigDecimal half-up on the shortest repr) and DuckDB
       -- (fp-multiply then half-away) round the same double
       -- differently. At 6 decimals every terminating case sits far
       -- from a boundary.
       ROUND(CASE
         WHEN avg_value IS NOT NULL THEN avg_value
         WHEN prev_v IS NULL OR next_v IS NULL THEN NULL
         ELSE prev_v + (next_v - prev_v)
              * EXTRACT(EPOCH FROM bucket - prev_t)
              / EXTRACT(EPOCH FROM next_t - prev_t)
       END, 6) AS value_interp,
       (avg_value IS NULL) AS was_gap
FROM marked
ORDER BY event_type, bucket
"""


@query("q_ts_interpolate", oracle=_ORACLE_INTERP)
def ts_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    series = _resampled(spark, sf_dir)
    # Both directions as CUMULATIVE frames: Spark's (currentRow,
    # unboundedFollowing) frame re-scans current→end for EVERY row —
    # O(n²) per partition, measured 26× at a 10× scale-up. last(...)
    # IGNORE NULLS over unboundedPreceding..currentRow is incremental
    # (O(1)/row), so the forward pass runs on the DESC ordering
    # instead: last non-null from the end down to the current row ≡
    # first non-null at-or-after it. Same values, linear cost.
    wb = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("event_type")
        .orderBy(F.col("bucket").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    obs_t = F.when(F.col("avg_value").isNotNull(), F.col("bucket"))
    marked = series.select(
        "event_type",
        "bucket",
        "avg_value",
        F.last("avg_value", ignorenulls=True).over(wb).alias("prev_v"),
        F.last(obs_t, ignorenulls=True).over(wb).alias("prev_t"),
        F.last("avg_value", ignorenulls=True).over(wf).alias("next_v"),
        F.last(obs_t, ignorenulls=True).over(wf).alias("next_t"),
    )
    # association order mirrors the oracle's `a + b * dt / dT`
    # (= a + ((b*dt)/dT)) exactly — both engines then produce the
    # bit-identical double, so ROUND(x, 4) can't straddle a half-way
    # boundary differently
    dt = F.col("bucket").cast("double") - F.col("prev_t").cast("double")
    dT = F.col("next_t").cast("double") - F.col("prev_t").cast("double")
    interp = (
        F.when(F.col("avg_value").isNotNull(), F.col("avg_value"))
        .when(F.col("prev_v").isNull() | F.col("next_v").isNull(), F.lit(None))
        .otherwise(
            F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * dt / dT
        )
    )
    return marked.select(
        "event_type",
        "bucket",
        F.round(interp, 6).alias("value_interp"),
        F.col("avg_value").isNull().alias("was_gap"),
    ).orderBy("event_type", "bucket")


# ---------------------------------------------------------------------------
# Trailing z-score anomaly flagging on the raw stream: each event
# scored against the mean/stddev of the previous N events of its
# type. Strictly-preceding frame = no self-influence (an outlier
# can't mask itself) and the online/streaming semantics.
# ---------------------------------------------------------------------------

_ZWIN = 200
_ZTHRESH = 3.0

# Formulation note (perf-critical): a naive AVG/STDDEV over a ROWS
# (-200, -1) frame re-evaluates the whole 200-row buffer FOR EVERY
# ROW — Spark's sliding-frame aggregates have no retraction, so cost
# is rows × frame (measured 6.8 s at sf0.1). Cumulative frames
# (UNBOUNDED PRECEDING .. CURRENT ROW) and lag() ARE incremental, so
# the trailing window's sum/sumsq are taken as prefix-sum
# DIFFERENCES: frame_sum_i = S_i - v_i - lag(S, W+1, 0). Same
# algebra, O(1)/row, ~10× faster — and the oracle uses the IDENTICAL
# formulation so both engines round the same doubles. (Cancellation
# safety: values are O(100), prefixes O(10⁷) — float64 leaves ~9
# significant digits in the difference, and z is rounded at 3.)

_ORACLE_ANOMALY = f"""
WITH sums AS (
    SELECT event_id, event_type, value, ts,
           ROW_NUMBER() OVER wo AS rn,
           SUM(value) OVER wc AS s,
           SUM(value * value) OVER wc AS q
    FROM events
    WINDOW wo AS (PARTITION BY event_type ORDER BY ts, event_id),
           wc AS (PARTITION BY event_type ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), pre AS (
    SELECT event_id, event_type, value, rn, s, q,
           COALESCE(LAG(s, {_ZWIN + 1}) OVER wo, 0) AS s_lag,
           COALESCE(LAG(q, {_ZWIN + 1}) OVER wo, 0) AS q_lag
    FROM sums
    WINDOW wo AS (PARTITION BY event_type ORDER BY ts, event_id)
), scored AS (
    SELECT event_id, event_type, value,
           LEAST(rn - 1, {_ZWIN}) AS n_prior,
           (s - value - s_lag) / LEAST(rn - 1, {_ZWIN}) AS mu,
           SQRT(
             ((q - value * value - q_lag)
              - LEAST(rn - 1, {_ZWIN})
                * ((s - value - s_lag) / LEAST(rn - 1, {_ZWIN}))
                * ((s - value - s_lag) / LEAST(rn - 1, {_ZWIN})))
             / (LEAST(rn - 1, {_ZWIN}) - 1)
           ) AS sigma
    FROM pre
    WHERE rn > 1
)
SELECT event_id, event_type, value,
       ROUND((value - mu) / sigma, 3) AS zscore
FROM scored
WHERE n_prior >= 30 AND sigma > 0
  AND ABS((value - mu) / sigma) > {_ZTHRESH}
ORDER BY event_id
"""


@query("q_anomaly_zscore", oracle=_ORACLE_ANOMALY)
def anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    wo = Window.partitionBy("event_type").orderBy("ts", "event_id")
    wc = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pre = ev.select(
        "event_id",
        "event_type",
        "value",
        F.row_number().over(wo).alias("rn"),
        F.sum("value").over(wc).alias("s"),
        F.sum(F.col("value") * F.col("value")).over(wc).alias("q"),
        F.coalesce(
            F.lag(F.sum("value").over(wc), _ZWIN + 1).over(wo), F.lit(0.0)
        ).alias("s_lag"),
        F.coalesce(
            F.lag(F.sum(F.col("value") * F.col("value")).over(wc), _ZWIN + 1).over(
                wo
            ),
            F.lit(0.0),
        ).alias("q_lag"),
    ).filter(F.col("rn") > 1)
    n = F.least(F.col("rn") - 1, F.lit(_ZWIN))
    mu = (F.col("s") - F.col("value") - F.col("s_lag")) / n
    sumsq = F.col("q") - F.col("value") * F.col("value") - F.col("q_lag")
    sigma = F.sqrt((sumsq - n * mu * mu) / (n - 1))
    scored = pre.select(
        "event_id",
        "event_type",
        "value",
        n.alias("n_prior"),
        mu.alias("mu"),
        sigma.alias("sigma"),
    )
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        scored.filter(
            (F.col("n_prior") >= 30) & (F.col("sigma") > 0) & (F.abs(z) > _ZTHRESH)
        )
        .select("event_id", "event_type", "value", F.round(z, 3).alias("zscore"))
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# OHLC candlestick downsample: per (event_type, day) the first/last/
# min/max value plus volume — the finance-standard "candle" rollup.
# ---------------------------------------------------------------------------

_ORACLE_OHLC = """
SELECT event_type,
       CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
       (min({'ts': ts, 'event_id': event_id, 'v': value})).v AS open,
       ROUND(MAX(value), 4) AS high,
       ROUND(MIN(value), 4) AS low,
       (max({'ts': ts, 'event_id': event_id, 'v': value})).v AS close,
       COUNT(*) AS volume
FROM events
GROUP BY 1, 2
ORDER BY event_type, bucket
"""


@query("q_ts_ohlc", oracle=_ORACLE_OHLC)
def ts_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC (open/high/low/close) downsample of `events` to daily candles.

    Capability family: the reference's `time` dimension
    (/root/reference/sql_queries.py:161-173) is the datepart half of
    bucketed downsampling; OHLC is the canonical per-bucket shape on top.

    Scale design (100 TB): ONE hash aggregation. Open/close are NOT
    window sorts — they are lexicographic struct extrema:
    min(struct(ts, event_id, value)).value is "value at the earliest
    (ts, event_id)" and participates in partial (map-side) aggregation,
    so the shuffle carries one 5-field row per (series, day), never the
    raw ticks. The window-function formulation (row_number = 1) would
    shuffle every tick into a per-group sort; the struct-extremum form
    is algebraically mergeable — the same trick DuckDB's arg_min/Spark's
    min_by use, widened to a composite tiebreak key (event_id) so ties
    on ts stay deterministic cross-engine.

    Physical note: struct-valued agg buffers are not hash-agg mutable,
    so Spark plans SortAggregate — still partial(map-side) + one
    exchange carrying per-group rows; the pre-agg sort is per-partition
    and spillable, not a global sort.
    """
    ev = load_table(spark, sf_dir, "events")
    tagged = F.struct("ts", "event_id", F.col("value").alias("v"))
    return (
        ev.groupBy(
            "event_type", F.date_trunc("day", "ts").alias("bucket")
        )
        .agg(
            F.min(tagged)["v"].alias("open"),
            F.round(F.max("value"), 4).alias("high"),
            F.round(F.min("value"), 4).alias("low"),
            F.max(tagged)["v"].alias("close"),
            F.count(F.lit(1)).alias("volume"),
        )
        .orderBy("event_type", "bucket")
    )


# ---------------------------------------------------------------------------
# Hypertable-style multi-resolution rollup: hour + day + grand total
# per series in ONE scan (grouping sets over pre-computed truncs).
# ---------------------------------------------------------------------------

_ORACLE_MULTIRES = """
WITH b AS (
    SELECT event_type,
           CAST(date_trunc('day', ts) AS TIMESTAMP)  AS bucket_day,
           CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket_hour,
           value
    FROM events
)
SELECT CASE WHEN bucket_hour IS NOT NULL THEN 'hour'
            WHEN bucket_day  IS NOT NULL THEN 'day'
            ELSE 'series' END AS level,
       event_type, bucket_day, bucket_hour,
       ROUND(SUM(value), 4) AS sum_value,
       COUNT(*) AS n_events
FROM b
GROUP BY GROUPING SETS ((event_type, bucket_day, bucket_hour),
                        (event_type, bucket_day),
                        (event_type))
ORDER BY level, event_type, bucket_day, bucket_hour
"""


@query("q_rollup_timebucket", oracle=_ORACLE_MULTIRES)
def rollup_timebucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TimescaleDB-hypertable-style continuous-aggregate rollup: the
    hour, day, and whole-series resolutions of each event series
    materialized from ONE scan via GROUPING SETS.

    The level label is derived from bucket nullness (not engine
    grouping_id() bit layouts, which differ across engines).

    Scale design (100 TB): GROUPING SETS expands each input row to its
    grouping combinations AFTER partial aggregation of the finest level
    in Spark's Expand+HashAggregate pipeline — the shuffle carries
    (3 × distinct-hour-buckets) partial rows, not 3× the raw events.
    The hierarchical alternative (reaggregate day FROM hour partials,
    the true continuous-aggregate cascade) is what `operators/matview.py`
    implements for incremental refresh; this operator is the one-shot
    batch form. Sum/count are mergeable partials, so both compose.
    """
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        F.date_trunc("day", "ts").alias("bucket_day"),
        F.date_trunc("hour", "ts").alias("bucket_hour"),
        "value",
    )
    # DataFrame groupingSets API (Spark 4) rather than a session-global
    # temp view: a shared view name would let a second caller silently
    # redirect this lazy plan before collection
    agg = base.groupingSets(
        [
            ["event_type", "bucket_day", "bucket_hour"],
            ["event_type", "bucket_day"],
            ["event_type"],
        ],
        "event_type",
        "bucket_day",
        "bucket_hour",
    ).agg(
        F.round(F.sum("value"), 4).alias("sum_value"),
        F.count(F.lit(1)).alias("n_events"),
    )
    level = (
        F.when(F.col("bucket_hour").isNotNull(), F.lit("hour"))
        .when(F.col("bucket_day").isNotNull(), F.lit("day"))
        .otherwise(F.lit("series"))
    )
    return agg.select(
        level.alias("level"),
        "event_type",
        "bucket_day",
        "bucket_hour",
        "sum_value",
        "n_events",
    ).orderBy("level", "event_type", "bucket_day", "bucket_hour")


_ORACLE_BANDS = """
SELECT date_trunc('week', CAST(o_orderdate AS DATE)) AS week,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       quantile_disc(o_totalprice, 0.1) AS p10,
       quantile_disc(o_totalprice, 0.5) AS p50,
       quantile_disc(o_totalprice, 0.9) AS p90
FROM orders
GROUP BY week
ORDER BY week
"""


@query("q_percentile_bands", oracle=_ORACLE_BANDS)
def percentile_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly p10/p50/p90 bands of order value — the contour chart
    behind every 'order value over time' dashboard. DISCRETE
    percentiles (smallest value whose cumulative rank reaches p, the
    q_agg_percentile_disc emulation): always an actual price, so the
    cross-engine compare is exact with NO rounding discipline at all —
    the interpolated form lands exactly on ROUND's half-cent grid
    (0.9·(hi−lo) over 2-decimal prices) where the engines' tie rules
    diverge. One week-keyed window + one aggregation."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders").withColumn(
        "week", F.date_trunc("week", F.col("o_orderdate").cast("date")).cast("date")
    )
    w = Window.partitionBy("week").orderBy("o_totalprice")
    ranked = orders.select(
        "week",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("week")).alias("n"),
    )

    def disc(p: float):
        return F.min(
            F.when(F.col("rn") >= F.ceil(F.lit(p) * F.col("n")), F.col("o_totalprice"))
        )

    return (
        ranked.groupBy("week")
        .agg(
            F.max("n").cast("long").alias("n_orders"),
            disc(0.1).alias("p10"),
            disc(0.5).alias("p50"),
            disc(0.9).alias("p90"),
        )
        .orderBy("week")
    )
