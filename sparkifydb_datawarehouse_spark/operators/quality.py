"""Data-quality audit operators.

The reference tolerates constraint violations by design: Redshift
leaves PK/FK unenforced, `user_table_insert` lands duplicate user_ids
(/root/reference/sql_queries.py:133-136) and the fact table is
inserted before its dimensions (/root/reference/sql_queries.py:196-202).
A warehouse built that way needs audit queries that MEASURE the
violations instead of preventing them — the Deequ/great-expectations
shape, expressed as plain aggregations so they run at 100 TB cost:
one scan per table, partial aggs, tiny outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table

# ---------------------------------------------------------------------------
# Referential-integrity audit: orphaned foreign keys per relationship.
# Anti-join counts — each relationship is one left_anti against the
# parent's key set; the parent side is distinct-projected first, so
# even a 100 TB fact table shuffles only keys.
# ---------------------------------------------------------------------------

_ORACLE_REFERENTIAL = """
SELECT relationship, n_orphans, n_rows,
       ROUND(n_orphans * 1.0 / n_rows, 6) AS orphan_frac
FROM (
    SELECT 'lineitem.l_orderkey->orders' AS relationship, 1 AS ord,
           (SELECT COUNT(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans,
           (SELECT COUNT(*) FROM lineitem) AS n_rows
    UNION ALL
    SELECT 'orders.o_custkey->customer', 2,
           (SELECT COUNT(*) FROM orders x
            WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = x.o_custkey)),
           (SELECT COUNT(*) FROM orders)
    UNION ALL
    SELECT 'lineitem.l_partkey->part', 3,
           (SELECT COUNT(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)),
           (SELECT COUNT(*) FROM lineitem)
) ORDER BY ord
"""


def referential_audit(child: DataFrame, fk: str, parent: DataFrame, pk: str,
                      name: str, ord_: int) -> DataFrame:
    """One relationship's orphan count as a single-row DataFrame.

    No driver-side count(): both scalars stay DataFrames and meet in a
    1x1 cross join, so the audit is one lazy distributed plan.
    """
    orphans = child.join(
        parent.select(pk).distinct(), child[fk] == parent[pk], "left_anti"
    ).agg(F.count(F.lit(1)).alias("n_orphans"))
    total = child.agg(F.count(F.lit(1)).alias("n_rows"))
    return orphans.crossJoin(F.broadcast(total)).select(
        F.lit(name).alias("relationship"),
        F.lit(ord_).alias("ord"),
        F.col("n_orphans"),
        F.col("n_rows"),
        # try_divide: an empty child table is a routine slice at scale;
        # the audit reports NULL fraction over 0 rows instead of raising
        F.round(F.try_divide(F.col("n_orphans"), F.col("n_rows")), 6).alias(
            "orphan_frac"
        ),
    )


@query("q_dq_referential", oracle=_ORACLE_REFERENTIAL)
def dq_referential(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    p = load_table(spark, sf_dir, "part")

    rels = [
        referential_audit(
            li, "l_orderkey", o, "o_orderkey", "lineitem.l_orderkey->orders", 1
        ),
        referential_audit(
            o, "o_custkey", c, "c_custkey", "orders.o_custkey->customer", 2
        ),
        referential_audit(
            li, "l_partkey", p, "p_partkey", "lineitem.l_partkey->part", 3
        ),
    ]
    out = rels[0]
    for r in rels[1:]:
        out = out.unionAll(r)
    return out.orderBy("ord").select(
        "relationship", "n_orphans", "n_rows", "orphan_frac"
    )


# ---------------------------------------------------------------------------
# Column-constraint audit: null / range / set-membership / uniqueness
# violations in ONE pass over the table (a single aggregation row,
# conditional-sum per rule). This is the scan-cost-optimal shape: k
# rules cost one scan, not k scans.
# ---------------------------------------------------------------------------

_ORACLE_CONSTRAINTS = """
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_custkey,
       CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS nonpositive_price,
       CAST(SUM(CASE WHEN o_orderstatus NOT IN ('F','O','P') THEN 1 ELSE 0 END) AS BIGINT) AS bad_status,
       CAST(SUM(CASE WHEN o_orderdate < TIMESTAMP '1990-01-01'
                  OR o_orderdate > TIMESTAMP '2030-01-01' THEN 1 ELSE 0 END) AS BIGINT) AS date_out_of_range,
       COUNT(*) - COUNT(DISTINCT o_orderkey) AS duplicate_keys
FROM orders
"""


@query("q_dq_constraints", oracle=_ORACLE_CONSTRAINTS)
def dq_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")

    def violations(cond) -> F.Column:
        return F.sum(F.when(cond, 1).otherwise(0))

    return o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        violations(F.col("o_custkey").isNull()).alias("null_custkey"),
        violations(F.col("o_totalprice") <= 0).alias("nonpositive_price"),
        violations(~F.col("o_orderstatus").isin("F", "O", "P")).alias("bad_status"),
        violations(
            (F.col("o_orderdate") < "1990-01-01")
            | (F.col("o_orderdate") > "2030-01-01")
        ).alias("date_out_of_range"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("duplicate_keys"),
    )


# ---------------------------------------------------------------------------
# Observed metrics: the same constraint audit attached to a PRODUCTION
# query via df.observe() — metrics ride the main query's single pass as
# accumulators (zero extra scans, zero extra shuffles), the Deequ
# "analyzer on the write path" shape. At 100 TB this is the difference
# between auditing for free and paying a second full scan.
#
# Not a registry query (its output is the observation, not a
# DataFrame); exercised by tests/test_observe_metrics.py.
# ---------------------------------------------------------------------------


def orders_with_observed_audit(spark: SparkSession, sf_dir: str):
    """Return (df, observation): `df` is a normal projection of orders
    (the "production" query); collecting it fills `observation` with
    the audit metrics computed during that same pass."""
    from pyspark.sql import Observation

    o = load_table(spark, sf_dir, "orders")
    obs = Observation("orders_audit")
    observed = o.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).alias(
            "null_custkey"
        ),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias(
            "nonpositive_price"
        ),
        F.max("o_totalprice").alias("max_price"),
    )
    return observed.select("o_orderkey", "o_totalprice"), obs


# ---------------------------------------------------------------------------
# Freshness audit — completes the DQ family (referential, constraint,
# observed): per-series lag behind the newest data in the table. The
# first thing an on-call checks when a pipeline "looks done but
# isn't": one series silently stalled while the rest kept loading.
# One scan, one tiny agg; at 100 TB the same query runs on partition
# metadata (max per partition) instead of rows — same contract.
# ---------------------------------------------------------------------------

_ORACLE_FRESHNESS = """
WITH per_type AS (
    SELECT event_type, MAX(ts) AS latest, COUNT(*) AS n_events
    FROM events GROUP BY event_type
), g AS (SELECT MAX(latest) AS global_latest FROM per_type)
SELECT p.event_type,
       p.latest,
       CAST(ROUND(EXTRACT(EPOCH FROM g.global_latest - p.latest) / 60.0, 0) AS BIGINT)
           AS lag_minutes,
       CAST(p.n_events AS BIGINT) AS n_events
FROM per_type p, g
ORDER BY event_type
"""


@query("q_dq_freshness", oracle=_ORACLE_FRESHNESS)
def dq_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.max("ts").alias("latest"), F.count(F.lit(1)).alias("n_events")
    )
    g = per_type.agg(F.max("latest").alias("global_latest"))
    lag_min = F.round(
        (
            F.col("global_latest").cast("double") - F.col("latest").cast("double")
        )
        / 60.0,
        0,
    ).cast("long")
    return (
        per_type.crossJoin(F.broadcast(g))
        .select("event_type", "latest", lag_min.alias("lag_minutes"), "n_events")
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Uniqueness audit — the candidate-key check that the referential and
# constraint audits assume: for each proposed key, how many key values
# are duplicated and how deep. One hash agg per key (shuffle carries
# distinct key values), then a dimensions-sized summary. The
# reference's PKs are unenforced (SURVEY §1) — this measures what that
# tolerates, completing the DQ family (referential/constraints/
# freshness/uniqueness).
# ---------------------------------------------------------------------------

_ORACLE_UNIQUENESS = """
WITH e1 AS (
    SELECT event_id, COUNT(*) AS m FROM events GROUP BY event_id
), e2 AS (
    SELECT user_id, ts, COUNT(*) AS m FROM events GROUP BY user_id, ts
)
SELECT candidate_key, ord, n_keys, n_dup_keys, n_excess_rows, max_multiplicity,
       CAST(n_dup_keys AS BIGINT) = 0 AS is_unique
FROM (
    SELECT 'events(event_id)' AS candidate_key, 1 AS ord,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(COUNT(*) FILTER (WHERE m > 1) AS BIGINT) AS n_dup_keys,
           CAST(SUM(m - 1) AS BIGINT) AS n_excess_rows,
           CAST(MAX(m) AS BIGINT) AS max_multiplicity
    FROM e1
    UNION ALL
    SELECT 'events(user_id, ts)', 2,
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) FILTER (WHERE m > 1) AS BIGINT),
           CAST(SUM(m - 1) AS BIGINT),
           CAST(MAX(m) AS BIGINT)
    FROM e2
)
ORDER BY ord
"""


def uniqueness_audit(df: DataFrame, key_cols: list[str], name: str, ord_: int) -> DataFrame:
    m = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("m"))
    return m.agg(
        F.lit(name).alias("candidate_key"),
        F.lit(ord_).alias("ord"),
        F.count(F.lit(1)).alias("n_keys"),
        F.sum((F.col("m") > 1).cast("long")).alias("n_dup_keys"),
        F.sum(F.col("m") - 1).alias("n_excess_rows"),
        F.max("m").alias("max_multiplicity"),
    ).select(
        "candidate_key", "ord", "n_keys", "n_dup_keys", "n_excess_rows",
        "max_multiplicity", (F.col("n_dup_keys") == 0).alias("is_unique"),
    )


@query("q_dq_uniqueness", oracle=_ORACLE_UNIQUENESS)
def dq_uniqueness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    a = uniqueness_audit(ev, ["event_id"], "events(event_id)", 1)
    b = uniqueness_audit(ev, ["user_id", "ts"], "events(user_id, ts)", 2)
    return a.unionByName(b).orderBy("ord")


# ---------------------------------------------------------------------------
# Volume anomaly: day-over-day ingest-count z-score against the
# trailing 14 days — the data-observability monitor that catches a
# broken producer or a double-load BEFORE value-level checks can
# (complements q_anomaly_zscore, which scores VALUES within a
# series; this scores the row volume of the feed itself).
# ---------------------------------------------------------------------------

_VOL_WIN = 14

_ORACLE_VOLUME_ANOMALY = f"""
WITH daily AS (
    SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM events GROUP BY day
), stats AS (
    SELECT day, n_rows,
           COUNT(*) OVER w AS w_n,
           SUM(n_rows) OVER w AS w_sum,
           SUM(n_rows * n_rows) OVER w AS w_sumsq
    FROM daily
    WINDOW w AS (ORDER BY day ROWS BETWEEN {_VOL_WIN} PRECEDING AND 1 PRECEDING)
)
SELECT day, n_rows,
       CAST(w_n AS BIGINT) AS window_days,
       ROUND((n_rows - w_sum * 1.0 / w_n)
             / SQRT((w_sumsq - w_sum * 1.0 * w_sum / w_n) / (w_n - 1)), 4)
           AS z_score
FROM stats
WHERE w_n >= 7
  AND (w_sumsq - w_sum * 1.0 * w_sum / w_n) > 0
ORDER BY day
"""


@query("q_dq_volume_anomaly", oracle=_ORACLE_VOLUME_ANOMALY)
def dq_volume_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily ingest volume z-scored against the trailing 14 days
    (current day excluded from its own baseline; days with under 7
    baseline days are warm-up and skipped).

    The fact table folds to one row per day BEFORE the window, so the
    trailing frame runs over calendar-length data at any scale; the
    baseline (n, sum, sumsq) triple is exact BIGINT and the z itself
    is the single assembled double, ROUND 4. At 100 TB this is the
    query you point at every feed's partition counts, keyed by feed —
    the unpartitioned window here is one global series and would
    become partitionBy(feed) with more than one.
    """
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    from pyspark.sql import Window

    w = Window.orderBy("day").rowsBetween(-_VOL_WIN, -1)
    stats = daily.select(
        "day",
        "n_rows",
        F.count(F.lit(1)).over(w).alias("w_n"),
        F.sum("n_rows").over(w).alias("w_sum"),
        F.sum(F.col("n_rows") * F.col("n_rows")).over(w).alias("w_sumsq"),
    )
    var_num = F.col("w_sumsq") - F.col("w_sum") * 1.0 * F.col("w_sum") / F.col("w_n")
    z = (F.col("n_rows") - F.col("w_sum") * 1.0 / F.col("w_n")) / F.sqrt(
        var_num / (F.col("w_n") - 1)
    )
    return (
        stats.filter((F.col("w_n") >= 7) & (var_num > 0))
        .select(
            "day",
            "n_rows",
            F.col("w_n").cast("long").alias("window_days"),
            F.round(z, 4).alias("z_score"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Rapid-repeat screen: consecutive orders by the same customer within
# 2 days, with the amount delta — the duplicate-payment / anomalous-
# reorder audit finance ops runs daily. (An exact-amount match is the
# textbook form, but continuous amounts make exact collisions
# measure-zero — real screens key on the customer and report the
# amount delta, as here.) One window partitioned by customer;
# per-customer order counts are bounded, so the sort is skew-free.
# ---------------------------------------------------------------------------

_DUP_WINDOW_DAYS = 2

_ORACLE_RAPID_REPEAT = f"""
WITH keyed AS (
    SELECT o_custkey AS cust_key,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
           CAST(o_orderdate AS DATE) AS day,
           o_orderkey AS order_key,
           LAG(CAST(o_orderdate AS DATE)) OVER w AS prev_day,
           LAG(o_orderkey) OVER w AS prev_order_key,
           LAG(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER w AS prev_cents
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY CAST(o_orderdate AS DATE), o_orderkey)
)
SELECT cust_key, prev_order_key, order_key, prev_day, day,
       CAST(day - prev_day AS BIGINT) AS gap_days,
       ABS(cents - prev_cents) AS amount_delta_cents
FROM keyed
WHERE prev_day IS NOT NULL AND day - prev_day <= {_DUP_WINDOW_DAYS}
ORDER BY cust_key, order_key
"""


@query("q_dq_rapid_repeat", oracle=_ORACLE_RAPID_REPEAT)
def dq_rapid_repeat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive orders by the same customer within 2 days,
    reported as (previous, current) pairs with the day gap and the
    absolute amount delta in cents — small deltas at small gaps are
    the duplicate-payment candidates a human reviews.

    One shuffle on cust_key; the frame is the customer's own order
    history (bounded), all comparisons integer.
    """
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("cust_key"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
        F.col("o_orderdate").cast("date").alias("day"),
        F.col("o_orderkey").alias("order_key"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("cust_key").orderBy("day", "order_key")
    keyed = o.select(
        "cust_key",
        "cents",
        "day",
        "order_key",
        F.lag("day").over(w).alias("prev_day"),
        F.lag("order_key").over(w).alias("prev_order_key"),
        F.lag("cents").over(w).alias("prev_cents"),
    )
    return (
        keyed.filter(
            F.col("prev_day").isNotNull()
            & (F.datediff("day", "prev_day") <= _DUP_WINDOW_DAYS)
        )
        .select(
            "cust_key",
            "prev_order_key",
            "order_key",
            "prev_day",
            "day",
            F.datediff("day", "prev_day").cast("long").alias("gap_days"),
            F.abs(F.col("cents") - F.col("prev_cents")).alias("amount_delta_cents"),
        )
        .orderBy("cust_key", "order_key")
    )
