"""Privacy auditing: k-anonymity over quasi-identifiers — "how many
individuals are re-identifiable because their attribute combination is
too rare?" The release-gating check that runs BEFORE the masked view
(`operators/masking.py`) ships data out.

Scale shape: one map-side-combined groupBy on the quasi-identifier
tuple (the equivalence classes), then a groups-sized rollup of the
class-size histogram. Counts are integers; rates are integer ratios —
cross-engine exact. At 100 TB the QI groupBy is the same shuffle as
any aggregation; the audit output is O(distinct QI combos), which is
the quantity k-anonymity is ABOUT, so it cannot blow up without the
release itself being unsafe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table

_K = 5

_ORACLE_KANON = f"""
WITH classes AS (
    SELECT c.c_mktsegment AS segment, n.n_name AS nation, COUNT(*) AS class_size
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY segment, nation
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(COUNT(*) FILTER (WHERE class_size < {_K}) AS BIGINT) AS n_unsafe_classes,
       CAST(SUM(class_size) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN class_size < {_K} THEN class_size ELSE 0 END) AS BIGINT)
           AS n_rows_suppressed,
       ROUND(SUM(CASE WHEN class_size < {_K} THEN class_size ELSE 0 END) * 1.0
             / SUM(class_size), 6) AS suppression_rate,
       CAST(MIN(class_size) AS BIGINT) AS k_achieved
FROM classes
"""


@query("q_k_anonymity", oracle=_ORACLE_KANON)
def k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit of the (market segment, nation) quasi-
    identifier: equivalence-class census, rows needing suppression to
    reach k={_K}, and the k actually achieved (the minimum class
    size)."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    classes = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"), F.col("n_name").alias("nation")
        )
        .agg(F.count(F.lit(1)).alias("class_size"))
    )
    unsafe = F.when(F.col("class_size") < _K, F.col("class_size")).otherwise(0)
    return classes.agg(
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.count(F.when(F.col("class_size") < _K, 1)).cast("long").alias(
            "n_unsafe_classes"
        ),
        F.sum("class_size").cast("long").alias("n_rows"),
        F.sum(unsafe).cast("long").alias("n_rows_suppressed"),
        F.round(F.sum(unsafe) / F.sum("class_size"), 6).alias("suppression_rate"),
        F.min("class_size").cast("long").alias("k_achieved"),
    )


# ---------------------------------------------------------------------------
# GDPR erasure (round 5) — the right-to-be-forgotten op: given a
# deletion list (subjects with user_id % 97 == 0 stand in for the DSR
# queue), produce the scrubbed events table and an erasure REPORT.
# Production shape: the deletion list is tiny relative to the corpus,
# so it BROADCASTS under a LEFT ANTI join — the corpus never shuffles
# for the erasure itself, and the rewrite composes with partitioned
# sinks so only partitions containing a subject rewrite. The report
# (what the auditor signs) carries per-subject erased-row counts plus
# a verified zero-residual flag computed from the SCRUBBED frame, so
# the claim is checked against the output, not assumed.
# ---------------------------------------------------------------------------

_ORACLE_ERASURE = """
WITH subjects AS (
    SELECT DISTINCT user_id FROM events WHERE user_id % 97 = 0
),
erased AS (
    SELECT e.user_id, CAST(COUNT(*) AS BIGINT) AS n_erased
    FROM events e JOIN subjects s USING (user_id)
    GROUP BY e.user_id
),
scrubbed AS (
    SELECT e.* FROM events e LEFT JOIN subjects s USING (user_id)
    WHERE s.user_id IS NULL
)
SELECT er.user_id, er.n_erased,
       CAST((SELECT COUNT(*) FROM scrubbed sc WHERE sc.user_id = er.user_id)
            AS BIGINT) AS n_residual
FROM erased er
ORDER BY er.user_id
"""


@query("q_gdpr_erasure", oracle=_ORACLE_ERASURE)
def gdpr_erasure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Erase all events of the deletion-list subjects; report erased
    counts per subject with a residual count verified on the scrubbed
    output (must be 0 by construction — the anti join IS the proof,
    and the report recomputes it rather than asserting it)."""
    ev = load_table(spark, sf_dir, "events")
    subjects = (
        ev.filter(F.col("user_id") % 97 == 0).select("user_id").distinct()
    )
    erased = (
        ev.join(F.broadcast(subjects), "user_id")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_erased"))
    )
    scrubbed = ev.join(F.broadcast(subjects), "user_id", "left_anti")
    residual = (
        scrubbed.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_resid"))
    )
    return (
        erased.join(residual, "user_id", "left")
        .select(
            "user_id",
            "n_erased",
            F.coalesce(F.col("n_resid"), F.lit(0)).cast("long").alias("n_residual"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Differentially-private noisy counts (round 5) — Laplace mechanism
# (Dwork et al. 2006, public literature) over per-event-type counts,
# sensitivity 1, epsilon 0.5 → scale b = 2. Noise is DETERMINISTIC
# for the oracle: u ∈ (0,1) derives from the md5 of the group key
# (the q_sample_hash pairing), and the Laplace inverse CDF
# x = -b·sign(u-1/2)·ln(1-2|u-1/2|) is one LN + fixed-order
# arithmetic — the LN-parity contract again. A production run swaps
# the hash-u for a real RNG; everything else (the mechanism, the
# post-processed non-negativity clamp, the epsilon ledger column) is
# the shipping shape. Map-side-combined count + per-group scalar
# noise: no extra shuffle beyond the aggregation.
# ---------------------------------------------------------------------------

_DP_EPS = 0.5
_DP_B = 1.0 / _DP_EPS  # sensitivity 1 / epsilon

_ORACLE_DP = f"""
WITH counts AS (
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS true_count
    FROM events WHERE event_type IS NOT NULL
    GROUP BY event_type
),
noised AS (
    SELECT event_type, true_count,
           (('0x' || substr(md5(event_type), 1, 15))::BIGINT % 1000000)
               / 1000000.0 + 0.0000005 AS u
    FROM counts
)
SELECT event_type, true_count,
       CAST(GREATEST(
           true_count + CAST(FLOOR(
               -{_DP_B} * (CASE WHEN u >= 0.5 THEN 1.0 ELSE -1.0 END)
               * LN(1.0 - 2.0 * ABS(u - 0.5)) + 0.5) AS BIGINT),
           0) AS BIGINT) AS dp_count,
       {_DP_EPS} AS epsilon
FROM noised
ORDER BY event_type
"""


@query("q_dp_noisy_counts", oracle=_ORACLE_DP)
def dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull()
    )
    counts = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("true_count")
    )
    u = (
        F.conv(F.substring(F.md5("event_type"), 1, 15), 16, 10).cast("long")
        % 1000000
    ) / F.lit(1000000.0) + F.lit(0.0000005)
    sign = F.when(u >= 0.5, F.lit(1.0)).otherwise(F.lit(-1.0))
    noise = F.floor(
        F.lit(-_DP_B) * sign * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(u - F.lit(0.5)))
        + F.lit(0.5)
    ).cast("long")
    return counts.select(
        "event_type",
        "true_count",
        F.greatest(F.col("true_count") + noise, F.lit(0).cast("long"))
        .cast("long")
        .alias("dp_count"),
        F.lit(_DP_EPS).alias("epsilon"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# l-diversity (round 11; Machanavajjhala et al. 2007, public
# literature): k-anonymity's successor check — an equivalence class
# can be large (k-safe) yet still leak if every member shares the
# SAME sensitive value. Distinct l-diversity requires ≥ l distinct
# sensitive values per class. Same scale shape as the k-anonymity
# audit: one QI groupBy whose agg adds a count_distinct of the
# sensitive attribute; output is O(distinct QI combos).
# ---------------------------------------------------------------------------

_L = 3

_ORACLE_LDIV = f"""
WITH classes AS (
    SELECT c.c_mktsegment AS segment, n.n_name AS nation,
           COUNT(*) AS class_size,
           COUNT(DISTINCT CASE
               WHEN c.c_acctbal < 0 THEN 'debt'
               WHEN c.c_acctbal < 5000 THEN 'mid'
               ELSE 'high' END) AS n_sensitive
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY segment, nation
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(COUNT(*) FILTER (WHERE n_sensitive < {_L}) AS BIGINT)
           AS n_undiverse_classes,
       CAST(SUM(CASE WHEN n_sensitive < {_L} THEN class_size ELSE 0 END)
            AS BIGINT) AS n_rows_at_risk,
       CAST(MIN(n_sensitive) AS BIGINT) AS l_achieved,
       ROUND(SUM(CASE WHEN n_sensitive < {_L} THEN class_size ELSE 0 END) * 1.0
             / SUM(class_size), 6) AS at_risk_rate
FROM classes
"""


@query("q_l_diversity", oracle=_ORACLE_LDIV)
def l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct l-diversity audit over the same (segment, nation)
    quasi-identifier as q_k_anonymity, with the banded account balance
    as the sensitive attribute: classes where fewer than l={_L}
    distinct sensitive bands co-occur leak the band by membership
    alone even when k-safe. Integer counts + one integer-ratio rate —
    cross-engine exact."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    band = (
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
    )
    classes = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"), F.col("n_name").alias("nation")
        )
        .agg(
            F.count(F.lit(1)).alias("class_size"),
            F.count_distinct(band).alias("n_sensitive"),
        )
    )
    at_risk = F.when(F.col("n_sensitive") < _L, F.col("class_size")).otherwise(0)
    return classes.agg(
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.count(F.when(F.col("n_sensitive") < _L, 1)).cast("long").alias(
            "n_undiverse_classes"
        ),
        F.sum(at_risk).cast("long").alias("n_rows_at_risk"),
        F.min("n_sensitive").cast("long").alias("l_achieved"),
        F.round(F.sum(at_risk) / F.sum("class_size"), 6).alias("at_risk_rate"),
    )


# ---------------------------------------------------------------------------
# t-closeness (round 11; Li, Li & Venkatasubramanian 2007, public
# literature): the third rung of the release-audit ladder — an
# l-diverse class still leaks when its sensitive DISTRIBUTION skews
# far from the table-wide one (e.g. a class that is 90% 'debt' in a
# 30%-debt population). For an ORDERED sensitive attribute with m
# equally-spaced bins, the Earth Mover's Distance reduces to
#   t = (1/(m-1)) · Σ_{i<m} | Σ_{j≤i} (p_j − q_j) |
# (cumulative-difference form). Same scale shape as the k-anonymity /
# l-diversity audits: one QI groupBy with per-band conditional
# counts, a broadcast 1-row global distribution, a per-class EMD
# projection, then a scalar rollup — output O(distinct QI combos).
# ---------------------------------------------------------------------------

_T_CLOSE = 0.2  # release threshold on EMD


def _band_case_sql(col: str) -> str:
    return (
        f"CASE WHEN {col} < 0 THEN 0 WHEN {col} < 5000 THEN 1 ELSE 2 END"
    )


_ORACLE_TCLOSE = f"""
WITH rows_banded AS (
    SELECT c.c_mktsegment AS segment, n.n_name AS nation,
           {_band_case_sql('c.c_acctbal')} AS band
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
),
globals AS (
    SELECT COUNT(*) AS big_n,
           SUM(CASE WHEN band = 0 THEN 1 ELSE 0 END) AS g0,
           SUM(CASE WHEN band = 1 THEN 1 ELSE 0 END) AS g1
    FROM rows_banded
),
classes AS (
    SELECT segment, nation, COUNT(*) AS n,
           SUM(CASE WHEN band = 0 THEN 1 ELSE 0 END) AS c0,
           SUM(CASE WHEN band = 1 THEN 1 ELSE 0 END) AS c1
    FROM rows_banded
    GROUP BY segment, nation
),
emd AS (
    SELECT segment, nation, n,
           (ABS(c0 * 1.0 / n - g0 * 1.0 / big_n)
            + ABS((c0 * 1.0 / n - g0 * 1.0 / big_n)
                  + (c1 * 1.0 / n - g1 * 1.0 / big_n))) / 2 AS t
    FROM classes CROSS JOIN globals
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(COUNT(*) FILTER (WHERE t > {_T_CLOSE}) AS BIGINT)
           AS n_skewed_classes,
       CAST(SUM(CASE WHEN t > {_T_CLOSE} THEN n ELSE 0 END) AS BIGINT)
           AS n_rows_at_risk,
       ROUND(MAX(t), 6) AS t_worst,
       ROUND(SUM(CASE WHEN t > {_T_CLOSE} THEN n ELSE 0 END) * 1.0
             / SUM(n), 6) AS at_risk_rate
FROM emd
"""


@query("q_t_closeness", oracle=_ORACLE_TCLOSE)
def t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit over the (segment, nation) quasi-identifier
    with the ordered banded balance as the sensitive attribute: EMD
    between each class's band distribution and the global one via the
    cumulative-difference closed form (expression trees parenthesized
    identically to the oracle; the only doubles are the two ratio
    differences, ROUND(.,6) at the rollup)."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    band = (
        F.when(F.col("c_acctbal") < 0, 0)
        .when(F.col("c_acctbal") < 5000, 1)
        .otherwise(2)
    )
    rows = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).select(
        F.col("c_mktsegment").alias("segment"),
        F.col("n_name").alias("nation"),
        band.alias("band"),
    )
    globals_ = rows.agg(
        F.count(F.lit(1)).alias("big_n"),
        F.sum((F.col("band") == 0).cast("long")).alias("g0"),
        F.sum((F.col("band") == 1).cast("long")).alias("g1"),
    )
    classes = rows.groupBy("segment", "nation").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("band") == 0).cast("long")).alias("c0"),
        F.sum((F.col("band") == 1).cast("long")).alias("c1"),
    )
    d0 = F.col("c0") * 1.0 / F.col("n") - F.col("g0") * 1.0 / F.col("big_n")
    d1 = F.col("c1") * 1.0 / F.col("n") - F.col("g1") * 1.0 / F.col("big_n")
    emd = classes.crossJoin(F.broadcast(globals_)).select(
        "segment",
        "nation",
        "n",
        ((F.abs(d0) + F.abs(d0 + d1)) / 2).alias("t"),
    )
    risky = F.when(F.col("t") > _T_CLOSE, F.col("n")).otherwise(0)
    return emd.agg(
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.count(F.when(F.col("t") > _T_CLOSE, 1)).cast("long").alias(
            "n_skewed_classes"
        ),
        F.sum(risky).cast("long").alias("n_rows_at_risk"),
        F.round(F.max("t"), 6).alias("t_worst"),
        F.round(F.sum(risky) / F.sum("n"), 6).alias("at_risk_rate"),
    )
