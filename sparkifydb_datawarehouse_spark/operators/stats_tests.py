"""Distribution tests & concentration statistics: Kolmogorov–Smirnov,
Benford first-digit audit, Gini / Lorenz concentration, CUSUM
change-point. The analytical layer a warehouse user runs AFTER the
aggregates: "are these two populations the same?", "is this ledger
fabricated?", "how concentrated is revenue?", "when did the level
shift?".

The reference (drpdr/sparkifydb-datawarehouse, sql_queries.py) stops at
plain aggregates; these are the standard follow-on statistics expressed
warehouse-side, each written in its 100 TB shape:

- KS: the ECDF prefix-sums use the SAME two-phase range-partition +
  per-partition-offset scan as `enumeration.global_rownumber` — no
  single-partition global window anywhere near fact-sized data. The
  per-distinct-value grid is an aggregate (map-side combined), not the
  facts.
- Benford: map-side digit extraction → 9-row aggregate. Pure codegen.
- Gini: ranks come from the same two-phase enumeration over the
  per-customer AGGREGATE (never facts); the rank-weighted sum
  Σ i·xᵢ is a mergeable partial.
- CUSUM: computed on integer CENTS with the mean division eliminated
  algebraically (argmax |n·prefixᵢ − i·total|), so the statistic is
  EXACT integer arithmetic end-to-end — no cross-engine float-sum
  drift at any scale (see ORACLES.md round-3 notes).

Float discipline: every division is integer/integer → double (IEEE-
deterministic); every transcendental (log10 in Benford) is rounded
independently on each side BEFORE differencing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table


def _ranged_enumerate(df: DataFrame, order_cols: list[str], k: int) -> DataFrame:
    """Two-phase global row_number over `order_cols` (must be a total
    order): range exchange → per-partition offsets → offset + local
    rank. Same scheme as enumeration.global_rownumber; localCheckpoint
    pins the sampled range boundaries so both passes see one
    partitioning."""
    ranged = (
        df.repartitionByRange(k, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    offsets = (
        ranged.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .withColumn(
            "_offset",
            F.coalesce(
                F.sum("_cnt").over(
                    Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("_pid", "_offset")
    )
    w_local = Window.partitionBy("_pid").orderBy(*order_cols)
    return (
        ranged.withColumn("_rn_local", F.row_number().over(w_local))
        .join(F.broadcast(offsets), "_pid")
        .withColumn("_rank", F.col("_offset") + F.col("_rn_local"))
        .drop("_pid", "_rn_local", "_offset")
    )


_ORACLE_KS = """
WITH vals AS (
    SELECT l_extendedprice AS v,
           COUNT(*) FILTER (WHERE l_returnflag = 'R') AS ca,
           COUNT(*) FILTER (WHERE l_returnflag = 'A') AS cb
    FROM lineitem
    WHERE l_returnflag IN ('R', 'A')
    GROUP BY l_extendedprice
), cum AS (
    SELECT CAST(SUM(ca) OVER (ORDER BY v) AS BIGINT) AS cum_a,
           CAST(SUM(cb) OVER (ORDER BY v) AS BIGINT) AS cum_b,
           CAST(SUM(ca) OVER () AS BIGINT) AS na,
           CAST(SUM(cb) OVER () AS BIGINT) AS nb
    FROM vals
)
SELECT ROUND(MAX(ABS(cum_a * 1.0 / na - cum_b * 1.0 / nb)), 6) AS ks_stat,
       MAX(na) AS n_a,
       MAX(nb) AS n_b
FROM cum
"""


@query("q_ks_two_sample", oracle=_ORACLE_KS)
def ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov D between the price distributions
    of returned ('R') vs accepted ('A') lineitems.

    D = max over distinct values of |ECDF_R − ECDF_A|. The value grid
    is a per-distinct-price aggregate with per-group counts of each
    population (one shuffle, map-side combined); the cumulative counts
    come from the two-phase range scan (see module docstring), so no
    stage ever sorts more than one balanced range partition. Counts are
    integers → the ECDFs are exact rationals → cross-engine
    deterministic.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("R", "A")
    )
    vals = li.groupBy(F.col("l_extendedprice").alias("v")).agg(
        F.count(F.when(F.col("l_returnflag") == "R", 1)).alias("ca"),
        F.count(F.when(F.col("l_returnflag") == "A", 1)).alias("cb"),
    )
    k = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    ranged = (
        vals.repartitionByRange(k, "v")
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    # per-partition subtotals of BOTH counters -> exclusive prefix offsets
    offsets = (
        ranged.groupBy("_pid")
        .agg(F.sum("ca").alias("pa"), F.sum("cb").alias("pb"))
        .select(
            "_pid",
            F.coalesce(
                F.sum("pa").over(
                    Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).alias("off_a"),
            F.coalesce(
                F.sum("pb").over(
                    Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).alias("off_b"),
        )
    )
    w_local = Window.partitionBy("_pid").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = (
        ranged.withColumn("la", F.sum("ca").over(w_local))
        .withColumn("lb", F.sum("cb").over(w_local))
        .join(F.broadcast(offsets), "_pid")
        .select(
            (F.col("off_a") + F.col("la")).alias("cum_a"),
            (F.col("off_b") + F.col("lb")).alias("cum_b"),
        )
    )
    totals = li.agg(
        F.count(F.when(F.col("l_returnflag") == "R", 1)).alias("na"),
        F.count(F.when(F.col("l_returnflag") == "A", 1)).alias("nb"),
    )
    return cum.crossJoin(F.broadcast(totals)).agg(
        F.round(
            F.max(
                F.abs(
                    F.col("cum_a") / F.col("na") - F.col("cum_b") / F.col("nb")
                )
            ),
            6,
        ).alias("ks_stat"),
        F.max("na").alias("n_a"),
        F.max("nb").alias("n_b"),
    )


_ORACLE_MANNWHITNEY = """
WITH vals AS (
    SELECT l_quantity AS v,
           COUNT(*) FILTER (WHERE l_returnflag = 'R') AS ca,
           COUNT(*) FILTER (WHERE l_returnflag = 'A') AS cb
    FROM lineitem
    WHERE l_returnflag IN ('R', 'A')
    GROUP BY l_quantity
), ranked AS (
    SELECT ca, cb, ca + cb AS t,
           CAST(COALESCE(SUM(ca + cb) OVER (
               ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS BIGINT) AS before
    FROM vals
), agg AS (
    SELECT CAST(SUM(ca) AS BIGINT) AS n1,
           CAST(SUM(cb) AS BIGINT) AS n2,
           SUM(ca * (before + (t + 1) / 2.0)) AS r1,
           SUM(CAST(t AS DOUBLE) * t * t - t) AS tie_term
    FROM ranked
)
SELECT ROUND(r1 - n1 * (n1 + 1) / 2.0, 1) AS u_stat,
       n1, n2,
       ROUND((r1 - n1 * (n1 + 1) / 2.0 - n1 * n2 / 2.0)
             / SQRT(n1 * 1.0 * n2 / 12.0
                    * ((n1 + n2 + 1.0)
                       - tie_term / ((n1 + n2) * 1.0 * (n1 + n2 - 1)))), 6) AS z_score
FROM agg
"""


@query("q_mannwhitney_u", oracle=_ORACLE_MANNWHITNEY)
def mannwhitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U rank-sum test (returned vs accepted lineitem
    quantities) with midrank tie handling and the tie-corrected normal
    approximation z.

    The rank machinery never ranks rows: quantities collapse to a
    per-distinct-value grid (domain-bounded — ~50 values here, and in
    general |grid| ≪ |facts| after the map-side-combined count), and
    midranks come from an exclusive prefix sum over that grid. Every
    quantity is a count or a half-integer — sums are EXACT in doubles
    (< 2^53), so U is cross-engine deterministic; only the final z
    divides/roots.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("R", "A")
    )
    vals = li.groupBy(F.col("l_quantity").alias("v")).agg(
        F.count(F.when(F.col("l_returnflag") == "R", 1)).alias("ca"),
        F.count(F.when(F.col("l_returnflag") == "A", 1)).alias("cb"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    ranked = vals.withColumn("t", F.col("ca") + F.col("cb")).withColumn(
        "before", F.coalesce(F.sum(F.col("ca") + F.col("cb")).over(w), F.lit(0))
    )
    agg = ranked.agg(
        F.sum("ca").alias("n1"),
        F.sum("cb").alias("n2"),
        F.sum(F.col("ca") * (F.col("before") + (F.col("t") + 1) / 2.0)).alias("r1"),
        F.sum(
            F.col("t").cast("double") * F.col("t") * F.col("t") - F.col("t")
        ).alias("tie_term"),
    )
    u = F.col("r1") - F.col("n1") * (F.col("n1") + 1) / 2.0
    n = F.col("n1") + F.col("n2")
    sigma = F.sqrt(
        F.col("n1") * 1.0 * F.col("n2") / 12.0
        * ((n + 1.0) - F.col("tie_term") / (n * 1.0 * (n - 1)))
    )
    return agg.select(
        F.round(u, 1).alias("u_stat"),
        "n1",
        "n2",
        F.round((u - F.col("n1") * F.col("n2") / 2.0) / sigma, 6).alias("z_score"),
    )


_ORACLE_WELCH = """
WITH g AS (
    SELECT l_returnflag,
           COUNT(*) AS n, AVG(l_extendedprice) AS m, VAR_SAMP(l_extendedprice) AS v
    FROM lineitem
    WHERE l_returnflag IN ('R', 'A')
    GROUP BY l_returnflag
), w AS (
    SELECT MAX(CASE WHEN l_returnflag = 'R' THEN n END) AS n1,
           MAX(CASE WHEN l_returnflag = 'R' THEN m END) AS m1,
           MAX(CASE WHEN l_returnflag = 'R' THEN v END) AS v1,
           MAX(CASE WHEN l_returnflag = 'A' THEN n END) AS n2,
           MAX(CASE WHEN l_returnflag = 'A' THEN m END) AS m2,
           MAX(CASE WHEN l_returnflag = 'A' THEN v END) AS v2
    FROM g
)
SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
       ROUND(m1 - m2, 4) AS mean_diff,
       ROUND((m1 - m2) / SQRT(v1 / n1 + v2 / n2), 6) AS t_stat,
       ROUND(POWER(v1 / n1 + v2 / n2, 2)
             / (POWER(v1 / n1, 2) / (n1 - 1) + POWER(v2 / n2, 2) / (n2 - 1)), 2) AS df_welch
FROM w
"""


@query("q_welch_ttest", oracle=_ORACLE_WELCH)
def welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test between returned and accepted
    price populations: single-pass streaming moments per group (same
    mergeable-partial shuffle shape as SUM — two rows leave the agg),
    then the t statistic and Welch–Satterthwaite df on the driver-sized
    result. Rounded at 6/4/2: the moments are float sums whose last
    ulps differ by engine summation order; t is O(1) so ulp-level input
    drift is invisible at 6 decimals."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("R", "A")
    )
    g = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("l_extendedprice").alias("m"),
        F.var_samp("l_extendedprice").alias("v"),
    )
    w = g.agg(
        *[
            F.max(F.when(F.col("l_returnflag") == flag, F.col(c))).alias(f"{c}{i}")
            for i, flag in ((1, "R"), (2, "A"))
            for c in ("n", "m", "v")
        ]
    )
    se2 = F.col("v1") / F.col("n1") + F.col("v2") / F.col("n2")
    return w.select(
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        F.round(F.col("m1") - F.col("m2"), 4).alias("mean_diff"),
        F.round((F.col("m1") - F.col("m2")) / F.sqrt(se2), 6).alias("t_stat"),
        F.round(
            F.pow(se2, 2)
            / (
                F.pow(F.col("v1") / F.col("n1"), 2) / (F.col("n1") - 1)
                + F.pow(F.col("v2") / F.col("n2"), 2) / (F.col("n2") - 1)
            ),
            2,
        ).alias("df_welch"),
    )


_ORACLE_BENFORD = """
WITH digits AS (
    SELECT CAST(FLOOR(o_totalprice / POWER(10, FLOOR(LOG10(o_totalprice)))) AS INTEGER) AS digit
    FROM orders
    WHERE o_totalprice > 0
)
SELECT digit,
       COUNT(*) AS n_orders,
       ROUND(COUNT(*) * 1.0 / SUM(COUNT(*)) OVER (), 6) AS share,
       ROUND(LOG10(1.0 + 1.0 / digit), 6) AS benford_expected,
       ROUND(ABS(ROUND(COUNT(*) * 1.0 / SUM(COUNT(*)) OVER (), 6)
                 - ROUND(LOG10(1.0 + 1.0 / digit), 6)), 6) AS abs_deviation
FROM digits
GROUP BY digit
ORDER BY digit
"""


@query("q_benford_digits", oracle=_ORACLE_BENFORD)
def benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of order totals vs Benford's
    law — the standard ledger-fraud / synthetic-data audit.

    Map-side digit extraction (floor(x / 10^floor(log10 x))) → 9-group
    aggregate; the grand total for the share rides the same aggregation
    as a windowless broadcast. share is count/total (exact rational);
    share and the log10 expectation are each rounded to 6 BEFORE the
    deviation is taken, so a 1-ulp libm difference between engines
    cannot leak into the result (ORACLES.md float discipline).
    """
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    digit = F.floor(
        F.col("o_totalprice") / F.pow(F.lit(10.0), F.floor(F.log10("o_totalprice")))
    ).cast("int")
    counts = orders.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    total = counts.agg(F.sum("n_orders").alias("n_total"))
    share = F.round(F.col("n_orders") / F.col("n_total"), 6)
    benford = F.round(F.log10(1.0 + 1.0 / F.col("digit")), 6)
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "digit",
            "n_orders",
            share.alias("share"),
            benford.alias("benford_expected"),
            F.round(F.abs(share - benford), 6).alias("abs_deviation"),
        )
        .orderBy("digit")
    )


_ORACLE_GINI = """
WITH rev AS (
    SELECT o_custkey, ROUND(SUM(o_totalprice), 2) AS x
    FROM orders
    GROUP BY o_custkey
), ranked AS (
    SELECT x, ROW_NUMBER() OVER (ORDER BY x, o_custkey) AS i FROM rev
), tot AS (
    SELECT COUNT(*) AS n, SUM(x) AS sx,
           COUNT(*) - CAST(FLOOR(COUNT(*) * 0.1) AS BIGINT) AS cutoff
    FROM ranked
)
SELECT ROUND(2.0 * SUM(i * x) / (MAX(n) * MAX(sx)) - (MAX(n) + 1.0) / MAX(n), 6) AS gini,
       CAST(MAX(n) AS BIGINT) AS n_customers,
       ROUND(SUM(CASE WHEN i > cutoff THEN x ELSE 0 END) / MAX(sx), 6) AS top_decile_share
FROM ranked, tot
GROUP BY cutoff
"""


@query("q_gini_concentration", oracle=_ORACLE_GINI)
def gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-customer revenue plus the Lorenz
    top-decile share — "how concentrated is our revenue?".

    G = 2·Σ i·xᵢ / (n·Σx) − (n+1)/n over revenues sorted ascending
    (i = 1..n, ties broken by custkey so the order is total). Ranks
    come from the two-phase range enumeration over the per-customer
    AGGREGATE — never the fact table — and Σ i·xᵢ is an ordinary
    mergeable SUM partial, so every stage stays balanced at 100 TB.
    Per-customer revenue is rounded to cents first: both engines then
    rank and weight identical doubles (ORACLES.md intermediate-rounding
    rule).
    """
    rev = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("x"))
    )
    k = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    ranked = _ranged_enumerate(rev, ["x", "o_custkey"], k)
    totals = ranked.agg(
        F.count(F.lit(1)).alias("n"), F.sum("x").alias("sx")
    ).withColumn("cutoff", F.col("n") - F.floor(F.col("n") * 0.1).cast("long"))
    return ranked.crossJoin(F.broadcast(totals)).agg(
        F.round(
            2.0 * F.sum(F.col("_rank") * F.col("x")) / (F.max("n") * F.max("sx"))
            - (F.max("n") + 1.0) / F.max("n"),
            6,
        ).alias("gini"),
        F.max("n").alias("n_customers"),
        F.round(
            F.sum(F.when(F.col("_rank") > F.col("cutoff"), F.col("x")).otherwise(0.0))
            / F.max("sx"),
            6,
        ).alias("top_decile_share"),
    )


_ORACLE_CUSUM = """
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS day,
           CAST(ROUND(SUM(o_totalprice) * 100) AS BIGINT) AS cents
    FROM orders
    GROUP BY day
), scanned AS (
    SELECT day,
           CAST(SUM(cents) OVER (ORDER BY day) AS BIGINT) AS prefix,
           ROW_NUMBER() OVER (ORDER BY day) AS i,
           CAST(SUM(cents) OVER () AS BIGINT) AS total,
           COUNT(*) OVER () AS n
    FROM daily
)
SELECT day AS change_day,
       ROUND(ABS(CAST(n AS HUGEINT) * prefix - CAST(i AS HUGEINT) * total)
             * 1.0 / (n * 100.0), 2) AS cusum_abs,
       CAST(n AS BIGINT) AS n_days
FROM scanned
ORDER BY ABS(CAST(n AS HUGEINT) * prefix - CAST(i AS HUGEINT) * total) DESC, day
LIMIT 1
"""


@query("q_cusum_changepoint", oracle=_ORACLE_CUSUM)
def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point over the daily-revenue series: the day i
    maximizing |Σ_{j≤i}(x_j − mean)| — the classic level-shift detector.

    The mean division is eliminated algebraically: with integer cents,
    n·prefixᵢ − i·total = n·Σ_{j≤i}(x_j − mean), so the argmax is
    computed in EXACT integer arithmetic — zero cross-engine float
    drift, at any scale factor. Only the final reported magnitude
    divides back to dollars. The scan runs over the per-day AGGREGATE
    (calendar-bounded: ~thousands of rows regardless of fact volume),
    so the single-partition window is over days, never facts.
    """
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            F.round(F.sum("o_totalprice") * 100, 0).cast("long").alias("cents")
        )
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    totals = daily.agg(
        F.sum("cents").alias("total"), F.count(F.lit(1)).alias("n")
    )
    scanned = (
        daily.withColumn("prefix", F.sum("cents").over(w))
        .withColumn("i", F.row_number().over(Window.orderBy("day")))
        .crossJoin(F.broadcast(totals))
        # DECIMAL(38,0) products: with n ≈ thousands of days and total
        # cents approaching 1e16 at warehouse scale, n*prefix exceeds
        # 2^63 — the same BIGINT→DECIMAL(38) lift q_agg_anova uses
        # (HUGEINT on the DuckDB side).
        .withColumn(
            "dev",
            F.abs(
                F.col("n").cast("decimal(19,0)") * F.col("prefix").cast("decimal(19,0)")
                - F.col("i").cast("decimal(19,0)") * F.col("total").cast("decimal(19,0)")
            ),
        )
    )
    return (
        scanned.orderBy(F.col("dev").desc(), "day")
        .limit(1)
        .select(
            F.col("day").alias("change_day"),
            F.round(F.col("dev") / (F.col("n") * 100.0), 2).alias("cusum_abs"),
            F.col("n").cast("long").alias("n_days"),
        )
    )


# ---------------------------------------------------------------------------
# One-way ANOVA: does mean order value differ across order
# priorities? The F-statistic from exact integer sufficient
# statistics — the same mergeable (n, sum, sumsq) triple every
# distributed variance here uses, lifted to DECIMAL(38) because
# sum-of-squared-cents overflows BIGINT at scale.
# ---------------------------------------------------------------------------

_ORACLE_ANOVA = """
WITH g AS (
    SELECT o_orderpriority AS grp,
           CAST(COUNT(*) AS BIGINT) AS n,
           SUM(CAST(ROUND(o_totalprice * 100) AS HUGEINT)) AS s,
           SUM(CAST(ROUND(o_totalprice * 100) AS HUGEINT)
               * CAST(ROUND(o_totalprice * 100) AS HUGEINT)) AS ssq
    FROM orders GROUP BY grp
), tot AS (
    SELECT CAST(SUM(n) AS DOUBLE) AS nn,
           CAST(SUM(s) AS DOUBLE) AS ts,
           CAST(SUM(ssq) AS DOUBLE) AS tssq,
           CAST(COUNT(*) AS BIGINT) AS k,
           SUM(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
               AS sum_sq_over_n
    FROM g
)
SELECT k,
       CAST(nn AS BIGINT) AS n_total,
       ROUND((sum_sq_over_n - ts * ts / nn) / (k - 1)
             / ((tssq - sum_sq_over_n) / (nn - k)), 4) AS f_stat
FROM tot
"""


@query("q_agg_anova", oracle=_ORACLE_ANOVA)
def agg_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F-statistic for order value across the 5 order
    priorities: F = (SSB/(k-1)) / (SSW/(N-k)).

    Plan: ONE map-side-combinable agg produces per-group
    (n, sum, sumsq) in exact DECIMAL(38) cents (sumsq of cents passes
    2^63 at warehouse scale; decimal keeps it exact on both engines —
    DuckDB's HUGEINT mirror), then a 5-row driver-sized reduction
    assembles F in doubles. The only inexactness is the final double
    assembly from exact integers, identical expression both sides,
    ROUND 4 (ORACLES.md aggregated-double margin; the cross-group sum
    order can differ only at the last ulp of 5 terms).
    """
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("decimal(38,0)")
    g = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderpriority").alias("grp"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(cents).alias("s"),
            F.sum(cents * cents).alias("ssq"),
        )
    )
    tot = g.agg(
        F.sum("n").cast("double").alias("nn"),
        F.sum("s").cast("double").alias("ts"),
        F.sum("ssq").cast("double").alias("tssq"),
        F.count(F.lit(1)).alias("k"),
        F.sum(
            F.col("s").cast("double") * F.col("s").cast("double")
            / F.col("n").cast("double")
        ).alias("sum_sq_over_n"),
    )
    return tot.select(
        "k",
        F.col("nn").cast("long").alias("n_total"),
        # try_divide x2: one group (k-1 = 0) or zero residual dof
        # (nn = k, the single-row slice) -> F undefined -> NULL
        F.round(
            F.try_divide(
                F.try_divide(
                    F.col("sum_sq_over_n") - F.col("ts") * F.col("ts") / F.col("nn"),
                    F.col("k") - 1,
                ),
                F.try_divide(
                    F.col("tssq") - F.col("sum_sq_over_n"),
                    F.col("nn") - F.col("k"),
                ),
            ),
            4,
        ).alias("f_stat"),
    )


# ---------------------------------------------------------------------------
# Covariance/correlation matrix: every pairwise relationship among
# (quantity, extendedprice, discount, tax) in ONE aggregation pass —
# the feature-engineering primitive before any modeling. All six
# pairs + four variances come from the same mergeable moment sums, so
# the fleet of statistics costs exactly one fact scan and one
# reduce. (+0 after ROUND folds IEEE -0.0 to 0.0 on both engines.)
# ---------------------------------------------------------------------------

_COV_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]

_ORACLE_COV_MATRIX = f"""
SELECT x, y, n, cov, corr FROM (
    {" UNION ALL ".join(
        f"SELECT '{a}' AS x, '{b}' AS y, CAST(COUNT(*) AS BIGINT) AS n, "
        f"ROUND(COVAR_SAMP({a}, {b}), 4) + 0 AS cov, "
        f"ROUND(CORR({a}, {b}), 6) + 0 AS corr FROM lineitem"
        for i, a in enumerate(_COV_COLS)
        for b in _COV_COLS[i + 1:]
    )}
)
ORDER BY x, y
"""


@query("q_agg_cov_matrix", oracle=_ORACLE_COV_MATRIX)
def agg_cov_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise sample covariance and correlation for the four
    numeric lineitem measures, as tidy (x, y, n, cov, corr) rows.

    ONE groupBy-less aggregate evaluates all six covar_samp/corr
    pairs simultaneously (Spark computes the shared moment sums in a
    single partial-agg pass over the scan — the plan has one
    HashAggregate, not six). The oracle's UNION ALL of six scans is
    the readable equivalent; values agree because both engines use
    numerically-stable co-moment updates, ROUND(4/6) per the
    aggregated-double margin.
    """
    li = load_table(spark, sf_dir, "lineitem")
    aggs = []
    for i, a in enumerate(_COV_COLS):
        for b in _COV_COLS[i + 1:]:
            aggs.append(F.count(F.lit(1)).alias(f"n__{a}__{b}"))
            aggs.append(
                (F.round(F.covar_samp(a, b), 4) + 0).alias(f"cov__{a}__{b}")
            )
            aggs.append((F.round(F.corr(a, b), 6) + 0).alias(f"corr__{a}__{b}"))
    wide = li.agg(*aggs)
    pairs = [
        (a, b) for i, a in enumerate(_COV_COLS) for b in _COV_COLS[i + 1:]
    ]
    stacked = wide.select(
        F.expr(
            "stack("
            + str(len(pairs))
            + ", "
            + ", ".join(
                f"'{a}', '{b}', n__{a}__{b}, cov__{a}__{b}, corr__{a}__{b}"
                for a, b in pairs
            )
            + ") AS (x, y, n, cov, corr)"
        )
    )
    return stacked.orderBy("x", "y")


# ---------------------------------------------------------------------------
# Poisson-bootstrap confidence interval (round 4; Efron's bootstrap in
# the one-pass "Poisson(1) weights" form — the variant production
# systems use at scale because it needs NO resampled copies of the
# data: replicate r gives every row an independent Poisson(1) weight,
# and Σ w·x / Σ w is a draw from the bootstrap distribution of the
# mean. All B replicates ride ONE explode + hash-aggregation pass
# (map-side combined: the shuffle carries B partial rows per
# partition, never facts), so the cost is B× map work, zero extra
# passes — at 100 TB that is the only bootstrap you can afford.
#
# Determinism: the Poisson(1) draw is the portable md5 bucket pushed
# through the exact inverse-CDF thresholds (P(0)=e⁻¹≈.368, cumulative
# ×1000 → 368/736/920/981/996), so both engines simulate the SAME
# weights; replicate means divide exact integer cents by exact
# integer weight-sums (IEEE-identical), and the 2.5%/97.5% cut uses
# the repo's disc-percentile emulation over the B-row replicate frame.
# ---------------------------------------------------------------------------

_BOOT_B = 100
# cumulative Poisson(1) CDF × 1000, truncated at w = 5
_BOOT_CUTS = (368, 736, 920, 981, 996)

_DUCK_BOOT_BUCKET = (
    "(('0x' || substr(md5(o_orderkey::VARCHAR || '#' || r::VARCHAR), 1, 15))"
    "::BIGINT % 1000)"
)

_ORACLE_BOOTSTRAP = f"""
WITH weighted AS (
    SELECT r,
           CASE WHEN {_DUCK_BOOT_BUCKET} < 368 THEN 0
                WHEN {_DUCK_BOOT_BUCKET} < 736 THEN 1
                WHEN {_DUCK_BOOT_BUCKET} < 920 THEN 2
                WHEN {_DUCK_BOOT_BUCKET} < 981 THEN 3
                WHEN {_DUCK_BOOT_BUCKET} < 996 THEN 4
                ELSE 5 END AS w,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders, (SELECT UNNEST(generate_series(0, {_BOOT_B - 1})) AS r)
), reps AS (
    SELECT r, ROUND(CAST(SUM(w * cents) AS DOUBLE)
                    / CAST(SUM(w) AS DOUBLE) / 100.0, 4) AS m
    FROM weighted GROUP BY r
), ranked AS (
    SELECT m, ROW_NUMBER() OVER (ORDER BY m) AS rk, COUNT(*) OVER () AS n
    FROM reps
)
SELECT CAST({_BOOT_B} AS INTEGER) AS b_reps,
       ROUND(AVG(m), 2) AS boot_mean,
       MIN(CASE WHEN rk >= CEIL(0.025 * n) THEN m END) AS ci_lo,
       MIN(CASE WHEN rk >= CEIL(0.975 * n) THEN m END) AS ci_hi
FROM ranked
"""


@query("q_bootstrap_ci", oracle=_ORACLE_BOOTSTRAP)
def bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% bootstrap CI for mean order value via B=100 deterministic
    Poisson-weight replicates in one aggregation pass."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    # Spread the scan BEFORE the B-fold explode: each input row costs
    # B md5+conv evaluations, so per-row CPU dominates the one
    # (key, cents) transfer — the spread idiom's precondition HOLDS
    # here (unlike q_dedup_exact's cheap projection). Without it the
    # single-file fixture ran all B·|orders| hashes on one task:
    # 13.2 → 0.7 s at sf0.1 (round-4 sweep adjudication).
    spread = orders.repartition(spark.sparkContext.defaultParallelism)
    exploded = spread.select(
        "o_orderkey", "cents", F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("r")
    )
    b = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("#", F.col("o_orderkey"), F.col("r"))), 1, 15
            ),
            16,
            10,
        ).cast("long")
        % 1000
    )
    w = (
        F.when(b < _BOOT_CUTS[0], 0)
        .when(b < _BOOT_CUTS[1], 1)
        .when(b < _BOOT_CUTS[2], 2)
        .when(b < _BOOT_CUTS[3], 3)
        .when(b < _BOOT_CUTS[4], 4)
        .otherwise(5)
    )
    reps = (
        exploded.withColumn("w", w)
        .groupBy("r")
        .agg(
            F.sum(F.col("w") * F.col("cents")).alias("s"),
            F.sum("w").alias("n"),
        )
        .select(
            "r",
            F.round(
                F.try_divide(F.col("s").cast("double"), F.col("n").cast("double"))
                / 100.0,
                4,
            ).alias("m"),
        )
    )
    ranked = reps.select(
        "m",
        F.row_number().over(Window.orderBy("m")).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )  # B rows — the single-partition window is over 100 replicates

    def disc(p: float):
        return F.min(
            F.when(F.col("rk") >= F.ceil(F.lit(p) * F.col("n")), F.col("m"))
        )

    return ranked.agg(
        F.lit(_BOOT_B).cast("int").alias("b_reps"),
        F.round(F.avg("m"), 2).alias("boot_mean"),
        disc(0.025).alias("ci_lo"),
        disc(0.975).alias("ci_hi"),
    )
