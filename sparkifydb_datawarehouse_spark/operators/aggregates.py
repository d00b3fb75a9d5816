"""B3-B5: hash aggregation, distinct aggregation, rollup/cube.

The reference deliberately avoids aggregations (/root/reference/
README.md:13-15 — the star schema exists so analysts "execute queries
... without aggregations at all"); the engine provides the full
surface anyway (SURVEY §2 Part B, mandated by BASELINE.json).

Scale notes:
- groupBy compiles to partial (map-side) + final hash aggregation —
  one shuffle keyed on the group columns. Low-cardinality keys
  (returnflag × linestatus = 6 groups) make the shuffle tiny.
- COUNT(DISTINCT x) rewrites to a two-phase expand + aggregation;
  for 100 TB dashboards prefer approx_count_distinct (HLL++, no
  second shuffle, tunable rsd) — both are exposed below.
- rollup/cube compile to Expand (one input row fans out to one row
  per grouping set) — at scale prefer rollup over cube: cube over n
  columns fans out 2^n.

Cross-engine notes: DuckDB SUM over integer columns returns INT128 —
oracles cast to BIGINT; Spark integer counts/ranks cast to long.
Money sums round(2) on both sides (float summation-order ulp).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table

# ---------------------------------------------------------------------------
# B3 — hash aggregation with the full accumulator set (TPC-H Q1 shape).
# ---------------------------------------------------------------------------

_ORACLE_B3 = """
SELECT l_returnflag AS return_flag,
       l_linestatus AS line_status,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(AVG(l_quantity), 4) AS avg_qty,
       ROUND(AVG(l_extendedprice), 4) AS avg_price,
       ROUND(MIN(l_extendedprice), 2) AS min_price,
       ROUND(MAX(l_extendedprice), 2) AS max_price,
       COUNT(*) AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
ORDER BY return_flag, line_status
"""


@query("q_agg_groupby", oracle=_ORACLE_B3)
def agg_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.groupBy(
            F.col("l_returnflag").alias("return_flag"),
            F.col("l_linestatus").alias("line_status"),
        )
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.min("l_extendedprice"), 2).alias("min_price"),
            F.round(F.max("l_extendedprice"), 2).alias("max_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("return_flag", "line_status")
    )


# ---------------------------------------------------------------------------
# B4 — exact distinct aggregation (two-phase expand under the hood).
# ---------------------------------------------------------------------------

_ORACLE_B4 = """
SELECT o_orderstatus AS order_status,
       COUNT(DISTINCT o_custkey) AS n_customers,
       COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderstatus
ORDER BY order_status
"""


@query("q_agg_count_distinct", oracle=_ORACLE_B4)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.col("o_orderstatus").alias("order_status"))
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("order_status")
    )


# ---------------------------------------------------------------------------
# B4b — approximate distinct (HLL++), contract-oracled as of round 7
# (VERDICT r6 #5): the estimate is engine-specific, so the oracled
# VALUES are the exact per-group counts plus a within-3·rsd flag —
# Spark's HLL++ is deterministic for fixed data, so the flag is stable
# (same discipline as q_agg_approx_distinct_calibration, which pins
# the corpus-level claim across rsd settings). The 100 TB path for
# cardinality dashboards remains the approx aggregate alone.
# ---------------------------------------------------------------------------

_APPROX_DISTINCT_RSD = 0.02

_ORACLE_APPROX_DISTINCT = """
SELECT o_orderstatus AS order_status,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_customers,
       CAST(1 AS INTEGER) AS within_3rsd
FROM orders
GROUP BY o_orderstatus
ORDER BY order_status
"""


@query("q_agg_approx_distinct", oracle=_ORACLE_APPROX_DISTINCT)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.col("o_orderstatus").alias("order_status"))
        .agg(
            F.countDistinct("o_custkey").cast("long").alias("exact_customers"),
            F.approx_count_distinct(
                "o_custkey", rsd=_APPROX_DISTINCT_RSD
            ).alias("approx_raw"),
        )
        .select(
            "order_status",
            "exact_customers",
            # exact == 0 (all-null slice): vacuously true, matching the
            # oracle's constant — try_divide alone yields NULL there
            F.when(F.col("exact_customers") == 0, F.lit(1))
            .otherwise(
                (
                    F.try_divide(
                        F.abs(F.col("approx_raw") - F.col("exact_customers")),
                        F.col("exact_customers"),
                    )
                    <= F.lit(3 * _APPROX_DISTINCT_RSD)
                ).cast("int")
            )
            .alias("within_3rsd"),
        )
        .orderBy("order_status")
    )


# ---------------------------------------------------------------------------
# B4c — HLL accuracy CALIBRATION (round 4): q_agg_approx_distinct is
# rows-only because the estimate is engine-specific, which left "the
# sketch is accurate" as an unchecked claim. This query turns the
# claim itself into the oracled VALUE: for each configured rsd, Spark
# computes |approx − exact| / exact and emits within_3rsd — Spark's
# HLL++ is deterministic for fixed data (register-max merge is
# commutative), so the flag is stable, and the oracle asserts the
# exact count plus the contract flag = 1. If the sketch ever degrades
# past 3·rsd, the driver's value-hash catches it — the same
# self-verification discipline as the minhash MAE calibration
# (llm/dedup.py) and the t-digest ≤1% anchor.
# ---------------------------------------------------------------------------

_HLL_RSDS = (0.05, 0.02, 0.01)

_ORACLE_HLL_CALIBRATION = f"""
WITH exact AS (
    SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_exact FROM orders
)
SELECT rsd, n_exact, CAST(1 AS INTEGER) AS within_3rsd
FROM exact, (SELECT UNNEST([{", ".join(str(r) for r in _HLL_RSDS)}]) AS rsd)
ORDER BY rsd
"""


@query("q_agg_approx_distinct_calibration", oracle=_ORACLE_HLL_CALIBRATION)
def agg_approx_distinct_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    aggs = [F.countDistinct("o_custkey").cast("long").alias("n_exact")] + [
        F.approx_count_distinct("o_custkey", rsd=r).alias(f"approx_{i}")
        for i, r in enumerate(_HLL_RSDS)
    ]
    wide = orders.agg(*aggs)
    per_rsd = [
        wide.select(
            F.lit(r).alias("rsd"),
            F.col("n_exact"),
            # try_divide: NULL (not a crash) on an empty corpus where
            # n_exact = 0 — inert at oracle scale (the empty-slice gate)
            (
                F.try_divide(
                    F.abs(F.col(f"approx_{i}") - F.col("n_exact")),
                    F.col("n_exact"),
                )
                <= 3 * r
            )
            .cast("int")
            .alias("within_3rsd"),
        )
        for i, r in enumerate(_HLL_RSDS)
    ]
    out = per_rsd[0]
    for df in per_rsd[1:]:
        out = out.unionAll(df)
    return out.orderBy("rsd")


# ---------------------------------------------------------------------------
# B5 — rollup + cube (multi-level totals via Expand).
# ---------------------------------------------------------------------------

_ORACLE_B5_ROLLUP = """
SELECT EXTRACT(year FROM o_orderdate) AS order_year,
       o_orderstatus AS order_status,
       ROUND(SUM(o_totalprice), 2) AS total_price,
       COUNT(*) AS n_orders
FROM orders
GROUP BY ROLLUP (EXTRACT(year FROM o_orderdate), o_orderstatus)
ORDER BY order_year NULLS FIRST, order_status NULLS FIRST
"""


@query("q_agg_rollup", oracle=_ORACLE_B5_ROLLUP)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            F.year("o_orderdate").cast("long").alias("order_year"),
            F.col("o_orderstatus").alias("order_status"),
            "o_totalprice",
        )
        .rollup("order_year", "order_status")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy(F.col("order_year").asc_nulls_first(), F.col("order_status").asc_nulls_first())
    )


_ORACLE_B5_CUBE = """
SELECT o_orderstatus AS order_status,
       o_orderpriority AS order_priority,
       ROUND(SUM(o_totalprice), 2) AS total_price,
       COUNT(*) AS n_orders
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY order_status NULLS FIRST, order_priority NULLS FIRST
"""


@query("q_agg_cube", oracle=_ORACLE_B5_CUBE)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            F.col("o_orderstatus").alias("order_status"),
            F.col("o_orderpriority").alias("order_priority"),
            "o_totalprice",
        )
        .cube("order_status", "order_priority")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy(
            F.col("order_status").asc_nulls_first(),
            F.col("order_priority").asc_nulls_first(),
        )
    )


# ---------------------------------------------------------------------------
# Exact decimal money aggregation: double SUMs of money drift in the
# last ulp and differ run-to-run with partitioning; financial rollups
# need DECIMAL accumulation (exact, associative, partitioning-
# independent). Result emitted as a canonical string so the
# cross-engine check is representation-exact, not float-tolerant.
# ---------------------------------------------------------------------------

_ORACLE_DECIMAL = """
SELECT o_orderpriority AS priority,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
            AS VARCHAR) AS total_price_exact,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
GROUP BY o_orderpriority
ORDER BY priority
"""


@query("q_agg_decimal_exact", oracle=_ORACLE_DECIMAL)
def agg_decimal_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    total = F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast(
        "decimal(18,2)"
    )
    return (
        o.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            total.cast("string").alias("total_price_exact"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("priority")
    )


# ---------------------------------------------------------------------------
# Exact frequent items (heavy hitters): every part exceeding a
# RELATIVE frequency threshold among order lines, with its share.
# Two aggregations over one scan: per-key counts + the scalar total
# (broadcast back as a literal-free cross join of one row). At 100 TB
# the exact form stays viable precisely because the output is bounded
# by 1/threshold rows; the sketch alternative (count-min + heap) only
# wins when the KEY set itself can't be hash-aggregated.
# ---------------------------------------------------------------------------

_HH_THRESHOLD = 0.0005  # 0.05% of all lineitems

_ORACLE_HEAVY = f"""
WITH counts AS (
    SELECT l_partkey, COUNT(*) AS n
    FROM lineitem GROUP BY l_partkey
), total AS (SELECT COUNT(*) AS t FROM lineitem)
SELECT c.l_partkey AS part_key,
       CAST(c.n AS BIGINT) AS n,
       ROUND(c.n / t.t::DOUBLE, 6) AS share
FROM counts c, total t
WHERE c.n / t.t::DOUBLE > {_HH_THRESHOLD}
ORDER BY n DESC, part_key
"""


@query("q_agg_heavy_hitters", oracle=_ORACLE_HEAVY)
def agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    counts = li.groupBy(F.col("l_partkey").alias("part_key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    total = li.agg(F.count(F.lit(1)).alias("t"))
    share = F.col("n") / F.col("t").cast("double")
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(share > _HH_THRESHOLD)
        .select("part_key", "n", F.round(share, 6).alias("share"))
        .orderBy(F.col("n").desc(), "part_key")
    )


# ---------------------------------------------------------------------------
# Audience overlap matrix — exact distinct-user overlap between every
# PAIR of event types (the "how much do these segments share" report).
# Collapse to distinct (user, type) FIRST (events never widen
# anything), then a self-join over that dimensions-bounded set builds
# the pair counts. At 100 TB the per-type audiences are user-set
# sized; the approx path is per-type HLL sketches with
# inclusion-exclusion (q_agg_hll_sketch is the primitive) — exact
# here, approx there, same output shape.
# ---------------------------------------------------------------------------

_ORACLE_AUDIENCE_OVERLAP = """
WITH ut AS (
    SELECT DISTINCT user_id, event_type FROM events
), sizes AS (
    SELECT event_type, COUNT(*) AS n FROM ut GROUP BY event_type
)
SELECT a.event_type AS type_a,
       b.event_type AS type_b,
       CAST(ANY_VALUE(sa.n) AS BIGINT) AS n_a,
       CAST(ANY_VALUE(sb.n) AS BIGINT) AS n_b,
       CAST(COUNT(*) AS BIGINT) AS n_overlap,
       ROUND(COUNT(*) * 1.0 / (ANY_VALUE(sa.n) + ANY_VALUE(sb.n) - COUNT(*)), 6)
           AS jaccard
FROM ut a
JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type
JOIN sizes sa ON sa.event_type = a.event_type
JOIN sizes sb ON sb.event_type = b.event_type
GROUP BY a.event_type, b.event_type
ORDER BY type_a, type_b
"""


@query("q_audience_overlap", oracle=_ORACLE_AUDIENCE_OVERLAP)
def audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    sizes = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select("user_id", F.col("event_type").alias("type_b"))
    overlap = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    sa = sizes.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    return (
        overlap.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            "n_overlap",
            F.round(
                F.col("n_overlap")
                * F.lit(1.0)
                / (F.col("n_a") + F.col("n_b") - F.col("n_overlap")),
                6,
            ).alias("jaccard"),
        )
        .orderBy("type_a", "type_b")
    )


# ---------------------------------------------------------------------------
# B4d — Count-Min sketch with an oracled accuracy CONTRACT (round 4,
# Cormode & Muthukrishnan 2005, public literature). q_agg_heavy_hitters
# is the exact form; this is the mergeable sublinear-memory form a
# 1000-executor cluster actually ships per partition: d=4 hash rows ×
# w=8192 counters (128 KB of state regardless of key cardinality),
# point estimate = min over rows. Two guarantees become the VALUE
# (the q_agg_approx_distinct_calibration pattern): the estimate never
# undercounts (deterministic CMS property), and for the fixture's hash
# realization it stays within exact + ceil(8N/w) (the ε = 2e/w-style
# bound with generous slack). Spark's xxhash64 is deterministic, so
# both flags are stable and DuckDB asserts them alongside the exact
# counts — sketch degradation fails the driver's value hash.
#
# Plan shape: counters are ONE explode(d)+groupBy pass with map-side
# combine (shuffle carries ≤ d·w partial rows per partition, never
# facts); the probe side broadcasts the d·w counter table under the
# candidate keys. At 100 TB the counter table is what crosses the
# wire — that is the entire point of the sketch.
# ---------------------------------------------------------------------------

_CMS_W, _CMS_D = 8192, 4

_ORACLE_CMS = """
WITH counts AS (
    SELECT l_partkey AS part_key, CAST(COUNT(*) AS BIGINT) AS n_exact
    FROM lineitem
    GROUP BY l_partkey
)
SELECT part_key, n_exact,
       CAST(1 AS INTEGER) AS never_undercounts,
       CAST(1 AS INTEGER) AS within_eps
FROM counts
ORDER BY n_exact DESC, part_key
LIMIT 10
"""


@query("q_agg_count_min", oracle=_ORACLE_CMS)
def agg_count_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey")
    rows = F.sequence(F.lit(0), F.lit(_CMS_D - 1))
    counters = (
        li.select(F.col("l_partkey"), F.explode(rows).alias("r"))
        .groupBy(
            "r", F.pmod(F.xxhash64("l_partkey", "r"), F.lit(_CMS_W)).alias("bucket")
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    total = li.agg(F.count(F.lit(1)).alias("n_total"))
    top = (
        li.groupBy(F.col("l_partkey").alias("part_key"))
        .agg(F.count(F.lit(1)).alias("n_exact"))
        .orderBy(F.col("n_exact").desc(), "part_key")
        .limit(10)
    )
    est = (
        top.select("part_key", "n_exact", F.explode(rows).alias("r"))
        .withColumn("bucket", F.pmod(F.xxhash64("part_key", "r"), F.lit(_CMS_W)))
        .join(F.broadcast(counters), ["r", "bucket"])
        .groupBy("part_key", "n_exact")
        .agg(F.min("c").alias("cms_est"))
        .crossJoin(F.broadcast(total))
    )
    eps = F.ceil(8.0 * F.col("n_total") / _CMS_W)
    return (
        est.select(
            "part_key",
            "n_exact",
            (F.col("cms_est") >= F.col("n_exact")).cast("int").alias(
                "never_undercounts"
            ),
            (F.col("cms_est") <= F.col("n_exact") + eps).cast("int").alias(
                "within_eps"
            ),
        )
        .orderBy(F.col("n_exact").desc(), "part_key")
    )


# ---------------------------------------------------------------------------
# B4e — Bloom-filter semi-join pruning with an oracled contract
# (round 4; Bloom 1970, public literature) — completes the sketch
# triad: HLL answers "how many distinct", CMS "how often", Bloom "is
# it a member". The realistic deployment is runtime join pruning: the
# build side's key set becomes an m-bit filter that prunes the probe
# side BEFORE the shuffle (Spark's own runtime row-group Bloom
# pushdown, here spelled explicitly as DataFrame ops so the contract
# is checkable). Two guarantees become the oracled value: NO FALSE
# NEGATIVES (a Bloom filter never drops a true match — deterministic
# property of the construction) and a false-positive rate under a
# generous bound for these parameters (k=4, m=65536, n_build ≈
# hundreds → theoretical fp ≈ (1−e^{−kn/m})^k ≪ 1%). xxhash64 is
# deterministic, so both flags are stable for fixed data and DuckDB
# asserts them next to the exact counts.
#
# Plan shape: the "bits" are the DISTINCT (hash_row, bucket) pairs —
# ≤ k·n_build rows partial-agg'd map-side and broadcast; the probe
# pass is scan + broadcast join, no fact shuffle. At 100 TB that is
# exactly the semi-join-pruning economics this sketch exists for.
# ---------------------------------------------------------------------------

_BLOOM_M, _BLOOM_K = 65536, 4

_ORACLE_BLOOM = """
WITH build AS (
    SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'P'
), probe AS (
    SELECT c_custkey FROM customer
)
SELECT CAST((SELECT COUNT(*) FROM probe) AS BIGINT) AS n_probe,
       CAST((SELECT COUNT(*) FROM probe WHERE c_custkey IN (SELECT o_custkey FROM build)) AS BIGINT) AS n_true,
       CAST(1 AS INTEGER) AS no_false_negatives,
       CAST(1 AS INTEGER) AS fp_within_bound
"""


@query("q_join_bloom_prefilter", oracle=_ORACLE_BLOOM)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    rows = F.sequence(F.lit(0), F.lit(_BLOOM_K - 1))
    build = (
        orders.filter(F.col("o_orderstatus") == "P")
        .select("o_custkey")
        .distinct()
    )
    bits = (
        build.select(F.col("o_custkey"), F.explode(rows).alias("r"))
        .select(
            "r", F.pmod(F.xxhash64("o_custkey", "r"), F.lit(_BLOOM_M)).alias("bucket")
        )
        .distinct()
    )
    probe = (
        cust.select("c_custkey")
        .select(F.col("c_custkey"), F.explode(rows).alias("r"))
        .withColumn("bucket", F.pmod(F.xxhash64("c_custkey", "r"), F.lit(_BLOOM_M)))
        .join(F.broadcast(bits.withColumn("hit", F.lit(1))), ["r", "bucket"], "left")
        .groupBy("c_custkey")
        .agg((F.count("hit") == _BLOOM_K).alias("bloom_pass"))
    )
    truth = probe.join(
        build.withColumn("is_true", F.lit(1)),
        probe.c_custkey == build.o_custkey,
        "left",
    ).select(
        "c_custkey", "bloom_pass", F.coalesce("is_true", F.lit(0)).alias("is_true")
    )
    return truth.agg(
        F.count(F.lit(1)).cast("long").alias("n_probe"),
        F.sum("is_true").cast("long").alias("n_true"),
        # no false negatives: every true member passes the filter
        F.min(
            F.when(F.col("is_true") == 1, F.col("bloom_pass").cast("int")).otherwise(1)
        )
        .cast("int")
        .alias("no_false_negatives"),
        # false positives bounded: non-members that pass stay under 1%
        (
            F.try_divide(
                F.sum(
                    F.when(
                        (F.col("is_true") == 0) & F.col("bloom_pass"), 1
                    ).otherwise(0)
                ),
                F.sum(F.when(F.col("is_true") == 0, 1).otherwise(0)),
            )
            <= 0.01
        )
        .cast("int")
        .alias("fp_within_bound"),
    )


# ---------------------------------------------------------------------------
# B4f — KMV (k-minimum-values) distinct sketch with SET ALGEBRA
# (round 5; Bar-Yossef et al. 2002 / Beyer et al. SIGMOD'07, public
# literature) — the fourth sketch: unlike HLL, a KMV synopsis supports
# INTERSECTION estimates directly, which is what audience-overlap
# dashboards need (q_audience_overlap is the exact form). Sketch per
# set = the k smallest values of u(x) = xxhash64(x)/2^64 + 0.5 ∈ [0,1);
# estimate D̂ = (k-1)/u_(k) (or the exact distinct-hash count when a
# set has fewer than k members). Sketches MERGE by union + re-truncate
# — that's the union estimate — and inclusion-exclusion gives the
# intersection: D̂_∩ = D̂_A + D̂_B − D̂_∪.
#
# Calibration contract (the q_agg_approx_distinct_calibration
# pattern): xxhash64 is deterministic, so for fixed data the estimate
# is a stable VALUE; the query emits, per set, the exact count and a
# flag that |D̂ − D|/D ≤ 3·rsd with rsd = 1/√(k−2) (k=256 → ~6.3%),
# and for the intersection row |D̂_∩ − D_∩| ≤ 3·rsd·D_∪ (errors of the
# three constituent sketches are each union-scale). DuckDB asserts the
# exact counts plus literal-1 flags — sketch degradation fails the
# driver's value hash.
#
# Plan shape: the shuffle carries DISTINCT (set, u) pairs — hashes,
# never facts; the per-set k-th order statistic is a window rank over
# those pairs. At 100 TB you'd keep the k smallest PER PARTITION
# first (KMV's mergeability makes the partial exact, same
# union+truncate rule) so the rank input is ≤ k·partitions rows; at
# fixture scale the direct rank is the same plan minus that partial.
# ---------------------------------------------------------------------------

_KMV_K = 256
_KMV_RSD = 1.0 / (_KMV_K - 2) ** 0.5

_ORACLE_KMV = """
WITH m AS (
    SELECT DISTINCT o_orderstatus AS s, o_custkey AS c
    FROM orders WHERE o_orderstatus IN ('O', 'F')
),
sizes AS (
    SELECT (SELECT COUNT(*) FROM m WHERE s = 'O') AS n_o,
           (SELECT COUNT(*) FROM m WHERE s = 'F') AS n_f,
           (SELECT COUNT(DISTINCT c) FROM m) AS n_u
)
SELECT set_name, n_exact, CAST(1 AS INTEGER) AS within_tol
FROM (
    SELECT 'F' AS set_name, CAST(n_f AS BIGINT) AS n_exact FROM sizes
    UNION ALL SELECT 'O', CAST(n_o AS BIGINT) FROM sizes
    UNION ALL SELECT 'intersection', CAST(n_o + n_f - n_u AS BIGINT) FROM sizes
    UNION ALL SELECT 'union', CAST(n_u AS BIGINT) FROM sizes
)
ORDER BY set_name
"""


@query("q_agg_kmv_overlap", oracle=_ORACLE_KMV)
def agg_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    base = (
        orders.filter(F.col("o_orderstatus").isin("O", "F"))
        .select(F.col("o_orderstatus").alias("set_name"), F.col("o_custkey").alias("c"))
        .distinct()
    )
    union_set = base.select(F.lit("union").alias("set_name"), "c").distinct()
    members = base.unionAll(union_set)
    u = F.xxhash64("c").cast("double") / F.lit(float(2**64)) + F.lit(0.5)
    with_u = members.select("set_name", u.alias("u"))
    w = Window.partitionBy("set_name").orderBy("u")
    kth = (
        with_u.distinct()
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == _KMV_K)
        .select("set_name", F.col("u").alias("u_k"))
    )
    # one aggregation carries both the exact member count and the
    # distinct-hash count per set; kth (≤3 rows) broadcasts back in
    stats = with_u.groupBy("set_name").agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.countDistinct("u").alias("n_hashes"),
    )
    sets = stats.join(F.broadcast(kth), "set_name", "left").withColumn(
        "est",
        F.when(F.col("u_k").isNull(), F.col("n_hashes").cast("double")).otherwise(
            F.lit(float(_KMV_K - 1)) / F.col("u_k")
        ),
    )
    # pivot the three per-set rows into ONE row, then emit all four
    # output rows from a single explode — the whole sketch pipeline is
    # computed exactly once (a 4-way union of filtered branches would
    # replicate the DAG per branch: measured 63 exchanges vs 7 here)
    one = sets.agg(
        *[
            F.max(F.when(F.col("set_name") == s, F.col(col))).alias(f"{col}_{tag}")
            for s, tag in (("O", "o"), ("F", "f"), ("union", "u"))
            for col in ("est", "n_exact")
        ]
    )
    tol = F.lit(3.0 * _KMV_RSD)

    def row(name: str, n_exact, within):
        return F.struct(
            F.lit(name).alias("set_name"),
            n_exact.cast("long").alias("n_exact"),
            within.cast("int").alias("within_tol"),
        )

    def set_row(name: str, tag: str):
        est, n = F.col(f"est_{tag}"), F.col(f"n_exact_{tag}")
        return row(name, n, F.abs(est - n) / n <= tol)

    exact_i = F.col("n_exact_o") + F.col("n_exact_f") - F.col("n_exact_u")
    est_i = F.col("est_o") + F.col("est_f") - F.col("est_u")
    inter = row(
        "intersection", exact_i, F.abs(est_i - exact_i) <= tol * F.col("n_exact_u")
    )
    return (
        one.select(
            F.explode(
                F.array(
                    set_row("O", "o"), set_row("F", "f"), set_row("union", "u"), inter
                )
            ).alias("r")
        )
        .select("r.*")
        .orderBy("set_name")
    )
