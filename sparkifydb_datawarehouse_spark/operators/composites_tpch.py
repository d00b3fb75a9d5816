"""The remaining TPC-H-shaped composites (Q2,4,7,8,9,11,12,13,14,15,16,
17,19,20,21,22) — completing the 22-query suite started in
composites.py (Q1,3,5,6,10,18 live there).

The fixture tables (FIXTURES.md §A) are TPC-H-ish but lack partsupp,
l_commitdate/l_receiptdate/l_shipmode, c_phone and ps_supplycost, so
each query keeps the REFERENCE SHAPE (the operator composition that
makes the query interesting: correlated min, EXISTS/NOT EXISTS
self-joins, scalar-subquery thresholds, disjunctive pushdown,
outer-join histograms) while adapting predicates to fixture columns.
Adaptations are noted per query.

Scale notes (100 TB posture), common to the suite:
- nation/region/supplier/part are dimensions → `F.broadcast`; the
  only shuffles left are lineitem⋈orders on orderkey and the final
  aggregations on their (small) group keys.
- Aggregate-before-join wherever semantics allow (Q11, Q15, Q20
  aggregate lineitem alone first, so the join input is group-sized,
  not line-sized).
- Self-join correlation (Q21) reuses one `l_orderkey` hash
  partitioning across the semi + anti joins — one shuffle of
  lineitem, reused three times by AQE/exchange reuse.

Cross-engine determinism follows ORACLES.md: money rounded to 2,
ratios to 4, counts are BIGINT on both sides, thresholds rounded
before comparison so engine-order ulp noise cannot flip a predicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table

def _rev():
    """Discounted line revenue (built lazily: F.col needs a live session)."""
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))

# ---------------------------------------------------------------------------
# Q2 shape — minimum-cost supplier: correlated per-part MIN, decorated
# with supplier/nation/region dims. No partsupp fixture → the "cost"
# is the minimum observed unit price (extendedprice/quantity) among
# lineitem shipments of that part by suppliers in one region.
# ---------------------------------------------------------------------------

_ORACLE_Q2 = """
WITH offers AS (
    SELECT p.p_partkey, p.p_brand, s.s_name, s.s_acctbal, n.n_name,
           ROUND(l.l_extendedprice / l.l_quantity, 2) AS unit_cost,
           MIN(ROUND(l.l_extendedprice / l.l_quantity, 2))
               OVER (PARTITION BY p.p_partkey) AS min_cost
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE p.p_size <= 10 AND p.p_type = 'LARGE' AND r.r_name = 'EUROPE'
)
SELECT DISTINCT ROUND(s_acctbal, 2) AS acct_bal,
       s_name AS supp_name,
       n_name AS nation_name,
       p_partkey AS part_key,
       p_brand AS brand,
       unit_cost
FROM offers
WHERE unit_cost = min_cost
ORDER BY acct_bal DESC, supp_name, part_key
LIMIT 100
"""


@query("q_tpch_q2_min_cost_supplier", oracle=_ORACLE_Q2)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 10) & (F.col("p_type") == "LARGE")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    # unit_cost is a single IEEE division + round — bit-identical across
    # engines, so the MIN-equality predicate is deterministic (ORACLES.md).
    offers = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .withColumn(
            "unit_cost", F.round(F.col("l_extendedprice") / F.col("l_quantity"), 2)
        )
        .withColumn(
            "min_cost", F.min("unit_cost").over(Window.partitionBy("p_partkey"))
        )
    )
    return (
        offers.filter(F.col("unit_cost") == F.col("min_cost"))
        .select(
            F.round("s_acctbal", 2).alias("acct_bal"),
            F.col("s_name").alias("supp_name"),
            F.col("n_name").alias("nation_name"),
            F.col("p_partkey").alias("part_key"),
            F.col("p_brand").alias("brand"),
            "unit_cost",
        )
        .distinct()
        .orderBy(F.col("acct_bal").desc(), "supp_name", "part_key")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q4 shape — order-priority checking: EXISTS-correlated semi-join with a
# non-equi residual. No l_commitdate fixture → "late" means a line
# shipped more than 30 days after the order date.
# ---------------------------------------------------------------------------

_ORACLE_Q4 = """
SELECT o.o_orderpriority AS order_priority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-04-01'
  AND EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
  )
GROUP BY o.o_orderpriority
ORDER BY order_priority
"""


@query("q_tpch_q4_order_priority", oracle=_ORACLE_Q4)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    # Semi join: equi on orderkey carries the shuffle; the date residual
    # rides in the same condition (no second pass over lineitem).
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 30 DAYS")),
            "left_semi",
        )
        .groupBy(F.col("o_orderpriority").alias("order_priority"))
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("order_priority")
    )


# ---------------------------------------------------------------------------
# Q7 shape — volume shipping between two nations, revenue per
# (supp_nation, cust_nation, year) for both directions of the pair.
# ---------------------------------------------------------------------------

_ORACLE_Q7 = """
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS BIGINT) AS ship_year,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1999-01-01'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY n1.n_name, n2.n_name, CAST(year(l.l_shipdate) AS BIGINT)
ORDER BY supp_nation, cust_nation, ship_year
"""


@query("q_tpch_q7_volume_shipping", oracle=_ORACLE_Q7)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1999-01-01")
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    flipped = (F.col("supp_nation") == "NATION_2") & (
        F.col("cust_nation") == "NATION_1"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair | flipped)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("ship_year"),
        )
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


# ---------------------------------------------------------------------------
# Q8 shape — national market share: one nation's fraction of regional
# revenue per year, as a conditional-sum ratio.
# ---------------------------------------------------------------------------

_ORACLE_Q8 = """
WITH volumes AS (
    SELECT CAST(year(o.o_orderdate) AS BIGINT) AS order_year,
           l.l_extendedprice * (1 - l.l_discount) AS volume,
           n1.n_name AS supp_nation
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    JOIN region r ON n2.n_regionkey = r.r_regionkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
)
SELECT order_year,
       ROUND(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END), 2)
           AS nation_volume,
       ROUND(SUM(volume), 2) AS total_volume,
       ROUND(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END)
             / SUM(volume), 4) AS mkt_share
FROM volumes
GROUP BY order_year
ORDER BY order_year
"""


@query("q_tpch_q8_market_share", oracle=_ORACLE_Q8)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n_cust = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    n_supp = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    volume = _rev()
    nation_volume = F.when(F.col("supp_nation") == "NATION_3", volume).otherwise(0.0)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n_cust), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_region") == r.r_regionkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n_supp), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").cast("long").alias("order_year"))
        .agg(
            F.round(F.sum(nation_volume), 2).alias("nation_volume"),
            F.round(F.sum(volume), 2).alias("total_volume"),
            F.round(F.sum(nation_volume) / F.sum(volume), 4).alias("mkt_share"),
        )
        .orderBy("order_year")
    )


# ---------------------------------------------------------------------------
# Q9 shape — product-type profit by nation and year. No ps_supplycost
# fixture → cost is modeled as 60% of p_retailprice per unit.
# ---------------------------------------------------------------------------

_ORACLE_Q9 = """
SELECT n.n_name AS nation_name,
       CAST(year(l.l_shipdate) AS BIGINT) AS ship_year,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)
                 - 0.6 * p.p_retailprice * l.l_quantity), 2) AS profit
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE p.p_name LIKE '%o%'
GROUP BY n.n_name, CAST(year(l.l_shipdate) AS BIGINT)
ORDER BY nation_name, ship_year DESC
"""


@query("q_tpch_q9_product_profit", oracle=_ORACLE_Q9)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%o%"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation")
    profit = _rev() - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation_name"),
            F.year("l_shipdate").cast("long").alias("ship_year"),
        )
        .agg(F.round(F.sum(profit), 2).alias("profit"))
        .orderBy("nation_name", F.col("ship_year").desc())
    )


# ---------------------------------------------------------------------------
# Q11 shape — important parts: per-part value with a scalar-subquery
# threshold (a fraction of total value). No partsupp fixture → value is
# discounted revenue shipped by suppliers of one region.
# Threshold is ROUNDed on both sides so the > cannot flip on engine
# summation order (ORACLES.md float discipline).
# ---------------------------------------------------------------------------

_ORACLE_Q11 = """
WITH vals AS (
    SELECT l.l_partkey AS part_key,
           SUM(l.l_extendedprice * (1 - l.l_discount)) AS raw_value
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY l.l_partkey
)
SELECT part_key, ROUND(raw_value, 2) AS part_value
FROM vals
WHERE ROUND(raw_value, 2) >
      (SELECT ROUND(AVG(raw_value) * 1.5, 2) FROM vals)
ORDER BY part_value DESC, part_key
"""


@query("q_tpch_q11_important_parts", oracle=_ORACLE_Q11)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vals = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .groupBy(F.col("l_partkey").alias("part_key"))
        .agg(F.sum(_rev()).alias("raw_value"))
    )
    # Scalar threshold: one-row aggregate broadcast into the filter —
    # at 100 TB this is a two-pass plan over the (already part-sized)
    # aggregate, not over lineitem.
    # 1.5× the average part value: scale-invariant (a fraction-of-total
    # threshold shrinks per part as the part count grows with SF).
    threshold = vals.agg(
        F.round(F.avg("raw_value") * 1.5, 2).alias("__threshold")
    )
    return (
        vals.crossJoin(F.broadcast(threshold))
        .filter(F.round("raw_value", 2) > F.col("__threshold"))
        .select("part_key", F.round("raw_value", 2).alias("part_value"))
        .orderBy(F.col("part_value").desc(), "part_key")
    )


# ---------------------------------------------------------------------------
# Q12 shape — shipping-priority classes: conditional counts per class.
# No l_shipmode fixture → classes derive from o_orderpriority; "late"
# means shipped >90 days after order date.
# ---------------------------------------------------------------------------

_ORACLE_Q12 = """
SELECT CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
            THEN 'HIGH' ELSE 'LOW' END AS priority_class,
       CAST(SUM(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
                     THEN 1 ELSE 0 END) AS BIGINT) AS late_count,
       COUNT(*) AS line_count
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY priority_class
ORDER BY priority_class
"""


@query("q_tpch_q12_priority_shipping", oracle=_ORACLE_Q12)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    late = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"), 1
    ).otherwise(0)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.when(
                F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "HIGH"
            )
            .otherwise("LOW")
            .alias("priority_class")
        )
        .agg(
            F.sum(late).cast("long").alias("late_count"),
            F.count(F.lit(1)).alias("line_count"),
        )
        .orderBy("priority_class")
    )


# ---------------------------------------------------------------------------
# Q13 shape — customer order-count distribution: LEFT join with the
# filter in the JOIN CONDITION (customers with zero qualifying orders
# must survive with count 0), then a histogram over the counts.
# ---------------------------------------------------------------------------

_ORACLE_Q13 = """
WITH c_orders AS (
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS order_count
    FROM customer c
    LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '5-LOW'
    GROUP BY c.c_custkey
)
SELECT order_count, COUNT(*) AS custdist
FROM c_orders
GROUP BY order_count
ORDER BY custdist DESC, order_count DESC
"""


@query("q_tpch_q13_customer_distribution", oracle=_ORACLE_Q13)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey",
                                                   "o_orderpriority")
    # The priority predicate must live in the join condition, not a
    # pre-filter of the OUTER side — but as a filter on the inner
    # (orders) side it is equivalent and pushes down to the scan.
    o_qual = o.filter(F.col("o_orderpriority") != "5-LOW")
    return (
        c.join(o_qual, c.c_custkey == o_qual.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("order_count"))
        .groupBy("order_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("order_count").desc())
    )


# ---------------------------------------------------------------------------
# Q14 shape — promotion effect: conditional-sum ratio over one month.
# ---------------------------------------------------------------------------

_ORACLE_Q14 = """
SELECT ROUND(100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0 END)
             / SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_share,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS total_revenue
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
  AND l.l_shipdate < TIMESTAMP '1997-10-01'
"""


@query("q_tpch_q14_promo_effect", oracle=_ORACLE_Q14)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-09-01") & (F.col("l_shipdate") < "1997-10-01")
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    promo = F.when(F.col("p_type") == "PROMO", _rev()).otherwise(0.0)
    return li.join(F.broadcast(p), li.l_partkey == p.p_partkey).agg(
        F.round(100.0 * F.sum(promo) / F.sum(_rev()), 4).alias("promo_share"),
        F.round(F.sum(_rev()), 2).alias("total_revenue"),
    )


# ---------------------------------------------------------------------------
# Q15 shape — top supplier: revenue view + scalar MAX equality.
# Aggregate-before-join: the supplier join sees one row per supplier,
# never lineitem. Revenue is rounded BEFORE the MAX so the equality
# is over engine-stable values.
# ---------------------------------------------------------------------------

_ORACLE_Q15 = """
WITH revenue AS (
    SELECT l.l_suppkey AS supp_key,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS total_revenue
    FROM lineitem l
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1997-04-01'
    GROUP BY l.l_suppkey
)
SELECT s.s_suppkey AS supp_key, s.s_name AS supp_name, r.total_revenue
FROM supplier s
JOIN revenue r ON s.s_suppkey = r.supp_key
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY supp_key
"""


@query("q_tpch_q15_top_supplier", oracle=_ORACLE_Q15)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    revenue = li.groupBy(F.col("l_suppkey").alias("supp_key")).agg(
        F.round(F.sum(_rev()), 2).alias("total_revenue")
    )
    best = revenue.agg(F.max("total_revenue").alias("__best"))
    return (
        revenue.crossJoin(F.broadcast(best))
        .filter(F.col("total_revenue") == F.col("__best"))
        .join(F.broadcast(s), F.col("supp_key") == s.s_suppkey)
        .select("supp_key", F.col("s_name").alias("supp_name"), "total_revenue")
        .orderBy("supp_key")
    )


# ---------------------------------------------------------------------------
# Q16 shape — supplier diversity per part attribute: COUNT(DISTINCT)
# with a NOT IN exclusion (suppliers in deficit). No partsupp fixture →
# the part-supplier relation is derived from lineitem shipments.
# ---------------------------------------------------------------------------

_ORACLE_Q16 = """
SELECT p.p_brand AS brand,
       p.p_type AS part_type,
       p.p_size AS part_size,
       COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_size IN (1, 5, 10, 15, 20, 25)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, brand, part_type, part_size
"""


@query("q_tpch_q16_supplier_diversity", oracle=_ORACLE_Q16)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_size").isin(1, 5, 10, 15, 20, 25))
    )
    deficit = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    # NOT IN over a non-null key column ≡ anti join (no null-semantics
    # trap: s_suppkey is never null in the fixture).
    return (
        li.join(F.broadcast(deficit), li.l_suppkey == deficit.s_suppkey, "left_anti")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.col("p_type").alias("part_type"),
            F.col("p_size").alias("part_size"),
        )
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "brand", "part_type", "part_size")
    )


# ---------------------------------------------------------------------------
# Q17 shape — small-quantity revenue: correlated per-part AVG (window),
# lines below 20% of their part's average quantity. Threshold rounded
# so the correlated AVG cannot flip the predicate across engines.
# ---------------------------------------------------------------------------

_ORACLE_Q17 = """
WITH flagged AS (
    SELECT l.l_extendedprice, l.l_quantity,
           AVG(l.l_quantity) OVER (PARTITION BY l.l_partkey) AS avg_qty
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand = 'Brand#3'
)
SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly,
       COUNT(*) AS n_lines
FROM flagged
WHERE l_quantity < ROUND(0.2 * avg_qty, 2)
"""


@query("q_tpch_q17_small_quantity", oracle=_ORACLE_Q17)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    flagged = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).withColumn(
        "avg_qty", F.avg("l_quantity").over(Window.partitionBy("l_partkey"))
    )
    # At 100 TB prefer the two-level form (groupBy partkey → avg →
    # broadcast re-join): the window shuffles every line on l_partkey,
    # the agg shuffles one row per part. Kept as a window here because
    # the brand filter already shrinks the input to ~1/25.
    return flagged.filter(
        F.col("l_quantity") < F.round(0.2 * F.col("avg_qty"), 2)
    ).agg(
        F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# Q19 shape — disjunctive brand/size/quantity predicates: three OR'd
# conjunct groups over the part⋈lineitem join. Catalyst extracts the
# common join key and pushes the per-branch constraints; the interesting
# plan property is that the OR does NOT block partition/filter pushdown
# of the shared predicates.
# ---------------------------------------------------------------------------

_ORACLE_Q19 = """
SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 20)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity BETWEEN 10 AND 30)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
       AND l.l_quantity BETWEEN 20 AND 40)
"""


@query("q_tpch_q19_disjunctive_filter", oracle=_ORACLE_Q19)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    branch = lambda brand, size_hi, q_lo, q_hi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, size_hi)
        & F.col("l_quantity").between(q_lo, q_hi)
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(
            branch("Brand#1", 15, 1, 20)
            | branch("Brand#2", 25, 10, 30)
            | branch("Brand#3", 35, 20, 40)
        )
        .agg(
            F.round(F.sum(_rev()), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Q20 shape — heavy shippers of a part family: aggregate-then-semijoin
# (HAVING over (supplier, part) shipments feeds a supplier semi join).
# ---------------------------------------------------------------------------

_ORACLE_Q20 = """
WITH heavy AS (
    SELECT l.l_suppkey
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_name LIKE 'red%'
      AND l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l.l_suppkey, l.l_partkey
    HAVING SUM(l.l_quantity) > 45
)
SELECT s.s_suppkey AS supp_key, s.s_name AS supp_name, n.n_name AS nation_name
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE s.s_suppkey IN (SELECT l_suppkey FROM heavy)
ORDER BY supp_key
"""


@query("q_tpch_q20_heavy_shippers", oracle=_ORACLE_Q20)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    heavy = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("__qty"))
        .filter(F.col("__qty") > 45)  # integral sums — engine-stable;
        # 45 needs a 46+ single line or a multi-line pair, so it
        # discriminates (~2/3 of suppliers) at every SF: per-supplier
        # line counts are SF-invariant in this corpus
        .select("l_suppkey")
    )
    return (
        s.join(heavy, s.s_suppkey == heavy.l_suppkey, "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            F.col("s_suppkey").alias("supp_key"),
            F.col("s_name").alias("supp_name"),
            F.col("n_name").alias("nation_name"),
        )
        .orderBy("supp_key")
    )


# ---------------------------------------------------------------------------
# Q21 shape — suppliers who kept orders waiting: the EXISTS /
# NOT-EXISTS double self-correlation. "Late" = shipped >60 days after
# order date on a finished ('F') order; a supplier is counted when it
# was late, some OTHER supplier contributed to the same order, and no
# other supplier was late on it. No l_receiptdate fixture → lateness
# derives from shipdate.
# ---------------------------------------------------------------------------

_ORACLE_Q21 = """
WITH f_orders AS (
    SELECT o_orderkey, o_orderdate FROM orders WHERE o_orderstatus = 'F'
),
late AS (
    SELECT l.l_orderkey, l.l_suppkey
    FROM lineitem l
    JOIN f_orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
)
SELECT s.s_name AS supp_name, COUNT(*) AS numwait
FROM late l1
JOIN supplier s ON l1.l_suppkey = s.s_suppkey
WHERE EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
)
AND NOT EXISTS (
    SELECT 1 FROM late l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
)
GROUP BY s.s_name
ORDER BY numwait DESC, supp_name
LIMIT 20
"""


@query("q_tpch_q21_waiting_suppliers", oracle=_ORACLE_Q21)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    f_orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    late = (
        li.join(f_orders, li.l_orderkey == f_orders.o_orderkey)
        .filter(
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .select("l_orderkey", "l_suppkey")
    )
    # All three joins hash on l_orderkey — one partitioning, reused.
    other_lines = li.select(
        F.col("l_orderkey").alias("o2_key"), F.col("l_suppkey").alias("o2_supp")
    )
    other_late = late.select(
        F.col("l_orderkey").alias("o3_key"), F.col("l_suppkey").alias("o3_supp")
    )
    waited = (
        late.join(
            other_lines,
            (late.l_orderkey == F.col("o2_key"))
            & (late.l_suppkey != F.col("o2_supp")),
            "left_semi",
        )
        .join(
            other_late,
            (F.col("l_orderkey") == F.col("o3_key"))
            & (F.col("l_suppkey") != F.col("o3_supp")),
            "left_anti",
        )
    )
    return (
        waited.join(F.broadcast(s), waited.l_suppkey == s.s_suppkey)
        .groupBy(F.col("s_name").alias("supp_name"))
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "supp_name")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q22 shape — dormant high-balance customers: scalar-subquery average
# threshold + anti join against recent orders, grouped by a derived
# segment. No c_phone fixture → the segment is the last digit of
# c_name ("Customer#000000042" → '2'); "dormant" = no order since
# 2000-01-01 (every customer has old orders at fixture densities).
# ---------------------------------------------------------------------------

_ORACLE_Q22 = """
WITH threshold AS (
    SELECT ROUND(AVG(c_acctbal), 2) AS avg_bal
    FROM customer WHERE c_acctbal > 0.0
),
eligible AS (
    SELECT right(c.c_name, 1) AS cust_segment, c.c_acctbal
    FROM customer c, threshold t
    WHERE c.c_acctbal > t.avg_bal
      AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_orderdate >= TIMESTAMP '2000-01-01'
      )
)
SELECT cust_segment,
       COUNT(*) AS numcust,
       ROUND(SUM(c_acctbal), 2) AS total_acctbal
FROM eligible
GROUP BY cust_segment
ORDER BY cust_segment
"""


@query("q_tpch_q22_dormant_customers", oracle=_ORACLE_Q22)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    recent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "2000-01-01")
        .select("o_custkey")
    )
    threshold = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(F.round(F.avg("c_acctbal"), 2).alias("avg_bal"))
    )
    return (
        c.crossJoin(F.broadcast(threshold))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .groupBy(F.expr("right(c_name, 1)").alias("cust_segment"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
        .orderBy("cust_segment")
    )
