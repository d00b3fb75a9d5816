"""B10-B11: sort / limit / top-k, set operations.

Scale notes:
- Global ORDER BY is a range-partitioned sort (sampling pass to pick
  range bounds, then one shuffle). ORDER BY + LIMIT n is optimized to
  TakeOrderedAndProject: each partition keeps its local top-n, the
  driver merges — no full sort materialized. This is the 100 TB-safe
  top-k.
- Top-k per group: window row_number + filter — one shuffle on the
  group key; never collect-and-sort per group driver-side.
- UNION ALL is free (no shuffle, just plan concatenation); INTERSECT /
  EXCEPT compile to semi/anti joins with dedup — each one shuffle.
- Spark union() is positional (SURVEY §7 sharp edge) — columns are
  aligned explicitly before the union below.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from ..tables import load_table

# ---------------------------------------------------------------------------
# B10 — global sort + limit (TakeOrderedAndProject).
# ---------------------------------------------------------------------------

_ORACLE_SORT_LIMIT = """
SELECT o_orderkey AS order_key,
       o_custkey AS cust_key,
       o_totalprice AS total_price
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


@query("q_sort_limit", oracle=_ORACLE_SORT_LIMIT)
def sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            F.col("o_orderkey").alias("order_key"),
            F.col("o_custkey").alias("cust_key"),
            F.col("o_totalprice").alias("total_price"),
        )
        .orderBy(F.col("total_price").desc(), F.col("order_key"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# B10 — top-k per group (window + rank filter; DuckDB QUALIFY oracle).
# ---------------------------------------------------------------------------

_ORACLE_TOPK = """
SELECT cust_key, order_key, total_price, rn
FROM (
    SELECT o_custkey AS cust_key,
           o_orderkey AS order_key,
           o_totalprice AS total_price,
           ROW_NUMBER() OVER (
               PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
           ) AS rn
    FROM orders
)
WHERE rn <= 3
ORDER BY cust_key, rn
"""


@query("q_topk_per_group", oracle=_ORACLE_TOPK)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.select(
            F.col("o_custkey").alias("cust_key"),
            F.col("o_orderkey").alias("order_key"),
            F.col("o_totalprice").alias("total_price"),
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
        .orderBy("cust_key", "rn")
    )


# ---------------------------------------------------------------------------
# B11 — UNION ALL (positional; columns aligned explicitly).
# ---------------------------------------------------------------------------

_ORACLE_UNION_ALL = """
SELECT event_id, user_id, 'purchase' AS kind FROM events WHERE event_type = 'purchase'
UNION ALL
SELECT event_id, user_id, 'signup' AS kind FROM events WHERE event_type = 'signup'
ORDER BY event_id
"""


@query("q_union_all", oracle=_ORACLE_UNION_ALL)
def union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.lit("purchase").alias("kind")
    )
    signups = ev.filter(F.col("event_type") == "signup").select(
        "event_id", "user_id", F.lit("signup").alias("kind")
    )
    return purchases.unionAll(signups).orderBy("event_id")


# ---------------------------------------------------------------------------
# B11 — INTERSECT (distinct semantics; compiles to left-semi + dedup).
# ---------------------------------------------------------------------------

_ORACLE_INTERSECT = """
SELECT o_custkey AS cust_key FROM orders WHERE o_orderstatus = 'F'
INTERSECT
SELECT o_custkey AS cust_key FROM orders WHERE o_orderstatus = 'O'
ORDER BY cust_key
"""


@query("q_intersect", oracle=_ORACLE_INTERSECT)
def intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("cust_key"))
    op = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("cust_key"))
    return f.intersect(op).orderBy("cust_key")


# ---------------------------------------------------------------------------
# B11 — EXCEPT (distinct semantics; compiles to left-anti + dedup).
# ---------------------------------------------------------------------------

_ORACLE_EXCEPT = """
SELECT o_custkey AS cust_key FROM orders WHERE o_orderstatus = 'F'
EXCEPT
SELECT o_custkey AS cust_key FROM orders WHERE o_orderstatus = 'O'
ORDER BY cust_key
"""


@query("q_except", oracle=_ORACLE_EXCEPT)
def except_(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("cust_key"))
    op = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("cust_key"))
    # subtract == EXCEPT DISTINCT (exceptAll().distinct() would be wrong:
    # a key on both sides but duplicated on the left would survive it)
    return f.subtract(op).orderBy("cust_key")


# ---------------------------------------------------------------------------
# Explicit NULL ordering — a silent cross-engine divergence: Spark
# sorts NULLS FIRST on ASC by default, DuckDB/Postgres NULLS LAST.
# Any ORDER BY on a nullable key that feeds pagination, top-k, or a
# hash comparison must spell the null position on BOTH engines; this
# query pins the convention (ASC NULLS LAST, DESC NULLS FIRST) over a
# key with a planted NULL class.
# ---------------------------------------------------------------------------

_ORACLE_NULL_ORDER = """
WITH k AS (
    SELECT c_custkey, NULLIF(c_mktsegment, 'MACHINERY') AS seg, c_acctbal
    FROM customer WHERE c_custkey <= 200
)
SELECT c_custkey AS cust_key,
       COALESCE(seg, '<null>') AS seg,
       ROUND(c_acctbal, 2) AS acctbal
FROM k
ORDER BY seg ASC NULLS LAST, c_acctbal DESC NULLS FIRST, c_custkey
"""


@query("q_sort_null_order", oracle=_ORACLE_NULL_ORDER)
def sort_null_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 200)
    seg = F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY"))
    return (
        c.select(
            F.col("c_custkey").alias("cust_key"),
            seg.alias("seg_raw"),
            F.round("c_acctbal", 2).alias("acctbal"),
        )
        .orderBy(
            F.col("seg_raw").asc_nulls_last(),
            F.col("acctbal").desc_nulls_first(),
            F.col("cust_key"),
        )
        .select(
            "cust_key",
            F.coalesce("seg_raw", F.lit("<null>")).alias("seg"),
            "acctbal",
        )
    )


# ---------------------------------------------------------------------------
# Keyset (cursor) pagination — the scalable replacement for OFFSET.
# OFFSET n at 100 TB sorts-and-discards n rows on EVERY page; keyset
# turns the cursor into a pushed-down range predicate, so page 1000
# costs the same as page 1.
# ---------------------------------------------------------------------------

_ORACLE_KEYSET = """
SELECT o_orderkey, o_orderdate, o_totalprice
FROM orders
WHERE o_orderdate > TIMESTAMP '1997-06-15'
   OR (o_orderdate = TIMESTAMP '1997-06-15' AND o_orderkey > 5000)
ORDER BY o_orderdate, o_orderkey
LIMIT 100
"""


@query("q_keyset_pagination", oracle=_ORACLE_KEYSET)
def keyset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One page of orders strictly after the cursor
    (o_orderdate, o_orderkey) = (1997-06-15, 5000) in the total order.

    Scale design (100 TB): the cursor is an ordinary range predicate —
    `.explain` shows it in PushedFilters, so a date-partitioned or
    z-ordered layout (sources/layout.py) prunes every file before the
    cursor; the ORDER BY + LIMIT plans as TakeOrderedAndProject
    (per-partition top-k, k rows per task to the driver — never a
    global sort). The OFFSET formulation admits neither optimization,
    which is why every warehouse's deep-pagination advice is exactly
    this rewrite.
    """
    o = load_table(spark, sf_dir, "orders")
    cursor_date = F.lit("1997-06-15").cast("timestamp")
    page = (
        o.filter(
            (F.col("o_orderdate") > cursor_date)
            | (
                (F.col("o_orderdate") == cursor_date)
                & (F.col("o_orderkey") > 5000)
            )
        )
        .select("o_orderkey", "o_orderdate", "o_totalprice")
        .orderBy("o_orderdate", "o_orderkey")
        .limit(100)
    )
    return page


# ---------------------------------------------------------------------------
# Schema-evolution union: unionByName over sources with different
# column sets — the consolidation step when a table's schema grew
# between ingestion epochs.
# ---------------------------------------------------------------------------

_ORACLE_UNION_BY_NAME = """
SELECT o_orderkey, o_totalprice, CAST(NULL AS VARCHAR) AS o_orderpriority
FROM orders WHERE o_orderkey % 2 = 0
UNION ALL
SELECT o_orderkey, CAST(NULL AS DOUBLE) AS o_totalprice, o_orderpriority
FROM orders WHERE o_orderkey % 2 = 1
ORDER BY o_orderkey
"""


@query("q_union_by_name", oracle=_ORACLE_UNION_BY_NAME)
def union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union two epochs of the same logical table whose schemas
    diverged (one has o_totalprice, the other o_orderpriority);
    missing columns null-fill.

    Spark's plain `union` is POSITIONAL (column i meets column i — a
    silent corruption when schemas drift); `unionByName(
    allowMissingColumns=True)` is the schema-evolution-safe form and
    pairs with the parquet `mergeSchema` read option tested in
    tests/test_new_ops_r2.py. Zero shuffle: union is a plan-level
    concatenation of scans at any scale.
    """
    o = load_table(spark, sf_dir, "orders")
    epoch_a = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_totalprice"
    )
    epoch_b = o.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_orderpriority"
    )
    return epoch_a.unionByName(epoch_b, allowMissingColumns=True).orderBy(
        "o_orderkey"
    )


# ---------------------------------------------------------------------------
# Top-k with an OTHERS bucket — the BI presentation shape: the top-5
# brands by revenue stay named, the long tail collapses into one
# 'OTHER' row so the result always sums to the total. Two levels: the
# brand aggregate (shuffle carries brands), then rank + conditional
# regroup over the brands-sized result — the second pass never touches
# fact rows.
# ---------------------------------------------------------------------------

_ORACLE_TOPK_OTHERS = """
WITH rev AS (
    SELECT p.p_brand AS brand,
           SUM(l.l_extendedprice * (1 - l.l_discount)) AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
), ranked AS (
    SELECT brand, revenue,
           ROW_NUMBER() OVER (ORDER BY revenue DESC, brand) AS rk
    FROM rev
)
SELECT CASE WHEN rk <= 5 THEN brand ELSE 'OTHER' END AS brand,
       CAST(MIN(rk) AS BIGINT) AS rank_order,
       ROUND(SUM(revenue), 2) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_brands
FROM ranked
GROUP BY CASE WHEN rk <= 5 THEN brand ELSE 'OTHER' END
ORDER BY rank_order
"""


@query("q_topk_with_others", oracle=_ORACLE_TOPK_OTHERS)
def topk_with_others(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
    )
    ranked = rev.select(
        "brand",
        "revenue",
        F.row_number()
        .over(Window.orderBy(F.desc("revenue"), "brand"))
        .alias("rk"),
    )
    bucket = F.when(F.col("rk") <= 5, F.col("brand")).otherwise(F.lit("OTHER"))
    return (
        ranked.groupBy(bucket.alias("brand"))
        .agg(
            F.min("rk").alias("rank_order"),
            F.round(F.sum("revenue"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_brands"),
        )
        .orderBy("rank_order")
    )


_ORACLE_SKYLINE = """
WITH pts AS (
    SELECT p_partkey, p_retailprice, p_size FROM part
)
SELECT a.p_partkey, ROUND(a.p_retailprice, 2) AS retail_price,
       CAST(a.p_size AS BIGINT) AS size
FROM pts a
WHERE NOT EXISTS (
    SELECT 1 FROM pts b
    WHERE b.p_retailprice <= a.p_retailprice AND b.p_size >= a.p_size
      AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size)
)
ORDER BY a.p_partkey
"""


@query("q_skyline_pareto", oracle=_ORACLE_SKYLINE)
def skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline / Pareto frontier: parts not dominated on (cheaper,
    bigger) — the multi-criteria shortlist operator (Börzsönyi et al.,
    ICDE 2001, public literature).

    The textbook spelling is the quadratic NOT EXISTS self-join — that
    IS the oracle here, proving the scalable form equivalent. The
    engine's form is the sort-scan: order by (price asc, size desc,
    key) — a TOTAL order — and keep a row iff its size strictly
    exceeds the running max size over all STRICTLY cheaper rows
    (same-price groups share the predecessor max, so equal-price
    ties are resolved exactly as dominance requires: among equal
    price, only the max size survives, duplicates of that max are
    kept only if nothing cheaper matches it). One window over the
    dimension — linear, no self-join; at 100 TB the same scan runs
    per-partition after a range exchange on price.
    """
    part = load_table(spark, sf_dir, "part")
    per_price = part.groupBy("p_retailprice").agg(
        F.max("p_size").alias("grp_max")
    )
    w_prices = Window.orderBy("p_retailprice").rowsBetween(
        Window.unboundedPreceding, -1
    )
    cheaper = per_price.withColumn(
        "cheaper_max", F.max("grp_max").over(w_prices)
    )
    return (
        part.join(cheaper, "p_retailprice")
        .filter(
            (F.col("p_size") == F.col("grp_max"))
            & (
                F.col("cheaper_max").isNull()
                | (F.col("p_size") > F.col("cheaper_max"))
            )
        )
        .select(
            "p_partkey",
            F.round("p_retailprice", 2).alias("retail_price"),
            F.col("p_size").cast("long").alias("size"),
        )
        .orderBy("p_partkey")
    )
